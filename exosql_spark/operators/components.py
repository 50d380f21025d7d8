"""Connected components over candidate-pair edges — upgrades pairwise
near-dup output (min-representative convention) to true duplicate
CLUSTERS (transitive closure: A~B, B~C ⇒ {A,B,C} even when A≁C).

Algorithm: iterative min-label propagation (the standard large-graph
approach when a Pregel framework isn't available):

  label(v) ← min(label(v), min over neighbors label(u))

repeated until fixpoint. Each iteration is two hash joins on the edge
list; lineage is cut with localCheckpoint every iteration so the plan
doesn't grow (iterative DataFrame algorithms otherwise compile
exponentially). Converges in O(diameter) iterations — dedup graphs
are unions of near-cliques, so diameter is tiny (2-4).

At 100 TB the edge list (near-dup candidate pairs) is vastly smaller
than the corpus; this runs on pairs only.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def connected_components(
    edges: DataFrame,
    src: str = "id_a",
    dst: str = "id_b",
    max_iterations: int = 20,
) -> DataFrame:
    """Return (id, component) where component = min node id reachable.

    ``edges`` is undirected input (each pair listed once, either
    order). Nodes with no edges are not returned (callers union
    singletons if needed).
    """
    # symmetrize once: propagate both directions
    e = (
        edges.select(F.col(src).alias("u"), F.col(dst).alias("v"))
        .union(edges.select(F.col(dst).alias("u"), F.col(src).alias("v")))
        .distinct()
        .localCheckpoint()
    )
    labels = (
        e.select(F.col("u").alias("id"))
        .distinct()
        .withColumn("component", F.col("id"))
        .localCheckpoint()
    )
    for _ in range(max_iterations):
        # candidate labels arriving over edges
        incoming = (
            e.join(labels.withColumnRenamed("id", "v2"), e.v == F.col("v2"))
            .select(F.col("u").alias("id"), "component")
        )
        new_labels = (
            labels.union(incoming)
            .groupBy("id")
            .agg(F.min("component").alias("component"))
            .localCheckpoint()
        )
        changed = (
            new_labels.alias("n")
            .join(labels.alias("o"), "id")
            .filter(F.col("n.component") != F.col("o.component"))
            .limit(1)
            .count()
        )
        labels = new_labels
        if changed == 0:
            break
    return labels


def dedup_components(
    df: DataFrame,
    pairs: DataFrame,
    id_col: str = "doc_id",
) -> DataFrame:
    """Keep one representative (min id) per duplicate CLUSTER; rows
    that appear in no pair are kept as-is. ``pairs`` columns: id_a,
    id_b (e.g. minhash_dedup_pairs output)."""
    comp = connected_components(pairs)
    losers = comp.filter(F.col("id") != F.col("component")).select(
        F.col("id").alias(id_col)
    )
    return df.join(losers, id_col, "left_anti")
