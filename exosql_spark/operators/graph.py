"""Graph centrality over edge tables — PageRank, distributed.

WHY in a training-data engine: link-graph centrality is a standard
document-quality prior for web-scale corpora (Common Crawl publishes
harmonic-centrality/PageRank rankings precisely so curation pipelines
can filter or weight pages by them; Brin & Page 1998).  The input is
the natural Spark shape — an ``(src, dst)`` edge DataFrame — and the
computation is the classic synchronous power iteration:

    rank ← (1−d)/N + d·(Σ_in rank/out_deg + dangling_mass/N)

Distributed shape per iteration (everything stays in the job graph —
the only driver scalar is N, one number):

- **contributions**: edges ⋈ ranks on src (ranks is |V|-sized, the
  smaller side at web scale after the first aggregation; AQE picks
  the join strategy) → groupBy dst, one map-side-combined shuffle
  keyed by vertex;
- **dangling mass** (vertices with no out-edges must redistribute
  their rank uniformly or total mass leaks): a 1-row aggregate over
  the zero-out-degree ranks, attached by broadcast ``crossJoin`` —
  in-plan, no collect;
- **lineage bound — checkpoint, not persist**: each rank generation
  is ``localCheckpoint``-ed (eager).  Persist alone is NOT enough
  here, unlike bpe.learn_bpe / clustering.kmeans where each
  generation references its predecessor once (linear plan growth):
  this loop references ``ranks`` three times per iteration (dangling
  aggregate, contribution join, vertex re-attach), so the LOGICAL
  plan tree grows 3^k — caching truncates execution but not the plan,
  and plan stringification alone OOMs the driver by iteration ~8
  (measured).  localCheckpoint cuts the lineage each round; freed
  generations are reclaimed by Spark's context cleaner once
  unreferenced.  On a real cluster prefer
  ``spark.sparkContext.setCheckpointDir`` + ``.checkpoint()`` if
  executor loss must be survivable mid-computation.

Determinism: the per-vertex contribution sum is a float sum whose
grouping order is partition-dependent (last-ulp), so oracles compare
nd-rounded ranks — the repo-wide fround convention.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def pagerank(
    edges: DataFrame,
    n_iter: int = 10,
    damping: float = 0.85,
    src: str = "src",
    dst: str = "dst",
    vertices: DataFrame | None = None,
    tol: float | None = None,
    weight: str | None = None,
) -> DataFrame:
    """Up to ``n_iter`` synchronous PageRank iterations over an edge
    table.  Returns (``id``, ``rank``); ranks sum to 1 (dangling mass
    is redistributed uniformly).  ``vertices`` (one ``id`` column)
    widens the vertex set beyond edge endpoints — isolated vertices
    then participate as pure dangling nodes.  Parallel edges are
    counted as distinct edges (contribution proportional to
    multiplicity), the usual multigraph convention.

    ``tol`` enables convergence early-stop: iteration ends once
    ``max_v |rank_v - prev_rank_v| < tol`` — one extra 1-row aggregate
    + driver scalar per iteration (the same bounded-collect budget as
    bpe.learn_bpe's per-merge argmax), worth it when n_iter is a
    generous cap and the graph mixes fast.  Entries that need
    engine-reproducible output use a FIXED n_iter and no tol (the
    stopping iteration is float-comparison-dependent and therefore
    not oracle-stable).

    ``weight`` names an edge-weight column: each source then splits
    its rank over out-edges PROPORTIONALLY to weight (out-strength
    normalization, the weighted-PageRank convention) instead of
    uniformly — the form link-graph quality priors actually use
    (e.g. crawl graphs weighting by link count between domains).
    Non-positive and NULL weights are dropped with their edges — but
    the VERTEX set is derived from the unfiltered endpoints, so a
    vertex whose every incident edge is dropped still participates as
    a dangling node rather than silently vanishing and renormalizing
    rank mass over the survivors (ADVICE r13); an unweighted call is
    exactly the weighted call with weight ≡ 1."""
    if n_iter < 0:
        raise ValueError(f"n_iter must be >= 0, got {n_iter}")
    # The edge table feeds EVERY iteration's contribution join: hash-
    # partition it by source once and persist, so iterations re-read a
    # materialized, already-partitioned frame instead of re-scanning
    # and re-shuffling the (at scale, corpus-sized) edge input n_iter
    # times — the ranks side is what legitimately moves each round.
    w = (
        F.col(weight).cast("double")
        if weight is not None
        else F.lit(1.0)
    )
    e_all = edges.select(
        F.col(src).alias("_s"), F.col(dst).alias("_d"), w.alias("_w")
    )
    e = e_all.where(F.col("_w") > 0) if weight is not None else e_all
    e = e.repartition(F.col("_s")).persist()
    # endpoints from the UNFILTERED frame: zero-weight-only vertices
    # stay in the graph as dangling nodes
    verts = e_all.select(F.col("_s").alias("id")).unionByName(
        e_all.select(F.col("_d").alias("id"))
    )
    if vertices is not None:
        verts = verts.unionByName(vertices.select(F.col("id")))
    verts = verts.distinct().persist()
    n = verts.count()  # the one driver scalar; also materializes verts
    if n == 0:
        verts.unpersist()
        e.unpersist()
        return verts.withColumn("rank", F.lit(0.0))

    # out-strength: Σ weights per source (== out-degree when
    # unweighted, since every _w is 1.0)
    out_deg = e.groupBy(F.col("_s").alias("id")).agg(
        F.sum("_w").alias("_deg")
    )
    # (id, deg, rank): deg NULL marks dangling vertices; checkpointed
    # so every iteration starts from a lineage-free frame
    ranks = (
        verts.join(out_deg, "id", "left")
        .select("id", "_deg", F.lit(1.0 / n).alias("rank"))
        .localCheckpoint()
    )
    verts.unpersist()

    teleport = (1.0 - damping) / n
    for _ in range(n_iter):
        prev_ranks = ranks
        dangling = ranks.filter(F.col("_deg").isNull()).agg(
            F.coalesce(F.sum("rank"), F.lit(0.0)).alias("_dm")
        )
        contrib = (
            e.join(
                ranks.select(
                    F.col("id").alias("_s"),
                    (F.col("rank") / F.col("_deg")).alias("_c"),
                ),
                "_s",
            )
            .groupBy(F.col("_d").alias("id"))
            .agg(F.sum(F.col("_c") * F.col("_w")).alias("_in"))
        )
        ranks = (
            ranks.select("id", "_deg")
            .join(contrib, "id", "left")
            .crossJoin(F.broadcast(dangling))  # 1-row mass attachment
            .select(
                "id",
                "_deg",
                (
                    F.lit(teleport)
                    + F.lit(damping)
                    * (
                        F.coalesce(F.col("_in"), F.lit(0.0))
                        + F.col("_dm") / n
                    )
                ).alias("rank"),
            )
            .localCheckpoint()  # eager: truncates the 3-ref lineage
        )
        if tol is not None:
            delta = (
                ranks.select("id", "rank")
                .join(
                    prev_ranks.select("id", F.col("rank").alias("_pr")), "id"
                )
                .agg(F.max(F.abs(F.col("rank") - F.col("_pr"))).alias("d"))
                .first()
                .d
            )
            if delta is not None and delta < tol:
                break
    e.unpersist()
    return ranks.select("id", "rank")
