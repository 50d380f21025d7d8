"""Count-min sketches over keys: join-cardinality estimation without
executing the join.

At 100 TB the question "how big is A ⋈ B on this key?" decides the
physical strategy (broadcast vs shuffle vs pre-bucket) and must be
answered WITHOUT producing the join: the classic answer (Cormode &
Muthukrishnan 2005, §4.2) is the count-min inner product — sketch each
side's key-frequency vector into a depth×width table, then
``est = min_d Σ_w A[d][w]·B[d][w]``, an upper bound on the true
``Σ_k a_k·b_k`` that overestimates by at most ``ε·‖a‖₁·‖b‖₁`` with
probability 1-δ (ε = e/width, δ = e^-depth).

Scale shape: building a sketch is one pass — depth bucket ids per row
(engine-portable seeded ``hash60``, so sketches built by different
engines/runs/retries are IDENTICAL, which also makes the estimate
exact-oracle-able in DuckDB), posexplode to (d, bucket), and a
map-side-combined groupBy whose output is bounded by depth×width
(1024 rows here), never by the data.  Comparing two sketches is a
broadcast join of two tiny tables.  Sketches are mergeable (entrywise
sum) across partitions, days, or corpora — the same pre-aggregation
story as the HLL rollup (events_hll_sketch_rollup).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from exosql_spark.operators.ordering import hash60


def cms_counts(
    df: DataFrame, key: Column, depth: int = 4, width: int = 256, salt: str = ""
) -> DataFrame:
    """Count-min table ``(d, bucket, n)`` of the key-frequency vector:
    row r increments bucket ``hash_d(key(r)) mod width`` in each of
    the ``depth`` rows.  Empty buckets are absent (implicit 0).
    ``hash60`` is non-negative (60-bit), so ``% width`` needs no pmod;
    NULL keys hash to NULL buckets, which are dropped explicitly below
    (posexplode of an all-NULL array still emits rows), matching the
    SQL twin's ``x || ':salt'`` NULL propagation + inner-join drop."""
    buckets = F.array(
        *[(hash60(key, salt=f"{salt}{d}") % width) for d in range(depth)]
    )
    return (
        df.select(F.posexplode(buckets).alias("d", "bucket"))
        .where(F.col("bucket").isNotNull())
        .groupBy("d", "bucket")
        .agg(F.count(F.lit(1)).alias("n"))
    )


def cms_join_size_estimate(
    cms_a: DataFrame, cms_b: DataFrame, width: int | None = None
) -> DataFrame:
    """CM inner-product estimate of |A ⋈ B| from two sketches built
    with the SAME depth/width/salt: one row, column ``est``.  Only
    buckets present on both sides contribute (absent = 0) — and a
    depth row with NO shared bucket contributes an inner product of
    ZERO, which must survive into the min: dropping it (the naive
    inner-join-then-min) would report the minimum of the *colliding*
    depths for disjoint key sets instead of the correct 0.

    Shape guards (ADVICE r12 — two sketches of mismatched build
    parameters previously joined into a meaningless estimate with no
    error): the two sides' observed DEPTH sets must be equal (always
    checked — the sketch table carries ``d`` so this is data-visible),
    and when the caller passes the build ``width``, any bucket ≥ width
    on either side errors the query (a wider-built sketch mixed in is
    caught with near-certainty, since its buckets populate the full
    range).  Width is a parameter rather than inferred: the table
    stores only occupied buckets, so the build width is not data-
    recoverable."""
    if width is not None:
        guard = F.when(
            F.col("bucket") >= width,
            F.raise_error(
                F.concat(
                    F.lit(
                        f"cms_join_size_estimate: bucket >= width={width} "
                        f"- sketch built with a different width? bucket="
                    ),
                    F.col("bucket").cast("string"),
                )
            ).cast("long"),
        ).otherwise(F.col("bucket"))
        cms_a = cms_a.withColumn("bucket", guard)
        cms_b = cms_b.withColumn("bucket", guard)
    j = cms_a.alias("a").join(cms_b.alias("b"), ["d", "bucket"])
    per_d = j.groupBy("d").agg(
        F.sum(F.col("a.n") * F.col("b.n")).alias("s")
    )
    # depth-set mismatch (e.g. depth-4 vs depth-8 builds) must error,
    # not silently min() over depths one side never populated.  An
    # EMPTY side (no input rows at all → no depths) stays legitimate:
    # the guard fires only when both sides are populated AND their
    # depth sets differ.
    da, db = cms_a.select("d").distinct(), cms_b.select("d").distinct()
    mismatch = (
        da.join(db, "d", "left_anti")
        .union(db.join(da, "d", "left_anti"))
        .agg(F.count(F.lit(1)).alias("n_mismatch"))
        .crossJoin(da.agg(F.count(F.lit(1)).alias("n_da")))
        .crossJoin(db.agg(F.count(F.lit(1)).alias("n_db")))
    )
    depths = da.union(db).distinct()
    full = (
        depths.join(per_d, "d", "left")
        .crossJoin(mismatch)  # 1-row broadcast attachment
        .select(
            F.when(
                (F.col("n_mismatch") > 0)
                & (F.col("n_da") > 0)
                & (F.col("n_db") > 0),
                F.raise_error(
                    F.lit(
                        "cms_join_size_estimate: the two sketches' depth "
                        "sets differ - built with different depth?"
                    )
                ).cast("long"),
            )
            .otherwise(F.coalesce(F.col("s"), F.lit(0)))
            .alias("s")
        )
    )
    # empty sketch (no input rows at all) ⇒ no depths ⇒ estimate 0
    return full.agg(F.coalesce(F.min("s"), F.lit(0)).alias("est"))
