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

from pyspark.sql import Column, DataFrame, Window
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


def bottomk_sample(
    df: DataFrame,
    key: Column,
    k: int = 512,
    salt: str = "",
    value_col: str = "x",
) -> DataFrame:
    """Bottom-k sketch (Cohen & Kaplan 2007): the ``k`` rows whose
    seeded engine-portable hash of ``key`` is smallest — a fixed-size
    uniform sample WITHOUT an RNG.  Determinism is the point twice
    over: the sketch is exact-oracle-able (DuckDB computes the same
    md5-derived order), and it is MERGEABLE — bottom-k of a union is
    the bottom-k of the parts' bottom-ks, so per-partition /
    per-day / per-corpus sketches combine without revisiting data
    (the same pre-aggregation story as the CMS and HLL sketches
    above).  Hash ties are broken by the hash itself being (md5-)
    collision-free at 60 bits for practical inputs; NULL keys hash
    NULL and are excluded (they cannot be ordered).  Output:
    (``_hk``, ``value_col``), the k smallest hash keys.

    Scale: TakeOrderedAndProject — per-partition heaps of size k, one
    k-row merge at the driver side of the exchange; nothing
    corpus-sized moves."""
    return (
        df.select(hash60(key, salt=salt).alias("_hk"), F.col(value_col))
        .where(F.col("_hk").isNotNull())
        .orderBy(F.col("_hk").asc())
        .limit(k)
    )


def quantiles_from_sample(
    sample: DataFrame, qs: list[float], value_col: str = "x"
) -> DataFrame:
    """Rank-based quantile estimates from a (bottom-k) sample: for
    each q, the value at 1-indexed rank ``ceil(q*n)`` of the sample
    sorted by value — percentile_disc semantics, chosen because both
    engines state it identically with integer arithmetic (no
    interpolation doubles to drift).  Output: (q, est), one row per
    requested quantile."""
    ranked = sample.select(
        F.col(value_col),
        F.row_number().over(Window.orderBy(F.col(value_col).asc())).alias("_r"),
        F.count(F.lit(1)).over(Window.partitionBy()).alias("_n"),
    )
    spec = F.array(*[F.lit(float(q)) for q in qs])
    return (
        ranked.select(F.explode(spec).alias("q"), "_r", "_n", value_col)
        .where(F.col("_r") == F.ceil(F.col("q") * F.col("_n")).cast("int"))
        .select("q", F.col(value_col).alias("est"))
        .orderBy("q")
    )
