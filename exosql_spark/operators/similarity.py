"""Similarity search over embedding columns (``array<float>``).

Two tiers, as a 100 TB pipeline needs:

- :func:`cosine_topk` — exact brute-force top-k. The query set is
  broadcast (small side); the corpus scan is embarrassingly parallel;
  per-partition top-k then global top-k via TakeOrderedAndProject.
  Right for ≤ a few thousand queries against any corpus size.
- :func:`lsh_topk` — random-hyperplane (sign) LSH: corpus and queries
  hash to sign-pattern buckets; candidates = bucket collisions; exact
  cosine re-rank inside buckets. Turns all-pairs into a bucket-key
  equi-join — the scale path. ``n_flip`` adds MULTI-PROBE (Lv et al.
  2007): margin-ranked 1-bit perturbations probed on the query side
  only, trading per-query probes for index tables (footprint).
- :func:`ivf_topk` — IVF-style coarse quantization without training:
  assign each vector to its nearest of `n_cells` sampled centroids
  (one broadcast pass), probe the closest cells per query.

Dot products default to native higher-order functions
(``zip_with`` + ``aggregate``) — JVM-side, no Python per row; the
bucket/cell computations additionally offer Arrow-batched numpy
twins (``hasher=``/``assigner='pandas'``), tested bit-identical,
because literal plane/centroid expression trees cost Catalyst
analysis proportional to k × dim on every plan build (SCALE.md,
"The Catalyst-analysis trap").
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from exosql_spark.cache import managed_persist


def _dot(a: F.Column, b: F.Column) -> F.Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


# --------------------------------------------------------------------
# SQL-text expression builders (r18 optimization round, guide §1.2):
# the cosine/L2 trees below are rebuilt through the Column API on
# every query construction at ~0.17 ms of py4j round-trip latency per
# node; rendering each as ONE F.expr/selectExpr string collapses the
# build to a handful of round trips. The SQL parses to the identical
# expression tree (double literals spelled `0.0D` to match F.lit's
# double, not SQL's default decimal) — same analyzed plan, same
# values, pinned by TestSqlTextBuilderEquivalence. Same mechanism as
# the dedup/BPE/text conversions earlier this round.
# --------------------------------------------------------------------


def _cosine_sql(a: str, b: str) -> str:
    """cosine(a, b) as a SQL fragment — the exact tree :func:`cosine`
    builds (cast-to-double, zip_with dot, per-side norms)."""
    da = f"transform({a}, x -> cast(x as double))"
    db = f"transform({b}, x -> cast(x as double))"
    dot = (
        f"aggregate(zip_with({da}, {db}, (x, y) -> x * y), 0.0D,"
        " (acc, v) -> acc + v)"
    )

    def norm(v: str) -> str:
        return (
            f"sqrt(aggregate(transform({v}, x -> x * x), 0.0D,"
            " (acc, v) -> acc + v))"
        )

    return f"{dot} / ({norm(da)} * {norm(db)})"


#: exact squared L2 in double (vectors arrive float32) — the
#: :func:`exact_rerank` sq_l2 tree.
_SQ_L2_SQL = (
    "aggregate(zip_with({a}, {b}, (x, y) ->"
    " (cast(x as double) - cast(y as double))"
    " * (cast(x as double) - cast(y as double))),"
    " 0.0D, (acc, v) -> acc + v)"
)


def _cosine_rank_tail(cands: DataFrame, k: int) -> DataFrame:
    """Shared scoring tail of :func:`lsh_topk` / :func:`ivf_topk`:
    cosine(c_vec, q_vec), per-query rank window, top-``k`` — the
    SQL-text form of the (score → row_number → filter → round) chain
    (r18; see the block comment at :func:`_cosine_sql`)."""
    return (
        cands.selectExpr(
            "query_id", "vec_id", f"{_cosine_sql('c_vec', 'q_vec')} AS _sim"
        )
        .selectExpr(
            "*",
            "row_number() OVER (PARTITION BY query_id"
            " ORDER BY _sim DESC, vec_id) AS rank",
        )
        .where(f"rank <= {int(k)}")
        .selectExpr(
            "query_id", "vec_id", "round(_sim, 4) AS cosine_sim", "rank"
        )
    )


def _norm(a: F.Column) -> F.Column:
    return F.sqrt(
        F.aggregate(
            F.transform(a, lambda x: x * x), F.lit(0.0), lambda acc, v: acc + v
        )
    )


def cosine(a: F.Column, b: F.Column) -> F.Column:
    """Cosine similarity of two float arrays (as double)."""
    da = F.transform(a, lambda x: x.cast("double"))
    db = F.transform(b, lambda x: x.cast("double"))
    return _dot(da, db) / (_norm(da) * _norm(db))


def cosine_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
) -> DataFrame:
    """Exact top-k cosine neighbors per query — two-level top-k.

    ``queries`` columns: (query_id, embedding). Broadcast it — the
    corpus side streams.  Level 1: partial top-k per
    (spark_partition_id, query_id) — ``collect_list`` groups are
    partition-local (each holds one scan partition's rows for one
    query, bounded by ``maxPartitionBytes``), sliced to k, re-exploded.
    Level 2: the global rank window then sees ≤ k × n_partitions rows
    per query instead of |corpus| rows, so no reducer ever holds a
    corpus-sized partition and the final exchange is k-bounded.

    The partial keeps rows by the SAME order as the global rank
    (``_sim`` desc, ``vec_id`` asc — hence sorting on struct(-sim, id)
    ascending): any global top-k row is within the top-k of its own
    partition under that order, so the pre-filter is lossless.
    Columns: query_id, vec_id, cosine_sim, rank.
    """
    q = F.broadcast(
        queries.select(
            F.col(query_id_col).alias("query_id"), F.col(vec_col).alias("q_vec")
        )
    )
    # SQL-text column programs (r18 — block comment at _cosine_sql):
    # same trees as the Column-API form, a handful of py4j round trips
    # instead of ~400 per build.
    scored = (
        corpus.select(F.col(id_col).alias("vec_id"), F.col(vec_col).alias("c_vec"))
        .crossJoin(q)
        .selectExpr(
            "query_id", "vec_id", f"{_cosine_sql('c_vec', 'q_vec')} AS _sim"
        )
    )
    # Level 1: partition-local top-k (negated sim → ascending struct sort
    # gives sim desc, vec_id asc — identical to the global rank order).
    partial = (
        scored.selectExpr("*", "spark_partition_id() AS _pid")
        .groupBy("_pid", "query_id")
        .agg(
            F.expr(
                "slice(array_sort(collect_list("
                "named_struct('ns', -_sim, 'v', vec_id, 's', _sim)"
                f")), 1, {int(k)}) AS _top"
            )
        )
        .selectExpr("query_id", "explode(_top) AS _t")
        .selectExpr("query_id", "_t.v AS vec_id", "_t.s AS _sim")
    )
    # Level 2: global rank over the k-bounded survivors.
    return (
        partial.selectExpr(
            "*",
            "row_number() OVER (PARTITION BY query_id"
            " ORDER BY _sim DESC, vec_id) AS rank",
        )
        .where(f"rank <= {int(k)}")
        .selectExpr(
            "query_id", "vec_id", "round(_sim, 4) AS cosine_sim", "rank"
        )
    )


# --------------------------------------------------------------------
# Random-hyperplane LSH (sign LSH ≈ cosine)
# --------------------------------------------------------------------


def _hyperplanes(dim: int, n_planes: int, seed: int) -> list[list[float]]:
    rng = np.random.default_rng(seed)
    return rng.standard_normal((n_planes, dim)).tolist()


def signature_bits(vec_col: F.Column, planes: list[list[float]]) -> F.Column:
    """Sign-pattern bucket id (long) for a vector against fixed planes.

    NULL vectors hash to NULL (and so fall out of bucket equi-joins)
    rather than to bucket 0: without the guard every NULL embedding
    would collide into ONE bucket — at corpus scale that is a
    quadratic-bucket time bomb, and it silently diverged from the
    Arrow twin, which already emitted NULL (round-7 review find)."""
    v = F.transform(vec_col, lambda x: x.cast("double"))
    key = F.lit(0).cast("long")
    for i, p in enumerate(planes):
        plane = F.array(*[F.lit(float(x)) for x in p])
        bit = F.when(_dot(v, plane) > 0, F.shiftleft(F.lit(1).cast("long"), i)).otherwise(
            F.lit(0).cast("long")
        )
        key = key.bitwiseOR(bit)
    return F.when(vec_col.isNotNull(), key)


def _bucket_ids_pandas_udf(tables: list[list[list[float]]]):
    """Arrow-batched sign-LSH bucket ids, all tables in one pass:
    returns array<long> of per-table buckets (bit i of table t's value
    = sign of dot(v, plane_i of table t), same strict-``> 0`` rule as
    :func:`signature_bits`). The scale rationale mirrors
    clustering.assign_clusters_pandas: the expression formulation
    carries n_tables × n_planes × dim literals through Catalyst
    analysis on every plan build — seconds of driver time at
    4×8×64, before any data moves."""
    planes = np.array(tables, dtype=np.float64)  # T × planes × dim
    n_tables, n_planes, _ = planes.shape
    weights = (1 << np.arange(n_planes, dtype=np.int64))

    @F.pandas_udf("array<long>")
    def _buckets(v: pd.Series) -> pd.Series:
        import numpy as np

        # NULL vectors → NULL bucket array (the expression path's
        # sign-bit dots also propagate NULL); non-null rows must be
        # fixed-length or np.stack raises — ragged input is a bug.
        mask = v.notna().to_numpy()
        if mask.all() and len(v):  # hot path: no masking machinery
            x = np.stack(v.to_numpy()).astype(np.float64)
            per_table = [
                ((x @ planes[t].T) > 0).astype(np.int64) @ weights
                for t in range(n_tables)
            ]
            return pd.Series(list(np.stack(per_table, axis=1)))
        out = pd.Series([None] * len(v), dtype=object)
        if mask.any():
            x = np.stack(v[mask].to_numpy()).astype(np.float64)
            per_table = [
                ((x @ planes[t].T) > 0).astype(np.int64) @ weights
                for t in range(n_tables)
            ]
            vals = np.empty(int(mask.sum()), dtype=object)
            vals[:] = list(np.stack(per_table, axis=1))
            out.iloc[np.flatnonzero(mask)] = vals
        return out

    return _buckets


def probe_buckets_expr(
    vec_col: F.Column, planes: list[list[float]], n_flip: int
) -> F.Column:
    """Multi-probe bucket list for ONE table (array<long>): the base
    sign-pattern bucket followed by ``n_flip`` single-bit perturbations,
    flipping the bits whose hyperplane margin |dot| is smallest first
    (Lv et al. 2007's insight, restricted to 1-bit perturbations: the
    near-miss buckets most likely to hold neighbors are the ones across
    the CLOSEST hyperplanes). Ties in |margin| break toward the lower
    plane index — matching the stable argsort in the Arrow twin."""
    v = F.transform(vec_col, lambda x: x.cast("double"))
    dots = [_dot(v, F.array(*[F.lit(float(x)) for x in p])) for p in planes]
    base = F.lit(0).cast("long")
    for i, d in enumerate(dots):
        bit = F.when(d > 0, F.shiftleft(F.lit(1).cast("long"), i)).otherwise(
            F.lit(0).cast("long")
        )
        base = base.bitwiseOR(bit)
    ranked = F.array_sort(
        F.array(
            *[
                F.struct(F.abs(d).alias("m"), F.lit(i).alias("i"))
                for i, d in enumerate(dots)
            ]
        )
    )
    weights = F.array(*[F.lit(1 << i).cast("long") for i in range(len(planes))])
    flips = F.transform(
        F.slice(ranked, 1, n_flip),
        lambda s: base.bitwiseXOR(F.element_at(weights, s["i"] + 1)),
    )
    # NULL vector → NULL probe list (matches the Arrow twin; see
    # signature_bits for the bucket-0 rationale)
    return F.when(vec_col.isNotNull(), F.concat(F.array(base), flips))


def _probe_bits_pandas_udf(tables: list[list[list[float]]], n_flip: int):
    """Arrow twin of :func:`probe_buckets_expr`, all tables in one
    pass: array<array<long>> — per table, [base bucket, n_flip
    margin-ranked single-bit flips]. Same strict ``> 0`` sign rule and
    the same tie rule (stable argsort on |margin| keeps plane order).
    NULL vectors → NULL."""
    planes = np.array(tables, dtype=np.float64)  # T × planes × dim
    n_tables, n_planes, _ = planes.shape
    weights = (1 << np.arange(n_planes, dtype=np.int64))

    @F.pandas_udf("array<array<long>>")
    def _probes(v: pd.Series) -> pd.Series:
        import numpy as np

        def probe_lists(x):
            per_table = []
            for t in range(n_tables):
                d = x @ planes[t].T  # n × planes
                base = ((d > 0).astype(np.int64) @ weights)  # n
                order = np.argsort(np.abs(d), axis=1, kind="stable")[:, :n_flip]
                flips = base[:, None] ^ weights[order]  # n × n_flip
                per_table.append(np.concatenate([base[:, None], flips], axis=1))
            return np.stack(per_table, axis=1)  # n × T × (1+n_flip)

        mask = v.notna().to_numpy()
        if mask.all() and len(v):
            stacked = probe_lists(np.stack(v.to_numpy()).astype(np.float64))
            return pd.Series([row for row in stacked])
        out = pd.Series([None] * len(v), dtype=object)
        if mask.any():
            stacked = probe_lists(np.stack(v[mask].to_numpy()).astype(np.float64))
            vals = np.empty(int(mask.sum()), dtype=object)
            vals[:] = [row for row in stacked]
            out.iloc[np.flatnonzero(mask)] = vals
        return out

    return _probes


def _cell_ids_pandas_udf(cents: list[list[float]], n_probe: int | None = None):
    """Arrow-batched IVF cell assignment (argmax dot). Tie rules match
    the expression path exactly: single assignment mirrors
    ``array_max`` over (score, cell) structs (ties → HIGHER cell);
    probing mirrors ``reverse(array_sort(...))`` (descending score,
    ties → higher cell first) — implemented by argsorting the
    column-reversed score matrix with a stable sort."""
    c = np.array(cents, dtype=np.float64)  # k × dim
    k = len(c)

    if n_probe is None:

        @F.pandas_udf("int")
        def _cell(v: pd.Series) -> pd.Series:
            import numpy as np

            mask = v.notna().to_numpy()
            if mask.all() and len(v):
                d = np.stack(v.to_numpy()).astype(np.float64) @ c.T
                return pd.Series(
                    (k - 1 - np.argmax(d[:, ::-1], axis=1)).astype("int32")
                )
            out = pd.Series([None] * len(v), dtype="Int32")
            if mask.any():
                d = np.stack(v[mask].to_numpy()).astype(np.float64) @ c.T
                out.iloc[np.flatnonzero(mask)] = (
                    k - 1 - np.argmax(d[:, ::-1], axis=1)
                ).astype("int32")
            return out

        return _cell

    @F.pandas_udf("array<int>")
    def _probes(v: pd.Series) -> pd.Series:
        import numpy as np

        def probe_cells(x):
            d = x @ c.T
            order_rev = np.argsort(-d[:, ::-1], axis=1, kind="stable")
            return (k - 1 - order_rev[:, :n_probe]).astype(np.int32)

        mask = v.notna().to_numpy()
        if mask.all() and len(v):
            return pd.Series(list(probe_cells(np.stack(v.to_numpy()).astype(np.float64))))
        out = pd.Series([None] * len(v), dtype=object)
        if mask.any():
            cells = probe_cells(np.stack(v[mask].to_numpy()).astype(np.float64))
            vals = np.empty(int(mask.sum()), dtype=object)
            vals[:] = list(cells)
            out.iloc[np.flatnonzero(mask)] = vals
        return out

    return _probes


def lsh_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
    n_planes: int = 8,
    n_tables: int = 4,
    dim: int = 64,
    seed: int = 42,
    hasher: str = "expr",
    n_flip: int = 0,
) -> DataFrame:
    """Approximate top-k: `n_tables` independent sign-LSH tables of
    `n_planes` bits each; candidates = any-table bucket collision; exact
    cosine re-rank. Recall rises with n_tables, bucket size shrinks with
    n_planes. ``hasher='pandas'`` computes the bucket ids in one
    Arrow-batched matmul instead of the literal-plane expression tree
    (same strict-sign rule; see _bucket_ids_pandas_udf for the
    Catalyst-analysis rationale).

    ``n_flip > 0`` turns on MULTI-PROBE (Lv et al. 2007, 1-bit
    perturbations): each query additionally probes, per table, the
    ``n_flip`` buckets across its closest hyperplanes — the buckets
    most likely to hold near-misses. Only the QUERY side fans out
    (n_flip+1 probe rows per table — broadcast-sized); the stored
    corpus keeps exactly one bucket per table, so the index neither
    grows nor rewrites. This is the recall/space lever at scale: more
    probes ≈ the recall of more tables at 1/(n_flip+1) of the index
    footprint. Columns: query_id, vec_id, cosine_sim, rank."""
    tables = [_hyperplanes(dim, n_planes, seed + t) for t in range(n_tables)]

    def bucketed(df: DataFrame, idc: str, vecc: str, out_id: str, out_vec: str) -> DataFrame:
        if hasher == "pandas":
            bk = _bucket_ids_pandas_udf(tables)
            return df.select(
                F.col(idc).alias(out_id),
                F.col(vecc).alias(out_vec),
                F.posexplode(bk(F.col(vecc))).alias("table", "bucket"),
            )
        return df.select(
            F.col(idc).alias(out_id),
            F.col(vecc).alias(out_vec),
            F.explode(
                F.array(
                    *[
                        F.struct(
                            F.lit(t).alias("table"),
                            signature_bits(F.col(vecc), tables[t]).alias("bucket"),
                        )
                        for t in range(n_tables)
                    ]
                )
            ).alias("tb"),
        ).select(out_id, out_vec, "tb.table", "tb.bucket")

    def probed(df: DataFrame, idc: str, vecc: str, out_id: str, out_vec: str) -> DataFrame:
        if hasher == "pandas":
            pb = _probe_bits_pandas_udf(tables, n_flip)
            per_table = df.select(
                F.col(idc).alias(out_id),
                F.col(vecc).alias(out_vec),
                F.posexplode(pb(F.col(vecc))).alias("table", "_buckets"),
            )
        else:
            per_table = df.select(
                F.col(idc).alias(out_id),
                F.col(vecc).alias(out_vec),
                F.explode(
                    F.array(
                        *[
                            F.struct(
                                F.lit(t).alias("table"),
                                probe_buckets_expr(
                                    F.col(vecc), tables[t], n_flip
                                ).alias("buckets"),
                            )
                            for t in range(n_tables)
                        ]
                    )
                ).alias("tb"),
            ).select(out_id, out_vec, "tb.table", F.col("tb.buckets").alias("_buckets"))
        return per_table.select(
            out_id, out_vec, "table", F.explode("_buckets").alias("bucket")
        )

    c = bucketed(corpus, id_col, vec_col, "vec_id", "c_vec")
    q = (probed if n_flip > 0 else bucketed)(
        queries, query_id_col, vec_col, "query_id", "q_vec"
    )
    cands = (
        c.join(F.broadcast(q), ["table", "bucket"])
        .select("query_id", "vec_id", "c_vec", "q_vec")
        .dropDuplicates(["query_id", "vec_id"])
    )
    return _cosine_rank_tail(cands, k)


# --------------------------------------------------------------------
# IVF-style coarse quantization (training-free variant)
# --------------------------------------------------------------------


def _cell_scores_expr(cents: list[list[float]]):
    def cell_scores(vecc: F.Column) -> F.Column:
        v = F.transform(vecc, lambda x: x.cast("double"))
        return F.array(
            *[
                F.struct(
                    _dot(v, F.array(*[F.lit(float(x)) for x in c])).alias("score"),
                    F.lit(i).alias("cell"),
                )
                for i, c in enumerate(cents)
            ]
        )

    return cell_scores


def ivf_encode(
    corpus: DataFrame,
    centroids: list[list[float]],
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    assigner: str = "expr",
) -> DataFrame:
    """The IVF STORED layout: (id, vector, cell) with cell = argmax dot
    against ``centroids`` (ties → higher cell, both paths — see
    _cell_ids_pandas_udf). Write it partitioned by cell —
    ``sinks.write_table(enc, path, partition_by=["cell"])`` — and
    probe-time cell filters prune FILES before they prune rows
    (asserted mechanically in tests/test_sinks.py); pass the stored
    frame back to :func:`ivf_topk` via ``encoded=`` with the SAME
    centroids. This is the encode-once / probe-many production shape:
    assignment cost is paid at ingest, not per query."""
    if assigner == "pandas":
        return corpus.select(
            F.col(id_col).alias("vec_id"),
            F.col(vec_col),
            _cell_ids_pandas_udf(centroids)(F.col(vec_col)).alias("cell"),
        )
    cell_scores = _cell_scores_expr(centroids)
    # NULL vector → NULL cell (drops out of the probe equi-join),
    # matching the Arrow twin — see signature_bits' rationale.
    return corpus.select(
        F.col(id_col).alias("vec_id"),
        F.col(vec_col),
        F.when(
            F.col(vec_col).isNotNull(),
            F.array_max(cell_scores(F.col(vec_col)))["cell"],
        ).alias("cell"),
    )


def validate_encoded_ivf(
    encoded: DataFrame, n_cells: int, vec_col: str = "embedding"
) -> None:
    """Guard the ``encoded=`` round-trip: a stored (vec_id, vector,
    cell) layout read back against DIFFERENT centroids than it was
    encoded with silently returns wrong neighbors — the coarse cells
    no longer mean what the prober thinks they mean. Full re-checking
    would defeat the point of the stored layout, so this is the cheap
    tripwire: schema presence (free) plus a one-row sample asserting
    the cell id is inside [0, n_cells). Catches the common stale-pair
    failures (wrong table, re-trained quantizer with fewer cells);
    byte-identical centroid drift needs the fingerprint discipline
    documented in sinks.write_table's docstring."""
    need = {"vec_id", vec_col, "cell"}
    missing = need - set(encoded.columns)
    if missing:
        raise ValueError(
            f"encoded IVF frame is missing column(s) {sorted(missing)}; "
            f"expected the ivf_encode layout (vec_id, {vec_col}, cell)"
        )
    row = encoded.select("cell").filter(F.col("cell").isNotNull()).first()
    if row is not None and not (0 <= row["cell"] < n_cells):
        raise ValueError(
            f"encoded IVF frame has cell id {row['cell']} outside "
            f"[0, {n_cells}): the stored layout was encoded with "
            "different centroids than were passed to this probe"
        )


def ivf_append(
    new_vectors: DataFrame,
    centroids: list[list[float]],
    path: str,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    assigner: str = "expr",
    batch_id: int | None = None,
) -> None:
    """Index MAINTENANCE for the stored IVF layout: assign ``new_vectors``
    with the FROZEN ``centroids`` (no retrain) and append them into the
    existing cell-partitioned parquet at ``path``.

    ``batch_id`` (streaming callers): route the append through
    ``sinks.append_batch_keyed`` — files land under deterministic
    batch-keyed names, so a micro-batch REPLAYED after a crash between
    append and offset commit overwrites itself instead of duplicating
    rows (exactly-once-effect ingest; replay-tested in
    tests/test_streaming.py). ``None`` keeps the plain bulk append.

    This is the missing piece of the 100 TB index lifecycle between
    encode-once (:func:`ivf_encode` + ``sinks.write_table``) and
    probe-many (:func:`ivf_topk(encoded=...)`): a production corpus
    grows daily, and re-encoding 10⁹ resident vectors to admit 10⁶ new
    ones is not an option.  Because the quantizer is frozen, appended
    rows land in exactly the cell a from-scratch build would give them,
    so a probe over the appended layout is IDENTICAL to a probe over a
    full rebuild (driver-hash-proven by
    ``similarity_topk_ivf_lifecycle_planted``).  Spark's dynamic
    partitionBy append only touches the cells the new batch hits —
    existing cell directories gain one file each, untouched cells keep
    their files byte-identical, and probe-time PartitionFilters pruning
    works unchanged (plan-asserted in tests/test_sinks.py).

    Retraining the quantizer (new centroids) is the one thing this must
    NOT be used for — cells would change meaning mid-layout.  That path
    is a rebuild; validate_encoded_ivf's range check plus the
    fingerprint discipline in sinks.write_table's docstring guard the
    read side."""
    from exosql_spark import sinks

    encoded = ivf_encode(new_vectors, centroids, id_col, vec_col, assigner)
    if batch_id is not None:
        sinks.append_batch_keyed(encoded, path, "cell", batch_id)
    else:
        sinks.write_table(encoded, path, mode="append", partition_by=["cell"])


def ivf_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
    n_cells: int = 16,
    n_probe: int = 4,
    dim: int = 64,
    seed: int = 7,
    centroids: list[list[float]] | None = None,
    assigner: str = "expr",
    encoded: DataFrame | None = None,
) -> DataFrame:
    """IVF coarse quantization: each corpus vector is assigned to its
    best cell (argmax dot), each query probes its `n_probe` best
    cells. Exact cosine re-rank within probed cells. At scale the
    corpus should be written partitioned/bucketed by cell id so probes
    prune partitions.

    ``centroids=None`` (default) uses fixed random directions — a
    training-free quantizer, fine when data has no strong cluster
    structure. Pass TRAINED centroids (e.g. ``clustering.kmeans`` on a
    bounded sample — the real-IVF shape) for data-adapted cells:
    balanced occupancy and higher recall at the same n_probe; the cell
    assignment/probing code path is identical either way.
    ``assigner='pandas'`` runs assignment/probing as Arrow-batched
    matmuls with the expression path's exact tie rules (see
    _cell_ids_pandas_udf) — the scale path for large n_cells, where
    the literal-centroid tree's Catalyst analysis dominates.
    ``encoded``: a pre-encoded (vec_id, vector, cell) frame from
    :func:`ivf_encode` — typically read back from a cell-partitioned
    parquet layout, where the probe's cell filter prunes partitions;
    must have been encoded with the SAME centroids passed here."""
    cents = centroids if centroids is not None else _hyperplanes(dim, n_cells, seed)
    n_cells = len(cents)
    cell_scores = _cell_scores_expr(cents)

    if encoded is not None:
        # ivf_encode always emits the id column AS "vec_id" (whatever
        # id_col the encode call used), so select it by that name —
        # selecting F.col(id_col) here broke the documented round-trip
        # for any non-default id_col (round-7 review find).
        validate_encoded_ivf(encoded, n_cells, vec_col)
        c_assigned = encoded.select(
            "vec_id", F.col(vec_col).alias("c_vec"), "cell"
        )
    else:
        c_assigned = ivf_encode(corpus, cents, id_col, vec_col, assigner).select(
            "vec_id", F.col(vec_col).alias("c_vec"), "cell"
        )
    if assigner == "pandas":
        q_probes = queries.select(
            F.col(query_id_col).alias("query_id"),
            F.col(vec_col).alias("q_vec"),
            F.explode(
                _cell_ids_pandas_udf(cents, n_probe)(F.col(vec_col))
            ).alias("cell"),
        )
    else:
        # NULL query vector → NULL probe array → explode drops the row
        # (matches the Arrow prober's NULL output)
        q_probes = queries.select(
            F.col(query_id_col).alias("query_id"),
            F.col(vec_col).alias("q_vec"),
            F.explode(
                F.when(
                    F.col(vec_col).isNotNull(),
                    F.slice(
                        F.reverse(F.array_sort(cell_scores(F.col(vec_col)))),
                        1,
                        n_probe,
                    ),
                )
            ).alias("probe"),
        ).select("query_id", "q_vec", F.col("probe.cell").alias("cell"))
    cands = c_assigned.join(F.broadcast(q_probes), "cell").select(
        "query_id", "vec_id", "c_vec", "q_vec"
    )
    return _cosine_rank_tail(cands, k)


def exact_rerank(
    shortlist: DataFrame,
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 10,
    metric: str = "sq_l2",
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
) -> DataFrame:
    """Exact-distance refinement of an ANN shortlist — the second
    stage of the standard two-stage retrieval pipeline (FAISS's
    ``IndexRefineFlat`` / DiskANN's re-rank step): a compressed-domain
    stage (PQ/ADC, sign-LSH, IVF pruning) produces a generous
    candidate shortlist, then only those |Q|·shortlist_k candidates
    are scored against the FULL-precision vectors and re-ordered by
    exact distance.  Quantization error never reaches the final
    ranking — it only costs recall at the shortlist boundary.

    ``shortlist``: (query_id, vec_id) pairs from any ANN stage
    (:func:`~exosql_spark.operators.pq.ivfpq_topk`, :func:`lsh_topk`,
    …; extra columns such as the approximate distance are ignored).
    ``corpus``: (vec_id, embedding) full-precision vectors.
    ``queries``: (query_id, embedding).

    Plan shape — the scale story is that the EXPENSIVE side never
    moves: the shortlist (k-bounded per query) and the query vectors
    are both broadcast, so the corpus side resolves candidates inside
    its scan via a broadcast hash join — no corpus shuffle, no raw
    vectors on the wire beyond the |Q|·shortlist_k matched rows.  The
    final rank window sees only the matched candidates (k-bounded),
    never the corpus.

    ``metric``: ``"sq_l2"`` (squared Euclidean, matching
    ``approx_sq_dist`` of the PQ/ADC stages; ascending) or
    ``"cosine"`` (descending, matching :func:`cosine_topk`).
    Columns: query_id, vec_id, ``exact_sq_dist``|``cosine_sim``, rank.
    """
    if metric not in ("sq_l2", "cosine"):
        raise ValueError(f"unknown rerank metric {metric!r}")
    cand = F.broadcast(
        shortlist.select(
            F.col(query_id_col).alias("query_id"), F.col(id_col).alias("vec_id")
        ).distinct()
    )
    qv = F.broadcast(
        queries.select(
            F.col(query_id_col).alias("query_id"), F.col(vec_col).alias("q_vec")
        )
    )
    matched = (
        corpus.select(F.col(id_col).alias("vec_id"), F.col(vec_col).alias("c_vec"))
        .join(cand, "vec_id")
        .join(qv, "query_id")
    )
    # SQL-text forms of the score + rank tail (r18 — block comment at
    # _cosine_sql): identical trees, single-digit py4j round trips.
    if metric == "cosine":
        score_sql = _cosine_sql("c_vec", "q_vec")
        order_sql = "_s DESC NULLS LAST, vec_id"
        out_name = "cosine_sim"
    else:
        # exact squared L2 in double (vectors arrive float32);
        # nulls LAST: a NULL or length-mismatched vector scores NULL
        # (zip_with pads with nulls) — asc would otherwise rank it #1
        # and evict a true neighbor
        score_sql = _SQ_L2_SQL.format(a="c_vec", b="q_vec")
        order_sql = "_s ASC NULLS LAST, vec_id"
        out_name = "exact_sq_dist"
    return (
        matched.selectExpr("query_id", "vec_id", f"{score_sql} AS _s")
        .selectExpr(
            "*",
            "row_number() OVER (PARTITION BY query_id"
            f" ORDER BY {order_sql}) AS rank",
        )
        .where(f"rank <= {int(k)}")
        .selectExpr(
            "query_id", "vec_id", f"round(_s, 4) AS {out_name}", "rank"
        )
    )


def embedding_near_dupes(
    df: DataFrame,
    threshold: float = 0.95,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_planes: int = 8,
    n_tables: int = 6,
    dim: int = 64,
    seed: int = 42,
    max_bucket: int | None = None,
    hasher: str = "expr",
) -> DataFrame:
    """Embedding-cosine near-duplicate pairs (id_a < id_b, cosine_sim ≥
    threshold) via the same sign-LSH bucketing — self-join edition.
    ``max_bucket``: quadratic-bucket cap (see dedup._cap_buckets);
    ``hasher='pandas'``: Arrow-batched bucket ids (lsh_topk's note)."""
    tables = [_hyperplanes(dim, n_planes, seed + t) for t in range(n_tables)]
    if hasher == "pandas":
        bk = _bucket_ids_pandas_udf(tables)
        banded = df.select(
            F.col(id_col).alias("_id"),
            F.col(vec_col).alias("_vec"),
            F.posexplode(bk(F.col(vec_col))).alias("table", "bucket"),
        )
    else:
        banded = df.select(
            F.col(id_col).alias("_id"),
            F.col(vec_col).alias("_vec"),
            F.explode(
                F.array(
                    *[
                        F.struct(
                            F.lit(t).alias("table"),
                            signature_bits(F.col(vec_col), tables[t]).alias("bucket"),
                        )
                        for t in range(n_tables)
                    ]
                )
            ).alias("tb"),
        ).select("_id", "_vec", "tb.table", "tb.bucket")
    from exosql_spark.operators.dedup import _cap_buckets

    # persist: both self-join sides consume this frame — without the
    # barrier the n_tables×n_planes sign-bit dot products run twice
    banded = _cap_buckets(banded, ["table", "bucket"], max_bucket).transform(managed_persist)
    a, b = banded.alias("a"), banded.alias("b")
    return (
        a.join(
            b,
            (F.col("a.table") == F.col("b.table"))
            & (F.col("a.bucket") == F.col("b.bucket"))
            & (F.col("a._id") < F.col("b._id")),
        )
        .select(
            F.col("a._id").alias("id_a"),
            F.col("b._id").alias("id_b"),
            F.col("a._vec").alias("va"),
            F.col("b._vec").alias("vb"),
        )
        .dropDuplicates(["id_a", "id_b"])
        .select("id_a", "id_b", F.round(cosine(F.col("va"), F.col("vb")), 4).alias("cosine_sim"))
        .filter(F.col("cosine_sim") >= threshold)
    )


def label_centroids(
    df: DataFrame, vec_col: str = "embedding", label_col: str = "label"
) -> DataFrame:
    """Per-label centroid vectors — the k-means / IVF-coarse-quantizer
    building block: (label, n_vecs, centroid array<double>).

    posexplode → one (label, pos) shuffle with map-side partial sums →
    re-assemble by sorting (pos, mean) structs. Component count per
    group is the vector dim (bounded), so collect_list is safe at any
    corpus size; the shuffle key space is |labels|·dim — never skewed
    by corpus growth."""
    ex = df.select(
        F.col(label_col).alias("label"), F.posexplode(vec_col).alias("pos", "v")
    )
    comps = ex.groupBy("label", "pos").agg(
        (F.sum(F.col("v").cast("double")) / F.count(F.lit(1))).alias("c"),
        F.count(F.lit(1)).alias("n_vecs"),
    )
    return comps.groupBy("label").agg(
        F.min("n_vecs").alias("n_vecs"),
        F.transform(
            F.array_sort(F.collect_list(F.struct("pos", "c"))), lambda s: s["c"]
        ).alias("centroid"),
    )


def mine_hard_negatives(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 3,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    label_col: str = "label",
    query_id_col: str = "query_id",
) -> DataFrame:
    """Hard-negative mining for contrastive / embedding training
    (the in-batch-negatives upgrade of DPR, Karpukhin et al. 2020;
    ANCE, Xiong et al. 2021): for every query (anchor) vector, the
    ``k`` MOST-similar corpus vectors whose ``label_col`` differs
    from the anchor's — the near-miss examples that make a metric
    learner actually move, where random negatives are already
    trivially separated.

    Columns out: (query_id, query_label, vec_id, neg_label,
    cosine_sim, rank).

    Shape = :func:`cosine_topk` with a label-mismatch predicate
    pushed BELOW the top-k (the filter must see every candidate — a
    same-label vector must not occupy a top-k slot): broadcast
    anchors into the corpus scan, score, filter, then the same
    lossless two-level top-k (partition-local slice bounded by k,
    global rank over ≤ k·P survivors).  At 100 TB the corpus is
    touched once and nothing larger than k·P rows per anchor ever
    reaches an exchange.  In production the anchor set is a batch
    (10²–10⁵ rows) — comfortably broadcastable."""
    q = F.broadcast(
        queries.select(
            F.col(query_id_col).alias("query_id"),
            F.col(label_col).alias("query_label"),
            F.col(vec_col).alias("q_vec"),
        )
    )
    scored = (
        corpus.select(
            F.col(id_col).alias("vec_id"),
            F.col(label_col).alias("neg_label"),
            F.col(vec_col).alias("c_vec"),
        )
        .crossJoin(q)
        .where(F.col("neg_label") != F.col("query_label"))
        .select(
            "query_id",
            "query_label",
            "vec_id",
            "neg_label",
            cosine(F.col("c_vec"), F.col("q_vec")).alias("_sim"),
        )
    )
    partial = (
        scored.withColumn("_pid", F.spark_partition_id())
        .groupBy("_pid", "query_id", "query_label")
        .agg(
            F.slice(
                F.array_sort(
                    F.collect_list(
                        F.struct(
                            (-F.col("_sim")).alias("ns"),
                            F.col("vec_id").alias("v"),
                            F.col("_sim").alias("s"),
                            F.col("neg_label").alias("nl"),
                        )
                    )
                ),
                1,
                k,
            ).alias("_top")
        )
        .select("query_id", "query_label", F.explode("_top").alias("_t"))
        .select(
            "query_id",
            "query_label",
            F.col("_t.v").alias("vec_id"),
            F.col("_t.nl").alias("neg_label"),
            F.col("_t.s").alias("_sim"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("_sim").desc(), F.col("vec_id")
    )
    # fround, not F.round (ADVICE r14): Spark's round uses
    # shortest-decimal-repr semantics that differ from DuckDB's
    # exact-binary round on boundary doubles — the exact cross-engine
    # hazard _util's docstring documents; floor(x*1e4+0.5)/1e4 is
    # bit-identical on both engines.
    from exosql_spark.queries._util import fround

    return (
        partial.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(
            "query_id",
            "query_label",
            "vec_id",
            "neg_label",
            fround(F.col("_sim")).alias("cosine_sim"),
            "rank",
        )
    )
