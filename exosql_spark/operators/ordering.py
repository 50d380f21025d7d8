"""Corpus-organization operators — deterministic ordering, split
assignment, and snapshot merging for a training-data corpus
(beyond-reference LLM surface; the reference engine has no
corpus-organization operators):

- :func:`epoch_shuffle` — seeded deterministic global shuffle into
  (shard, pos) training order, the "reshuffle the corpus every epoch"
  step every data loader needs reproducibly.
- :func:`split_assign` — content-hash train/val/test assignment, so
  byte-identical documents can NEVER straddle a split boundary
  (the standard eval-leakage guard).
- :func:`merge_keep_latest` — upsert a delta snapshot into a base
  corpus keeping the newest version per key (the incremental-corpus
  maintenance merge).

Scale design:

``epoch_shuffle`` must never plan a GLOBAL sort or a global
``row_number`` window (one task orders the whole corpus).  Instead the
seeded hash both *permutes* and *partitions*: ``shard = h % n_shards``
splits the corpus into uniform hash buckets, and the position window
is ``PARTITION BY shard`` — every shard orders independently in its
own task.  ``n_shards`` is the parallelism unit AND the output-file
unit: at 100 TB pick ``corpus_rows / target_rows_per_shard``
(thousands of shards), exactly how training corpora are sharded on
disk anyway.  The hash is md5-derived (engine-portable, seeded by
salting the preimage), so the epoch order is reproducible across
engines, runs, and cluster sizes — no RNG state anywhere.

``split_assign`` is a pure projection — no shuffle, no state,
embarrassingly parallel at any scale.  Hashing the *content* rather
than the id is the leakage guard: exact duplicates (still present in
any pre-dedup corpus) get the same bucket by construction.

``merge_keep_latest`` deliberately uses a ``max_by`` hash aggregation
rather than the textbook ``row_number`` window: the aggregate gets a
map-side partial (each input partition reduces to one candidate row
per key before the shuffle) and no sort, so merging a small delta
into a huge base moves ~|keys| rows, not |base| sorted rows.  Any
number of snapshots can be unioned into one merge pass.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from exosql_spark.operators.packing import portable_hash60


def hash60(col: Column, salt: str = "") -> Column:
    """Seeded variant of :func:`packing.portable_hash60`: hash of
    ``col || ':' || salt``, so each salt (seed) yields an independent
    engine-portable permutation.  DuckDB twin:
    ``CAST(('0x' || substr(md5(x || ':salt'), 1, 15)) AS BIGINT)``.

    NULL inputs propagate to a NULL hash — ``F.concat``, not
    ``concat_ws`` (which silently DROPS null elements: a NULL key
    would hash to just ``":salt"``, parking every null-content row in
    one deterministic bucket while the SQL twin's ``x || ':salt'``
    yields NULL).  Downstream this keeps the twins aligned: a NULL
    key gets a NULL shard/bucket in both engines."""
    return portable_hash60(F.concat(col.cast("string"), F.lit(":" + salt)))


def epoch_shuffle(
    df: DataFrame,
    key_col: str,
    seed: int = 0,
    n_shards: int | None = None,
    shard_col: str = "shard",
    pos_col: str = "pos",
) -> DataFrame:
    """Deterministic seeded global shuffle: ``df``'s columns plus
    ``shard_col`` (which hash bucket) and ``pos_col`` (1-based
    position within the shard).  Reading shards in order 0..n-1, each
    in ``pos`` order, visits every row exactly once in an order that
    is uniform-pseudorandom in ``key_col`` — a new ``seed`` gives an
    independent permutation (a new epoch), the same seed always gives
    the same one.

    ``key_col`` must be unique (it is the tie-breaker that makes the
    order total) and therefore non-NULL in practice; a NULL key
    follows the SQL twin's semantics — NULL hash, NULL shard
    (:func:`hash60`).  Each shard's position window runs in ONE task —
    size ``n_shards`` so a shard's rows fit a task comfortably
    (``rows / n_shards`` ≲ a few million; shards are also the natural
    output-file granularity for a training reader).
    ``n_shards=None`` (default) derives that sizing from a cheap
    ``df.count()`` (``selection.derive_n_parts`` — same rule, same
    one-small-job composition-time contract): a fixed default that is
    fine at sf0.1 would hand a 100 TB corpus to 32 window tasks.
    NOTE: the shard ids themselves depend on ``n_shards`` (``h %
    n_shards``), so reproducible epoch orders across runs over
    growing data must pass it explicitly."""
    if n_shards is None:
        from exosql_spark.operators.selection import derive_n_parts

        n_shards = derive_n_parts(df.count())
    h = hash60(F.col(key_col), salt=str(seed))
    w = Window.partitionBy(shard_col).orderBy("_hkey", key_col)
    return (
        df.withColumn("_hkey", h)
        .withColumn(shard_col, F.pmod(F.col("_hkey"), F.lit(n_shards)))
        .withColumn(pos_col, F.row_number().over(w))
        .drop("_hkey")
    )


def split_assign(
    df: DataFrame,
    content_col: Column,
    splits: tuple[tuple[str, int], ...] = (("train", 80), ("val", 10), ("test", 10)),
    seed: int = 0,
    bucket_col: str = "bucket",
    split_col: str = "split",
) -> DataFrame:
    """Assign every row to a named split by hashing ``content_col``
    into ``sum(weights)`` buckets: ``df``'s columns plus ``bucket_col``
    and ``split_col``.  ``splits`` are (name, weight) pairs; weights
    are percentages of the bucket space in order, so the default is an
    80/10/10 split over 100 buckets.

    Pass the document CONTENT (normalized text, or a content
    fingerprint) — not the id — and identical documents land in the
    same split by construction, which is the whole point: an eval
    split that shares even one duplicated document with train is
    leaked.  Pure projection: no shuffle at any scale."""
    n_buckets = sum(wgt for _, wgt in splits)
    bucket = F.pmod(hash60(content_col, salt=str(seed)), F.lit(n_buckets))
    expr = None
    edge = 0
    for name, wgt in splits[:-1]:
        edge += wgt
        cond = bucket < edge
        expr = F.when(cond, name) if expr is None else expr.when(cond, name)
    label = F.lit(splits[-1][0]) if expr is None else expr.otherwise(splits[-1][0])
    return df.withColumn(bucket_col, bucket).withColumn(split_col, label)


def merge_keep_latest(
    snapshots: list[DataFrame],
    key_cols: list[str],
    order_cols: list[str],
) -> DataFrame:
    """Upsert-merge: union ``snapshots`` (all same schema) and keep,
    per ``key_cols`` group, the single row with the greatest
    ``order_cols`` tuple — new keys insert, higher-versioned rows
    replace lower.  Output columns = the snapshots' columns.

    ``order_cols`` must be a TOTAL order within every key group
    (e.g. ``["version", "snapshot_no"]`` where later snapshots carry a
    higher number) — equal maxima would otherwise make the survivor
    engine-dependent.  Implementation is one ``max_by`` hash
    aggregation, chosen over the ``row_number`` window for its
    map-side partial combine and sortless shuffle (see module doc)."""
    if not snapshots:
        raise ValueError("need at least one snapshot")
    u = snapshots[0]
    for s in snapshots[1:]:
        u = u.unionByName(s)
    cols = u.columns
    row = F.struct(*[F.col(c) for c in cols])
    order = F.struct(*[F.col(c) for c in order_cols])
    return (
        u.groupBy(*[F.col(c) for c in key_cols])
        .agg(F.max_by(row, order).alias("_row"))
        .select("_row.*")
    )
