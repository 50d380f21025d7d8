"""Sinks — the write path the reference never had (SURVEY.md §2.1 S9:
exosql returns in-memory rows only; ``format_result`` pretty-printing
is its entire output story, mirrored in :func:`context.format_result`).

Thin, opinionated wrappers over ``df.write`` encoding the 100 TB
defaults:

- parquet + snappy everywhere;
- ``partition_by`` for coarse, low-cardinality routing columns
  (dt/source/cell) → partition pruning at read;
- ``bucket_by`` for join/dedup keys → co-located, exchange-free joins
  between tables bucketed the same way (requires saveAsTable —
  bucketing lives in the catalog, not the files);
- ``sorted_within`` to make downstream merge scans and as-of joins
  cheap.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def write_table(
    df: DataFrame,
    path: str,
    mode: str = "overwrite",
    partition_by: list[str] | None = None,
    sorted_within: list[str] | None = None,
    compression: str = "snappy",
    max_records_per_file: int | None = None,
) -> None:
    """Write a parquet dataset with scale-appropriate layout.

    For derived layouts whose meaning depends on out-of-band model
    state (ANN indexes: ivf_encode's cell assignments, ivfpq_encode's
    pq codes), persist a fingerprint of that state — e.g. a one-row
    ``_meta`` parquet beside the layout holding a hash of the
    centroids/codebooks — and compare it at read time. The probe-side
    validators (similarity.validate_encoded_ivf,
    pq.validate_encoded_ivfpq) catch structural mismatches (wrong m,
    out-of-range cell/code) cheaply, but byte-level drift between two
    same-shaped quantizers is only detectable by fingerprint."""
    if sorted_within:
        df = df.sortWithinPartitions(*sorted_within)
    w = df.write.mode(mode).option("compression", compression)
    if max_records_per_file:
        w = w.option("maxRecordsPerFile", str(max_records_per_file))
    if partition_by:
        w = w.partitionBy(*partition_by)
    w.parquet(path)


def append_batch_keyed(
    df: DataFrame,
    path: str,
    partition_col: str,
    batch_id: int,
    compression: str = "snappy",
) -> None:
    """IDEMPOTENT append of one ingest batch into a partitioned parquet
    layout: the batch's files land under deterministic batch-keyed
    names (``ingest-b{batch_id}-{i}.<codec>.parquet``, extension taken
    from what Spark wrote for ``compression``), so re-running
    the SAME batch — a streaming micro-batch replayed after a crash
    between the parquet append and the checkpoint's offset commit —
    overwrites its own previous files instead of duplicating rows.
    This is the classic batch-id-keyed-file sink that turns
    foreachBatch's at-least-once delivery into exactly-once-effect
    output without a transactional table format.

    Mechanics: the batch stages partitioned by ``partition_col`` with
    one task per value (exactly one file per touched value — the same
    fragmentation unit as a plain append, repaired by
    :func:`compact_partitioned`); each staged file then MOVES into the
    layout's partition directory under its batch-keyed name, after
    purging any ``ingest-b{batch_id}-*`` files a previous attempt left
    there. The purge-then-move makes a PARTIAL earlier attempt (crash
    mid-move) harmless too: the replay deletes whatever subset landed
    and re-moves the full batch. Plain-append files (``part-*``) never
    collide with the keyed names, so batch-keyed and bulk appends
    coexist in one layout.

    Caveat (same as every batch-id-keyed sink): idempotence holds per
    ``batch_id`` — two DIFFERENT batch ids carrying the same rows are
    an upstream bug this layer cannot see. Structured Streaming's
    checkpoint guarantees a replayed micro-batch keeps its id, which
    is exactly the case this protects."""
    import uuid

    spark = df.sparkSession
    root = path.rstrip("/")
    stage = f"{root}__ingest_stage_b{batch_id}_{uuid.uuid4().hex[:12]}"
    jvm = spark._jvm
    hpath = jvm.org.apache.hadoop.fs.Path
    fs = hpath(root).getFileSystem(spark._jsc.hadoopConfiguration())
    prefix = f"ingest-b{batch_id}-"
    try:
        (
            df.repartition(F.col(partition_col))
            .write.mode("overwrite")
            .option("compression", compression)
            .partitionBy(partition_col)
            .parquet(stage)
        )
        for st in fs.listStatus(hpath(stage)):
            name = st.getPath().getName()
            if not (st.isDirectory() and name.startswith(partition_col + "=")):
                continue
            fs.mkdirs(hpath(f"{root}/{name}"))
            stale = fs.globStatus(hpath(f"{root}/{name}/{prefix}*"))
            for old in stale or []:
                if not fs.delete(old.getPath(), False):
                    raise IOError(
                        f"could not purge replayed batch file {old.getPath()}"
                    )
            moved = sorted(
                (
                    f.getPath()
                    for f in fs.listStatus(st.getPath())
                    if f.isFile() and f.getPath().getName().endswith(".parquet")
                ),
                key=lambda p: p.getName(),
            )
            for i, src in enumerate(moved):
                # keep the codec extension Spark gave the staged file
                # (".snappy.parquet", ".zstd.parquet", plain
                # ".parquet", ...) so names never lie about contents
                toks = src.getName().split(".")
                codec = (
                    toks[-2]
                    if len(toks) >= 3
                    and toks[-2] in {"snappy", "gz", "zstd", "lz4", "lz4raw", "br", "lzo"}
                    else None
                )
                ext = f".{codec}.parquet" if codec else ".parquet"
                dst = hpath(f"{root}/{name}/{prefix}{i}{ext}")
                if not fs.rename(src, dst):
                    raise IOError(f"rename failed: {src} -> {dst}")
    finally:
        _hadoop_delete(spark, stage)


def write_bucketed_table(
    df: DataFrame,
    table: str,
    bucket_by: list[str],
    n_buckets: int,
    sort_by: list[str] | None = None,
    mode: str = "overwrite",
) -> None:
    """Save as a bucketed managed table: two tables bucketed by the
    same key/count join WITHOUT an exchange — the write-time answer to
    the orders⋈lineitem shuffle at 100 TB."""
    w = df.write.mode(mode).bucketBy(n_buckets, *bucket_by)
    if sort_by:
        w = w.sortBy(*sort_by)
    w.saveAsTable(table)


def write_csv(df: DataFrame, path: str, mode: str = "overwrite", header: bool = True) -> None:
    """CSV export (the reference's CSV story is read-only)."""
    df.write.mode(mode).option("header", str(header).lower()).csv(path)


def write_stream_parquet(
    stream_df: DataFrame,
    path: str,
    checkpoint: str,
    trigger_seconds: int | None = None,
):
    """Streaming parquet sink with checkpointing (exactly-once file
    output); returns the StreamingQuery."""
    w = (
        stream_df.writeStream.format("parquet")
        .option("path", path)
        .option("checkpointLocation", checkpoint)
        .outputMode("append")
    )
    if trigger_seconds:
        w = w.trigger(processingTime=f"{trigger_seconds} seconds")
    else:
        w = w.trigger(availableNow=True)
    return w.start()


def path_exists(spark, target: str) -> bool:
    """Existence check through the Hadoop FileSystem API — like
    :func:`_hadoop_delete`, works identically on file://, hdfs:// and
    s3a:// layouts.  Ingest readers use this instead of catching read
    exceptions: a bare ``except`` around a store read treats ANY
    failure (corrupt footer, FS hiccup, permission error) on an
    EXISTING store as "first batch", which silently computes against
    an empty prior (ADVICE r15)."""
    jvm = spark._jvm
    p = jvm.org.apache.hadoop.fs.Path(target)
    fs = p.getFileSystem(spark._jsc.hadoopConfiguration())
    return bool(fs.exists(p))


def store_has_data(spark, target: str) -> bool:
    """True iff ``target`` holds at least one parquet DATA file —
    the first-batch probe for :func:`append_batch_keyed` layouts.

    A bare directory-existence check is not enough (ADVICE r16): a
    crash inside :func:`append_batch_keyed` between ``fs.mkdirs`` and
    the first file move leaves the store directory EXISTING but with
    zero parquet files, and ``spark.read.parquet`` then throws
    "unable to infer schema" on every replay — permanently wedging
    the stream on a state the replay itself would repair.  Globbing
    for data files classifies that state as first-batch (the replay's
    purge-then-move rebuilds it), while a store with ANY data file
    still takes the read path, so a real read failure (corrupt
    footer, FS hiccup, permission error) still fails the micro-batch
    loudly — the ADVICE-r15 contract is preserved.

    Checks both layout shapes the sinks produce: partitioned
    (``{target}/{col}={v}/*.parquet`` — append_batch_keyed, one glob)
    and flat (``{target}/*.parquet``)."""
    jvm = spark._jvm
    hpath = jvm.org.apache.hadoop.fs.Path
    root = target.rstrip("/")
    fs = hpath(root).getFileSystem(spark._jsc.hadoopConfiguration())
    if not fs.exists(hpath(root)):
        return False
    for pattern in (f"{root}/*/*.parquet", f"{root}/*.parquet"):
        if fs.globStatus(hpath(pattern)):
            return True
    return False


def _hadoop_delete(spark, target: str, must_exist: bool = False) -> bool:
    """Remove a path through the Hadoop FileSystem API so the same code
    works on file://, hdfs:// and s3a:// layouts (os.* would silently
    only work locally).

    ``must_exist=True`` raises when the path is absent — callers that
    COMPUTED the path (a partition directory that provably holds rows)
    use it so a path-construction bug surfaces as an error instead of
    silently retaining data. A ``False`` return from Hadoop's
    ``fs.delete`` (the API's failure signal) always raises."""
    jvm = spark._jvm
    p = jvm.org.apache.hadoop.fs.Path(target)
    fs = p.getFileSystem(spark._jsc.hadoopConfiguration())
    if not fs.exists(p):
        if must_exist:
            raise IOError(
                f"expected path to exist, cannot delete it: {target}"
            )
        return False
    if not fs.delete(p, True):
        raise IOError(f"Hadoop FileSystem refused to delete {target}")
    return True


# Spark's sentinel directory name for a NULL partition value.
_HIVE_NULL_PARTITION = "__HIVE_DEFAULT_PARTITION__"


def _partition_dir(spark, path: str, partition_col: str, value) -> str:
    """The on-disk directory of one partition value, using Spark's OWN
    path escaping (``ExternalCatalogUtils.escapePathName`` — the exact
    function that named the directory at write time). Building
    ``f"{col}={value}"`` by hand retains data silently: a string value
    like ``a:b`` lives in ``cell=a%3Ab``, and a NULL in
    ``cell=__HIVE_DEFAULT_PARTITION__`` — neither matches the naive
    string."""
    esc = spark._jvm.org.apache.spark.sql.catalyst.catalog.ExternalCatalogUtils.escapePathName
    name = _HIVE_NULL_PARTITION if value is None else esc(str(value))
    return f"{path.rstrip('/')}/{esc(partition_col)}={name}"


def compact_partitioned(
    spark,
    path: str,
    partition_col: str = "cell",
    compression: str = "snappy",
) -> None:
    """Compact a partitioned parquet layout in place: one data file per
    partition value, partition directories and row contents unchanged.

    Append-maintained layouts fragment — every ``ivf_append`` /
    ``ivfpq_append`` batch adds one file to each cell it touches, and
    after months of daily ingest a probe of 4 cells opens hundreds of
    small files whose open/seek overhead dwarfs the bytes read. This
    rewrite is the classic small-files compaction: stage the layout
    repartitioned BY the partition column (each value lands in exactly
    one task → exactly one output file), then dynamic-partition-
    overwrite the original path from the stage. Only the second write
    touches ``path``, and Spark's dynamic mode replaces each partition
    directory atomically-per-partition; the stage is required because
    Spark refuses to overwrite a path that a running plan is reading.

    At 100 TB you compact cells incrementally (filter the stage to the
    fragmented cells — dynamic overwrite leaves the rest untouched);
    the full-layout form here is the testable core of that loop.

    The stage path carries a per-invocation nonce: two maintenance
    runs racing on the same layout must not share (and clobber) one
    stage directory mid-copy. The stage write itself sits inside the
    try/finally, so a mid-write failure cannot orphan the stage.
    """
    import uuid

    stage = f"{path.rstrip('/')}__compact_stage_{uuid.uuid4().hex[:12]}"
    stored = spark.read.parquet(path)
    try:
        (
            stored.repartition(F.col(partition_col))
            .write.mode("overwrite")
            .option("compression", compression)
            .partitionBy(partition_col)
            .parquet(stage)
        )
        (
            # schema enforced for the same VOID-partition-inference
            # reason as delete_rows_partitioned's stage read
            spark.read.schema(stored.schema).parquet(stage)
            .write.mode("overwrite")
            .option("partitionOverwriteMode", "dynamic")
            .option("compression", compression)
            .partitionBy(partition_col)
            .parquet(path)
        )
    finally:
        _hadoop_delete(spark, stage)


def delete_rows_partitioned(
    spark,
    path: str,
    keys: DataFrame,
    key_col: str = "vec_id",
    partition_col: str = "cell",
    compression: str = "snappy",
) -> None:
    """Targeted row deletion from a partitioned parquet layout: rewrite
    ONLY the partitions that contain a doomed key, leave every other
    partition's files untouched.

    This is the curation/GDPR shape of stored-index maintenance: a
    100 TB cell-partitioned ANN layout cannot be rewritten end-to-end
    to forget a few thousand vectors. The affected partition set is
    discovered with a broadcast semi-join (the delete set is small by
    contract — broadcast it, never shuffle the corpus), the surviving
    rows of ONLY those partitions are staged, and a dynamic-partition
    overwrite swaps just those directories. A partition whose rows are
    all deleted is removed explicitly afterwards — dynamic overwrite
    can only replace partitions it writes, so an emptied cell would
    otherwise keep its old files (tested in test_sinks.py).

    The broadcast + ``.collect()`` of the affected partition VALUES is
    bounded by the layout's partition cardinality (n_cells for ANN
    layouts — hundreds, not rows), same contract as the other bounded
    collects in this repo.

    Concurrency contract: this function is NOT safe to run
    concurrently with another maintenance op on the same layout —
    only the stage path is race-protected (per-invocation nonce). The
    ``must_exist=True`` directory deletes are deliberate: a partition
    this run PROVED holds doomed rows must exist at delete time, so a
    second racer removing it first surfaces as an error rather than
    as silent mutual interference (two interleaved rewrites can
    resurrect deleted rows, which no-oping would hide). Serialize
    maintenance per layout — the same discipline every non-
    transactional table format demands.
    """
    stored = spark.read.parquet(path)
    key_set = F.broadcast(keys.select(key_col).distinct())
    affected = [
        r[0]
        for r in stored.join(key_set, key_col, "left_semi")
        .select(partition_col)
        .distinct()
        .collect()
    ]
    if not affected:
        return
    # NULL-safe partition membership: .isin() never matches NULL, so a
    # doomed key living in the NULL partition would otherwise vanish
    # from the staged rewrite (its partition rewritten WITHOUT it is
    # correct — but its partition not being rewritten at all retains
    # the row)
    non_null = [v for v in affected if v is not None]
    in_affected = F.col(partition_col).isin(non_null)
    if len(non_null) < len(affected):
        in_affected = in_affected | F.col(partition_col).isNull()
    remaining = stored.filter(in_affected).join(key_set, key_col, "left_anti")
    if remaining.isEmpty():
        # every affected partition is emptied — there is nothing to
        # stage, and parquet cannot round-trip a zero-row partitioned
        # write (the staged read would fail UNABLE_TO_INFER_SCHEMA
        # before any directory was removed); just drop the dirs.
        # must_exist: these partitions provably held the doomed rows —
        # a missing directory means the path construction is wrong,
        # which must surface as an error, never as silent retention
        for value in affected:
            _hadoop_delete(
                spark,
                _partition_dir(spark, path, partition_col, value),
                must_exist=True,
            )
        return
    import uuid

    stage = f"{path.rstrip('/')}__delete_stage_{uuid.uuid4().hex[:12]}"
    try:
        remaining.write.mode("overwrite").option(
            "compression", compression
        ).partitionBy(partition_col).parquet(stage)
        # enforce the layout's schema on the stage read: partition-value
        # inference types an all-NULL partition column as VOID (e.g.
        # when the only surviving rows sit in __HIVE_DEFAULT_PARTITION__),
        # and a VOID partition column cannot be written back
        staged = spark.read.schema(stored.schema).parquet(stage)
        kept = {r[0] for r in staged.select(partition_col).distinct().collect()}
        if kept:
            (
                staged.write.mode("overwrite")
                .option("partitionOverwriteMode", "dynamic")
                .option("compression", compression)
                .partitionBy(partition_col)
                .parquet(path)
            )
        for value in set(affected) - kept:
            _hadoop_delete(
                spark,
                _partition_dir(spark, path, partition_col, value),
                must_exist=True,
            )
    finally:
        _hadoop_delete(spark, stage)


def read_layout_asof(
    spark, path: str, batch_id: int, partition_col: str
) -> DataFrame:
    """Read a batch-keyed layout AS OF ingest batch ``batch_id``: only
    files from batches ≤ ``batch_id`` (plus any plain-append
    ``part-*`` base files) — poor-man's snapshot isolation that the
    deterministic ``ingest-b{n}-*`` names from
    :func:`append_batch_keyed` make possible without a transactional
    table format.  "What did the index hold when batch N landed?" is
    the question every ingest-pipeline debug session asks; with plain
    appends the answer is gone, with batch-keyed names it's a file
    filter.

    Mechanics: one driver-side listing restricted to the layout's own
    ``{partition_col}=*`` directories plus root-level base files (a
    metadata op — file COUNT, not data size; the same cost every
    parquet read already pays), filter names by parsed batch id, hand
    Spark the explicit file list.  Scoping the listing by
    ``partition_col`` is both a cost bound (unrelated sibling data
    under ``path`` is never walked) and a layout check.  Schema/
    partition values are recovered from the Hive paths via
    ``basePath``, so partition pruning and column projection on the
    result behave exactly as a plain read."""
    import re as _re

    jvm = spark._jvm
    hpath = jvm.org.apache.hadoop.fs.Path
    root = path.rstrip("/")
    fs = hpath(root).getFileSystem(spark._jsc.hadoopConfiguration())

    def _statuses():
        for st in fs.listStatus(hpath(root)):
            if st.isFile():
                yield st
        part_dirs = fs.globStatus(hpath(f"{root}/{partition_col}=*")) or []
        for d in part_dirs:
            if not d.isDirectory():
                continue
            it = fs.listFiles(d.getPath(), True)
            while it.hasNext():
                yield it.next()

    keep: list[str] = []
    pat = _re.compile(r"^ingest-b(\d+)-")
    for st in _statuses():
        name = st.getPath().getName()
        if not name.endswith(".parquet"):
            continue
        m = pat.match(name)
        if m is None and not name.startswith("part-"):
            continue
        if m is not None and int(m.group(1)) > batch_id:
            continue
        keep.append(st.getPath().toString())
    if not keep:
        raise FileNotFoundError(
            f"read_layout_asof({root!r}, batch_id={batch_id}): no base or"
            f" batch-keyed parquet files at or before that batch"
        )
    return spark.read.option("basePath", root).parquet(*keep)


def zorder_key(cols: list, bits: int = 16):
    """Morton (Z-order) interleave of 2+ pre-bucketed integer columns —
    the multi-column data-layout key Delta's OPTIMIZE ZORDER BY and
    Iceberg's sort-order use: sorting by the interleaved key clusters
    rows so EVERY participating column gets tight per-file min/max
    ranges, where a lexicographic sort gives them only to its leading
    column.  At 100 TB this is what turns parquet footer stats into
    file-level pruning for queries that filter on the second, third,
    … layout column.

    Callers pass columns already mapped to ``[0, 2^bits)`` (bucket
    ids, quantile ranks, truncated epochs…).  Pure column arithmetic —
    a Python loop over bit positions emits O(bits·ncols) shift/mask
    terms over plain attributes, whole-stage codegen, no UDF.  With
    ``bits=16`` and 2 columns the key fits a long with room to spare
    (32 significant bits)."""
    from pyspark.sql import functions as F

    ncols = len(cols)
    if ncols < 2:
        raise ValueError("zorder_key needs at least 2 columns")
    if bits * ncols > 63:
        raise ValueError(f"{bits} bits x {ncols} cols overflows a long key")
    key = F.lit(0).cast("long")
    for b in range(bits):
        for c, col in enumerate(cols):
            bit = F.shiftright(col.cast("long"), b).bitwiseAND(F.lit(1))
            key = key + F.shiftleft(bit, b * ncols + c)
    return key


def write_zordered(
    df: DataFrame,
    path: str,
    cols: list,
    bits: int = 16,
    n_files: int = 8,
    mode: str = "overwrite",
) -> None:
    """Write parquet laid out along the Z-order curve of ``cols``:
    range-partition by the interleaved key (balanced files), sort
    within partitions, drop the helper key before writing.  Row-group
    and file min/max stats then bound every layout column tightly —
    the pruning effect is measured file-by-file in
    tests/test_sinks.py via parquet footer metadata."""
    from pyspark.sql import functions as F  # noqa: F401

    keyed = df.withColumn("__exo_zkey", zorder_key(cols, bits))
    (
        keyed.repartitionByRange(n_files, "__exo_zkey")
        .sortWithinPartitions("__exo_zkey")
        .drop("__exo_zkey")
        .write.mode(mode)
        .parquet(path)
    )
