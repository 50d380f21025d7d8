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
