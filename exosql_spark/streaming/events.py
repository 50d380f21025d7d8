"""Streaming operators over the events table.

The reference has no streaming at all (batch pull-based only — SURVEY.md
§2.9); this module is the Structured Streaming extension. Each
transformation is written against a *streaming* DataFrame but is equally
valid on a batch one — the batch twins in
:mod:`exosql_spark.queries.events_q` share the same ``F.window``
semantics, which is how tests verify streaming output == batch output.

Scale notes:
- Watermarks bound state: an aggregation over (window, key) keeps state
  only until watermark passes window end. At 100 TB/day the state store
  (RocksDB in prod) holds ~|active windows × keys| rows, not the stream.
- ``session_window`` merges per-key gap sessions incrementally — the
  streaming twin of the batch gaps-and-islands pattern.
- ``dropDuplicatesWithinWatermark`` is the streaming exact-dedup: state
  = one digest per event id within the watermark horizon.
"""

from __future__ import annotations

import os
import tempfile

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

def _as_stream_dir(parquet_path: str) -> str:
    """The file-stream source wants a directory; stage a symlink dir for
    single-file inputs (testdata layout). DETERMINISTIC per source path
    — a checkpointed query records the source dir, so restarting with a
    fresh random dir would fail with 'Wrong basePath'."""
    if os.path.isdir(parquet_path):
        return parquet_path
    import hashlib

    tag = hashlib.md5(os.path.abspath(parquet_path).encode()).hexdigest()[:12]
    d = os.path.join(tempfile.gettempdir(), f"exosql_stream_{tag}")
    os.makedirs(d, exist_ok=True)
    link = os.path.join(d, os.path.basename(parquet_path))
    if not os.path.exists(link):
        os.symlink(parquet_path, link)
    return d


EVENTS_SCHEMA = T.StructType(
    [
        T.StructField("event_id", T.LongType()),
        T.StructField("ts", T.TimestampType()),
        T.StructField("user_id", T.LongType()),
        T.StructField("event_type", T.StringType()),
        T.StructField("value", T.DoubleType()),
        T.StructField("props", T.StringType()),
    ]
)


def read_events_stream(
    spark: SparkSession, parquet_path: str, max_files_per_trigger: int = 1
) -> DataFrame:
    """File-source stream over an events parquet path.

    The testdata has shipped ``ts`` both as TIMESTAMP(NANOS) (surfaced
    as bigint under nanosAsLong) and as plain TIMESTAMP(MICROS) —
    probe the surfaced dtype with a footer-only batch read of the SAME
    path and branch, mirroring the batch loader's conditional
    (io.load_table). Hardcoding either unit silently shifts every
    event-time by 1000× when the data changes.
    """
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    batch_schema = spark.read.parquet(parquet_path).schema
    ts_type = batch_schema["ts"].dataType
    raw_schema = T.StructType(
        [
            T.StructField("event_id", T.LongType()),
            T.StructField("ts", ts_type),
            T.StructField("user_id", T.LongType()),
            T.StructField("event_type", T.StringType()),
            T.StructField("value", T.DoubleType()),
            T.StructField("props", T.StringType()),
        ]
    )
    parquet_path = _as_stream_dir(parquet_path)
    df = (
        spark.readStream.schema(raw_schema)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .parquet(parquet_path)
    )
    # watermarks require TIMESTAMP (ltz) event time; under the UTC
    # session timezone this is value-identical to the batch ntz column
    if isinstance(ts_type, T.LongType):  # nanos-as-long
        return df.withColumn("ts", F.expr("timestamp_micros(ts div 1000)"))
    return df.withColumn("ts", F.col("ts").cast(T.TimestampType()))


def tumbling_counts(
    events: DataFrame, width: str = "1 hour", watermark: str = "2 hours"
) -> DataFrame:
    """Watermarked tumbling-window counts per event_type."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.window("ts", width).alias("w"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum("value"), 4).alias("total_value"),
        )
        .select(
            F.col("w.start").alias("bucket_start"),
            "event_type",
            "n_events",
            "total_value",
        )
    )


def sliding_value_avg(
    events: DataFrame,
    width: str = "1 hour",
    slide: str = "30 minutes",
    watermark: str = "2 hours",
) -> DataFrame:
    """Watermarked sliding-window stats. ``total_value`` (a sum of
    2-decimal testdata values — always on the 0.01 grid, so rounding
    is engine-stable) carries the cross-engine parity check;
    ``avg_value`` is the human-facing stat (an average can land
    exactly on a rounding half-boundary, where float-sum order makes
    engines legitimately disagree — see queries/_util.py)."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.window("ts", width, slide).alias("w"))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum("value"), 4).alias("total_value"),
            F.round(F.avg("value"), 4).alias("avg_value"),
        )
        .select(
            F.col("w.start").alias("window_start"),
            "n_events",
            "total_value",
            "avg_value",
        )
    )


def session_aggregate(
    events: DataFrame, gap: str = "30 minutes", watermark: str = "2 hours"
) -> DataFrame:
    """Per-user session windows (inactivity gap) — incremental state
    merge; the streaming twin of events_q.events_sessionize."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.session_window("ts", gap).alias("sw"), "user_id")
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            "user_id",
            F.col("sw.start").alias("session_start"),
            F.col("sw.end").alias("session_end"),
            "n_events",
        )
    )


def dedup_within_watermark(events: DataFrame, watermark: str = "2 hours") -> DataFrame:
    """Streaming exact-dedup on event_id within the watermark horizon."""
    return events.withWatermark("ts", watermark).dropDuplicatesWithinWatermark(
        ["event_id"]
    )


def topk_event_types(events: DataFrame, k: int = 3) -> DataFrame:
    """Global top-k event types by count — streaming HEAVY HITTERS in
    COMPLETE output mode: sort + limit are only legal under complete
    mode (the full updated ranking is re-emitted every micro-batch, so
    the sink always holds the current exact top-k — the memory sink
    keeps just the latest emission). This is the exact small-k shape;
    the sketch-based alternative for huge key spaces is the batch
    text_token_topk_approx pattern. Aggregation state is |event_type|
    rows — bounded, no watermark needed (no event-time grouping).
    Columns: event_type, n_events, total_value."""
    return (
        events.groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum("value"), 4).alias("total_value"),
        )
        .orderBy(F.col("n_events").desc(), F.col("event_type"))
        .limit(k)
    )


def run_to_memory(
    stream: DataFrame, name: str, mode: str = "append", timeout_s: int = 120
):
    """Execute a streaming query to a memory sink with availableNow
    (process-everything-then-stop — the batch-parity test harness).
    Returns the StreamingQuery after it has fully drained; raises if
    the drain times out (a partially drained sink would make a parity
    check fail against the batch oracle for harness reasons, not code
    reasons — fail loudly instead)."""
    q = (
        stream.writeStream.format("memory")
        .queryName(name)
        .outputMode(mode)
        .trigger(availableNow=True)
        .start()
    )
    if not q.awaitTermination(timeout_s):
        q.stop()
        raise RuntimeError(
            f"run_to_memory({name!r}): availableNow drain did not finish "
            f"within {timeout_s} s — partial sink, aborting"
        )
    return q


def start_to_parquet(
    stream: DataFrame,
    path: str,
    checkpoint: str,
    mode: str = "append",
):
    """Start a checkpointed parquet-sink query with availableNow.

    This is the production-shaped sink: the checkpoint's offset log +
    the file sink's commit manifest give end-to-end exactly-once — a
    query stopped mid-stream and restarted with the SAME path and
    checkpoint resumes from the last committed batch, never duplicating
    and never dropping rows (asserted in
    tests/test_streaming.py::TestCheckpointRestart). Returns the
    running StreamingQuery; callers stop/await it."""
    return (
        stream.writeStream.format("parquet")
        .option("path", path)
        .option("checkpointLocation", checkpoint)
        .outputMode(mode)
        .trigger(availableNow=True)
        .start()
    )


def enrich_with_dimension(
    events: DataFrame,
    dim: DataFrame,
    on_left: str = "user_id",
    on_right: str = "c_custkey",
) -> DataFrame:
    """Stream-static join: enrich the event stream with a (batch)
    dimension table. Spark broadcasts/rescans the static side per
    micro-batch — no state, no watermark needed; the streaming twin of
    the star-schema dim join. At 100 TB keep the dim broadcast-sized
    or pre-bucket both sides."""
    return events.join(
        dim, events[on_left] == dim[on_right], "left"
    )


def attribution_join(
    views: DataFrame,
    purchases: DataFrame,
    horizon: str = "1 hour",
    watermark: str = "2 hours",
) -> DataFrame:
    """Stream-stream interval join: attribute each purchase to the
    view(s) by the same user within ``horizon`` before it.

    Both sides carry a watermark and the join condition bounds event
    time in BOTH directions (p.ts in [v.ts, v.ts + horizon]), so Spark
    can expire join state: a buffered view is droppable once the
    purchase-side watermark passes v.ts + horizon. Without the time
    bound the state store grows without limit — the canonical
    stream-stream join mistake at scale. Inner matches emit as soon as
    both rows arrive (watermark only gates state cleanup), so results
    equal the batch join exactly.
    """
    v = views.withWatermark("ts", watermark).select(
        F.col("user_id").alias("v_user"),
        F.col("ts").alias("v_ts"),
        F.col("event_id").alias("view_id"),
    )
    p = purchases.withWatermark("ts", watermark).select(
        F.col("user_id").alias("p_user"),
        F.col("ts").alias("p_ts"),
        F.col("event_id").alias("purchase_id"),
        F.col("value").alias("purchase_value"),
    )
    return v.join(
        p,
        (F.col("v_user") == F.col("p_user"))
        & (F.col("p_ts") >= F.col("v_ts"))
        & (F.col("p_ts") <= F.col("v_ts") + F.expr(f"INTERVAL {horizon}")),
        "inner",
    ).select(
        F.col("p_user").alias("user_id"),
        "view_id",
        "purchase_id",
        "v_ts",
        "p_ts",
        "purchase_value",
    )
