"""Time-series regularization: resampling onto a fixed grid with
gap-filling — the hypertable/rollup-class operator family relational
engines bolt on (TimescaleDB ``time_bucket_gapfill``, InfluxDB
``fill(previous)``); absent in both the reference and vanilla Spark.

Scale shape: one (key, bucket) aggregation with map-side combine, one
tiny per-key bounds aggregation, a grid explode whose fan-out is
bounded by time-range/step per key (never by event count), and one
window pass per key for the forward fill. Everything shuffles on the
series key; event rows never fan out.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def resample_ffill(
    events: DataFrame,
    unit: str = "hour",
    id_col: str = "user_id",
    ts_col: str = "ts",
    value_col: str = "value",
) -> DataFrame:
    """Resample each key's event stream onto a regular ``unit`` grid
    spanning [first event, last event], carrying per-bucket counts and
    the last observed reading, with empty buckets forward-filled from
    the previous reading (``fill(previous)`` semantics).

    Returns (id, bucket, n_events, is_gap, filled_value); leading
    buckets before any observation stay NULL. ``last observed`` is
    well-defined because (id, ts) is unique per series — max_by on the
    raw timestamp, no tiebreaker needed.
    """
    bucket = F.date_trunc(unit, F.col(ts_col))
    per_bucket = events.groupBy(F.col(id_col), bucket.alias("bucket")).agg(
        F.count(F.lit(1)).alias("n_events"),
        F.max_by(F.col(value_col), F.col(ts_col)).alias("_last"),
    )
    bounds = events.groupBy(id_col).agg(
        F.date_trunc(unit, F.min(ts_col)).alias("_b0"),
        F.date_trunc(unit, F.max(ts_col)).alias("_b1"),
    )
    grid = bounds.select(
        id_col,
        F.explode(F.expr(f"sequence(_b0, _b1, interval 1 {unit})")).alias("bucket"),
    )
    w = (
        Window.partitionBy(id_col)
        .orderBy("bucket")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        grid.join(per_bucket, [id_col, "bucket"], "left")
        .select(
            id_col,
            "bucket",
            F.coalesce("n_events", F.lit(0)).alias("n_events"),
            F.col("_last").isNull().alias("is_gap"),
            F.last("_last", ignorenulls=True).over(w).alias("filled_value"),
        )
    )
