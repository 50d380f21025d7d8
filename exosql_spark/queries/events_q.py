"""Event-table queries: time bucketing, JSON props, datetime compat,
sessionization — the batch half of the streaming extension (SURVEY.md
§2.9: the reference has no streaming/windows; these use the same
``F.window`` / JSON machinery the streaming jobs reuse, and the DuckDB
oracle checks them via ``time_bucket`` / JSON functions).
"""

from __future__ import annotations

from pyspark.sql import Window as W
from pyspark.sql import functions as F

from exosql_spark.catalog import register
from exosql_spark.functions.json_compat import jp
from exosql_spark.io import Tables
from exosql_spark.queries import _util as _u


@register(
    "events_time_bucket",
    oracle="""
SELECT time_bucket(INTERVAL 1 HOUR, ts) AS bucket_start,
       event_type,
       count(*) AS n_events,
       floor((CAST(sum(CAST((value) AS DECIMAL(25,6))) AS DOUBLE)) * 10000.0 + 0.5) / 10000.0 AS total_value
FROM events
GROUP BY 1, 2
""",
    tags=("events", "datetime"),
    bench=True,
)
def events_time_bucket(spark, sf_dir):
    """Tumbling 1-hour buckets (batch F.window — identical semantics to
    the streaming job in exosql_spark.streaming). One hash-shuffle on
    (bucket, type); partial aggregation first, so 100 TB of events
    reduces map-side before the exchange."""
    t = Tables(spark, sf_dir)
    return (
        t.events.groupBy(
            F.window("ts", "1 hour").alias("w"), "event_type"
        )
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            _u.dsum("value").alias("total_value"),
        )
        .select(
            F.col("w.start").alias("bucket_start"),
            "event_type",
            "n_events",
            "total_value",
        )
    )


@register(
    "events_json_props",
    oracle="""
SELECT event_id,
       json_extract_string(props, '$.k') AS k_str,
       CAST(json_extract_string(props, '$.k') AS BIGINT) AS k_num
FROM events
WHERE CAST(json_extract_string(props, '$.k') AS BIGINT) > 50
""",
    tags=("events", "json"),
)
def events_json_props(spark, sf_dir):
    """``json()``/``jp()`` compat (reference builtins.ex json/jp): JSON
    pointer '/k' → get_json_object '$.k' — JVM-side, no UDF."""
    t = Tables(spark, sf_dir)
    k = jp(F.col("props"), "/k")
    return (
        t.events.select(
            "event_id",
            k.alias("k_str"),
            k.cast("bigint").alias("k_num"),
        )
        .filter(F.col("k_num") > 50)
    )


@register(
    "events_sessionize",
    oracle="""
WITH gaps AS (
  SELECT user_id, ts, event_id,
         CASE WHEN date_diff('second',
                             lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id),
                             ts) > 1800
              OR lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) IS NULL
              THEN 1 ELSE 0 END AS new_session
  FROM events
),
sess AS (
  SELECT user_id, ts,
         CAST(sum(new_session) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                     ROWS UNBOUNDED PRECEDING) AS BIGINT) AS session_id
  FROM gaps
)
SELECT user_id, session_id, count(*) AS n_events,
       cast(date_diff('second', min(ts), max(ts)) AS bigint) AS duration_s
FROM sess
GROUP BY user_id, session_id
""",
    tags=("events", "window"),
)
def events_sessionize(spark, sf_dir):
    """Batch sessionization (30-min inactivity gap) via lag + running
    sum — the classic gaps-and-islands shape; the streaming twin uses
    session_window (exosql_spark.streaming). Shuffles once on user_id."""
    t = Tables(spark, sf_dir)
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    # ntz → ltz cast is identity under the UTC session timezone
    epoch_s = F.col("ts").cast("timestamp").cast("long")
    gap = epoch_s - F.lag(epoch_s).over(w)
    new_session = F.when(gap.isNull() | (gap > 30 * 60), 1).otherwise(0)
    sess = t.events.withColumn(
        "session_id",
        F.sum(new_session).over(w.rowsBetween(W.unboundedPreceding, 0)),
    )
    return sess.groupBy("user_id", "session_id").agg(
        F.count(F.lit(1)).alias("n_events"),
        (
            F.max(F.col("ts").cast("timestamp").cast("long"))
            - F.min(F.col("ts").cast("timestamp").cast("long"))
        )
        .cast("bigint")
        .alias("duration_s"),
    )


@register(
    "events_sliding_window",
    oracle="""
SELECT time_bucket(INTERVAL 30 MINUTE, ts) + s.n * INTERVAL 1 MINUTE AS window_start,
       count(*) AS n_events,
       floor((CAST(sum(CAST((value) AS DECIMAL(25,6))) AS DOUBLE) / count(value)) * 10000.0 + 0.5) / 10000.0 AS avg_value
FROM events, (SELECT unnest([0, -30]) AS n) s
GROUP BY 1
""",
    tags=("events", "datetime"),
)
def events_sliding_window(spark, sf_dir):
    """Sliding window (1h wide, 30m slide): each event lands in 2
    buckets. Spark's F.window handles the fan-out natively; the DuckDB
    oracle reconstructs it with an unnest of slide offsets."""
    t = Tables(spark, sf_dir)
    return (
        t.events.groupBy(F.window("ts", "1 hour", "30 minutes").alias("w"))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            _u.davg("value").alias("avg_value"),
        )
        .select(F.col("w.start").alias("window_start"), "n_events", "avg_value")
    )


@register(
    "events_duration_filter",
    oracle="""
SELECT event_id, ts, event_type
FROM events
WHERE ts >= TIMESTAMP '2024-01-30 23:26:16.220708' - INTERVAL 7 DAY
  AND event_type IN ('purchase', 'signup')
""",
    tags=("events", "datetime"),
)
def events_duration_filter(spark, sf_dir):
    """Relative duration strings (reference ``to_datetime("-7d")``,
    datetime.ex duration grammar): '-7d' parsed by our compat layer into
    a real INTERVAL; anchored to max(ts) so the query is deterministic."""
    from exosql_spark.functions.datetime_compat import duration_interval

    t = Tables(spark, sf_dir)
    anchor = F.lit("2024-01-30 23:26:16.220708").cast("timestamp_ntz")
    cutoff = F.to_timestamp(anchor) + duration_interval("-7d")
    return t.events.filter(
        (F.col("ts") >= cutoff)
        & F.col("event_type").isin("purchase", "signup")
    ).select("event_id", "ts", "event_type")


@register(
    "events_engagement_suite",
    oracle="""
WITH v AS (SELECT user_id, min(ts) AS tv FROM events WHERE event_type = 'view' GROUP BY user_id),
c AS (SELECT e.user_id, min(e.ts) AS tc
      FROM events e JOIN v USING (user_id)
      WHERE e.event_type = 'click' AND e.ts >= v.tv GROUP BY e.user_id),
p AS (SELECT e.user_id, min(e.ts) AS tp
      FROM events e JOIN c USING (user_id)
      WHERE e.event_type = 'purchase' AND e.ts >= c.tc GROUP BY e.user_id),
first AS (
  SELECT user_id, date_trunc('week', min(ts)) AS w0 FROM events GROUP BY user_id
),
act AS (
  SELECT DISTINCT e.user_id,
         CAST(date_diff('day', f.w0, date_trunc('week', e.ts)) / 7 AS INTEGER) AS wk
  FROM events e JOIN first f USING (user_id)
)
SELECT 'funnel' AS variant, stage, CAST(NULL AS INTEGER) AS wk, n_users FROM (
  SELECT 'view' AS stage, (SELECT count(*) FROM v) AS n_users
  UNION ALL SELECT 'click', (SELECT count(*) FROM c)
  UNION ALL SELECT 'purchase', (SELECT count(*) FROM p)
)
UNION ALL
SELECT 'retention', CAST(NULL AS VARCHAR), wk, count(*)
FROM act GROUP BY wk
""",
    tags=("events", "extension"),
)
def events_engagement_suite(spark, sf_dir):
    """Product-analytics engagement rollups as tagged variants (r15
    window-capacity consolidation of events_funnel + events_retention
    — every column of both originals preserved: funnel rows carry
    ``stage``/NULL ``wk``, retention rows NULL ``stage``/``wk``):

    - ``funnel``: ordered view → click → purchase per-stage user
      counts where each stage's first event is at-or-after the
      previous stage's — three aggregations all keyed on user_id (the
      exchanges reuse one hash partitioning; AQE broadcasts the
      shrinking stage frames into the next join);
    - ``retention``: weekly cohort retention, users active k weeks
      after their first event — two aggregations and a join on
      user_id, then a tiny groupBy on the week offset (the per-user
      first-week frame is |users|-sized, broadcast back by AQE).

    Both variants share the events scan."""
    t = Tables(spark, sf_dir)
    ev = t.events
    v = (
        ev.filter(F.col("event_type") == "view")
        .groupBy("user_id")
        .agg(F.min("ts").alias("tv"))
    )
    c = (
        ev.filter(F.col("event_type") == "click")
        .join(v, "user_id")
        .filter(F.col("ts") >= F.col("tv"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("tc"))
    )
    p = (
        ev.filter(F.col("event_type") == "purchase")
        .join(c, "user_id")
        .filter(F.col("ts") >= F.col("tc"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("tp"))
    )
    stage = lambda name, df: df.agg(F.count(F.lit(1)).alias("n_users")).select(
        F.lit("funnel").alias("variant"),
        F.lit(name).alias("stage"),
        F.lit(None).cast("int").alias("wk"),
        "n_users",
    )
    funnel = (
        stage("view", v).unionAll(stage("click", c)).unionAll(stage("purchase", p))
    )
    first = ev.groupBy("user_id").agg(
        F.date_trunc("week", F.min("ts")).alias("w0")
    )
    act = (
        ev.join(first, "user_id")
        .select(
            "user_id",
            (
                F.datediff(F.date_trunc("week", F.col("ts")), F.col("w0")) / 7
            )
            .cast("int")
            .alias("wk"),
        )
        .distinct()
    )
    retention = act.groupBy("wk").agg(F.count(F.lit(1)).alias("n_users")).select(
        F.lit("retention").alias("variant"),
        F.lit(None).cast("string").alias("stage"),
        "wk",
        "n_users",
    )
    return funnel.unionByName(retention)


@register(
    "events_resample_gapfill",
    oracle="""
WITH pb AS (
  SELECT user_id, time_bucket(INTERVAL 1 HOUR, ts) AS bucket,
         count(*) AS n_events, arg_max(value, ts) AS last_value
  FROM events GROUP BY 1, 2
), bounds AS (
  SELECT user_id,
         time_bucket(INTERVAL 1 HOUR, min(ts)) AS b0,
         time_bucket(INTERVAL 1 HOUR, max(ts)) AS b1
  FROM events GROUP BY 1
), grid AS (
  SELECT user_id, unnest(generate_series(b0, b1, INTERVAL 1 HOUR)) AS bucket
  FROM bounds
)
SELECT g.user_id, g.bucket,
       coalesce(pb.n_events, 0) AS n_events,
       pb.last_value IS NULL AS is_gap,
       last_value(pb.last_value IGNORE NULLS)
         OVER (PARTITION BY g.user_id ORDER BY g.bucket
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS filled_value
FROM grid g LEFT JOIN pb USING (user_id, bucket)
""",
    tags=("events", "timeseries", "extension"),
)
def events_resample_gapfill(spark, sf_dir):
    """Hypertable-style gap-filled resampling (TimescaleDB
    time_bucket_gapfill / fill(previous) semantics, absent in vanilla
    Spark): every user's stream lands on a regular hourly grid with
    empty buckets forward-filled from the last reading. Grid fan-out
    is bounded by time-range/step per key; the fill is one window pass
    per series — see operators/timeseries.py."""
    from exosql_spark.operators import timeseries

    t = Tables(spark, sf_dir)
    return timeseries.resample_ffill(t.events, unit="hour")


@register(
    "events_hll_sketch_rollup",
    oracle="""
SELECT CAST(date_trunc('week', ts) AS TIMESTAMP) AS week,
       CAST(count(DISTINCT user_id) AS BIGINT) AS exact_users,
       CAST(count(*) AS BIGINT) AS n_events
FROM events GROUP BY 1 ORDER BY 1
""",
    tags=("events", "stats", "sketch", "scale"),
)
def events_hll_sketch_rollup(spark, sf_dir):
    """Mergeable-sketch pre-aggregation — THE distinct-count shape at
    100 TB: you cannot afford count(DISTINCT user_id) over raw events
    for every dashboard window, so the pipeline materializes per-DAY
    HLL sketches once (Spark 3.5+ Apache DataSketches ``hll_sketch_agg``,
    a few KB each) and answers any coarser window by register-wise
    merge (``hll_union_agg``) — never rescanning the raw data.  This
    entry builds the day sketches, merges them to ISO weeks, and
    ASSERTS the merged estimate equals the estimate of a sketch built
    directly over each week's raw rows — exact equality, not
    approximate: both hash the same values into the same registers and
    union is max-per-register, so merge-then-estimate and
    estimate-of-union are identical by construction.  It also asserts
    the estimate lands within 10% of the true distinct count (lgK=12
    ⇒ ~1.6% expected error).  The assertion table is calendar-bounded
    (≤6 weeks — a documented bounded collect); the returned columns
    are the exact weekly distincts the DuckDB oracle recomputes.
    Sketch internals stay un-oracled (DuckDB has no DataSketches HLL),
    which is exactly why the consistency proof is internal."""
    t = Tables(spark, sf_dir)
    ev = t.events.select(
        # stays timestamp (midnight Monday): the comparator sees
        # datetime64 on both sides (a Spark `date` collects as
        # datetime.date while DuckDB DATE lands as datetime64)
        F.date_trunc("week", "ts").alias("week"),
        F.to_date("ts").alias("day"),
        "user_id",
    )
    day_sketches = ev.groupBy("week", "day").agg(
        F.hll_sketch_agg("user_id").alias("sk"),
        F.count(F.lit(1)).alias("n"),
    )
    merged = day_sketches.groupBy("week").agg(
        F.hll_sketch_estimate(F.hll_union_agg("sk")).alias("merged_users"),
        F.sum("n").alias("n_events"),
    )
    direct = ev.groupBy("week").agg(
        F.hll_sketch_estimate(F.hll_sketch_agg("user_id")).alias("direct_users"),
        F.countDistinct("user_id").alias("exact_users"),
    )
    check = merged.join(direct, "week").collect()  # ≤6 calendar weeks
    assert check, "no weeks produced"
    for r in check:
        assert r.merged_users == r.direct_users, (
            f"sketch merge broke associativity for {r.week}: "
            f"{r.merged_users} != {r.direct_users}"
        )
        assert abs(r.merged_users / r.exact_users - 1) < 0.10, (
            f"HLL estimate off >10% for {r.week}"
        )
    return (
        merged.join(direct.select("week", "exact_users"), "week")
        .select(
            "week",
            F.col("exact_users").cast("long"),
            F.col("n_events").cast("long"),
        )
        .orderBy("week")
    )
