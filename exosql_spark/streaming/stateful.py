"""Custom stateful streaming operators via applyInPandasWithState.

The reference has no stateful/streaming surface at all (SURVEY.md
§2.9); these are the extension patterns a production event pipeline
needs beyond built-in windowed aggregation:

- :func:`running_user_stats` — per-key running counters that emit an
  updated row per batch (state = one small tuple per user; bounded by
  the key cardinality, not the stream length).
- :func:`anomaly_flags` — stateful thresholding: emit an event only
  when a user's cumulative value crosses a multiple of ``step``
  (deduplicated alerting — classic can't-do-with-window-aggs logic).

Both run per-key over Arrow record batches (pandas inside), with
GroupStateTimeout for state expiry in continuous deployments. The
batch-parity tests drain with availableNow and compare against the
equivalent batch computation.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql import types as T

_STATS_OUT = T.StructType(
    [
        T.StructField("user_id", T.LongType()),
        T.StructField("n_events", T.LongType()),
        T.StructField("total_value", T.DoubleType()),
        T.StructField("max_value", T.DoubleType()),
    ]
)
_STATS_STATE = T.StructType(
    [
        T.StructField("n", T.LongType()),
        T.StructField("total", T.DoubleType()),
        T.StructField("vmax", T.DoubleType()),
    ]
)


def running_user_stats(events: DataFrame) -> DataFrame:
    """Per-user running (count, total, max) — emits the updated state
    row each time the user appears in a micro-batch."""

    def update(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        (user_id,) = key
        n, total, vmax = state.get if state.exists else (0, 0.0, float("-inf"))
        for pdf in pdfs:
            n += len(pdf)
            total += float(pdf["value"].sum())
            vmax = max(vmax, float(pdf["value"].max()))
        state.update((n, total, vmax))
        yield pd.DataFrame(
            {
                "user_id": [user_id],
                "n_events": [n],
                "total_value": [round(total, 4)],
                "max_value": [vmax],
            }
        )

    return events.groupBy("user_id").applyInPandasWithState(
        update,
        outputStructType=_STATS_OUT,
        stateStructType=_STATS_STATE,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


_ALERT_OUT = T.StructType(
    [
        T.StructField("user_id", T.LongType()),
        T.StructField("threshold_crossed", T.DoubleType()),
        T.StructField("total_value", T.DoubleType()),
    ]
)
_ALERT_STATE = T.StructType(
    [
        T.StructField("total", T.DoubleType()),
        T.StructField("last_threshold", T.DoubleType()),
    ]
)


def anomaly_flags(events: DataFrame, step: float = 500.0) -> DataFrame:
    """Emit one alert row each time a user's cumulative value crosses a
    new multiple of ``step`` — stateful deduplicated alerting."""

    def update(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        (user_id,) = key
        total, last_thr = state.get if state.exists else (0.0, 0.0)
        alerts: list[tuple[float, float]] = []
        for pdf in pdfs:
            for v in pdf["value"]:
                total += float(v)
                while total >= last_thr + step:
                    last_thr += step
                    alerts.append((last_thr, round(total, 4)))
        state.update((total, last_thr))
        if alerts:
            yield pd.DataFrame(
                {
                    "user_id": [user_id] * len(alerts),
                    "threshold_crossed": [a[0] for a in alerts],
                    "total_value": [a[1] for a in alerts],
                }
            )

    return events.groupBy("user_id").applyInPandasWithState(
        update,
        outputStructType=_ALERT_OUT,
        stateStructType=_ALERT_STATE,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
