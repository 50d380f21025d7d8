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

try:  # transformWithState needs the protobuf state-server protocol
    import google.protobuf  # noqa: F401
    from pyspark.sql.streaming.stateful_processor import StatefulProcessor

    HAS_TRANSFORM_WITH_STATE = True
except ImportError:  # pragma: no cover - container has no protobuf
    StatefulProcessor = object  # type: ignore[assignment,misc]
    HAS_TRANSFORM_WITH_STATE = False

# The single load-bearing reason string for the gated twin: raised by
# event_type_profile_tws, reported by the suite's skip, and pinned by
# a meta-test (tests/test_streaming.py) so it can't silently rot.
# WHICH environment provides the dependency: any interpreter with the
# ``protobuf`` distribution (``pip install "pyspark[connect]"`` pulls
# it, as does plain ``pip install protobuf``) — Spark 4's
# transformWithStateInPandas speaks a protobuf wire protocol to the
# JVM state server, and pyspark imports google.protobuf at
# StatefulProcessor import time, so no pure-Python fallback exists.
# This container is no-install, so the twin stays gated here while
# the behavior-equivalent applyInPandasWithState path (the parity
# entry's engine) carries the driver-checked coverage.
TWS_UNAVAILABLE_REASON = (
    "transformWithStateInPandas needs the 'protobuf' package "
    "(provided by `pip install protobuf` or `pip install "
    "'pyspark[connect]'`); this no-install container lacks it, so the "
    "applyInPandasWithState twin carries the coverage"
)
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


class _EventTypeProfile(StatefulProcessor):
    """StatefulProcessor for :func:`event_type_profile` — declared at
    module scope (the processor is pickled to executors)."""

    def init(self, handle) -> None:
        # MapState: one sub-entry per event_type under the user's key —
        # the "arbitrary user state" shape applyInPandasWithState's
        # single flat tuple cannot express without packing/unpacking.
        self._counts = handle.getMapState(
            "type_counts", "event_type string", "n long"
        )

    def handleInputRows(self, key, pdfs, timerValues):
        (user_id,) = key
        batch: dict[str, int] = {}
        for pdf in pdfs:
            # .dropna() makes the NULL contract EXPLICIT: rows with a
            # NULL event_type are excluded from state, and the parity
            # oracle states the same filter (value_counts would drop
            # them anyway, but silently — the contract was incidental)
            for et, n in pdf["event_type"].dropna().value_counts().items():
                batch[et] = batch.get(et, 0) + int(n)
        types, counts = [], []
        for et in sorted(batch):
            prev = (
                self._counts.getValue((et,))
                if self._counts.containsKey((et,))
                else None
            )
            total = (prev[0] if prev else 0) + batch[et]
            self._counts.updateValue((et,), (total,))
            types.append(et)
            counts.append(total)
        yield pd.DataFrame(
            {
                "user_id": [user_id] * len(types),
                "event_type": types,
                "n_events": counts,
            }
        )

    def close(self) -> None:
        pass

    def handleInitialState(self, key, initialState, timerValues) -> None:
        pass

    def handleExpiredTimer(self, key, timerValues, expiredTimerInfo):
        return iter(())


def event_type_profile_tws(events: DataFrame) -> DataFrame:
    """Per-user per-event-type running counts via the Spark 4
    ``transformWithStateInPandas`` API (StatefulProcessor + MapState) —
    the map grows one RocksDB-backed sub-entry per event type, updated
    point-wise, never rewritten wholesale: at 10⁹ users × dozens of
    types that point-update is the scale path (the packed twin below
    rewrites the user's whole map tuple each batch).

    Requires ``protobuf`` (the transformWithState state-server wire
    protocol) — unavailable in this container, so the parity entry
    runs :func:`event_type_profile` and the test suite skips this
    variant unless HAS_TRANSFORM_WITH_STATE."""
    if not HAS_TRANSFORM_WITH_STATE:  # pragma: no cover
        raise ImportError(TWS_UNAVAILABLE_REASON)
    return events.groupBy("user_id").transformWithStateInPandas(
        statefulProcessor=_EventTypeProfile(),
        outputStructType="user_id long, event_type string, n_events long",
        outputMode="update",
        timeMode="none",
    )


_PROFILE_OUT = T.StructType(
    [
        T.StructField("user_id", T.LongType()),
        T.StructField("event_type", T.StringType()),
        T.StructField("n_events", T.LongType()),
    ]
)
# Arbitrary VARIABLE-SIZE user state in the applyInPandasWithState API:
# the per-user map {event_type: count} packed as two parallel arrays
# (the state struct is fixed-shape, its array fields are not).
_PROFILE_STATE = T.StructType(
    [
        T.StructField("types", T.ArrayType(T.StringType())),
        T.StructField("counts", T.ArrayType(T.LongType())),
    ]
)


def event_type_profile(events: DataFrame) -> DataFrame:
    """Per-user per-event-type running counts — the arbitrary-shape
    user-state pattern in the runnable API: applyInPandasWithState's
    state struct is fixed-shape, but ARRAY fields inside it are not,
    so a whole map of per-type counters packs as two parallel arrays
    and grows with the user's observed type set (none of the other
    stateful entries carry variable-size state).  Each micro-batch
    emits the updated (user_id, event_type, n_events) rows for the
    types that appeared; counts are monotone, so the final state per
    pair is the max-count emission (what the parity entry selects).
    State size: O(users × event types) entries, bounded by key
    cardinality, not stream length."""

    def update(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        (user_id,) = key
        types, counts = state.get if state.exists else ([], [])
        m = dict(zip(list(types), list(counts)))
        batch: dict[str, int] = {}
        for pdf in pdfs:
            # .dropna() makes the NULL contract EXPLICIT: rows with a
            # NULL event_type are excluded from state, and the parity
            # oracle states the same filter (value_counts would drop
            # them anyway, but silently — the contract was incidental)
            for et, n in pdf["event_type"].dropna().value_counts().items():
                batch[et] = batch.get(et, 0) + int(n)
        for et in batch:
            m[et] = m.get(et, 0) + batch[et]
        ks = sorted(m)
        state.update((ks, [m[k] for k in ks]))
        touched = sorted(batch)
        yield pd.DataFrame(
            {
                "user_id": [user_id] * len(touched),
                "event_type": touched,
                "n_events": [m[et] for et in touched],
            }
        )

    return events.groupBy("user_id").applyInPandasWithState(
        update,
        outputStructType=_PROFILE_OUT,
        stateStructType=_PROFILE_STATE,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
