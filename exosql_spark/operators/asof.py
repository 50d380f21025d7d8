"""As-of (most-recent-match) and range joins — time-series operators
Spark lacks natively (SURVEY.md §2.3 J8: absent in the reference too;
this is extension surface a training-data/metrics pipeline needs).

Scale design:

- The naive formulation is a per-row correlated subquery (quadratic).
  :func:`asof_join` instead uses the union+window merge: tag both
  sides, union, one window sorted by (key, ts) carrying the last right
  row forward, keep left rows. Cost = one shuffle on the key + one
  per-partition sort — the same complexity as a sort-merge join, no
  range explosion, no skew amplification. This is how kdb/QuestDB/
  Flink implement it; DuckDB's native ASOF JOIN is the oracle.
- :func:`range_join` keeps the equi key as the shuffle key and applies
  the range predicate as a post-join filter; Catalyst hashes on the
  equi conjunct so the cross product is per-key only. For keys with
  heavy timelines, bucket the timestamp (coarse grid) into the join
  key to cap per-task pair counts.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    left_ts: str = "ts",
    right_ts: str = "ts",
    value_cols: list[str] | None = None,
    suffix: str = "_right",
    strict: bool = False,
    direction: str = "backward",
) -> DataFrame:
    """For each left row, attach the latest right row with
    ``right.ts <= left.ts`` (``<`` when strict) within the same ``on``
    key — or, with ``direction="forward"``, the *earliest* right row
    with ``right.ts >= left.ts`` (``>`` when strict). Left rows with
    no matching right row keep nulls.

    Forward mode reuses the same union+window merge scanned in
    descending timestamp order (cost identical: one shuffle on the
    key + one sort) — no second code path, no range explosion.

    ``direction="nearest"`` attaches the right row minimizing
    ``|left.ts − right.ts|``, ties (equidistant before/after) taking
    the EARLIER right row — pandas ``merge_asof`` semantics. It runs
    BOTH carries over one union (same single shuffle on the key, two
    per-partition sorts — asc and desc) and picks per row; TIMESTAMP
    columns are handled by casting to epoch microseconds internally
    (exact long arithmetic — no interval types, no double rounding at
    micro-resolution ties), numeric columns compare as-is. Inclusive
    by definition (``strict=True`` rejected).

    REQUIREMENT (``direction="nearest"`` with ``timestamp_ntz``
    inputs): the session timezone must be a FIXED-OFFSET zone — this
    repo pins ``spark.sql.session.timeZone=UTC`` in ``get_spark`` /
    ``ensure_session_confs``.  The internal NTZ→TZ cast shifts both
    operands by the session offset, which cancels in the subtraction
    only when the offset is constant; under a DST zone, operands on
    opposite sides of a transition would shift by different amounts
    and could flip nearest/tie decisions.  Both timestamp columns
    must also agree in kind (both timestamp-like or both numeric) —
    mixed operands raise rather than silently comparing a shifted
    cast against a raw number.

    Returns all left columns plus ``<value_col><suffix>`` columns and
    ``<right_ts><suffix>`` (the matched right timestamp).
    """
    if direction not in ("backward", "forward", "nearest"):
        raise ValueError(
            f"direction must be backward|forward|nearest, got {direction!r}"
        )
    if direction == "nearest" and strict:
        raise ValueError("direction='nearest' is inclusive; strict=True unsupported")
    value_cols = value_cols or [
        c for c in right.columns if c not in (on, right_ts)
    ]

    # SQL-text column programs (r18 optimization round, guide §1.2):
    # the tagged-union selects, carry windows and unpack select below
    # were composed through the Column API at ~0.17 ms of py4j
    # round-trip latency per node (2,491 round trips for one 3-variant
    # join_asof_suite build) and struct_ddl ANALYZED a fresh select per
    # side just to read types that df.schema already holds. Same
    # trees, same values — pinned by the asof equivalence test and the
    # exact join_asof_suite oracle.
    def q(name: str) -> str:
        return "`" + name.replace("`", "``") + "`"

    def struct_ddl(df: DataFrame, cols: list[str]) -> str:
        fields = [df.schema[c] for c in cols]
        return (
            "struct<"
            + ",".join(f"{f.name}:{f.dataType.simpleString()}" for f in fields)
            + ">"
        )

    r_ddl = struct_ddl(right, [right_ts, *value_cols])
    l_ddl = struct_ddl(left, list(left.columns))

    l_tagged = left.selectExpr(
        f"{q(on)} AS _k",
        f"{q(left_ts)} AS _ts",
        "1 AS _side",  # left sorts after right on ties (<=)
        "struct(" + ", ".join(q(c) for c in left.columns) + ") AS _l",
        f"CAST(NULL AS {r_ddl}) AS _r",
    )
    r_tagged = right.selectExpr(
        f"{q(on)} AS _k",
        f"{q(right_ts)} AS _ts",
        "0 AS _side",
        f"CAST(NULL AS {l_ddl}) AS _l",
        "struct("
        + ", ".join(q(c) for c in [right_ts, *value_cols])
        + ") AS _r",
    )
    # strict (</>): left rows sort BEFORE right rows at equal ts so the
    # carried value excludes same-instant right rows. Forward mode =
    # the same merge over descending ts (carry the next right row).
    side_sql = "_side ASC" if not strict else "_side DESC"

    def carry_sql(ts_order: str) -> str:
        return (
            "last(_r, true) OVER (PARTITION BY _k"
            f" ORDER BY _ts {ts_order}, {side_sql}"
            " ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)"
        )

    if direction == "nearest":
        # both carries over ONE union: the backward candidate is the
        # max right ts <= left ts (nearest below), the forward one the
        # min right ts >= left ts (nearest above) — the global nearest
        # is whichever delta is smaller, backward on equidistant ties
        # (the earlier row, pandas merge_asof's rule)
        u = l_tagged.unionByName(r_tagged).selectExpr(
            "*",
            f"{carry_sql('ASC')} AS _mb",
            f"{carry_sql('DESC')} AS _mf",
        )
        # Deltas in exact long arithmetic: timestamps → epoch micros
        # (a subtraction of raw TIMESTAMP columns would only work via
        # DayTimeInterval compare, Spark 3.3+, and doubles lose
        # micro-resolution ties); numerics compare as-is.  The NTZ→TZ
        # cast shift cancels between operands only under the pinned
        # fixed-offset session tz — see the docstring REQUIREMENT.
        # BOTH sides' types decide the conversion (the delta pairs the
        # union's _ts column with the right struct's field): a mixed
        # timestamp/numeric pair would compare a shifted cast against
        # a raw number, so it raises instead.
        l_is_ts = left.schema[left_ts].dataType.typeName().startswith("timestamp")
        r_is_ts = right.schema[right_ts].dataType.typeName().startswith("timestamp")
        if l_is_ts != r_is_ts:
            raise TypeError(
                "direction='nearest' needs both timestamp columns to be "
                f"the same kind: {left_ts} is "
                f"{left.schema[left_ts].dataType.simpleString()}, {right_ts} is "
                f"{right.schema[right_ts].dataType.simpleString()}"
            )
        if l_is_ts:
            _num = lambda e: f"unix_micros(CAST({e} AS TIMESTAMP))"  # noqa: E731
        else:
            _num = lambda e: e  # noqa: E731
        d_b = f"abs({_num('_ts')} - {_num('_mb.' + q(right_ts))})"
        d_f = f"abs({_num('_mf.' + q(right_ts))} - {_num('_ts')})"
        merged = u.selectExpr(
            "*",
            "CASE WHEN _mb IS NULL THEN _mf"
            " WHEN _mf IS NULL THEN _mb"
            f" WHEN {d_b} <= {d_f} THEN _mb"
            " ELSE _mf END AS _match",
        )
    else:
        ts_order = "ASC" if direction == "backward" else "DESC"
        merged = l_tagged.unionByName(r_tagged).selectExpr(
            "*", f"{carry_sql(ts_order)} AS _match"
        )
    return merged.where("_side = 1").selectExpr(
        *[f"_l.{q(c)} AS {q(c)}" for c in left.columns],
        *[
            f"_match.{q(c)} AS {q(c + suffix)}"
            for c in [right_ts, *value_cols]
        ],
    )


def range_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    left_ts: str = "ts",
    right_ts: str = "ts",
    lower: int = 0,
    upper: int = 300,
    how: str = "inner",
) -> DataFrame:
    """Join rows within a time range: same key and
    ``lower <= left.ts - right.ts <= upper`` (seconds). The equi key
    hashes; the range predicate filters post-hash — per-key work only."""
    l = left.alias("l")
    r = right.alias("r")
    diff = F.col(f"l.{left_ts}").cast("timestamp").cast("long") - F.col(
        f"r.{right_ts}"
    ).cast("timestamp").cast("long")
    return l.join(
        r,
        (F.col(f"l.{on}") == F.col(f"r.{on}"))
        & (diff >= lower)
        & (diff <= upper),
        how,
    )
