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

from pyspark.sql import DataFrame, Window
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

    def struct_ddl(df: DataFrame, cols: list[str]) -> str:
        fields = df.select(*cols).schema.fields
        return (
            "struct<"
            + ",".join(f"{f.name}:{f.dataType.simpleString()}" for f in fields)
            + ">"
        )

    r_ddl = struct_ddl(right, [right_ts, *value_cols])
    l_ddl = struct_ddl(left, list(left.columns))

    l_tagged = left.select(
        F.col(on).alias("_k"),
        F.col(left_ts).alias("_ts"),
        F.lit(1).alias("_side"),  # left sorts after right on ties (<=)
        F.struct(*[F.col(c) for c in left.columns]).alias("_l"),
        F.lit(None).cast(r_ddl).alias("_r"),
    )
    r_tagged = right.select(
        F.col(on).alias("_k"),
        F.col(right_ts).alias("_ts"),
        F.lit(0).alias("_side"),
        F.lit(None).cast(l_ddl).alias("_l"),
        F.struct(F.col(right_ts), *[F.col(c) for c in value_cols]).alias("_r"),
    )
    # strict (</>): left rows sort BEFORE right rows at equal ts so the
    # carried value excludes same-instant right rows. Forward mode =
    # the same merge over descending ts (carry the next right row).
    order_side = F.col("_side").asc() if not strict else F.col("_side").desc()
    if direction == "nearest":
        # both carries over ONE union: the backward candidate is the
        # max right ts <= left ts (nearest below), the forward one the
        # min right ts >= left ts (nearest above) — the global nearest
        # is whichever delta is smaller, backward on equidistant ties
        # (the earlier row, pandas merge_asof's rule)
        w_b = (
            Window.partitionBy("_k")
            .orderBy(F.col("_ts").asc(), order_side)
            .rowsBetween(Window.unboundedPreceding, 0)
        )
        w_f = (
            Window.partitionBy("_k")
            .orderBy(F.col("_ts").desc(), order_side)
            .rowsBetween(Window.unboundedPreceding, 0)
        )
        u = (
            l_tagged.unionByName(r_tagged)
            .withColumn("_mb", F.last("_r", ignorenulls=True).over(w_b))
            .withColumn("_mf", F.last("_r", ignorenulls=True).over(w_f))
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
            _num = lambda c: F.unix_micros(c.cast("timestamp"))  # noqa: E731
        else:
            _num = lambda c: c  # noqa: E731
        d_b = F.abs(_num(F.col("_ts")) - _num(F.col("_mb")[right_ts]))
        d_f = F.abs(_num(F.col("_mf")[right_ts]) - _num(F.col("_ts")))
        merged = u.withColumn(
            "_match",
            F.when(F.col("_mb").isNull(), F.col("_mf"))
            .when(F.col("_mf").isNull(), F.col("_mb"))
            .when(d_b <= d_f, F.col("_mb"))
            .otherwise(F.col("_mf")),
        )
    else:
        order_ts = (
            F.col("_ts").asc() if direction == "backward" else F.col("_ts").desc()
        )
        w = (
            Window.partitionBy("_k")
            .orderBy(order_ts, order_side)
            .rowsBetween(Window.unboundedPreceding, 0)
        )
        merged = l_tagged.unionByName(r_tagged).withColumn(
            "_match", F.last("_r", ignorenulls=True).over(w)
        )
    out = merged.filter(F.col("_side") == 1).select(
        *[F.col("_l")[c].alias(c) for c in left.columns],
        *[
            F.col("_match")[c].alias(f"{c}{suffix}")
            for c in [right_ts, *value_cols]
        ],
    )
    return out


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
