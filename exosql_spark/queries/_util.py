"""Cross-engine-stable aggregates.

Two distinct hazards when hash-comparing double aggregates against
DuckDB:

1. **Accumulation order.** Spark's partial aggregation and DuckDB's
   sequential scan can differ in the last ulp. Fixed by summing via
   DECIMAL (exact, order-independent in both engines), cast back to
   double so result schemas stay double.

2. **round() semantics.** Spark's ``round(double, n)`` rounds the
   double's *shortest decimal representation* (``BigDecimal.valueOf``),
   DuckDB rounds the exact binary value — ``round(73.91374999…, 4)``
   (shortest repr "73.91375") yields 73.9138 on Spark, 73.9137 on
   DuckDB. Fixed by rounding arithmetically: ``floor(x*10^n + 0.5) /
   10^n`` is a pure IEEE-double expression that evaluates bit-
   identically on both engines.

Averages (exact-decimal sum ÷ count) land on representation
boundaries routinely (sums of 2-decimal data divided by small n), so
``davg``/``davg_sql`` always use the arithmetic rounding; sums keep
plain round (a rounded decimal sum is already boundary-free for
testdata-scale inputs) but go through the same helpers for symmetry.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

_DEC = "decimal(25,6)"


def _c(col: Column | str) -> Column:
    return F.col(col) if isinstance(col, str) else col


def fround(col: Column, nd: int = 4) -> Column:
    """Engine-deterministic half-up rounding on the binary double."""
    s = float(10**nd)
    return F.floor(col * F.lit(s) + F.lit(0.5)) / F.lit(s)


def fround_sql(expr: str, nd: int = 4) -> str:
    # CAST the scale literal: Spark SQL parses bare `10000.0` as
    # DECIMAL (the DataFrame lit() parses double), which would keep
    # the whole expression decimal when the same SQL text runs on
    # Spark; DuckDB treats both forms as DOUBLE.
    s = float(10**nd)
    scale = f"CAST({s} AS DOUBLE)"
    return f"floor(({expr}) * {scale} + 0.5) / {scale}"


def dsum(col: Column | str, nd: int = 4) -> Column:
    """Order-independent rounded double sum (exact decimal internally)."""
    return fround(F.sum(_c(col).cast(_DEC)).cast("double"), nd)


def davg(col: Column | str, nd: int = 4) -> Column:
    """Order-independent, engine-deterministic rounded double average."""
    c = _c(col)
    return fround(F.sum(c.cast(_DEC)).cast("double") / F.count(c), nd)


def dsum_sql(expr: str, nd: int = 4) -> str:
    return fround_sql(f"CAST(sum(CAST(({expr}) AS DECIMAL(25,6))) AS DOUBLE)", nd)


def davg_sql(expr: str, nd: int = 4) -> str:
    return fround_sql(
        f"CAST(sum(CAST(({expr}) AS DECIMAL(25,6))) AS DOUBLE) / count({expr})", nd
    )
