"""Dynamic-typing compat: exosql's implicit string↔number coercion.

Reference: ``lib/exosql/utils.ex :: ExoSQL.Utils.to_number/1,
to_float/1`` and the arithmetic clauses of
``lib/exosql/expr.ex :: run_expr/2`` — ``"1" + 2 → 3``; comparisons try
numeric compare first, fall back to string compare. The CSV extractor
yields all values as strings and queries still do math on them.

Spark is statically typed; we reproduce the *behavior* with try_cast
chains (ANSI-safe: no exceptions, null on failure) — pure Column
expressions, whole-stage-codegen eligible.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def to_number(col: Column | str) -> Column:
    """String → long if integral, else double, else null (mirrors
    Utils.to_number's int-first parse)."""
    c = F.col(col) if isinstance(col, str) else col
    s = c.cast("string")
    as_long = s.try_cast("long")
    as_double = s.try_cast("double")
    return F.when(as_long.isNotNull(), as_long.cast("double")).otherwise(as_double)


def exo_add(a: Column, b: Column) -> Column:
    """``+`` with dynamic coercion: numeric add when both sides parse."""
    return to_number(a) + to_number(b)


def exo_compare(a: Column, b: Column) -> Column:
    """Three-way compare (-1/0/1): numeric when both parse, else string
    (mirrors the reference's compare fallback chain)."""
    an, bn = to_number(a), to_number(b)
    a_s, b_s = a.cast("string"), b.cast("string")
    num_cmp = F.when(an < bn, -1).when(an > bn, 1).otherwise(0)
    str_cmp = F.when(a_s < b_s, -1).when(a_s > b_s, 1).otherwise(0)
    return F.when(an.isNotNull() & bn.isNotNull(), num_cmp).otherwise(str_cmp)
