"""printf-style ``format()`` incl. dashboard ``%k`` SI suffix.

Reference: ``lib/exosql/format.ex :: ExoSQL.Format`` — C printf subset
(%d %s %f %.Nf) plus dashboard-isms (thousands separators, ``%k`` SI
suffix: 1234567 → "1.2M").

Spark-side: the C subset maps to native ``format_string`` (JVM). ``%k``
has no JVM builtin → pure-Column arithmetic construction (still no
Python row loop). ``_format_py`` is the row-level fallback registered as
a SQL UDF for the federation SQL path only.
"""

from __future__ import annotations

import re

from pyspark.sql import Column
from pyspark.sql import functions as F

from exosql_spark.queries._util import fround, fround_sql

_SI = [(1e12, "T"), (1e9, "G"), (1e6, "M"), (1e3, "k")]


def humanize_si(col: Column | str, decimals: int = 1) -> Column:
    """1234567 → '1.2M' — pure Column (chained when/otherwise).

    Conditions are wrapped smallest-threshold-first so the LARGEST
    threshold ends outermost (wrapping largest-first would make the
    'k' branch shadow everything above it); format_string keeps fixed
    notation (a double→string cast goes scientific ≥1e7).

    The value is pre-rounded with :func:`fround` (half-up on the binary
    double) so rendering is engine-deterministic: Java's ``%.1f`` rounds
    HALF_UP while C printf rounds half-even, and 2-decimal inputs land
    on exact .x5 ties routinely — pre-rounding removes every tie before
    either formatter sees it, which is what makes fn_humanize_si
    oracle-checkable against DuckDB."""
    c = F.col(col) if isinstance(col, str) else col
    c = c.cast("double")
    absc = F.abs(c)
    fmt = f"%.{decimals}f"
    expr = F.format_string(fmt, fround(c, decimals))
    for thresh, suffix in reversed(_SI):
        expr = F.when(
            absc >= thresh,
            F.concat(F.format_string(fmt, fround(c / thresh, decimals)), F.lit(suffix)),
        ).otherwise(expr)
    return expr


def humanize_si_sql(expr: str, decimals: int = 1) -> str:
    """DuckDB twin of :func:`humanize_si` (same pre-round, same printf)."""
    e = f"CAST(({expr}) AS DOUBLE)"
    fmt = f"%.{decimals}f"
    branches = "".join(
        f"WHEN abs({e}) >= {thresh:.0f} "
        f"THEN printf('{fmt}', {fround_sql(f'{e} / {thresh:.0f}', decimals)}) || '{suffix}' "
        for thresh, suffix in _SI
    )
    return f"(CASE {branches}ELSE printf('{fmt}', {fround_sql(e, decimals)}) END)"


def exo_format(fmt: str, *cols: Column) -> Column:
    """``format("%d apples: %k", n, revenue)`` → Column.

    C-subset specifiers compile to native format_string; ``%k`` args are
    pre-rendered with humanize_si and spliced as %s.
    """
    spec_re = re.compile(r"%[-+ 0-9.]*[dsfk]")
    out_fmt: list[str] = []
    out_cols: list[Column] = []
    last = 0
    idx = 0
    for m in spec_re.finditer(fmt):
        out_fmt.append(fmt[last : m.start()])
        spec = m.group(0)
        col = cols[idx]
        idx += 1
        if spec.endswith("k"):
            out_fmt.append("%s")
            out_cols.append(humanize_si(col))
        else:
            out_fmt.append(spec)
            # format_string %d needs an integral type
            out_cols.append(col.cast("long") if spec.endswith("d") else col)
        last = m.end()
    out_fmt.append(fmt[last:])
    return F.format_string("".join(out_fmt), *out_cols)


def _format_py(fmt: str, args: list) -> str:
    """Row-level Python fallback (SQL-registered UDF only)."""
    out = []
    spec_re = re.compile(r"%[-+ 0-9.]*[dsfk]")
    last = 0
    idx = 0
    for m in spec_re.finditer(fmt):
        out.append(fmt[last : m.start()])
        spec = m.group(0)
        v = args[idx]
        idx += 1
        if spec.endswith("k"):
            x = float(v)

            def _r1(v: float) -> float:  # half-up like fround (f-strings round half-even)
                import math

                return math.floor(v * 10 + 0.5) / 10

            for thresh, suffix in _SI:
                if abs(x) >= thresh:
                    out.append(f"{_r1(x / thresh):.1f}{suffix}")
                    break
            else:
                out.append(f"{_r1(x):.1f}")
        elif spec.endswith("d"):
            out.append(spec % int(float(v)))
        elif spec.endswith("f"):
            out.append(spec % float(v))
        else:
            out.append(spec % (v,))
        last = m.end()
    out.append(fmt[last:])
    return "".join(out)
