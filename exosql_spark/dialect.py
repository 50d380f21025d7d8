"""exosql SQL-dialect compatibility rewrites.

The reference parses its own SQL dialect (leex/yecc grammar in
``src/``); Spark SQL covers almost all of it natively, but a few forms
need textual rewriting before ``spark.sql`` sees them. The rewrites
are conservative and literal-argument based — they only fire on
patterns Spark would otherwise reject or misinterpret:

- ``db.table`` → registered view names (done in :mod:`context`).
- ``$var`` → ``:var`` named parameters (done in :mod:`context`).
- ``strftime(x, '<c-pattern>')`` → ``date_format(x, '<java-pattern>')``
  (literal pattern translated at rewrite time — stays JVM-native,
  no UDF).
- ``jp(x, '/a/b/0')`` → ``get_json_object(x, '$.a.b[0]')``.
- ``to_datetime(x)`` / ``to_datetime(x, '<duration>')`` → timestamp
  dispatch + interval arithmetic.
- ``SELECT DISTINCT ON (keys) …`` (Postgres-style, used by the
  reference — SURVEY.md §2.7 U3) → window ``row_number`` desugar.
  Top-level queries only; ORDER BY must start with the DISTINCT ON
  keys (the Postgres rule).
"""

from __future__ import annotations

import re

from exosql_spark.functions.datetime_compat import parse_duration, strftime_to_java
from exosql_spark.functions.json_compat import jp_to_jsonpath

_STRFTIME_RE = re.compile(r"\bstrftime\s*\(([^,()]+(?:\([^()]*\))?[^,()]*),\s*'([^']*)'\s*\)", re.IGNORECASE)
_JP_RE = re.compile(r"\bjp\s*\(([^,()]+(?:\([^()]*\))?[^,()]*),\s*'([^']*)'\s*\)", re.IGNORECASE)
_TODT_MOD_RE = re.compile(
    r"\bto_datetime\s*\(([^,()]+(?:\([^()]*\))?[^,()]*),\s*'([^']*)'\s*\)", re.IGNORECASE
)
_TODT_RE = re.compile(r"\bto_datetime\s*\(([^,()]+(?:\([^()]*\))?[^,()]*)\)", re.IGNORECASE)


def _duration_to_interval_sql(dur: str) -> str:
    u = parse_duration(dur)
    parts = []
    for unit, name in (
        ("Y", "YEAR"), ("M", "MONTH"), ("w", "WEEK"), ("d", "DAY"),
        ("h", "HOUR"), ("m", "MINUTE"), ("s", "SECOND"),
    ):
        if u[unit]:
            parts.append(f"INTERVAL '{u[unit]}' {name}")
    return " + ".join(parts) if parts else "INTERVAL '0' SECOND"


def _todt_base(arg: str) -> str:
    """Numeric-looking values are epoch seconds, else timestamp cast —
    the reference's dynamic dispatch (builtins.ex to_datetime/1)."""
    a = arg.strip()
    return (
        f"coalesce(timestamp_seconds(try_cast(cast(({a}) AS string) AS double)), "
        f"try_cast(cast(({a}) AS string) AS timestamp))"
    )


def _sq(s: str) -> str:
    """Escape a string for splicing inside a SQL single-quoted literal
    (Java patterns quote literal text with single quotes)."""
    return s.replace("'", "''")


def rewrite_functions(sql: str) -> str:
    """Rewrite literal-argument compat functions to native Spark SQL."""
    sql = _STRFTIME_RE.sub(
        lambda m: f"date_format({m.group(1)}, '{_sq(strftime_to_java(m.group(2)))}')",
        sql,
    )
    sql = _JP_RE.sub(
        lambda m: f"get_json_object({m.group(1)}, '{_sq(jp_to_jsonpath(m.group(2)))}')",
        sql,
    )
    sql = _TODT_MOD_RE.sub(
        lambda m: f"({_todt_base(m.group(1))} + {_duration_to_interval_sql(m.group(2))})",
        sql,
    )
    sql = _TODT_RE.sub(lambda m: f"({_todt_base(m.group(1))})", sql)
    return sql


_DISTINCT_ON_RE = re.compile(
    r"^\s*SELECT\s+DISTINCT\s+ON\s*\(([^)]*)\)\s*(.*)$",
    re.IGNORECASE | re.DOTALL,
)


def _split_top_level(sql: str, keyword: str) -> tuple[str, str | None]:
    """Split off a trailing top-level clause (ORDER BY / LIMIT) —
    paren-depth aware, last occurrence wins."""
    depth = 0
    low = sql.lower()
    kw = keyword.lower()
    pos = None
    i = 0
    while i < len(sql):
        c = sql[i]
        if c == "(":
            depth += 1
        elif c == ")":
            depth -= 1
        elif depth == 0 and low.startswith(kw, i):
            pos = i
        i += 1
    if pos is None:
        return sql, None
    return sql[:pos].rstrip(), sql[pos + len(kw):].strip()


def rewrite_distinct_on(sql: str) -> str:
    """Desugar top-level ``SELECT DISTINCT ON (keys) sel FROM rest
    [ORDER BY o] [LIMIT n]`` into the row_number window pattern."""
    m = _DISTINCT_ON_RE.match(sql)
    if not m:
        return sql
    keys = m.group(1).strip()
    body = m.group(2)
    body, limit = _split_top_level(body, "limit")
    body, order = _split_top_level(body, "order by")
    # first top-level FROM (paren-depth aware, case-insensitive)
    depth, from_pos = 0, None
    low = body.lower()
    for i, c in enumerate(body):
        if c == "(":
            depth += 1
        elif c == ")":
            depth -= 1
        elif depth == 0 and low.startswith("from", i) and (
            i == 0 or not body[i - 1].isalnum()
        ) and (
            i + 4 >= len(body) or not body[i + 4].isalnum()
        ):
            from_pos = i
            break
    if from_pos is None:
        return sql  # can't parse — leave for Spark to error on
    sel, rest = body[:from_pos], body[from_pos + 4:]
    order_sql = order if order else keys
    out = (
        f"SELECT {sel.strip()} FROM ("
        f"SELECT *, row_number() OVER (PARTITION BY {keys} ORDER BY {order_sql}) AS __exo_rn "
        f"FROM {rest.strip()}"
        f") WHERE __exo_rn = 1"
    )
    if order:
        out += f" ORDER BY {order}"
    if limit:
        out += f" LIMIT {limit}"
    return out


def rewrite(sql: str) -> str:
    return rewrite_distinct_on(rewrite_functions(sql))
