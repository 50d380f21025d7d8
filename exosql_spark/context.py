"""Federation API — the exosql entry-point surface on Spark.

Reference surface (``lib/exosql.ex``):
  - ``ExoSQL.query(sql, context)``   → :func:`query`
  - ``ExoSQL.explain(sql, context)`` → :func:`explain`
  - ``ExoSQL.format_result(result)`` → :func:`format_result`
  - ``ExoSQL.parse/2`` + re-execute with different ``__vars__``
    → :meth:`Context.sql` with ``vars`` (parameterized re-run; Spark
    caches the parsed/analyzed plan internally).

The reference *context* is a map ``%{"db" => {ExtractorModule, opts}}``
(``lib/exosql/parser.ex :: real_parse/2`` resolves ``db.table`` against
extractor ``schema/1,2`` callbacks). Here a context maps database names to
source specs; each source registers its tables as temp views named
``db_table`` (exosql's ``db.table`` is rewritten to ``db_table`` by a
conservative identifier rewrite so the same queries run on Spark SQL).

Variables: exosql resolves ``$name`` placeholders from the context key
``"__vars__"`` (``lib/exosql/expr.ex :: run_expr`` ``{:var, name}``).
We bind them via Spark's parameterized SQL (named-parameter markers).
"""

from __future__ import annotations

import re
from dataclasses import dataclass
from typing import Any

from pyspark.sql import DataFrame, SparkSession

from exosql_spark.sources import resolve_source


@dataclass
class _RegisteredDB:
    name: str
    tables: dict[str, DataFrame]


class Context:
    """Maps db names → pluggable sources, mirroring exosql's context map.

    spec forms (see :mod:`exosql_spark.sources`):
      {"csv": "/path/to/dir"}                → CSV directory (S2)
      {"parquet": "/path/to/dir"}            → parquet directory of tables
      {"env": True}                          → OS environment table (S3)
      {"tables": {"name": DataFrame}}        → pre-built DataFrames
      {"http": {...}} / callable             → custom sources
    """

    def __init__(self, spark: SparkSession, databases: dict[str, Any] | None = None):
        self.spark = spark
        self._dbs: dict[str, _RegisteredDB] = {}
        for name, spec in (databases or {}).items():
            self.add_database(name, spec)

    def add_database(self, name: str, spec: Any) -> None:
        tables = resolve_source(self.spark, spec)
        for tname, df in tables.items():
            df.createOrReplaceTempView(f"{name}_{tname}")
        self._dbs[name] = _RegisteredDB(name, tables)

    def table_names(self) -> list[str]:
        return [
            f"{db.name}.{t}" for db in self._dbs.values() for t in db.tables
        ]

    def table(self, db: str, name: str) -> DataFrame:
        return self._dbs[db].tables[name]

    # -- query path ---------------------------------------------------

    def _rewrite(self, sql: str) -> str:
        """Rewrite the exosql dialect to Spark SQL: ``db.table`` refs →
        ``db_table`` views, ``$var`` → ``:var`` named parameters, plus
        the compat rewrites in :mod:`exosql_spark.dialect` (strftime /
        jp / to_datetime literal forms, DISTINCT ON desugar)."""
        from exosql_spark.dialect import rewrite as dialect_rewrite

        out = sql
        for db in self._dbs.values():
            for t in db.tables:
                out = re.sub(
                    rf"\b{re.escape(db.name)}\.{re.escape(t)}\b",
                    f"{db.name}_{t}",
                    out,
                )
        # $var → :var (named parameter marker), skip $$ escapes
        out = re.sub(r"\$([A-Za-z_][A-Za-z_0-9]*)", r":\1", out)
        return dialect_rewrite(out)

    def sql(self, sql: str, vars: dict[str, Any] | None = None) -> DataFrame:
        rewritten = self._rewrite(sql)
        if vars:
            return self.spark.sql(rewritten, args=vars)
        return self.spark.sql(rewritten)

    def explain(self, sql: str, vars: dict[str, Any] | None = None) -> str:
        df = self.sql(sql, vars)
        return df._jdf.queryExecution().explainString(
            self.spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
                "formatted"
            )
        )


def query(
    spark: SparkSession,
    sql: str,
    context: dict[str, Any] | Context | None = None,
    vars: dict[str, Any] | None = None,
) -> DataFrame:
    """``ExoSQL.query(sql, context)`` equivalent; returns a DataFrame
    (lazy — the reference returned fully-materialized rows; callers
    ``.collect()`` at the edge if they need that)."""
    ctx = context if isinstance(context, Context) else Context(spark, context or {})
    return ctx.sql(sql, vars)


def explain(
    spark: SparkSession,
    sql: str,
    context: dict[str, Any] | Context | None = None,
    vars: dict[str, Any] | None = None,
) -> str:
    """``ExoSQL.explain/2`` equivalent (formatted physical plan — strictly
    more informative than the reference's logical-tree pretty-print)."""
    ctx = context if isinstance(context, Context) else Context(spark, context or {})
    return ctx.explain(sql, vars)


def format_result(df: DataFrame, n: int = 100) -> str:
    """``ExoSQL.format_result/1`` equivalent — ASCII table of the first n
    rows (driver-side; for interactive/dashboard use only)."""
    return df._show_string(n, 0, False)


@dataclass
class Result:
    """``%ExoSQL.Result{columns, rows}`` parity shape
    (``lib/exosql/result.ex``): column names + row-oriented values.
    Only materialize at the API edge — everything upstream stays a
    lazy DataFrame."""

    columns: list[str]
    rows: list[list[Any]]

    def __len__(self) -> int:
        return len(self.rows)


def to_result(df: DataFrame, limit: int | None = None) -> Result:
    """Materialize a DataFrame into the reference's Result shape.
    ``limit`` guards accidental full-table driver collects."""
    if limit is not None:
        df = df.limit(limit)
    return Result(columns=list(df.columns), rows=[list(r) for r in df.collect()])
