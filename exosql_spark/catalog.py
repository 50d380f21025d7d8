"""Query catalog — the single source of truth for operator coverage.

Every implemented operator from SURVEY.md §2 registers here with:
  - a Spark callable ``(spark, sf_dir) -> DataFrame``
  - an equivalent ANSI-SQL oracle string for DuckDB (or None for
    non-SQL-expressible ops → rows-only check)

``__spark_entry__.py``, ``tests/test_oracle.py`` and ``bench.py`` all
derive from this registry, so local tests exercise exactly the driver's
correctness gate.
"""

from __future__ import annotations

import importlib
from collections.abc import Callable
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]

# Modules that define catalog entries (imported lazily by all_queries()).
_QUERY_MODULES = (
    "exosql_spark.queries.core",
    "exosql_spark.queries.joins",
    "exosql_spark.queries.aggregates",
    "exosql_spark.queries.setops",
    "exosql_spark.queries.windows",
    "exosql_spark.queries.functions_q",
    "exosql_spark.queries.events_q",
    "exosql_spark.queries.llm_q",
    "exosql_spark.queries.sources_q",
    "exosql_spark.queries.udx_q",
    "exosql_spark.queries.extensions_q",
    "exosql_spark.queries.tpch_q",
)


@dataclass
class Query:
    name: str
    fn: QueryFn
    oracle: str | None
    doc: str = ""
    tags: tuple[str, ...] = field(default_factory=tuple)
    bench: bool = False  # include in bench.py headline set


_REGISTRY: dict[str, Query] = {}
_LOADED = False


def register(
    name: str,
    oracle: str | None = None,
    doc: str = "",
    tags: tuple[str, ...] = (),
    bench: bool = False,
) -> Callable[[QueryFn], QueryFn]:
    def deco(fn: QueryFn) -> QueryFn:
        if name in _REGISTRY:
            raise ValueError(f"duplicate catalog entry {name!r}")
        _REGISTRY[name] = Query(name, fn, oracle, doc or (fn.__doc__ or ""), tags, bench)
        return fn

    return deco


def _load() -> None:
    global _LOADED
    if not _LOADED:
        for mod in _QUERY_MODULES:
            importlib.import_module(mod)
        _LOADED = True


def all_queries() -> dict[str, Query]:
    _load()
    return dict(_REGISTRY)


def queries() -> dict[str, QueryFn]:
    return {name: q.fn for name, q in all_queries().items()}


def oracle_sql() -> dict[str, str]:
    return {name: q.oracle for name, q in all_queries().items() if q.oracle}


def bench_queries() -> dict[str, QueryFn]:
    return {name: q.fn for name, q in all_queries().items() if q.bench}
