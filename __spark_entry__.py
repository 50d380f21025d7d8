"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs each
``queries()[name]`` at sf=0.01 and compares it against the matching
``oracle_sql()[name]`` via DuckDB (row-count + schema + order-insensitive
value-hash → CORRECTNESS_r{N}.json).

Everything derives from the catalog in :mod:`exosql_spark.catalog` —
one registered entry per implemented operator from SURVEY.md §2 (plus
the beyond-reference streaming/LLM-pipeline extensions). Tests
(tests/test_oracle.py) exercise exactly this contract locally.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from exosql_spark import catalog
from exosql_spark.session import ensure_session_confs

SF0001 = "/root/testdata/sf0.001"


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query (TPC-H-Q1-style pricing summary) on sf0.001."""
    ensure_session_confs(spark)
    from exosql_spark.queries.core import q1_pricing_summary

    return q1_pricing_summary(spark, SF0001)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return catalog.queries()


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable ANSI SQL twin for every oracle-checkable entry."""
    return catalog.oracle_sql()
