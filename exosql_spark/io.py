"""Table loading over the driver-generated parquet testdata.

Mirrors the reference's extractor table-scan contract
(``lib/exosql/executor.ex :: execute/2`` ``:execute`` leaf → extractor
``execute(config, table, quals, columns)``): here the "extractor" is the
parquet source and quals/column pruning are Catalyst's predicate pushdown
and column pruning — verified in tests via ``plans.explain`` helpers.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from exosql_spark.session import ensure_session_confs

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)


# Session-scoped plan cache for load_table, stored as an attribute on the
# SparkSession object (the cache.py registry pattern: lifetime == session's,
# two sessions can't alias).  What is reused is the lazy DataFrame — i.e. the
# resolved scan METADATA (file listing + parquet footer schema), never data:
# every action on the returned frame still reads the parquet files.  A bench
# sweep calls load_table ~800 times (69 queries × 6 runs × 1-3 tables) and
# each uncached spark.read.parquet pays a driver-side listing + footer read
# + py4j round trips; at cluster scale the same reuse is what a catalog
# (HMS/Iceberg manifest cache — guide §6 "file listing") provides.
_TABLE_CACHE_ATTR = "_exosql_table_plans"


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Load one testdata table; normalizes the events nanosecond timestamp
    to a micro-precision timestamp_ntz (values are micro-aligned in the
    generated data, so this is lossless and matches the DuckDB oracle).

    The lazy frame is memoized per (session, sf_dir, table): DataFrames
    are immutable plans, so reuse is safe — actions recompute from the
    parquet input every time; only scan metadata is shared."""
    cache = getattr(spark, _TABLE_CACHE_ATTR, None)
    if cache is None:
        cache = {}
        setattr(spark, _TABLE_CACHE_ATTR, cache)
    key = (sf_dir, name)
    df = cache.get(key)
    if df is not None:
        return df
    ensure_session_confs(spark)
    df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
    if name == "events" and dict(df.dtypes).get("ts") == "bigint":
        df = df.withColumn(
            "ts", F.expr("cast(timestamp_micros(ts div 1000) as timestamp_ntz)")
        )
    cache[key] = df
    return df


class Tables:
    """Lazy per-query table accessor: ``t = Tables(spark, sf_dir);
    t.lineitem`` — avoids re-reading footers for unused tables."""

    def __init__(self, spark: SparkSession, sf_dir: str):
        self._spark = spark
        self._sf_dir = sf_dir
        self._cache: dict[str, DataFrame] = {}

    def __getattr__(self, name: str) -> DataFrame:
        if name.startswith("_"):
            raise AttributeError(name)
        if name not in TABLES:
            raise AttributeError(f"unknown table {name!r}")
        if name not in self._cache:
            self._cache[name] = load_table(self._spark, self._sf_dir, name)
        return self._cache[name]


def register_views(
    spark: SparkSession, sf_dir: str, names: tuple[str, ...] = TABLES
) -> None:
    """Register testdata tables as temp views (for the SQL API path)."""
    for n in names:
        load_table(spark, sf_dir, n).createOrReplaceTempView(n)
