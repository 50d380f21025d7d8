"""Pluggable sources — the Spark equivalent of exosql extractors.

Reference extractor behavior (callbacks ``schema/1``, ``schema/2``,
``execute(config, table, quals, columns)``):
  - CSV dir extractor: ``lib/exosql/csv.ex :: ExoSQL.Csv`` (S2)
  - Env extractor:     ``lib/exosql/env.ex :: ExoSQL.Env`` (S3)
  - Node extractor:    ``lib/exosql/node.ex :: ExoSQL.Node`` (S4)
  - HTTP extractor:    (S5, lower confidence in reference)

Qual pushdown + column pruning (the reference planner's work,
``lib/exosql/planner.ex :: plan/1``) are Catalyst built-ins for the file
sources; the HTTP source documents where manual ``pushFilters`` would go
in a Python DataSource connector.
"""

from __future__ import annotations

import glob
import os
from collections.abc import Callable
from typing import Any

from pyspark.sql import DataFrame, SparkSession


def csv_dir(spark: SparkSession, path: str, infer_schema: bool = True) -> dict[str, DataFrame]:
    """Directory of ``*.csv`` = database; file stem = table; header row =
    columns. With ``infer_schema=False`` reproduces the reference's
    all-values-are-strings model (``lib/exosql/csv.ex``) for coercion
    compat tests."""
    tables = {}
    for f in sorted(glob.glob(os.path.join(path, "*.csv"))):
        name = os.path.splitext(os.path.basename(f))[0]
        tables[name] = (
            spark.read.option("header", "true")
            .option("inferSchema", str(infer_schema).lower())
            .csv(f)
        )
    return tables


def parquet_dir(spark: SparkSession, path: str) -> dict[str, DataFrame]:
    """Directory of ``*.parquet`` = database (the testdata layout)."""
    from exosql_spark.io import load_table

    tables = {}
    for f in sorted(glob.glob(os.path.join(path, "*.parquet"))):
        name = os.path.splitext(os.path.basename(f))[0]
        tables[name] = load_table(spark, path, name)
    return tables


def env_table(spark: SparkSession) -> dict[str, DataFrame]:
    """OS environment variables as a (key, value) table — tiny,
    driver-side by nature (matches ``lib/exosql/env.ex``)."""
    rows = [(k, v) for k, v in sorted(os.environ.items())]
    return {"env": spark.createDataFrame(rows, "key string, value string")}


def http_source(spark: SparkSession, spec: dict[str, Any]) -> dict[str, DataFrame]:
    """HTTP-API-as-table (S5). The container has no network access, so the
    fetch is stubbed; the Spark-side plumbing (schema declaration, one
    partition per URL shard, JSON row parsing) is the real pattern for a
    Python DataSource connector with manual filter pushdown."""
    raise NotImplementedError(
        "HTTP extractor requires network access; wire `requests.get` into "
        "a Python DataSource (pyspark.sql.datasource.DataSource) here."
    )


def resolve_source(spark: SparkSession, spec: Any) -> dict[str, DataFrame]:
    """Resolve a context source spec to {table_name: DataFrame}."""
    if callable(spec):
        out = spec(spark)
        if not isinstance(out, dict):
            raise TypeError("callable source spec must return {name: DataFrame}")
        return out
    if isinstance(spec, dict):
        if "csv" in spec:
            return csv_dir(spark, spec["csv"], spec.get("infer_schema", True))
        if "parquet" in spec:
            return parquet_dir(spark, spec["parquet"])
        if spec.get("env"):
            return env_table(spark)
        if "http" in spec:
            return http_source(spark, spec["http"])
        if "tables" in spec:
            return dict(spec["tables"])
    raise ValueError(f"unrecognized source spec: {spec!r}")
