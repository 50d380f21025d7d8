"""The local twin of the driver's correctness gate: every catalog entry
runs; oracle-checkable ones must match DuckDB exactly (row count +
column names + order-insensitive values); rows-only ones must produce a
stable schema and execute."""

from __future__ import annotations

import pytest

from exosql_spark.catalog import all_queries
from tests.conftest import assert_oracle_match

_QUERIES = all_queries()


@pytest.mark.parametrize("name", sorted(_QUERIES))
def test_catalog_entry(name, spark, duck, sf_dir):
    q = _QUERIES[name]
    df = q.fn(spark, sf_dir)
    assert df.schema.fields, f"{name}: empty schema"
    if q.oracle:
        assert_oracle_match(df, duck, q.oracle, name)
    else:
        n = df.count()
        assert n >= 0
