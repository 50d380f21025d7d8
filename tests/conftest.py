"""Shared fixtures: one Spark session per test run + the DuckDB oracle
comparator that mirrors the driver's correctness gate (row-count +
schema-name + order-insensitive value comparison, columns sorted by
name)."""

from __future__ import annotations

import math
import os

import duckdb
import pandas as pd
import pytest

from exosql_spark.io import TABLES
from exosql_spark.session import get_spark

SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")


@pytest.fixture(scope="session")
def spark():
    s = get_spark(app_name="exosql_spark_tests", cores=int(os.environ.get("SPARK_GRAFT_CPUS", "8")))
    yield s
    s.stop()


@pytest.fixture(scope="session")
def sf_dir() -> str:
    return SF_DIR


@pytest.fixture(scope="session")
def duck():
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{SF_DIR}/{t}.parquet'"
        )
    yield con
    con.close()


def _canon(df: pd.DataFrame) -> pd.DataFrame:
    """Columns sorted by name, rows sorted by stringified values —
    order-insensitive canonical form (like the driver's value-hash)."""
    out = df[sorted(df.columns)].copy()
    if out.empty:
        return out.reset_index(drop=True)
    key = out.astype(str).agg("\x1f".join, axis=1)
    return out.loc[key.sort_values(kind="mergesort").index].reset_index(drop=True)


def _cell_eq(a, b) -> bool:
    if a is None and b is None:
        return True
    if isinstance(a, float) or isinstance(b, float):
        try:
            fa, fb = float(a), float(b)
        except (TypeError, ValueError):
            return str(a) == str(b)
        if math.isnan(fa) and math.isnan(fb):
            return True
        return fa == fb  # exact — mirrors the driver's value-hash
    if pd.isna(a) and pd.isna(b):
        return True
    return a == b or str(a) == str(b)


def assert_oracle_match(spark_df, duck_con, oracle: str, name: str = "?") -> None:
    """Assert the Spark result matches the DuckDB oracle result the way
    the driver does."""
    sp = spark_df.toPandas()
    du = duck_con.execute(oracle).df()
    assert sorted(sp.columns) == sorted(du.columns), (
        f"{name}: column names differ: spark={sorted(sp.columns)} "
        f"duck={sorted(du.columns)}"
    )
    assert len(sp) == len(du), f"{name}: row count {len(sp)} != {len(du)}"
    a, b = _canon(sp), _canon(du)
    for col in a.columns:
        av, bv = a[col].tolist(), b[col].tolist()
        bad = [
            (i, x, y) for i, (x, y) in enumerate(zip(av, bv)) if not _cell_eq(x, y)
        ]
        assert not bad, (
            f"{name}: column {col!r} differs at {len(bad)} rows; "
            f"first: idx={bad[0][0]} spark={bad[0][1]!r} duck={bad[0][2]!r}"
        )
    # strict string-level hash (the driver's comparator stringifies —
    # a dtype drift like decimal-vs-double or hugeint-vs-bigint makes
    # equal values render differently)
    sa = a.astype(str)
    sb = b.astype(str)
    diff_cols = [c for c in sa.columns if not sa[c].equals(sb[c])]
    assert not diff_cols, (
        f"{name}: value-equal but string-rendering differs in {diff_cols} "
        f"(dtype drift: spark={[str(sp[c].dtype) for c in diff_cols]} "
        f"duck={[str(du[c].dtype) for c in diff_cols]})"
    )
