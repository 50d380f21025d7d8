"""User-defined function surface: scalar pandas UDFs, grouped-agg
pandas UDFs (UDAF), and Python UDTFs.

The reference has NO user-facing UDF registration (SURVEY.md §2.10 —
builtins are compile-time Elixir functions in ``ExoSQL.Builtins``;
extending means editing that module). Spark gives a public,
runtime-registerable surface; this module demonstrates each kind with
the idiomatic fast path:

- scalar: ``@pandas_udf`` — Arrow-batched, vectorized numpy inside
  (~10-100× row-at-a-time Python UDFs; still slower than JVM builtins,
  so only for logic Columns can't express).
- aggregate: ``@pandas_udf`` GROUPED_AGG over ``groupBy().agg()``.
- table function: ``@udtf`` (Spark 3.5+) with ``analyze``-free static
  schema; lateral-joinable from SQL.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from pyspark.sql import SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.functions import pandas_udf, udtf


# -- scalar pandas UDF ------------------------------------------------


@pandas_udf(T.DoubleType())
def gini_normalize(v: pd.Series) -> pd.Series:
    """Example vectorized scalar: rank-normalize a numeric column to
    [0,1] within each Arrow batch (cheap feature scaling)."""
    r = v.rank(method="average")
    n = max(len(v), 1)
    return (r - 1) / max(n - 1, 1)


def rank_normalize_grouped(
    df, group_col: str, value_col: str, out_col: str = "rank_norm"
):
    """Deterministic rank-normalization to [0,1] *within each group* via
    ``applyInPandas`` (Arrow-batched pandas per group — the vectorized
    UDX path, but partition-independent so it is oracle-checkable:
    pandas ``rank(method='average')`` ≡ SQL
    ``rank() + (ties-1)/2``). One shuffle on the group key; each group
    must fit one executor's memory — same envelope as any grouped
    pandas UDF."""
    out_schema = T.StructType(
        list(df.schema.fields) + [T.StructField(out_col, T.DoubleType())]
    )

    def _norm(pdf: pd.DataFrame) -> pd.DataFrame:
        r = pdf[value_col].rank(method="average")
        n = max(len(pdf), 1)
        pdf[out_col] = (r - 1) / max(n - 1, 1)
        return pdf

    return df.groupBy(group_col).applyInPandas(_norm, schema=out_schema)


# -- grouped-agg pandas UDF (UDAF) ------------------------------------


@pandas_udf(T.DoubleType())
def weighted_avg(v: pd.Series, w: pd.Series) -> float:
    """UDAF: Σ(v·w)/Σ(w) — numpy inside, one value per group."""
    ws = float(np.sum(w))
    return float(np.sum(v * w) / ws) if ws else float("nan")


@pandas_udf(T.DoubleType())
def p90(v: pd.Series) -> float:
    """UDAF: 90th percentile (linear interpolation, numpy)."""
    return float(np.percentile(v, 90)) if len(v) else float("nan")


# -- Python UDTF ------------------------------------------------------


@udtf(returnType="token string, pos int")
class SplitWords:
    """Table function: one row per whitespace token with its position —
    SQL: ``SELECT s.* FROM t, LATERAL split_words(t.text) s``."""

    def eval(self, text: str):
        if text:
            for i, tok in enumerate(text.split()):
                yield tok, i


def register_all(spark: SparkSession) -> None:
    """Expose the UDX surface to SQL (the public registration story the
    reference lacks)."""
    spark.udf.register("gini_normalize", gini_normalize)
    spark.udf.register("weighted_avg", weighted_avg)
    spark.udf.register("p90_agg", p90)
    spark.udtf.register("split_words", SplitWords)
