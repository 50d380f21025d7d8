"""Skew-handling: salted two-stage aggregation and salted joins.

AQE's skew-join splitting (on in :mod:`exosql_spark.session`) covers
sort-merge joins at runtime; two cases still need explicit salting at
100 TB:

- **Heavy-hitter groupBy with high-cardinality state** (e.g.
  collect_list / count-distinct per key where one key holds 1% of the
  corpus): partial aggregation doesn't shrink the hot key's state, so
  its reducer OOMs. :func:`salted_agg` splits every key into
  ``n_salts`` subkeys (stage 1) and merges the partials (stage 2) —
  turning one hot reducer into ``n_salts`` even ones.
- **Broadcast-ineligible skewed equi-join**: :func:`salted_join`
  explodes the small side ``n_salts``× and salts the big side's key
  randomly, so the hot key's rows spread over ``n_salts`` tasks.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def salted_agg(
    df: DataFrame,
    keys: list[str],
    partial_aggs: list[Column],
    merge_aggs: list[Column],
    n_salts: int = 16,
) -> DataFrame:
    """Two-stage salted aggregation.

    ``partial_aggs`` aggregate within (key, salt); ``merge_aggs``
    combine the partials per key. Example — skew-proof count + sum:

        salted_agg(df, ["k"],
                   [F.count("*").alias("c"), F.sum("v").alias("s")],
                   [F.sum("c").alias("c"),   F.sum("s").alias("s")])
    """
    salted = df.withColumn(
        "_salt", (F.rand(seed=42) * n_salts).cast("int")
    )
    stage1 = salted.groupBy(*keys, "_salt").agg(*partial_aggs)
    return stage1.groupBy(*keys).agg(*merge_aggs)


def salted_join(
    big: DataFrame,
    small: DataFrame,
    on: str,
    n_salts: int = 8,
    how: str = "inner",
) -> DataFrame:
    """Skew-resistant equi-join: salt the big side's key randomly,
    replicate the small side across all salt values, join on
    (key, salt). Output columns = big ∪ small (minus the dup key)."""
    big_s = big.withColumn("_salt", (F.rand(seed=7) * n_salts).cast("int"))
    small_s = small.withColumn(
        "_salt", F.explode(F.sequence(F.lit(0), F.lit(n_salts - 1)))
    )
    out = big_s.join(small_s, [on, "_salt"], how)
    return out.drop("_salt")
