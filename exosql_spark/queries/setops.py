"""Set operations & distinct: UNION [ALL], DISTINCT, DISTINCT ON,
INTERSECT, EXCEPT.

SURVEY.md §2.7 rows U1–U4. Reference anchors:
``lib/exosql/executor.ex`` ``:union`` / ``:distinct`` clauses;
DISTINCT ON via ``uniq_by`` (U3 — Postgres-style first-row-per-key).

DISTINCT ON has no native Spark equivalent; we desugar to
``row_number() over (partition by keys order by ...) = 1`` — the window
pattern from SURVEY.md §7. At scale this is one shuffle on the partition
keys (same cost as any grouped dedup).
"""

from __future__ import annotations

from pyspark.sql import Window as W
from pyspark.sql import functions as F

from exosql_spark.catalog import register
from exosql_spark.io import Tables


@register(
    "union_all",
    oracle="""
SELECT c_name AS name, 'customer' AS kind FROM customer
UNION ALL
SELECT s_name AS name, 'supplier' AS kind FROM supplier
""",
    tags=("setop",),
)
def union_all(spark, sf_dir):
    t = Tables(spark, sf_dir)
    c = t.customer.select(F.col("c_name").alias("name"), F.lit("customer").alias("kind"))
    s = t.supplier.select(F.col("s_name").alias("name"), F.lit("supplier").alias("kind"))
    return c.unionAll(s)


# ANSI UNION (dedup), INTERSECT and EXCEPT moved into the single
# consolidated setops_all_variants entry (extensions_q.py) under the
# round-14 window-capacity policy — the reference's plain UNION
# behaves as UNION ALL (SURVEY §2.7 U1 verify-note), which union_all
# above still covers standalone.


@register(
    "select_distinct",
    oracle="SELECT DISTINCT c_mktsegment, c_nationkey FROM customer",
    tags=("setop",),
)
def select_distinct(spark, sf_dir):
    t = Tables(spark, sf_dir)
    return t.customer.select("c_mktsegment", "c_nationkey").distinct()


@register(
    "distinct_on",
    oracle="""
SELECT DISTINCT ON (o_custkey) o_custkey, o_orderkey, o_totalprice
FROM orders
ORDER BY o_custkey, o_orderdate DESC, o_orderkey DESC
""",
    tags=("setop", "window"),
)
def distinct_on(spark, sf_dir):
    """DISTINCT ON (U3): latest order per customer, deterministic
    tie-break on o_orderkey. Window row_number desugar."""
    t = Tables(spark, sf_dir)
    w = W.partitionBy("o_custkey").orderBy(
        F.col("o_orderdate").desc(), F.col("o_orderkey").desc()
    )
    return (
        t.orders.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .select("o_custkey", "o_orderkey", "o_totalprice")
    )


