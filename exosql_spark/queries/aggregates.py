"""Aggregation: GROUP BY, whole-table agg, count/count-distinct,
sum/avg/min/max, HAVING, collect, rollup/cube (extension).

SURVEY.md §2.4 rows A1–A8. Reference anchors:
``lib/exosql/executor.ex :: execute`` ``:group_by`` / ``:table_to_row``
clauses; ``lib/exosql/builtins.ex`` aggregate section.

Scale notes: all of these are partial+final hash aggregations (map-side
combine) in Spark — the reference materializes every group's rows in a
single process. count(DISTINCT) at 100 TB should usually be
approx_count_distinct (exposed as a separate entry, rows-only check since
HLL values differ across engines).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from exosql_spark.catalog import register
from exosql_spark.io import Tables
from exosql_spark.queries import _util as _u


@register(
    "group_by_having",
    oracle="""
SELECT l_suppkey,
       count(*) AS n_items,
       floor((CAST(sum(CAST((l_extendedprice) AS DECIMAL(25,6))) AS DOUBLE)) * 10000.0 + 0.5) / 10000.0 AS total_price,
       floor((CAST(sum(CAST((l_quantity) AS DECIMAL(25,6))) AS DOUBLE) / count(l_quantity)) * 10000.0 + 0.5) / 10000.0 AS avg_qty,
       round(min(l_discount), 4) AS min_disc,
       round(max(l_discount), 4) AS max_disc
FROM lineitem
GROUP BY l_suppkey
HAVING count(*) > 50 AND sum(l_extendedprice) > 100000
""",
    tags=("agg",),
    bench=True,
)
def group_by_having(spark, sf_dir):
    """GROUP BY with HAVING over aggregates (A1, A5, A6)."""
    t = Tables(spark, sf_dir)
    return (
        t.lineitem.groupBy("l_suppkey")
        .agg(
            F.count(F.lit(1)).alias("n_items"),
            _u.dsum("l_extendedprice").alias("total_price"),
            _u.davg("l_quantity").alias("avg_qty"),
            F.round(F.min("l_discount"), 4).alias("min_disc"),
            F.round(F.max("l_discount"), 4).alias("max_disc"),
            F.sum("l_extendedprice").alias("_raw_total"),
        )
        .filter((F.col("n_items") > 50) & (F.col("_raw_total") > 100000))
        .drop("_raw_total")
    )


@register(
    "agg_whole_table",
    oracle="""
SELECT count(*) AS n_rows,
       count(DISTINCT l_orderkey) AS n_orders,
       floor((CAST(sum(CAST((l_quantity) AS DECIMAL(25,6))) AS DOUBLE)) * 10000.0 + 0.5) / 10000.0 AS sum_qty,
       floor((CAST(sum(CAST((l_extendedprice) AS DECIMAL(25,6))) AS DOUBLE) / count(l_extendedprice)) * 10000.0 + 0.5) / 10000.0 AS avg_price,
       round(min(l_extendedprice), 4) AS min_price,
       round(max(l_extendedprice), 4) AS max_price
FROM lineitem
""",
    tags=("agg",),
)
def agg_whole_table(spark, sf_dir):
    """Aggregates without GROUP BY → single row (A2, A3, A4, A5)."""
    t = Tables(spark, sf_dir)
    return t.lineitem.agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.countDistinct("l_orderkey").alias("n_orders"),
        _u.dsum("l_quantity").alias("sum_qty"),
        _u.davg("l_extendedprice").alias("avg_price"),
        F.round(F.min("l_extendedprice"), 4).alias("min_price"),
        F.round(F.max("l_extendedprice"), 4).alias("max_price"),
    )


@register(
    "count_distinct_grouped",
    oracle="""
SELECT l_returnflag,
       count(DISTINCT l_suppkey) AS n_suppliers,
       count(l_comment_missing) AS n_nonnull
FROM (SELECT l_returnflag, l_suppkey,
             CASE WHEN l_discount > 0.05 THEN l_suppkey END AS l_comment_missing
      FROM lineitem) t
GROUP BY l_returnflag
""",
    tags=("agg",),
)
def count_distinct_grouped(spark, sf_dir):
    """count(DISTINCT) per group + count(expr) null-skipping (A3, A4)."""
    t = Tables(spark, sf_dir)
    base = t.lineitem.select(
        "l_returnflag",
        "l_suppkey",
        F.when(F.col("l_discount") > 0.05, F.col("l_suppkey")).alias(
            "l_comment_missing"
        ),
    )
    return base.groupBy("l_returnflag").agg(
        F.countDistinct("l_suppkey").alias("n_suppliers"),
        F.count("l_comment_missing").alias("n_nonnull"),
    )


@register(
    "approx_count_distinct",
    oracle=None,  # HLL±± and DuckDB's HLL use different register
    # layouts/hashes — estimates differ legitimately; relative-error
    # bound vs exact count(DISTINCT) is asserted locally
    tags=("agg", "scale"),
)
def approx_count_distinct(spark, sf_dir):
    """The 100 TB-scale variant of A4: HyperLogLog++ distinct count.
    rsd=0.02; a single pass, no shuffle of distinct values."""
    t = Tables(spark, sf_dir)
    return t.lineitem.groupBy("l_returnflag").agg(
        F.approx_count_distinct("l_partkey", 0.02).alias("approx_parts")
    )


@register(
    "array_agg_collect",
    oracle="""
SELECT l_orderkey,
       array_to_string(list_sort(list(l_linenumber)), ',') AS line_numbers
FROM lineitem
WHERE l_orderkey <= 64
GROUP BY l_orderkey
""",
    tags=("agg",),
)
def array_agg_collect(spark, sf_dir):
    """collect_list / array_agg (A8), sorted + stringified on both sides
    so the hash is order-stable."""
    t = Tables(spark, sf_dir)
    return (
        t.lineitem.filter(F.col("l_orderkey") <= 64)
        .groupBy("l_orderkey")
        .agg(
            F.concat_ws(",", F.sort_array(F.collect_list("l_linenumber"))).alias(
                "line_numbers"
            )
        )
    )


@register(
    "agg_grouping_multi_suite",
    oracle="""
SELECT 'rollup' AS variant, l_returnflag AS k1, l_linestatus AS k2,
       count(*) AS n,
       floor((CAST(sum(CAST((l_quantity) AS DECIMAL(25,6))) AS DOUBLE)) * 10000.0 + 0.5) / 10000.0 AS sum_qty,
       CAST(NULL AS INTEGER) AS g_k1, CAST(NULL AS INTEGER) AS g_k2
FROM lineitem
GROUP BY ROLLUP (l_returnflag, l_linestatus)
UNION ALL
SELECT 'cube', o_orderstatus, o_orderpriority, count(*),
       CAST(NULL AS DOUBLE), CAST(NULL AS INTEGER), CAST(NULL AS INTEGER)
FROM orders
GROUP BY CUBE (o_orderstatus, o_orderpriority)
UNION ALL
SELECT 'grouping_sets', o_orderstatus, o_orderpriority, count(*),
       CAST(NULL AS DOUBLE),
       CAST(grouping(o_orderstatus) AS INTEGER),
       CAST(grouping(o_orderpriority) AS INTEGER)
FROM orders
GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
""",
    tags=("agg", "extension"),
)
def agg_grouping_multi_suite(spark, sf_dir):
    """The whole multi-grouping surface (A7 — absent in the
    reference, free in Spark) as tagged variants, r15 window-capacity
    consolidation of rollup_extension / cube_extension /
    grouping_sets with every original column preserved (``k1``/``k2``
    are each variant's two grouping dims; ``sum_qty`` is the rollup
    variant's decimal-exact quantity subtotal; ``g_k1``/``g_k2`` are
    the grouping() markers of the GROUPING SETS variant):

    - ``rollup``: ROLLUP subtotals over lineitem (returnflag,
      linestatus) with the order-independent dsum convention;
    - ``cube``: CUBE over two orders dims;
    - ``grouping_sets``: explicit GROUPING SETS with grouping()
      null-vs-grouped markers, via SparkSQL.

    Each variant is one expand+aggregate (map-side combined); the
    union adds no exchange."""
    t = Tables(spark, sf_dir)
    rollup = t.lineitem.rollup("l_returnflag", "l_linestatus").agg(
        _u.dsum("l_quantity").alias("sum_qty"),
        F.count(F.lit(1)).alias("n"),
    ).select(
        F.lit("rollup").alias("variant"),
        F.col("l_returnflag").alias("k1"),
        F.col("l_linestatus").alias("k2"),
        "n",
        "sum_qty",
        F.lit(None).cast("int").alias("g_k1"),
        F.lit(None).cast("int").alias("g_k2"),
    )
    cube = t.orders.cube("o_orderstatus", "o_orderpriority").agg(
        F.count(F.lit(1)).alias("n")
    ).select(
        F.lit("cube").alias("variant"),
        F.col("o_orderstatus").alias("k1"),
        F.col("o_orderpriority").alias("k2"),
        "n",
        F.lit(None).cast("double").alias("sum_qty"),
        F.lit(None).cast("int").alias("g_k1"),
        F.lit(None).cast("int").alias("g_k2"),
    )
    t.orders.createOrReplaceTempView("orders")
    gsets = spark.sql(
        """
        SELECT 'grouping_sets' AS variant,
               o_orderstatus AS k1, o_orderpriority AS k2,
               count(*) AS n, CAST(NULL AS DOUBLE) AS sum_qty,
               CAST(grouping(o_orderstatus) AS INT) AS g_k1,
               CAST(grouping(o_orderpriority) AS INT) AS g_k2
        FROM orders
        GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
        """
    )
    return rollup.unionByName(cube).unionByName(gsets)


_GROUP_BY_ALL_SQL = """
SELECT o_orderstatus, o_orderpriority,
       CAST(count(*) AS BIGINT) AS n_orders,
       CAST(min(o_orderkey) AS BIGINT) AS first_key
FROM orders
GROUP BY ALL
ORDER BY o_orderstatus, o_orderpriority
"""


@register(
    "group_by_all",
    oracle=_GROUP_BY_ALL_SQL,
    tags=("agg", "dialect"),
)
def group_by_all(spark, sf_dir):
    """``GROUP BY ALL`` (DuckDB-originated, adopted by Spark 3.4+):
    the IDENTICAL text runs natively on both engines — both must infer
    the same grouping set (every non-aggregate select item) or the
    shape of the result diverges.  Zero rewrite needed; this entry
    pins that the dialect stays aligned as both engines evolve."""
    t = Tables(spark, sf_dir)
    t.orders.createOrReplaceTempView("orders")
    return spark.sql(_GROUP_BY_ALL_SQL)


_ORDER_BY_ALL_SQL = """
SELECT o_orderpriority, o_orderstatus,
       CAST(count(*) AS BIGINT) AS n_orders,
       CAST(max(o_totalprice) AS DOUBLE) AS max_price
FROM orders
GROUP BY ALL
ORDER BY ALL
"""


@register(
    "order_by_all",
    oracle=_ORDER_BY_ALL_SQL,
    tags=("sort", "dialect"),
)
def order_by_all(spark, sf_dir):
    """``ORDER BY ALL`` (DuckDB-originated, adopted by Spark 4): sort
    by every select item left to right.  Like group_by_all, the
    IDENTICAL text runs natively on both engines and both must infer
    the same sort key list — the entry pins the dialect alignment
    (a divergence in which columns ALL expands to, or their order,
    breaks the value hash)."""
    t = Tables(spark, sf_dir)
    t.orders.createOrReplaceTempView("orders")
    return spark.sql(_ORDER_BY_ALL_SQL)
