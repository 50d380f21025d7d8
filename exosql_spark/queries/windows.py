"""Window functions — beyond-reference extension (SURVEY.md §2.5: the
reference has no OVER clause; dashboards there use GROUP BY +
self-joins). Spark gives ranking / analytic / frame-based aggregates
natively; the DuckDB oracle checks the same ANSI semantics.

Scale note: each window spec is one shuffle on its partition keys. We
keep partition keys high-cardinality (custkey/orderkey) so no single
partition dominates; an unpartitioned ORDER BY window would serialize —
avoided.
"""

from __future__ import annotations

from pyspark.sql import Window as W
from pyspark.sql import functions as F

from exosql_spark.catalog import register
from exosql_spark.io import Tables


@register(
    "window_analytic_suite",
    oracle="""
SELECT o_custkey, o_orderkey,
       row_number() OVER w1 AS rn,
       rank()       OVER w1 AS rnk,
       dense_rank() OVER w1 AS drnk,
       round(o_totalprice, 4) AS price,
       round(lag(o_totalprice)  OVER w2, 4) AS prev_price,
       round(lead(o_totalprice) OVER w2, 4) AS next_price,
       first_value(o_orderkey) OVER w3 AS first_order,
       last_value(o_orderkey)  OVER w3 AS latest_order,
       nth_value(o_orderkey, 2) OVER w3 AS second_order
FROM orders
WINDOW w1 AS (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey),
       w2 AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey),
       w3 AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
              ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
""",
    tags=("window", "extension"),
)
def window_analytic_suite(spark, sf_dir):
    """Ranking (row_number/rank/dense_rank), analytic (lag/lead) and
    frame-value (first/last/nth_value over an unbounded frame) window
    functions as ONE driver row — the window-capacity consolidation
    of the former window_ranking / window_lag_lead /
    window_frame_values entries, every original column preserved and
    value-hashed.  Three window specs over the same o_custkey
    partition key: Catalyst plans ONE hash exchange (all specs share
    the partition key; the two sort orders add sorts, not shuffles),
    so consolidation also SAVES two shuffles over the three separate
    entries."""
    t = Tables(spark, sf_dir)
    w1 = W.partitionBy("o_custkey").orderBy(
        F.col("o_totalprice").desc(), F.col("o_orderkey")
    )
    w2 = W.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    w3 = w2.rowsBetween(W.unboundedPreceding, W.unboundedFollowing)
    return t.orders.select(
        "o_custkey",
        "o_orderkey",
        F.row_number().over(w1).alias("rn"),
        F.rank().over(w1).alias("rnk"),
        F.dense_rank().over(w1).alias("drnk"),
        F.round("o_totalprice", 4).alias("price"),
        F.round(F.lag("o_totalprice").over(w2), 4).alias("prev_price"),
        F.round(F.lead("o_totalprice").over(w2), 4).alias("next_price"),
        F.first("o_orderkey").over(w3).alias("first_order"),
        F.last("o_orderkey").over(w3).alias("latest_order"),
        F.nth_value("o_orderkey", 2).over(w3).alias("second_order"),
    )


@register(
    "window_running_agg",
    oracle="""
SELECT o_custkey, o_orderkey,
       floor((CAST(sum(CAST(o_totalprice AS DECIMAL(25,6))) OVER (
         PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE)) * 10000.0 + 0.5) / 10000.0 AS running_spend,
       floor((CAST(sum(CAST(o_totalprice AS DECIMAL(25,6))) OVER (
         PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
         ROWS BETWEEN 2 PRECEDING AND CURRENT ROW) AS DOUBLE)
         / count(*) OVER (
         PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
         ROWS BETWEEN 2 PRECEDING AND CURRENT ROW)) * 10000.0 + 0.5) / 10000.0 AS moving_avg3
FROM orders
""",
    tags=("window", "extension"),
    bench=True,
)
def window_running_agg(spark, sf_dir):
    """Frame aggregates accumulate in engine-specific order → exact
    decimal sums inside the frame, engine-deterministic rounding out."""
    t = Tables(spark, sf_dir)
    w = W.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    dec = F.col("o_totalprice").cast("decimal(25,6)")
    run = F.sum(dec).over(w.rowsBetween(W.unboundedPreceding, 0))
    mov = F.sum(dec).over(w.rowsBetween(-2, 0))
    nmov = F.count(F.lit(1)).over(w.rowsBetween(-2, 0))
    from exosql_spark.queries._util import fround

    return t.orders.select(
        "o_custkey",
        "o_orderkey",
        fround(run.cast("double"), 4).alias("running_spend"),
        fround(mov.cast("double") / nmov, 4).alias("moving_avg3"),
    )


@register(
    "window_ntile_percent",
    oracle="""
SELECT c_custkey,
       ntile(4) OVER (ORDER BY c_acctbal, c_custkey) AS quartile,
       round(percent_rank() OVER (ORDER BY c_acctbal, c_custkey), 6) AS pct_rank
FROM customer
""",
    tags=("window", "extension"),
)
def window_ntile_percent(spark, sf_dir):
    """Unpartitioned ranking window — fine at dimension-table cardinality;
    for 100 TB fact tables use bucketed approx quantiles instead
    (exosql_spark.operators.text.quality buckets show the pattern)."""
    t = Tables(spark, sf_dir)
    w = W.orderBy("c_acctbal", "c_custkey")
    return t.customer.select(
        "c_custkey",
        F.ntile(4).over(w).alias("quartile"),
        F.round(F.percent_rank().over(w), 6).alias("pct_rank"),
    )


_QUALIFY_SQL = """
SELECT o_custkey, o_orderkey, o_totalprice,
       row_number() OVER (PARTITION BY o_custkey
                          ORDER BY o_totalprice DESC, o_orderkey) AS rn
FROM {orders}
QUALIFY row_number() OVER (PARTITION BY o_custkey
                           ORDER BY o_totalprice DESC, o_orderkey) <= 2
"""


@register(
    "window_qualify",
    oracle=_QUALIFY_SQL.format(orders="orders"),
    tags=("window", "dialect", "extension"),
)
def window_qualify(spark, sf_dir):
    """``QUALIFY`` (DuckDB/Snowflake/BigQuery window filter — Spark
    has no such clause): the SAME dialect text runs on both engines —
    DuckDB executes it natively as the oracle, Spark gets it through
    the dialect desugar (``dialect.rewrite_qualify``: subquery with
    the predicate as a boolean flag, evaluated in the original select
    scope so Catalyst merges the repeated window expression into ONE
    Window node — top-2 orders per customer costs exactly one hash
    exchange + one sort, same plan as writing the subquery by hand).
    Better: Catalyst's InferWindowGroupLimit recognizes the desugared
    rank-filter and plants a PARTIAL WindowGroupLimit before the
    exchange (plan-pinned in tests/test_dialect.py), so at 100 TB each
    map task ships at most k rows per key instead of its whole
    partition."""
    from exosql_spark.context import Context

    ctx = Context(spark, {"db": {"parquet": sf_dir}})
    return ctx.sql(_QUALIFY_SQL.format(orders="db.orders"))
