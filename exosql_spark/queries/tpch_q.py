"""TPC-H-style composite queries adapted to the testdata schema —
multi-join + aggregation + sort + limit in one plan, the shapes that
exercise join ordering, broadcast choice, and partial aggregation
together. (The reference never ran TPC-H; these demonstrate the full
relational surface composing, and anchor the benchmark.)

Broadcast policy: explicit `F.broadcast` hints ONLY on sides whose
size is bounded by construction — nation (25 rows), region (5), and
1-row global aggregates. customer/part/supplier/orders scale with the
data, so their join strategy is left to AQE, which broadcasts them at
bench scale and shuffles them at 100 TB; a hard-coded hint would OOM
the driver there.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from exosql_spark.catalog import register
from exosql_spark.io import Tables
from exosql_spark.queries import _util as _u


@register(
    "tpch_q3_shipping_priority",
    oracle=f"""
SELECT l.l_orderkey,
       {_u.dsum_sql('l.l_extendedprice * (1 - l.l_discount)')} AS revenue,
       o.o_orderdate, o.o_orderpriority
FROM customer c
JOIN orders o   ON c.c_custkey = o.o_custkey
JOIN lineitem l ON l.l_orderkey = o.o_orderkey
WHERE c.c_mktsegment = 'BUILDING'
  AND o.o_orderdate < TIMESTAMP '1998-03-15'
  AND l.l_shipdate  > TIMESTAMP '1998-03-15'
GROUP BY l.l_orderkey, o.o_orderdate, o.o_orderpriority
ORDER BY revenue DESC, o.o_orderdate, l.l_orderkey
LIMIT 10
""",
    tags=("tpch", "join", "agg"),
    bench=True,
)
def tpch_q3_shipping_priority(spark, sf_dir):
    """Q3 shape: selective dim filter → two fact joins → agg → top-k.
    customer broadcasts; orders⋈lineitem hashes on the orderkey."""
    t = Tables(spark, sf_dir)
    cutoff = F.lit("1998-03-15").cast("timestamp_ntz")
    c = t.customer.filter(F.col("c_mktsegment") == "BUILDING")
    o = t.orders.filter(F.col("o_orderdate") < cutoff)
    l = t.lineitem.filter(F.col("l_shipdate") > cutoff)
    return (
        o.join(c, o.o_custkey == c.c_custkey)
        .join(l, l.l_orderkey == o.o_orderkey)
        .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg(
            _u.dsum(
                F.col("l_extendedprice") * (1 - F.col("l_discount"))
            ).alias("revenue")
        )
        .orderBy(F.col("revenue").desc(), "o_orderdate", "l_orderkey")
        .limit(10)
        .select("l_orderkey", "revenue", "o_orderdate", "o_orderpriority")
    )


@register(
    "tpch_q5_local_supplier_volume",
    oracle=f"""
SELECT n.n_name,
       {_u.dsum_sql('l.l_extendedprice * (1 - l.l_discount)')} AS revenue
FROM customer c
JOIN orders o   ON c.c_custkey = o.o_custkey
JOIN lineitem l ON l.l_orderkey = o.o_orderkey
JOIN supplier s ON l.l_suppkey = s.s_suppkey AND c.c_nationkey = s.s_nationkey
JOIN nation n   ON s.s_nationkey = n.n_nationkey
JOIN region r   ON n.n_regionkey = r.r_regionkey
WHERE r.r_name = 'ASIA'
  AND o.o_orderdate >= TIMESTAMP '1996-01-01'
  AND o.o_orderdate <  TIMESTAMP '1998-01-01'
GROUP BY n.n_name
ORDER BY revenue DESC
""",
    tags=("tpch", "join", "agg"),
    bench=True,
)
def tpch_q5_local_supplier_volume(spark, sf_dir):
    """Q5 shape: 6-table star join with a same-nation constraint —
    every dim broadcasts, the fact chain hashes once on orderkey."""
    t = Tables(spark, sf_dir)
    o = t.orders.filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp_ntz"))
        & (F.col("o_orderdate") < F.lit("1998-01-01").cast("timestamp_ntz"))
    )
    r = t.region.filter(F.col("r_name") == "ASIA")
    return (
        t.lineitem.join(o, t.lineitem.l_orderkey == o.o_orderkey)
        .join(t.customer, o.o_custkey == t.customer.c_custkey)
        .join(
            t.supplier,
            (F.col("l_suppkey") == F.col("s_suppkey"))
            & (F.col("c_nationkey") == F.col("s_nationkey")),
        )
        .join(F.broadcast(t.nation), F.col("s_nationkey") == F.col("n_nationkey"))
        .join(F.broadcast(r), F.col("n_regionkey") == F.col("r_regionkey"))
        .groupBy("n_name")
        .agg(
            _u.dsum(
                F.col("l_extendedprice") * (1 - F.col("l_discount"))
            ).alias("revenue")
        )
        .orderBy(F.col("revenue").desc())
    )


@register(
    "tpch_q10_returned_items",
    oracle=f"""
SELECT c.c_custkey, c.c_name,
       {_u.dsum_sql('l.l_extendedprice * (1 - l.l_discount)')} AS revenue,
       n.n_name
FROM customer c
JOIN orders o   ON c.c_custkey = o.o_custkey
JOIN lineitem l ON l.l_orderkey = o.o_orderkey
JOIN nation n   ON c.c_nationkey = n.n_nationkey
WHERE l.l_returnflag = 'R'
  AND o.o_orderdate >= TIMESTAMP '1996-10-01'
  AND o.o_orderdate <  TIMESTAMP '1997-01-01'
GROUP BY c.c_custkey, c.c_name, n.n_name
ORDER BY revenue DESC, c.c_custkey
LIMIT 20
""",
    tags=("tpch", "join", "agg"),
    bench=True,
)
def tpch_q10_returned_items(spark, sf_dir):
    """Q10 shape: returned-items revenue per customer, one quarter."""
    t = Tables(spark, sf_dir)
    o = t.orders.filter(
        (F.col("o_orderdate") >= F.lit("1996-10-01").cast("timestamp_ntz"))
        & (F.col("o_orderdate") < F.lit("1997-01-01").cast("timestamp_ntz"))
    )
    l = t.lineitem.filter(F.col("l_returnflag") == "R")
    return (
        l.join(o, l.l_orderkey == o.o_orderkey)
        .join(t.customer, o.o_custkey == t.customer.c_custkey)
        .join(
            F.broadcast(t.nation),
            F.col("c_nationkey") == F.col("n_nationkey"),
        )
        .groupBy("c_custkey", "c_name", "n_name")
        .agg(
            _u.dsum(
                F.col("l_extendedprice") * (1 - F.col("l_discount"))
            ).alias("revenue")
        )
        .orderBy(F.col("revenue").desc(), "c_custkey")
        .limit(20)
        .select("c_custkey", "c_name", "revenue", "n_name")
    )


_DEC = "decimal(25,6)"


@register(
    "tpch_q4_order_priority",
    oracle="""
SELECT o.o_orderpriority, count(*) AS order_count
FROM orders o
WHERE o.o_orderdate >= TIMESTAMP '1996-07-01'
  AND o.o_orderdate <  TIMESTAMP '1996-10-01'
  AND EXISTS (SELECT 1 FROM lineitem l
              WHERE l.l_orderkey = o.o_orderkey
                AND l.l_shipdate > o.o_orderdate)
GROUP BY o.o_orderpriority
ORDER BY o.o_orderpriority
""",
    tags=("tpch", "semi", "agg"),
    bench=True,  # full TPC-H perf coverage since round 7
)
def tpch_q4_order_priority(spark, sf_dir):
    """Q4 shape: EXISTS-correlated semi-join (equi key + non-equi
    residual) feeding a priority rollup. Spark plans the residual as a
    LeftSemi hash join on l_orderkey — one shuffle, no dedup pass."""
    t = Tables(spark, sf_dir)
    o = t.orders.filter(
        (F.col("o_orderdate") >= F.lit("1996-07-01").cast("timestamp_ntz"))
        & (F.col("o_orderdate") < F.lit("1996-10-01").cast("timestamp_ntz"))
    )
    l = t.lineitem
    return (
        o.join(
            l,
            (o.o_orderkey == l.l_orderkey) & (l.l_shipdate > o.o_orderdate),
            "left_semi",
        )
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("order_count"))
        .orderBy("o_orderpriority")
    )


@register(
    "tpch_q6_forecast_revenue",
    oracle=f"""
SELECT {_u.dsum_sql('l_extendedprice * l_discount')} AS revenue,
       count(*) AS n_items
FROM lineitem
WHERE l_shipdate >= TIMESTAMP '1997-01-01'
  AND l_shipdate <  TIMESTAMP '1998-01-01'
  AND l_discount >= CAST(0.03 AS DOUBLE) AND l_discount <= CAST(0.07 AS DOUBLE)
  AND l_quantity < CAST(24 AS DOUBLE)
""",
    tags=("tpch", "scan", "agg"),
    bench=True,  # full TPC-H perf coverage since round 7
)
def tpch_q6_forecast_revenue(spark, sf_dir):
    """Q6 shape: pure scan→filter→agg, the pushdown showcase — all
    three predicates reach the parquet reader (min/max row-group skip
    at scale), no shuffle beyond the single partial-agg exchange."""
    t = Tables(spark, sf_dir)
    return (
        t.lineitem.filter(
            (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp_ntz"))
            & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp_ntz"))
            & (F.col("l_discount") >= 0.03)
            & (F.col("l_discount") <= 0.07)
            & (F.col("l_quantity") < 24)
        )
        .agg(
            _u.dsum(F.col("l_extendedprice") * F.col("l_discount")).alias("revenue"),
            F.count(F.lit(1)).alias("n_items"),
        )
    )


@register(
    "tpch_q7_volume_shipping",
    oracle=f"""
SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
       year(l.l_shipdate) AS l_year,
       {_u.dsum_sql('l.l_extendedprice * (1 - l.l_discount)')} AS revenue
FROM supplier s
JOIN lineitem l ON s.s_suppkey = l.l_suppkey
JOIN orders o   ON o.o_orderkey = l.l_orderkey
JOIN customer c ON c.c_custkey = o.o_custkey
JOIN nation n1  ON s.s_nationkey = n1.n_nationkey
JOIN nation n2  ON c.c_nationkey = n2.n_nationkey
WHERE ((n1.n_name = 'NATION_9' AND n2.n_name = 'NATION_6')
    OR (n1.n_name = 'NATION_6' AND n2.n_name = 'NATION_9'))
  AND l.l_shipdate >= TIMESTAMP '1996-01-01'
  AND l.l_shipdate <  TIMESTAMP '1998-01-01'
GROUP BY supp_nation, cust_nation, l_year
ORDER BY supp_nation, cust_nation, l_year
""",
    tags=("tpch", "join", "agg"),
    bench=True,  # full TPC-H perf coverage since round 7
)
def tpch_q7_volume_shipping(spark, sf_dir):
    """Q7 shape: nation-pair trade volume by year. The nation self-use
    (supplier's vs customer's) needs two aliased broadcast copies; the
    disjunctive pair predicate stays post-join (Catalyst can't split
    it), but both nation filters are pushed into the broadcast sides as
    an IN ('NATION_9','NATION_6') prefilter we add explicitly."""
    t = Tables(spark, sf_dir)
    pair = ["NATION_9", "NATION_6"]
    n1 = t.nation.filter(F.col("n_name").isin(pair)).select(
        F.col("n_nationkey").alias("n1_key"), F.col("n_name").alias("supp_nation")
    )
    n2 = t.nation.filter(F.col("n_name").isin(pair)).select(
        F.col("n_nationkey").alias("n2_key"), F.col("n_name").alias("cust_nation")
    )
    l = t.lineitem.filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp_ntz"))
        & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp_ntz"))
    )
    return (
        l.join(t.supplier, F.col("l_suppkey") == F.col("s_suppkey"))
        .join(F.broadcast(n1), F.col("s_nationkey") == F.col("n1_key"))
        .join(t.orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(t.customer, F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(n2), F.col("c_nationkey") == F.col("n2_key"))
        .filter(
            ((F.col("supp_nation") == "NATION_9") & (F.col("cust_nation") == "NATION_6"))
            | ((F.col("supp_nation") == "NATION_6") & (F.col("cust_nation") == "NATION_9"))
        )
        .groupBy("supp_nation", "cust_nation", F.year("l_shipdate").alias("l_year"))
        .agg(
            _u.dsum(
                F.col("l_extendedprice") * (1 - F.col("l_discount"))
            ).alias("revenue")
        )
        .orderBy("supp_nation", "cust_nation", "l_year")
    )


@register(
    "tpch_q8_market_share",
    oracle=f"""
SELECT year(o.o_orderdate) AS o_year,
       {_u.fround_sql(
           "CAST(sum(CAST(CASE WHEN n2.n_name = 'NATION_9' "
           "THEN l.l_extendedprice * (1 - l.l_discount) ELSE 0 END "
           "AS DECIMAL(25,6))) AS DOUBLE) / "
           "CAST(sum(CAST(l.l_extendedprice * (1 - l.l_discount) "
           "AS DECIMAL(25,6))) AS DOUBLE)"
       )} AS mkt_share
FROM lineitem l
JOIN part p     ON p.p_partkey = l.l_partkey
JOIN supplier s ON s.s_suppkey = l.l_suppkey
JOIN nation n2  ON s.s_nationkey = n2.n_nationkey
JOIN orders o   ON o.o_orderkey = l.l_orderkey
JOIN customer c ON c.c_custkey = o.o_custkey
JOIN nation n1  ON c.c_nationkey = n1.n_nationkey
JOIN region r   ON n1.n_regionkey = r.r_regionkey
WHERE r.r_name = 'ASIA'
  AND p.p_type = 'ECONOMY'
  AND o.o_orderdate >= TIMESTAMP '1996-01-01'
  AND o.o_orderdate <  TIMESTAMP '1998-01-01'
GROUP BY o_year
ORDER BY o_year
""",
    tags=("tpch", "join", "agg", "ratio"),
    bench=True,  # full TPC-H perf coverage since round 7
)
def tpch_q8_market_share(spark, sf_dir):
    """Q8 shape: one supplier-nation's share of regional volume —
    ratio of conditional sum to total sum in a single grouped pass
    (one shuffle; both sums share the partial-agg). 8-table star:
    every dim broadcasts, lineitem⋈orders is the only hash join."""
    t = Tables(spark, sf_dir)
    vol = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    n2 = t.nation.select(
        F.col("n_nationkey").alias("n2_key"), F.col("n_name").alias("supp_nation")
    )
    n1 = t.nation.select(
        F.col("n_nationkey").alias("n1_key"), F.col("n_regionkey").alias("n1_region")
    )
    r = t.region.filter(F.col("r_name") == "ASIA")
    p = t.part.filter(F.col("p_type") == "ECONOMY")
    o = t.orders.filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp_ntz"))
        & (F.col("o_orderdate") < F.lit("1998-01-01").cast("timestamp_ntz"))
    )
    num = F.when(F.col("supp_nation") == "NATION_9", vol).otherwise(F.lit(0.0))
    return (
        t.lineitem.join(p, F.col("l_partkey") == F.col("p_partkey"))
        .join(t.supplier, F.col("l_suppkey") == F.col("s_suppkey"))
        .join(F.broadcast(n2), F.col("s_nationkey") == F.col("n2_key"))
        .join(o, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(t.customer, F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(n1), F.col("c_nationkey") == F.col("n1_key"))
        .join(F.broadcast(r), F.col("n1_region") == F.col("r_regionkey"))
        .groupBy(F.year("o_orderdate").alias("o_year"))
        .agg(
            _u.fround(
                F.sum(num.cast(_DEC)).cast("double")
                / F.sum(vol.cast(_DEC)).cast("double")
            ).alias("mkt_share")
        )
        .orderBy("o_year")
    )


@register(
    "tpch_q14_promo_revenue",
    oracle=f"""
SELECT {_u.fround_sql(
        "CAST(100.0 AS DOUBLE) * "
        "CAST(sum(CAST(CASE WHEN p.p_type = 'PROMO' "
        "THEN l.l_extendedprice * (1 - l.l_discount) ELSE 0 END "
        "AS DECIMAL(25,6))) AS DOUBLE) / "
        "CAST(sum(CAST(l.l_extendedprice * (1 - l.l_discount) "
        "AS DECIMAL(25,6))) AS DOUBLE)"
    )} AS promo_revenue
FROM lineitem l
JOIN part p ON p.p_partkey = l.l_partkey
WHERE l.l_shipdate >= TIMESTAMP '1997-03-01'
  AND l.l_shipdate <  TIMESTAMP '1997-04-01'
""",
    tags=("tpch", "join", "ratio"),
    bench=True,  # full TPC-H perf coverage since round 7
)
def tpch_q14_promo_revenue(spark, sf_dir):
    """Q14 shape: promo share of one month's revenue. part broadcasts;
    the month predicate prunes lineitem at the scan."""
    t = Tables(spark, sf_dir)
    vol = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    promo = F.when(F.col("p_type") == "PROMO", vol).otherwise(F.lit(0.0))
    return (
        t.lineitem.filter(
            (F.col("l_shipdate") >= F.lit("1997-03-01").cast("timestamp_ntz"))
            & (F.col("l_shipdate") < F.lit("1997-04-01").cast("timestamp_ntz"))
        )
        .join(t.part, F.col("l_partkey") == F.col("p_partkey"))
        .agg(
            _u.fround(
                F.lit(100.0)
                * F.sum(promo.cast(_DEC)).cast("double")
                / F.sum(vol.cast(_DEC)).cast("double")
            ).alias("promo_revenue")
        )
    )


@register(
    "tpch_q17_small_quantity_revenue",
    oracle=f"""
WITH pq AS (
  SELECT l_partkey,
         sum(CAST(l_quantity AS DECIMAL(25,6))) AS sum_qty,
         count(*) AS cnt_qty
  FROM lineitem GROUP BY l_partkey
)
SELECT {_u.fround_sql(
        "CAST(sum(CAST(l.l_extendedprice AS DECIMAL(25,6))) AS DOUBLE)"
        " / CAST(7.0 AS DOUBLE)"
    )} AS avg_yearly
FROM lineitem l
JOIN part p ON p.p_partkey = l.l_partkey
JOIN pq     ON pq.l_partkey = l.l_partkey
WHERE p.p_brand = 'Brand#23'
  AND CAST(l.l_quantity AS DECIMAL(25,6)) * 5 * pq.cnt_qty < pq.sum_qty
""",
    tags=("tpch", "join", "agg", "correlated"),
    bench=True,  # shuffle-heavy shape: tracked since round 6
)
def tpch_q17_small_quantity_revenue(spark, sf_dir):
    """Q17 shape: lineitems below 20% of their part's average quantity.
    The correlated avg subquery decorrelates to a per-part aggregate
    joined back; the threshold comparison is kept in exact decimal
    (qty*5*count < sum) so both engines agree bit-for-bit at the
    boundary — never compare against a divided double."""
    t = Tables(spark, sf_dir)
    p = t.part.filter(F.col("p_brand") == "Brand#23")
    # Aggregate only lineitems of the brand-filtered parts: the final
    # join discards every other part anyway, and the semi-join cuts
    # the per-part partial-agg input ~|brands|× before its shuffle —
    # the filter-through-aggregate pushdown the decorrelated subquery
    # is entitled to. Join strategy left to AQE (part scales with
    # data; see the module broadcast policy).
    li = t.lineitem.join(
        p.select(F.col("p_partkey").alias("_fk")),
        F.col("l_partkey") == F.col("_fk"),
        "left_semi",
    )
    pq = li.groupBy("l_partkey").agg(
        F.sum(F.col("l_quantity").cast(_DEC)).alias("sum_qty"),
        F.count(F.lit(1)).alias("cnt_qty"),
    ).withColumnRenamed("l_partkey", "pq_partkey")
    return (
        t.lineitem.join(p, F.col("l_partkey") == F.col("p_partkey"))
        .join(pq, F.col("l_partkey") == F.col("pq_partkey"))
        .filter(
            F.col("l_quantity").cast(_DEC) * F.lit(5) * F.col("cnt_qty")
            < F.col("sum_qty")
        )
        .agg(
            _u.fround(
                F.sum(F.col("l_extendedprice").cast(_DEC)).cast("double")
                / F.lit(7.0)
            ).alias("avg_yearly")
        )
    )


@register(
    "tpch_q18_large_volume_customers",
    bench=True,
    oracle=f"""
WITH big AS (
  SELECT l_orderkey FROM lineitem
  GROUP BY l_orderkey HAVING sum(l_quantity) > 150
)
SELECT c.c_name, c.c_custkey, o.o_orderkey, o.o_orderdate, o.o_totalprice,
       {_u.dsum_sql('l.l_quantity')} AS sum_qty
FROM customer c
JOIN orders o   ON c.c_custkey = o.o_custkey
JOIN lineitem l ON o.o_orderkey = l.l_orderkey
WHERE o.o_orderkey IN (SELECT l_orderkey FROM big)
GROUP BY c.c_name, c.c_custkey, o.o_orderkey, o.o_orderdate, o.o_totalprice
ORDER BY o.o_totalprice DESC, o.o_orderkey
LIMIT 20
""",
    tags=("tpch", "join", "agg", "semi"),
)
def tpch_q18_large_volume_customers(spark, sf_dir):
    """Q18 shape: orders whose total quantity tops a threshold. The
    HAVING pre-aggregate doubles as the semi-join filter (Spark:
    left_semi against the aggregated keys — at 100 TB this is the
    small side and broadcasts after AQE sizes it)."""
    t = Tables(spark, sf_dir)
    big = (
        t.lineitem.groupBy("l_orderkey")
        .agg(F.sum("l_quantity").alias("sq"))
        .filter(F.col("sq") > 150)
        .select("l_orderkey")
    )
    l = t.lineitem.join(
        big.withColumnRenamed("l_orderkey", "big_key"),
        F.col("l_orderkey") == F.col("big_key"),
        "left_semi",
    )
    return (
        l.join(t.orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(t.customer, F.col("o_custkey") == F.col("c_custkey"))
        .groupBy("c_name", "c_custkey", "o_orderkey", "o_orderdate", "o_totalprice")
        .agg(_u.dsum("l_quantity").alias("sum_qty"))
        .orderBy(F.col("o_totalprice").desc(), "o_orderkey")
        .limit(20)
        .select("c_name", "c_custkey", "o_orderkey", "o_orderdate", "o_totalprice", "sum_qty")
    )


@register(
    "tpch_q19_disjunctive_revenue",
    oracle=f"""
SELECT {_u.dsum_sql('l.l_extendedprice * (1 - l.l_discount)')} AS revenue,
       count(*) AS n_items
FROM lineitem l
JOIN part p ON p.p_partkey = l.l_partkey
WHERE (p.p_brand = 'Brand#1'  AND p.p_size BETWEEN 1  AND 15
       AND l.l_quantity >= 1  AND l.l_quantity <= 11)
   OR (p.p_brand = 'Brand#13' AND p.p_size BETWEEN 10 AND 30
       AND l.l_quantity >= 10 AND l.l_quantity <= 20)
   OR (p.p_brand = 'Brand#23' AND p.p_size BETWEEN 20 AND 50
       AND l.l_quantity >= 20 AND l.l_quantity <= 30)
""",
    tags=("tpch", "join", "disjunctive"),
    bench=True,  # full TPC-H perf coverage since round 7
)
def tpch_q19_disjunctive_revenue(spark, sf_dir):
    """Q19 shape: OR-of-conjuncts across both join sides. Catalyst
    derives the common implied predicates (brand IN (...), size<=50,
    quantity<=30) and pushes them to the scans; the residual OR
    evaluates post-join inside codegen."""
    t = Tables(spark, sf_dir)
    q, b, s = F.col("l_quantity"), F.col("p_brand"), F.col("p_size")
    cond = (
        ((b == "Brand#1") & s.between(1, 15) & q.between(1, 11))
        | ((b == "Brand#13") & s.between(10, 30) & q.between(10, 20))
        | ((b == "Brand#23") & s.between(20, 50) & q.between(20, 30))
    )
    return (
        t.lineitem.join(t.part, F.col("l_partkey") == F.col("p_partkey"))
        .filter(cond)
        .agg(
            _u.dsum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias(
                "revenue"
            ),
            F.count(F.lit(1)).alias("n_items"),
        )
    )


@register(
    "tpch_q22_dormant_rich_customers",
    oracle=f"""
WITH pos AS (
  SELECT sum(CAST(c_acctbal AS DECIMAL(25,6))) AS s, count(*) AS n
  FROM customer WHERE c_acctbal > 0
)
SELECT c.c_nationkey, count(*) AS numcust,
       {_u.dsum_sql('c.c_acctbal')} AS totacctbal
FROM customer c, pos
WHERE CAST(c.c_acctbal AS DECIMAL(25,6)) * pos.n > pos.s
  AND NOT EXISTS (SELECT 1 FROM orders o
                  WHERE o.o_custkey = c.c_custkey
                    AND o.o_orderpriority = '1-URGENT')
GROUP BY c.c_nationkey
ORDER BY c.c_nationkey
""",
    tags=("tpch", "anti", "agg", "scalar-subquery"),
    bench=True,  # full TPC-H perf coverage since round 7
)
def tpch_q22_dormant_rich_customers(spark, sf_dir):
    """Q22 shape: above-average-balance customers with no urgent
    orders (testdata gives every customer orders, so the classic
    no-orders anti-join is keyed on the urgent subset instead).
    The global average is a 1-row broadcast cross join; the
    above-average test multiplies through by the count so it stays
    in exact decimal. Anti side prefilters to '1-URGENT' before the
    shuffle."""
    t = Tables(spark, sf_dir)
    pos = t.customer.filter(F.col("c_acctbal") > 0).agg(
        F.sum(F.col("c_acctbal").cast(_DEC)).alias("s"),
        F.count(F.lit(1)).alias("n"),
    )
    urgent = t.orders.filter(F.col("o_orderpriority") == "1-URGENT").select(
        "o_custkey"
    )
    return (
        t.customer.crossJoin(F.broadcast(pos))
        .filter(F.col("c_acctbal").cast(_DEC) * F.col("n") > F.col("s"))
        .join(urgent, F.col("c_custkey") == F.col("o_custkey"), "left_anti")
        .groupBy("c_nationkey")
        .agg(
            F.count(F.lit(1)).alias("numcust"),
            _u.dsum("c_acctbal").alias("totacctbal"),
        )
        .orderBy("c_nationkey")
    )


@register(
    "tpch_q2_min_cost_supplier",
    oracle=f"""
WITH cost AS (
  SELECT l_partkey, l_suppkey,
         sum(CAST(l_extendedprice AS DECIMAL(25,6))) AS c
  FROM lineitem GROUP BY l_partkey, l_suppkey
)
SELECT s.s_acctbal, s.s_name, n.n_name, p.p_partkey, p.p_name,
       {_u.fround_sql('CAST(cost.c AS DOUBLE)')} AS supply_cost
FROM part p
JOIN cost       ON cost.l_partkey = p.p_partkey
JOIN supplier s ON s.s_suppkey = cost.l_suppkey
JOIN nation n   ON n.n_nationkey = s.s_nationkey
JOIN region r   ON r.r_regionkey = n.n_regionkey
WHERE r.r_name = 'ASIA'
  AND p.p_size IN (5, 15, 25)
  AND p.p_type IN ('STANDARD', 'ECONOMY')
  AND cost.c = (SELECT min(c2.c) FROM cost c2
                WHERE c2.l_partkey = p.p_partkey)
ORDER BY s.s_acctbal DESC, n.n_name, s.s_name, p.p_partkey
LIMIT 20
""",
    tags=("tpch", "correlated", "join"),
    bench=True,  # full TPC-H perf coverage since round 7
)
def tpch_q2_min_cost_supplier(spark, sf_dir):
    """Q2 shape: for each part, the cheapest supplier (testdata has no
    partsupp, so per-pair cost is the lineitem spend sum). The
    correlated MIN subquery decorrelates to a per-part min-aggregate
    joined back on exact-decimal equality — decimal, not double, so
    the boundary row set is identical on both engines."""
    t = Tables(spark, sf_dir)
    p = t.part.filter(
        F.col("p_size").isin(5, 15, 25) & F.col("p_type").isin("STANDARD", "ECONOMY")
    )
    # Aggregate costs only for the size/type-filtered parts: cost and
    # per-part min are keyed by partkey, so restricting to the parts
    # the final join keeps cannot change their values — the same
    # filter-through-aggregate pushdown as tpch_q17, cutting the
    # (partkey, suppkey) partial-agg input by the part filter's
    # selectivity before its shuffle.
    li = t.lineitem.join(
        p.select(F.col("p_partkey").alias("_fk")),
        F.col("l_partkey") == F.col("_fk"),
        "left_semi",
    )
    cost = li.groupBy("l_partkey", "l_suppkey").agg(
        F.sum(F.col("l_extendedprice").cast(_DEC)).alias("c")
    )
    minc = cost.groupBy("l_partkey").agg(F.min("c").alias("minc")).withColumnRenamed(
        "l_partkey", "min_partkey"
    )
    n = t.nation.join(
        F.broadcast(t.region.filter(F.col("r_name") == "ASIA")),
        F.col("n_regionkey") == F.col("r_regionkey"),
    )
    return (
        cost.join(
            minc,
            (F.col("l_partkey") == F.col("min_partkey"))
            & (F.col("c") == F.col("minc")),
        )
        .join(p, F.col("l_partkey") == F.col("p_partkey"))
        .join(t.supplier, F.col("l_suppkey") == F.col("s_suppkey"))
        .join(F.broadcast(n), F.col("s_nationkey") == F.col("n_nationkey"))
        .select(
            "s_acctbal", "s_name", "n_name", "p_partkey", "p_name",
            _u.fround(F.col("c").cast("double")).alias("supply_cost"),
        )
        .orderBy(F.col("s_acctbal").desc(), "n_name", "s_name", "p_partkey")
        .limit(20)
    )


@register(
    "tpch_q9_product_type_profit",
    bench=True,
    oracle=f"""
SELECT n.n_name AS nation, year(o.o_orderdate) AS o_year,
       {_u.dsum_sql(
           "l.l_extendedprice * (1 - l.l_discount)"
           " - p.p_retailprice * l.l_quantity * CAST(0.1 AS DOUBLE)"
       )} AS profit
FROM lineitem l
JOIN part p     ON p.p_partkey = l.l_partkey
JOIN supplier s ON s.s_suppkey = l.l_suppkey
JOIN nation n   ON n.n_nationkey = s.s_nationkey
JOIN orders o   ON o.o_orderkey = l.l_orderkey
WHERE p.p_name LIKE '%red%'
GROUP BY nation, o_year
ORDER BY nation, o_year DESC
""",
    tags=("tpch", "join", "agg"),
)
def tpch_q9_product_type_profit(spark, sf_dir):
    """Q9 shape: profit by supplier nation and order year over a
    part-name LIKE filter (no partsupp → cost proxied as 10% of retail
    value; same arithmetic left-to-right on both engines). part/
    supplier/nation broadcast; lineitem⋈orders is the lone shuffle."""
    t = Tables(spark, sf_dir)
    p = t.part.filter(F.col("p_name").like("%red%"))
    profit = (
        F.col("l_extendedprice") * (1 - F.col("l_discount"))
        - F.col("p_retailprice") * F.col("l_quantity") * F.lit(0.1)
    )
    return (
        t.lineitem.join(p, F.col("l_partkey") == F.col("p_partkey"))
        .join(t.supplier, F.col("l_suppkey") == F.col("s_suppkey"))
        .join(F.broadcast(t.nation), F.col("s_nationkey") == F.col("n_nationkey"))
        .join(t.orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .groupBy(
            F.col("n_name").alias("nation"),
            F.year("o_orderdate").alias("o_year"),
        )
        .agg(_u.dsum(profit).alias("profit"))
        .orderBy("nation", F.col("o_year").desc())
    )


@register(
    "tpch_q11_important_stock",
    oracle="""
WITH v AS (
  SELECT l.l_partkey,
         sum(CAST(l.l_extendedprice AS DECIMAL(25,6))) AS s
  FROM lineitem l
  JOIN supplier sp ON sp.s_suppkey = l.l_suppkey
  JOIN nation n    ON n.n_nationkey = sp.s_nationkey
  WHERE n.n_name IN ('NATION_3', 'NATION_7')
  GROUP BY l.l_partkey
)
SELECT l_partkey, CAST(s AS DOUBLE) AS part_value
FROM v, (SELECT sum(s) AS total, CAST(count(*) AS DECIMAL(10,0)) AS n FROM v) tot
WHERE s * tot.n > CAST(2 AS DECIMAL(2,0)) * tot.total
ORDER BY part_value DESC, l_partkey
""",
    tags=("tpch", "scalar-subquery", "agg"),
    bench=True,  # full TPC-H perf coverage since round 7
)
def tpch_q11_important_stock(spark, sf_dir):
    """Q11 shape: parts whose spend share (within two nations'
    suppliers) beats a global threshold — here 2× the mean share, so
    the predicate is scale-factor-free. The global (total, count) is a
    1-row broadcast; the comparison multiplies through by the count to
    stay in exact decimal (s·n > 2·total), never dividing into
    doubles. Exact decimal sums are hash-safe; the output value is the
    raw decimal cast to double (no rounding needed — sums of 2-decimal
    inputs are exactly representable)."""
    t = Tables(spark, sf_dir)
    sp = (
        t.supplier.join(
            F.broadcast(t.nation.filter(F.col("n_name").isin("NATION_3", "NATION_7"))),
            F.col("s_nationkey") == F.col("n_nationkey"),
        ).select("s_suppkey")
    )
    v = (
        t.lineitem.join(sp, F.col("l_suppkey") == F.col("s_suppkey"))
        .groupBy("l_partkey")
        .agg(F.sum(F.col("l_extendedprice").cast(_DEC)).alias("s"))
    )
    tot = v.agg(
        F.sum("s").alias("total"),
        F.count(F.lit(1)).cast("decimal(10,0)").alias("n"),
    )
    return (
        v.crossJoin(F.broadcast(tot))
        .filter(F.col("s") * F.col("n") > F.lit(2).cast("decimal(2,0)") * F.col("total"))
        .select("l_partkey", F.col("s").cast("double").alias("part_value"))
        .orderBy(F.col("part_value").desc(), "l_partkey")
    )


@register(
    "tpch_q12_shipmode_priority",
    oracle="""
SELECT l.l_linestatus AS ship_class,
       CAST(sum(CASE WHEN o.o_orderpriority IN ('1-URGENT', '2-HIGH')
                THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
       CAST(sum(CASE WHEN o.o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
                THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
FROM orders o
JOIN lineitem l ON o.o_orderkey = l.l_orderkey
WHERE l.l_shipdate >= TIMESTAMP '1997-01-01'
  AND l.l_shipdate <  TIMESTAMP '1998-01-01'
  AND l.l_shipdate >  o.o_orderdate + INTERVAL 180 DAY
GROUP BY ship_class
ORDER BY ship_class
""",
    tags=("tpch", "join", "conditional-agg"),
    bench=True,  # full TPC-H perf coverage since round 7
)
def tpch_q12_shipmode_priority(spark, sf_dir):
    """Q12 shape: late shipments classified by line status (testdata
    has no l_shipmode/l_receiptdate, so "late" is shipped >180 days
    after order date), with urgent-vs-other conditional counts in one
    grouped pass — both CASE sums share the partial aggregate."""
    t = Tables(spark, sf_dir)
    urgent = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        t.lineitem.filter(
            (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp_ntz"))
            & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp_ntz"))
        )
        .join(t.orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .filter(F.col("l_shipdate") > F.expr("o_orderdate + INTERVAL 180 DAYS"))
        .groupBy(F.col("l_linestatus").alias("ship_class"))
        .agg(
            F.sum(F.when(urgent, 1).otherwise(0)).alias("high_line_count"),
            F.sum(F.when(~urgent, 1).otherwise(0)).alias("low_line_count"),
        )
        .orderBy("ship_class")
    )


@register(
    "tpch_q13_customer_distribution",
    oracle="""
SELECT c_count, count(*) AS custdist
FROM (
  SELECT c.c_custkey, count(o.o_orderkey) AS c_count
  FROM customer c
  LEFT JOIN orders o ON c.c_custkey = o.o_custkey
                    AND o.o_orderpriority <> '1-URGENT'
  GROUP BY c.c_custkey
) per_cust
GROUP BY c_count
ORDER BY custdist DESC, c_count DESC
""",
    tags=("tpch", "outer-join", "double-agg"),
    bench=True,  # shuffle-heavy shape: tracked since round 6
)
def tpch_q13_customer_distribution(spark, sf_dir):
    """Q13 shape: order-count histogram over customers including
    zero-order ones — LEFT JOIN with a join-time (not WHERE) residual
    filter, count(col) null-skipping semantics, then a second
    aggregation over the first's output."""
    t = Tables(spark, sf_dir)
    o = t.orders.filter(F.col("o_orderpriority") != "1-URGENT")
    per_cust = (
        t.customer.join(o, F.col("c_custkey") == F.col("o_custkey"), "left")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return (
        per_cust.groupBy("c_count")
        .agg(F.count(F.lit(1)).alias("custdist"))
        .orderBy(F.col("custdist").desc(), F.col("c_count").desc())
    )


@register(
    "tpch_q15_top_supplier",
    oracle=f"""
WITH rev AS (
  SELECT l_suppkey,
         sum(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(25,6))) AS total
  FROM lineitem
  WHERE l_shipdate >= TIMESTAMP '1997-01-01'
    AND l_shipdate <  TIMESTAMP '1997-04-01'
  GROUP BY l_suppkey
)
SELECT s.s_suppkey, s.s_name, {_u.fround_sql('CAST(rev.total AS DOUBLE)')} AS total_revenue
FROM supplier s
JOIN rev ON rev.l_suppkey = s.s_suppkey
WHERE rev.total = (SELECT max(total) FROM rev)
ORDER BY s.s_suppkey
""",
    tags=("tpch", "scalar-subquery", "agg"),
    bench=True,  # full TPC-H perf coverage since round 7
)
def tpch_q15_top_supplier(spark, sf_dir):
    """Q15 shape: supplier(s) with the quarter's max revenue. The
    MAX scalar subquery becomes a 1-row aggregate joined back on
    exact-decimal *equality* — an equi-join, so no nested-loop plan,
    and ties at the max are kept identically by both engines."""
    t = Tables(spark, sf_dir)
    rev = (
        t.lineitem.filter(
            (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp_ntz"))
            & (F.col("l_shipdate") < F.lit("1997-04-01").cast("timestamp_ntz"))
        )
        .groupBy("l_suppkey")
        .agg(
            F.sum(
                (F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast(_DEC)
            ).alias("total")
        )
    )
    maxr = rev.agg(F.max("total").alias("max_total"))
    return (
        rev.join(F.broadcast(maxr), F.col("total") == F.col("max_total"))
        .join(t.supplier, F.col("l_suppkey") == F.col("s_suppkey"))
        .select(
            "s_suppkey", "s_name",
            _u.fround(F.col("total").cast("double")).alias("total_revenue"),
        )
        .orderBy("s_suppkey")
    )


@register(
    "tpch_q16_supplier_part_counts",
    oracle="""
SELECT p.p_brand, p.p_type, p.p_size,
       count(DISTINCT l.l_suppkey) AS supplier_cnt
FROM lineitem l
JOIN part p ON p.p_partkey = l.l_partkey
WHERE p.p_brand <> 'Brand#23'
  AND p.p_type <> 'PROMO'
  AND p.p_size IN (1, 5, 10, 15, 20, 25)
  AND l.l_suppkey NOT IN (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
GROUP BY p.p_brand, p.p_type, p.p_size
ORDER BY supplier_cnt DESC, p.p_brand, p.p_type, p.p_size
""",
    tags=("tpch", "anti", "distinct-agg"),
    bench=True,  # full TPC-H perf coverage since round 7
)
def tpch_q16_supplier_part_counts(spark, sf_dir):
    """Q16 shape: distinct-supplier counts per part attribute triple,
    excluding blacklisted suppliers (negative balance stands in for
    the complaints filter) via NOT IN → left_anti. The distinct-agg
    expands to a two-phase (dedup, then count) plan; the anti side is
    a broadcast."""
    t = Tables(spark, sf_dir)
    bad = t.supplier.filter(F.col("s_acctbal") < 0).select("s_suppkey")
    p = t.part.filter(
        (F.col("p_brand") != "Brand#23")
        & (F.col("p_type") != "PROMO")
        & F.col("p_size").isin(1, 5, 10, 15, 20, 25)
    )
    return (
        t.lineitem.join(
            bad, F.col("l_suppkey") == F.col("s_suppkey"), "left_anti"
        )
        .join(p, F.col("l_partkey") == F.col("p_partkey"))
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.countDistinct("l_suppkey").alias("supplier_cnt"))
        .orderBy(F.col("supplier_cnt").desc(), "p_brand", "p_type", "p_size")
    )


@register(
    "tpch_q20_volume_share_suppliers",
    oracle="""
WITH base AS (
  SELECT l.l_partkey, l.l_suppkey,
         sum(CAST(l.l_quantity AS DECIMAL(25,6))) AS sq
  FROM lineitem l
  JOIN part p ON p.p_partkey = l.l_partkey
  WHERE p.p_name LIKE 'red%'
    AND l.l_shipdate >= TIMESTAMP '1997-01-01'
    AND l.l_shipdate <  TIMESTAMP '1998-01-01'
  GROUP BY l.l_partkey, l.l_suppkey
),
tot AS (SELECT l_partkey, sum(sq) AS tq FROM base GROUP BY l_partkey)
SELECT s.s_name, s.s_acctbal
FROM supplier s
JOIN nation n ON n.n_nationkey = s.s_nationkey
JOIN region r ON r.r_regionkey = n.n_regionkey
WHERE r.r_name = 'ASIA'
  AND s.s_suppkey IN (
    SELECT b.l_suppkey FROM base b
    JOIN tot t ON t.l_partkey = b.l_partkey
    WHERE b.sq * 3 > t.tq * 2
  )
ORDER BY s.s_name
""",
    tags=("tpch", "semi", "correlated"),
    bench=True,  # shuffle-heavy shape: tracked since round 6
)
def tpch_q20_volume_share_suppliers(spark, sf_dir):
    """Q20 shape: suppliers dominating a part's shipped volume (no
    partsupp availqty, so the threshold is >2/3 of the part's 1997
    'red%' volume — a share predicate, scale-factor-free). Two stacked
    aggregates feed a semi-join into the supplier dimension; the
    threshold multiplies through (3·sq > 2·tq) to stay exact-decimal.

    The part total ``tq`` is a WINDOW sum over ``base`` (r19), not a
    second aggregate self-joined back: the self-join form referenced
    ``base`` twice, and whether AQE exchange reuse merged the two
    physical copies was nondeterministic — constraint inference
    decorated them with differently-ordered isnotnull terms run to
    run, so the lineitem⋈part aggregate sometimes computed twice (the
    4⇄5 exchange-count flap EXPLAIN.md recorded across two rounds).
    One reference ⇒ one computation, deterministically, with one fewer
    aggregate and join; same sq/tq pairs (DECIMAL sums are
    order-independent), so the same suppliers qualify."""
    t = Tables(spark, sf_dir)
    base = (
        t.lineitem.filter(
            (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp_ntz"))
            & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp_ntz"))
        )
        .join(
            t.part.filter(F.col("p_name").like("red%")),
            F.col("l_partkey") == F.col("p_partkey"),
        )
        .groupBy("l_partkey", "l_suppkey")
        .agg(F.sum(F.col("l_quantity").cast(_DEC)).alias("sq"))
    )
    from pyspark.sql import Window

    dominant = (
        base.withColumn(
            "tq", F.sum("sq").over(Window.partitionBy("l_partkey"))
        )
        .filter(F.col("sq") * 3 > F.col("tq") * 2)
        .select("l_suppkey")
    )
    n = t.nation.join(
        F.broadcast(t.region.filter(F.col("r_name") == "ASIA")),
        F.col("n_regionkey") == F.col("r_regionkey"),
    )
    return (
        t.supplier.join(
            F.broadcast(n), F.col("s_nationkey") == F.col("n_nationkey")
        )
        .join(dominant, F.col("s_suppkey") == F.col("l_suppkey"), "left_semi")
        .select("s_name", "s_acctbal")
        .orderBy("s_name")
    )


@register(
    "tpch_q21_waiting_suppliers",
    bench=True,
    oracle="""
SELECT s.s_name, count(*) AS numwait
FROM supplier s
JOIN lineitem l1 ON s.s_suppkey = l1.l_suppkey
JOIN orders o    ON o.o_orderkey = l1.l_orderkey
WHERE o.o_orderstatus = 'F'
  AND l1.l_shipdate > o.o_orderdate + INTERVAL 365 DAY
  AND EXISTS (SELECT 1 FROM lineitem l2
              WHERE l2.l_orderkey = l1.l_orderkey
                AND l2.l_suppkey <> l1.l_suppkey)
  AND NOT EXISTS (SELECT 1 FROM lineitem l3
                  WHERE l3.l_orderkey = l1.l_orderkey
                    AND l3.l_suppkey <> l1.l_suppkey
                    AND l3.l_shipdate > o.o_orderdate + INTERVAL 365 DAY)
GROUP BY s.s_name
ORDER BY numwait DESC, s.s_name
LIMIT 20
""",
    tags=("tpch", "exists", "anti", "agg"),
)
def tpch_q21_waiting_suppliers(spark, sf_dir):
    """Q21 shape: the sole-late-supplier query — EXISTS (another
    supplier in the order) plus doubly-correlated NOT EXISTS (no other
    supplier also late). Decorrelated to one per-order aggregate:
    n_supp = distinct suppliers, n_late = distinct late suppliers; a
    late line qualifies iff n_supp > 1 and n_late = 1 (it is itself
    late, so the single late supplier is its own). One lineitem scan
    computes the stats; joining them back on orderkey replaces two
    correlated subquery scans — at 100 TB that's one shuffle instead
    of three."""
    t = Tables(spark, sf_dir)
    late = F.col("l_shipdate") > F.expr("o_orderdate + INTERVAL 365 DAYS")
    lo = t.lineitem.join(
        t.orders.filter(F.col("o_orderstatus") == "F").select(
            "o_orderkey", "o_orderdate"
        ),
        F.col("l_orderkey") == F.col("o_orderkey"),
    ).withColumn("is_late", late)
    stats = lo.groupBy(F.col("l_orderkey").alias("st_orderkey")).agg(
        F.countDistinct("l_suppkey").alias("n_supp"),
        F.countDistinct(F.when(F.col("is_late"), F.col("l_suppkey"))).alias("n_late"),
    )
    return (
        lo.filter(F.col("is_late"))
        .join(stats, F.col("l_orderkey") == F.col("st_orderkey"))
        .filter((F.col("n_supp") > 1) & (F.col("n_late") == 1))
        .join(t.supplier, F.col("l_suppkey") == F.col("s_suppkey"))
        .groupBy("s_name")
        .agg(F.count(F.lit(1)).alias("numwait"))
        .orderBy(F.col("numwait").desc(), "s_name")
        .limit(20)
    )
