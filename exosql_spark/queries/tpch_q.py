"""TPC-H-style composite queries adapted to the testdata schema —
multi-join + aggregation + sort + limit in one plan, the shapes that
exercise join ordering, broadcast choice, and partial aggregation
together. (The reference never ran TPC-H; these demonstrate the full
relational surface composing, and anchor the benchmark.)
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
        o.join(F.broadcast(c), o.o_custkey == c.c_custkey)
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
        .join(F.broadcast(t.customer), o.o_custkey == t.customer.c_custkey)
        .join(
            F.broadcast(t.supplier),
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
        .join(F.broadcast(t.customer), o.o_custkey == t.customer.c_custkey)
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
