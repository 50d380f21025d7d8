"""Joins: cross/inner/left/right/theta/semi/anti/lateral.

SURVEY.md §2.3 rows J1–J7. Reference anchors:
``lib/exosql/executor.ex`` ``:cross_join``/``:inner_join``/``:left_join``/
``:right_join`` clauses; ``lib/exosql/expr.ex :: run_expr`` ``:in`` with
subquery (semi/anti).

The reference executes joins as nested-loop with an IN-qual semi-join
pushdown into the right scan. On Spark we declare the join and let
Catalyst pick: dimension tables (region/nation/supplier/customer at small
SF) go broadcast-hash (asserted in tests/test_plans.py); the big
fact-fact joins go sort-merge with AQE skew handling. At 100 TB the
orders⋈lineitem join is the shuffle that matters — both sides hash on the
orderkey, and AQE coalesces the output.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from exosql_spark.catalog import register
from exosql_spark.io import Tables
from exosql_spark.queries import _util as _u


@register(
    "join_inner_star",
    oracle="""
SELECT r.r_name, n.n_name,
       count(*) AS n_orders,
       floor((CAST(sum(CAST((o.o_totalprice) AS DECIMAL(25,6))) AS DOUBLE)) * 10000.0 + 0.5) / 10000.0 AS revenue
FROM orders o
JOIN customer c ON o.o_custkey = c.c_custkey
JOIN nation n   ON c.c_nationkey = n.n_nationkey
JOIN region r   ON n.n_regionkey = r.r_regionkey
GROUP BY r.r_name, n.n_name
""",
    tags=("join",),
    bench=True,
)
def join_inner_star(spark, sf_dir):
    """Inner equi-join chain over the star schema (J2). Dims broadcast."""
    t = Tables(spark, sf_dir)
    return (
        t.orders.join(
            t.customer, t.orders.o_custkey == t.customer.c_custkey
        )
        .join(F.broadcast(t.nation), F.col("c_nationkey") == F.col("n_nationkey"))
        .join(F.broadcast(t.region), F.col("n_regionkey") == F.col("r_regionkey"))
        .groupBy("r_name", "n_name")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            _u.dsum("o_totalprice").alias("revenue"),
        )
    )


@register(
    "join_left_outer",
    oracle="""
SELECT c.c_custkey, count(o.o_orderkey) AS n_orders
FROM customer c
LEFT JOIN orders o ON o.o_custkey = c.c_custkey AND o.o_totalprice > 200000
GROUP BY c.c_custkey
""",
    tags=("join",),
)
def join_left_outer(spark, sf_dir):
    """Left outer join with an extra ON predicate; unmatched customers
    keep a 0 count (nulls skipped by count(col)) (J3)."""
    t = Tables(spark, sf_dir)
    o, c = t.orders, t.customer
    return (
        c.join(
            o, (o.o_custkey == c.c_custkey) & (o.o_totalprice > 200000), "left"
        )
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("n_orders"))
    )


@register(
    "join_right_outer",
    oracle="""
SELECT n.n_name, count(s.s_suppkey) AS n_suppliers
FROM supplier s
RIGHT JOIN nation n ON s.s_nationkey = n.n_nationkey
GROUP BY n.n_name
""",
    tags=("join",),
)
def join_right_outer(spark, sf_dir):
    """Right outer join (J4) — nations with zero suppliers retained."""
    t = Tables(spark, sf_dir)
    s, n = t.supplier, t.nation
    return (
        s.join(n, s.s_nationkey == n.n_nationkey, "right")
        .groupBy("n_name")
        .agg(F.count("s_suppkey").alias("n_suppliers"))
    )


@register(
    "join_cross",
    oracle="""
SELECT r.r_name, n.n_name
FROM region r
CROSS JOIN nation n
""",
    tags=("join",),
)
def join_cross(spark, sf_dir):
    """Cartesian product (J1) — comma-FROM in the reference dialect."""
    t = Tables(spark, sf_dir)
    return t.region.crossJoin(t.nation).select("r_name", "n_name")


@register(
    "join_theta",
    oracle="""
SELECT s.s_suppkey, count(*) AS n_richer_customers
FROM supplier s
JOIN customer c ON c.c_acctbal > s.s_acctbal AND c.c_nationkey = s.s_nationkey
GROUP BY s.s_suppkey
""",
    tags=("join",),
)
def join_theta(spark, sf_dir):
    """Theta join (J5): one equi conjunct (hashable) + one range conjunct
    (residual) — Catalyst hashes on the equi key and filters, instead of
    a full BNLJ; this is the scalable shape for mixed conditions."""
    t = Tables(spark, sf_dir)
    s, c = t.supplier, t.customer
    return (
        s.join(
            c,
            (c.c_acctbal > s.s_acctbal) & (c.c_nationkey == s.s_nationkey),
            "inner",
        )
        .groupBy("s_suppkey")
        .agg(F.count(F.lit(1)).alias("n_richer_customers"))
    )


@register(
    "join_semi_in_subquery",
    oracle="""
SELECT c_custkey, c_name
FROM customer
WHERE c_custkey IN (SELECT o_custkey FROM orders WHERE o_totalprice > 300000)
""",
    tags=("join",),
)
def join_semi_in_subquery(spark, sf_dir):
    """IN (subquery) → left-semi join (J6). The reference evaluates this
    as an IN qual pushed into the scan; Spark's semi join is the
    distributed equivalent."""
    t = Tables(spark, sf_dir)
    big = t.orders.filter(F.col("o_totalprice") > 300000).select("o_custkey")
    return (
        t.customer.join(
            big, t.customer.c_custkey == big.o_custkey, "left_semi"
        ).select("c_custkey", "c_name")
    )


@register(
    "join_anti_not_in",
    oracle="""
SELECT c_custkey, c_name
FROM customer
WHERE c_custkey NOT IN (SELECT o_custkey FROM orders)
""",
    tags=("join",),
)
def join_anti_not_in(spark, sf_dir):
    """NOT IN (subquery) → left-anti join (J6). o_custkey is non-null in
    the testdata, so NOT IN and anti-join agree (ANSI NOT IN with nulls
    would yield empty — documented divergence of the shortcut)."""
    t = Tables(spark, sf_dir)
    keys = t.orders.select("o_custkey")
    return (
        t.customer.join(
            keys, t.customer.c_custkey == keys.o_custkey, "left_anti"
        ).select("c_custkey", "c_name")
    )


@register(
    "join_lateral",
    oracle="""
SELECT c.c_custkey, t.o_orderkey, t.o_totalprice
FROM customer c,
LATERAL (
  SELECT o_orderkey, o_totalprice
  FROM orders o
  WHERE o.o_custkey = c.c_custkey
  ORDER BY o_totalprice DESC, o_orderkey
  LIMIT 2
) t
""",
    tags=("join",),
)
def join_lateral(spark, sf_dir):
    """CROSS JOIN LATERAL (J7): top-2 orders per customer. Spark supports
    correlated lateral subqueries (3.2+); Catalyst decorrelates to a
    window-rank under the hood."""
    t = Tables(spark, sf_dir)
    t.customer.createOrReplaceTempView("customer")
    t.orders.createOrReplaceTempView("orders")
    return spark.sql(
        """
        SELECT c.c_custkey, t.o_orderkey, t.o_totalprice
        FROM customer c
        JOIN LATERAL (
          SELECT o_orderkey, o_totalprice
          FROM orders o
          WHERE o.o_custkey = c.c_custkey
          ORDER BY o_totalprice DESC, o_orderkey
          LIMIT 2
        ) t
        """
    )


@register(
    "join_fuzzy_names",
    oracle="""
SELECT a.s_suppkey AS id_a, b.s_suppkey AS id_b,
       CAST(levenshtein(a.s_name, b.s_name) AS INT) AS edit_dist
FROM supplier a JOIN supplier b ON a.s_suppkey < b.s_suppkey
WHERE levenshtein(a.s_name, b.s_name) <= 1
ORDER BY id_a, id_b
""",
    tags=("join", "fuzzy", "extension", "scale"),
    bench=True,  # entity-resolution join: tracked since round 7
)
def join_fuzzy_names(spark, sf_dir):
    """Fuzzy (edit-distance ≤ 1) self-join on supplier names via
    symmetric deletion neighborhoods (operators/fuzzy.py) — the
    entity-resolution primitive. The result is EXACT (candidates from
    the variant equi-join are a superset by the SymSpell property;
    a levenshtein filter verifies), so the oracle is the naive DuckDB
    cross product with the same predicate — pair-for-pair equality,
    while the Spark plan contains no cartesian product (asserted by
    the catalog-wide sweep in tests/test_plans.py)."""
    from exosql_spark.operators.fuzzy import fuzzy_self_pairs

    t = Tables(spark, sf_dir)
    sup = t.supplier.select("s_suppkey", "s_name")
    return fuzzy_self_pairs(sup, "s_name", "s_suppkey", max_dist=1).orderBy(
        "id_a", "id_b"
    )


# join_fuzzy_vocab_k2 and join_fuzzy_qgram_k3 are registered as the
# single join_fuzzy_radius_suite entry below (round-14 window-capacity
# consolidation); the per-radius callables and their rationale remain.


def _join_fuzzy_vocab_k2(spark, sf_dir):
    """Edit-distance ≤ 2 fuzzy self-join — drives the 2-deletion
    neighborhood RECURSION (operators/fuzzy.py deletion_neighborhood's
    frontier loop), which join_fuzzy_names (k=1) never enters; it was
    local-test-only before (round-7 verdict Next #5).

    Input is the DISTINCT part-name vocabulary (~64 names, min
    p_partkey as id) rather than supplier names: every supplier-name
    pair is within distance 2 at sf0.01 (the names differ only in
    their last two digits), which would make the k=2 result the full
    cross product — an oracle that cannot distinguish the fuzzy join
    from a cartesian. Dedup-before-fuzzy is also exactly the
    documented scale discipline for this operator (exact dedup removes
    the mass-duplicate hot keys; the fuzzy join runs on the
    vocabulary). 16 of the 24 result pairs are at distance exactly 2
    (measured, stable across SFs), so the recursion's candidates are
    load-bearing, and the oracle is the naive DuckDB cross product —
    pair-for-pair exact."""
    from exosql_spark.operators.fuzzy import fuzzy_self_pairs

    t = Tables(spark, sf_dir)
    vocab = t.part.groupBy("p_name").agg(F.min("p_partkey").alias("id"))
    return fuzzy_self_pairs(vocab, "p_name", "id", max_dist=2).orderBy(
        "id_a", "id_b"
    )


def _join_fuzzy_qgram_k3(spark, sf_dir):
    """Edit-distance ≤ 3 fuzzy self-join via the Q-GRAM COUNT FILTER
    (operators/fuzzy.py fuzzy_self_pairs_qgram, Gravano et al.
    VLDB'01) — the radius the deletion-neighborhood join deliberately
    refuses (its fan-out is O(|s|^k); its docstring names q-gram count
    filtering as the k ≥ 3 algorithm, and this entry closes that gap).

    Input: the distinct "p_name p_brand" vocabulary (~1130 strings of
    15–21 chars — long enough that the count bound max(|a|,|b|)−q+1−kq
    ≥ 8 shared bigrams has real pruning power; bare p_name at 7–12
    chars gives a bound ≤ 0, i.e. no filter at all). ~15 200 true
    pairs, ~4 260 at distance exactly 3 (measured, stable across SFs),
    so the bag-intersection machinery — occurrence-numbered gram join,
    count bound, levenshtein verify — is load-bearing, and the oracle
    is the naive DuckDB cross product, pair-for-pair exact. No short
    strings in this vocabulary, so the plan carries no nested-loop
    residue branch (the operator's count gate, plan-asserted in
    tests/test_fuzzy.py)."""
    from exosql_spark.operators.fuzzy import fuzzy_self_pairs_qgram

    t = Tables(spark, sf_dir)
    vocab = t.part.groupBy(
        F.concat_ws(" ", "p_name", "p_brand").alias("s")
    ).agg(F.min("p_partkey").alias("id"))
    return fuzzy_self_pairs_qgram(vocab, "s", "id", max_dist=3).orderBy(
        "id_a", "id_b"
    )


@register(
    "join_fuzzy_radius_suite",
    oracle="""
WITH v2 AS (
  SELECT p_name, min(p_partkey) AS id
  FROM part GROUP BY p_name
),
v3 AS (
  SELECT p_name || ' ' || p_brand AS s, min(p_partkey) AS id
  FROM part GROUP BY 1
)
SELECT 'deletion_k2' AS variant, a.id AS id_a, b.id AS id_b,
       CAST(levenshtein(a.p_name, b.p_name) AS INT) AS edit_dist
FROM v2 a JOIN v2 b ON a.id < b.id
WHERE levenshtein(a.p_name, b.p_name) <= 2
UNION ALL
SELECT 'qgram_k3', a.id, b.id,
       CAST(levenshtein(a.s, b.s) AS INT)
FROM v3 a JOIN v3 b ON a.id < b.id
WHERE levenshtein(a.s, b.s) <= 3
ORDER BY variant, id_a, id_b
""",
    tags=("join", "fuzzy", "extension", "scale"),
)
def join_fuzzy_radius_suite(spark, sf_dir):
    """Both beyond-k=1 fuzzy self-join algorithms as ONE driver row
    (window-capacity consolidation of join_fuzzy_vocab_k2 +
    join_fuzzy_qgram_k3, every pair preserved and variant-tagged):
    the 2-deletion-neighborhood recursion at radius 2 over the
    part-name vocabulary, and the q-gram count-filter join at radius
    3 over the longer name+brand vocabulary — each checked
    pair-for-pair against the naive DuckDB levenshtein cross product.
    The per-variant scale rationale lives on the private callables
    above; join_fuzzy_names (k=1, bench-tracked) is unchanged."""
    a = _join_fuzzy_vocab_k2(spark, sf_dir).select(
        F.lit("deletion_k2").alias("variant"), "id_a", "id_b", "edit_dist"
    )
    b = _join_fuzzy_qgram_k3(spark, sf_dir).select(
        F.lit("qgram_k3").alias("variant"), "id_a", "id_b", "edit_dist"
    )
    return a.unionByName(b).orderBy("variant", "id_a", "id_b")


@register(
    "join_null_safe_eq",
    oracle="""
WITH a AS (
  SELECT NULLIF(o_custkey % 50, 0) AS k, count(*) AS n_even
  FROM orders WHERE o_orderkey % 2 = 0 GROUP BY 1
),
b AS (
  SELECT NULLIF(o_custkey % 50, 0) AS k, count(*) AS n_odd
  FROM orders WHERE o_orderkey % 2 = 1 GROUP BY 1
)
SELECT a.k AS k, CAST(a.n_even AS BIGINT) AS n_even,
       CAST(b.n_odd AS BIGINT) AS n_odd
FROM a JOIN b ON a.k IS NOT DISTINCT FROM b.k
ORDER BY k NULLS FIRST
""",
    tags=("join", "null"),
)
def join_null_safe_eq(spark, sf_dir):
    """Null-safe equality join (``IS NOT DISTINCT FROM`` / Spark's
    ``eqNullSafe``/``<=>``): NULL keys MATCH each other instead of
    vanishing — the semantics every slowly-changing-dimension merge
    and nullable-foreign-key reconciliation needs, and a real physical
    difference: Catalyst plans null-safe equality as a HASH join key
    (null-safe keys hash like values), so it shuffles/broadcasts
    normally rather than degenerating to a nested-loop theta join.
    The planted NULLIF key guarantees a NULL group on both sides, so
    the hash proves the NULL↔NULL row actually joins (a plain
    equi-join would silently drop it — 1 row of 50 here, and exactly
    the row a wrong engine loses)."""
    t = Tables(spark, sf_dir)
    k = F.nullif(F.col("o_custkey") % 50, F.lit(0)).alias("k")
    a = (
        t.orders.filter(F.col("o_orderkey") % 2 == 0)
        .groupBy(k).agg(F.count(F.lit(1)).alias("n_even"))
    )
    b = (
        t.orders.filter(F.col("o_orderkey") % 2 == 1)
        .groupBy(k).agg(F.count(F.lit(1)).alias("n_odd"))
    )
    return (
        a.join(b, a["k"].eqNullSafe(b["k"]))
        .select(a["k"].alias("k"), "n_even", "n_odd")
        .orderBy(F.col("k").asc_nulls_first())
    )
