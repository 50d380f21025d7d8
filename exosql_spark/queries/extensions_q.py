"""Extension operator entries beyond the reference surface: as-of /
range / full-outer joins, statistical aggregates, GROUPING SETS,
pivot, EXISTS, richer window frames, string/array function zoo.

(All absent in serverboards/exosql — SURVEY.md §2.3 J8, §2.4 A7, §2.5
absence rows; first-class here because a real analytics engine needs
them and Spark gives most natively.)
"""

from __future__ import annotations

from pyspark.sql import Window as W
from pyspark.sql import functions as F

from exosql_spark.catalog import register
from exosql_spark.io import Tables
from exosql_spark.queries import _util as _u


# --------------------------------------------------------------------
# Time-series joins
# --------------------------------------------------------------------


@register(
    "join_asof_suite",
    oracle="""
WITH p AS (SELECT event_id, user_id, ts FROM events
           WHERE event_type = 'purchase'),
v AS (SELECT user_id, ts, event_id FROM events WHERE event_type = 'view'),
back AS (
  SELECT p.event_id, p.user_id, p.ts, v.ts AS ts_right,
         v.event_id AS matched_event_id
  FROM p ASOF LEFT JOIN v
    ON p.user_id = v.user_id AND v.ts <= p.ts
),
fwd AS (
  SELECT pn.event_id, pn.user_id, pn.ts, vn.ts AS ts_right,
         vn.event_id AS matched_event_id
  FROM (SELECT event_id, user_id, ts, -epoch(ts) AS nts FROM p) pn
  ASOF LEFT JOIN (SELECT user_id, ts, event_id, -epoch(ts) AS nts FROM v) vn
    ON pn.user_id = vn.user_id AND vn.nts <= pn.nts
),
near AS (
  SELECT p.event_id, p.user_id, p.ts,
         (SELECT v.ts FROM v WHERE v.user_id = p.user_id
          ORDER BY abs(epoch_ns(v.ts) - epoch_ns(p.ts)), v.ts
          LIMIT 1) AS ts_right,
         (SELECT v.event_id FROM v WHERE v.user_id = p.user_id
          ORDER BY abs(epoch_ns(v.ts) - epoch_ns(p.ts)), v.ts
          LIMIT 1) AS matched_event_id
  FROM p
)
SELECT 'backward' AS mode, * FROM back
UNION ALL SELECT 'forward', * FROM fwd
UNION ALL SELECT 'nearest', * FROM near
""",
    tags=("join", "extension", "timeseries"),
    bench=True,  # replaces the bench-tracked join_asof + join_asof_nearest
)
def join_asof_suite(spark, sf_dir):
    """As-of join, all three direction modes as tagged variants (r15
    window-capacity consolidation of join_asof / join_asof_forward /
    join_asof_nearest — same operator, three bound modes; every column
    of the three originals is preserved, the per-mode match column
    under the common name ``matched_event_id``):

    - ``backward``: each purchase gets the user's most recent
      at-or-before view — DuckDB's native ASOF JOIN is the oracle;
    - ``forward``: the user's next at-or-after view — DuckDB has no
      forward ASOF, so the oracle runs its backward ASOF over negated
      epoch seconds, which picks exactly the minimal ``v.ts >= p.ts``
      match;
    - ``nearest``: the view CLOSEST in time either side, equidistant
      ties taking the earlier view (pandas merge_asof semantics) —
      oracled by the definitional per-row correlated subquery
      (quadratic; fine for DuckDB at sf0.01, the exact shape
      asof.asof_join exists to avoid).

    Each variant is the union+window merge: ONE shuffle on user_id
    plus per-partition sorts, never a range explosion (nearest runs
    both carries over the same single shuffle).  The three variants
    share the purchases/views scans."""
    from exosql_spark.operators.asof import asof_join

    t = Tables(spark, sf_dir)
    purchases = t.events.filter(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "ts"
    )
    views = t.events.filter(F.col("event_type") == "view").select(
        "user_id", "ts", F.col("event_id").alias("matched_event_id")
    )
    parts = [
        asof_join(purchases, views, on="user_id", direction=mode)
        .withColumnRenamed("matched_event_id_right", "matched_event_id")
        .select(
            F.lit(mode).alias("mode"),
            "event_id",
            "user_id",
            "ts",
            "ts_right",
            "matched_event_id",
        )
        for mode in ("backward", "forward", "nearest")
    ]
    return parts[0].unionByName(parts[1]).unionByName(parts[2])


@register(
    "join_range",
    oracle="""
SELECT a.user_id, count(*) AS n_pairs
FROM events a
JOIN events b
  ON a.user_id = b.user_id
 AND date_diff('second', b.ts, a.ts) BETWEEN 0 AND 600
 AND a.event_id <> b.event_id
GROUP BY a.user_id
""",
    tags=("join", "extension", "timeseries"),
)
def join_range(spark, sf_dir):
    """Range join: ordered event pairs per user within 10 minutes. The
    equi key (user_id) is the shuffle key; the range predicate filters
    per-key — no cross-table explosion."""
    from exosql_spark.operators.asof import range_join

    t = Tables(spark, sf_dir)
    e = t.events.select("event_id", "user_id", "ts")
    joined = range_join(e, e, on="user_id", lower=0, upper=600)
    return (
        joined.filter(F.col("l.event_id") != F.col("r.event_id"))
        .groupBy(F.col("l.user_id").alias("user_id"))
        .agg(F.count(F.lit(1)).alias("n_pairs"))
    )


@register(
    "join_full_outer",
    oracle="""
SELECT coalesce(c.c_nationkey, s.s_nationkey) AS nationkey,
       count(DISTINCT c.c_custkey) AS n_customers,
       count(DISTINCT s.s_suppkey) AS n_suppliers
FROM customer c
FULL OUTER JOIN supplier s ON c.c_nationkey = s.s_nationkey
GROUP BY 1
""",
    tags=("join", "extension"),
)
def join_full_outer(spark, sf_dir):
    """Full outer join (J8 — absent in reference)."""
    t = Tables(spark, sf_dir)
    c, s = t.customer, t.supplier
    return (
        c.join(s, c.c_nationkey == s.s_nationkey, "full_outer")
        .groupBy(
            F.coalesce("c_nationkey", "s_nationkey").alias("nationkey")
        )
        .agg(
            F.countDistinct("c_custkey").alias("n_customers"),
            F.countDistinct("s_suppkey").alias("n_suppliers"),
        )
    )


@register(
    "subquery_exists",
    oracle="""
SELECT n_nationkey, n_name
FROM nation n
WHERE EXISTS (SELECT 1 FROM supplier s WHERE s.s_nationkey = n.n_nationkey)
  AND NOT EXISTS (SELECT 1 FROM customer c
                  WHERE c.c_nationkey = n.n_nationkey AND c.c_acctbal < 0)
""",
    tags=("subquery", "extension"),
)
def subquery_exists(spark, sf_dir):
    """Correlated EXISTS / NOT EXISTS (decorrelated to semi/anti joins
    by Catalyst). Identical SQL on both engines."""
    t = Tables(spark, sf_dir)
    t.nation.createOrReplaceTempView("nation")
    t.supplier.createOrReplaceTempView("supplier")
    t.customer.createOrReplaceTempView("customer")
    return spark.sql(
        """
        SELECT n_nationkey, n_name
        FROM nation n
        WHERE EXISTS (SELECT 1 FROM supplier s WHERE s.s_nationkey = n.n_nationkey)
          AND NOT EXISTS (SELECT 1 FROM customer c
                          WHERE c.c_nationkey = n.n_nationkey AND c.c_acctbal < 0)
        """
    )


# --------------------------------------------------------------------
# Statistical aggregates
# --------------------------------------------------------------------


@register(
    "agg_statistics",
    oracle=f"""
SELECT l_returnflag,
       {_u.fround_sql('stddev_samp(l_quantity)')} AS qty_stddev,
       {_u.fround_sql('var_samp(l_quantity)')}    AS qty_var,
       {_u.fround_sql('corr(l_quantity, l_extendedprice)', 6)} AS qty_price_corr,
       {_u.fround_sql('covar_samp(l_discount, l_tax)', 8)}     AS disc_tax_covar
FROM lineitem
GROUP BY l_returnflag
""",
    tags=("agg", "extension", "stats"),
)
def agg_statistics(spark, sf_dir):
    """stddev/variance/correlation/covariance (none in reference)."""
    t = Tables(spark, sf_dir)
    return t.lineitem.groupBy("l_returnflag").agg(
        _u.fround(F.stddev_samp("l_quantity"), 4).alias("qty_stddev"),
        _u.fround(F.var_samp("l_quantity"), 4).alias("qty_var"),
        _u.fround(F.corr("l_quantity", "l_extendedprice"), 6).alias(
            "qty_price_corr"
        ),
        _u.fround(F.covar_samp("l_discount", "l_tax"), 8).alias("disc_tax_covar"),
    )


@register(
    "agg_percentiles",
    oracle=f"""
SELECT l_returnflag,
       {_u.fround_sql('quantile_cont(l_extendedprice, 0.5)')} AS median_price,
       {_u.fround_sql('quantile_cont(l_extendedprice, 0.9)')} AS p90_price,
       {_u.fround_sql('quantile_cont(l_quantity, 0.25)')}     AS p25_qty
FROM lineitem
GROUP BY l_returnflag
""",
    tags=("agg", "extension", "stats"),
)
def agg_percentiles(spark, sf_dir):
    """Exact interpolated percentiles (Spark `percentile` == DuckDB
    quantile_cont). At 100 TB use approx_percentile (t-digest sketch,
    single pass, mergeable) — covered rows-only below."""
    t = Tables(spark, sf_dir)
    return t.lineitem.groupBy("l_returnflag").agg(
        _u.fround(F.percentile("l_extendedprice", F.lit(0.5)), 4).alias(
            "median_price"
        ),
        _u.fround(F.percentile("l_extendedprice", F.lit(0.9)), 4).alias("p90_price"),
        _u.fround(F.percentile("l_quantity", F.lit(0.25)), 4).alias("p25_qty"),
    )


@register(
    "agg_approx_percentile",
    oracle=None,  # approx_percentile is a GK/KLL-style sketch whose
    # error depends on merge order — not bit-reproducible in DuckDB;
    # bounds vs exact percentile_cont are asserted locally
    tags=("agg", "extension", "stats", "scale"),
)
def agg_approx_percentile(spark, sf_dir):
    """The 100 TB percentile: single-pass mergeable sketch."""
    t = Tables(spark, sf_dir)
    return t.lineitem.groupBy("l_returnflag").agg(
        F.approx_percentile("l_extendedprice", F.lit(0.5), F.lit(10000)).alias(
            "median_est"
        )
    )


@register(
    "agg_extremes_bitwise",
    oracle="""
SELECT m.l_returnflag,
       m.cheapest_order, m.priciest_order,
       b.lines_and, b.lines_or, b.lines_xor
FROM (
  SELECT l_returnflag,
         arg_min(l_orderkey, l_extendedprice) AS cheapest_order,
         arg_max(l_orderkey, l_extendedprice) AS priciest_order
  FROM (SELECT * FROM lineitem WHERE l_linenumber = 1) t
  GROUP BY l_returnflag
) m
JOIN (
  SELECT l_returnflag,
         bit_and(l_linenumber) AS lines_and,
         bit_or(l_linenumber)  AS lines_or,
         bit_xor(l_linenumber) AS lines_xor
  FROM lineitem
  GROUP BY l_returnflag
) b USING (l_returnflag)
""",
    tags=("agg", "extension"),
)
def agg_extremes_bitwise(spark, sf_dir):
    """min_by/max_by (DuckDB arg_min/arg_max) + bitwise aggregates
    (bit_and/or/xor — set-membership compaction tricks) as ONE driver
    row, joined on the shared l_returnflag grouping key (window-
    capacity consolidation of the former agg_min_max_by + agg_bitwise
    entries; every original column preserved).  The extremes side is
    restricted to l_linenumber=1 so the extremum is unique →
    deterministic."""
    t = Tables(spark, sf_dir)
    extremes = (
        t.lineitem.filter(F.col("l_linenumber") == 1)
        .groupBy("l_returnflag")
        .agg(
            F.min_by("l_orderkey", "l_extendedprice").alias("cheapest_order"),
            F.max_by("l_orderkey", "l_extendedprice").alias("priciest_order"),
        )
    )
    bitwise = t.lineitem.groupBy("l_returnflag").agg(
        F.bit_and("l_linenumber").alias("lines_and"),
        F.bit_or("l_linenumber").alias("lines_or"),
        F.bit_xor("l_linenumber").alias("lines_xor"),
    )
    return extremes.join(bitwise, "l_returnflag")


# GROUPING SETS moved into aggregates.agg_grouping_multi_suite
# (r15 window-capacity consolidation with rollup/cube)


@register(
    "pivot_status_priority",
    oracle="""
SELECT o_orderpriority,
       count(*) FILTER (WHERE o_orderstatus = 'O') AS status_O,
       count(*) FILTER (WHERE o_orderstatus = 'F') AS status_F,
       count(*) FILTER (WHERE o_orderstatus = 'P') AS status_P
FROM orders
GROUP BY o_orderpriority
""",
    tags=("agg", "extension"),
)
def pivot_status_priority(spark, sf_dir):
    """Pivot (long→wide). Spark's native pivot; oracle via FILTER aggs."""
    t = Tables(spark, sf_dir)
    out = (
        t.orders.groupBy("o_orderpriority")
        .pivot("o_orderstatus", ["O", "F", "P"])
        .count()
    )
    return out.select(
        "o_orderpriority",
        F.coalesce(F.col("O"), F.lit(0)).alias("status_O"),
        F.coalesce(F.col("F"), F.lit(0)).alias("status_F"),
        F.coalesce(F.col("P"), F.lit(0)).alias("status_P"),
    )


# --------------------------------------------------------------------
# Window frame extras
# --------------------------------------------------------------------


# first/last/nth_value moved into windows.py::window_analytic_suite
# (round-14 window-capacity consolidation).


# window_range_frame absorbed into windows.py::window_ntile_range_suite
# (round-17 window-capacity consolidation; window_ntile_percent merged
# there too — non-bench pair, so the bench query set stays
# byte-identical).


# --------------------------------------------------------------------
# Function zoo round 2
# --------------------------------------------------------------------


# fn_strings2 absorbed into functions_q.py::fn_strings
# (round-14 window-capacity consolidation).


@register(
    "fn_arrays",
    oracle="""
SELECT doc_id,
       len(toks)                                   AS n_toks,
       toks[1]                                     AS first_tok,
       toks[len(toks)]                             AS last_tok,
       array_to_string(toks[1:3], ' ')             AS first3,
       CAST(list_contains(toks, 'spark') AS INT)   AS has_spark,
       len(list_distinct(toks))                    AS n_distinct,
       array_to_string(list_sort(list_distinct(toks))[1:5], ',') AS top5_sorted
FROM (SELECT doc_id, string_split(text, ' ') AS toks
      FROM documents WHERE doc_id < 50) t
""",
    tags=("functions", "extension", "arrays"),
)
def fn_arrays(spark, sf_dir):
    """Array function family over tokenized text (size/element_at/
    slice/contains/distinct/sort)."""
    t = Tables(spark, sf_dir)
    toks = F.split("text", " ")
    base = t.documents.filter(F.col("doc_id") < 50).select(
        "doc_id", toks.alias("toks")
    )
    a = F.col("toks")
    return base.select(
        "doc_id",
        F.size(a).alias("n_toks"),
        F.element_at(a, 1).alias("first_tok"),
        F.element_at(a, -1).alias("last_tok"),
        F.array_join(F.slice(a, 1, 3), " ").alias("first3"),
        F.array_contains(a, "spark").cast("int").alias("has_spark"),
        F.size(F.array_distinct(a)).alias("n_distinct"),
        F.array_join(
            F.slice(F.array_sort(F.array_distinct(a)), 1, 5), ","
        ).alias("top5_sorted"),
    )


@register(
    "fn_maps",
    oracle="""
SELECT doc_id,
       CAST(m['lang'][1] AS VARCHAR)  AS m_lang,
       CAST(m['source'][1] AS VARCHAR) AS m_source,
       len(map_keys(m)) AS n_keys
FROM (SELECT doc_id, MAP {'lang': lang, 'source': source} AS m
      FROM documents WHERE doc_id < 20) t
""",
    tags=("functions", "extension", "maps"),
)
def fn_maps(spark, sf_dir):
    """Map type family: construction, key lookup, map_keys."""
    t = Tables(spark, sf_dir)
    m = F.create_map(
        F.lit("lang"), F.col("lang"), F.lit("source"), F.col("source")
    )
    return t.documents.filter(F.col("doc_id") < 20).select(
        "doc_id",
        m["lang"].alias("m_lang"),
        m["source"].alias("m_source"),
        F.size(F.map_keys(m)).alias("n_keys"),
    )


@register(
    "setops_all_variants",
    oracle="""
SELECT 'except' AS variant, nationkey, CAST(1 AS BIGINT) AS n FROM (
  SELECT n_nationkey AS nationkey FROM nation
  EXCEPT
  SELECT s_nationkey AS nationkey FROM supplier
)
UNION ALL
SELECT 'intersect', nationkey, CAST(1 AS BIGINT) FROM (
  SELECT c_nationkey AS nationkey FROM customer
  INTERSECT
  SELECT s_nationkey AS nationkey FROM supplier
)
UNION ALL
SELECT 'intersect_all', nationkey, count(*) FROM (
  SELECT c_nationkey AS nationkey FROM customer
  INTERSECT ALL
  SELECT s_nationkey AS nationkey FROM supplier
) GROUP BY nationkey
UNION ALL
SELECT 'union', nationkey, CAST(1 AS BIGINT) FROM (
  SELECT c_nationkey AS nationkey FROM customer
  UNION
  SELECT s_nationkey AS nationkey FROM supplier
)
ORDER BY variant, nationkey
""",
    tags=("setop", "extension"),
)
def setops_all_variants(spark, sf_dir):
    """All four dedup/multiplicity set-operation semantics as ONE
    driver row (U1 UNION-distinct + U4 INTERSECT / INTERSECT ALL /
    EXCEPT — window-capacity consolidation of the former
    union_distinct / intersect_extension / except_extension entries):
    each variant's rows are tagged and separately value-hashed, n
    carries INTERSECT ALL's multiplicity (1 for the distinct
    variants).  UNION ALL (the reference's plain-UNION semantics,
    SURVEY §2.7 U1 note) keeps its own entry in setops.py.

    Fronted for driver re-verification in the r15 window (ADVICE r14:
    the r14 rewrite absorbing the three variant entries shipped after
    this entry's last driver row, so its driver evidence predated the
    rewrite — this edit re-fronts it through the change-aware tier)."""
    t = Tables(spark, sf_dir)
    c = t.customer.select(F.col("c_nationkey").alias("nationkey"))
    s = t.supplier.select(F.col("s_nationkey").alias("nationkey"))
    nn = t.nation.select(F.col("n_nationkey").alias("nationkey"))
    one = F.lit(1).cast("long")

    def tag(df, v, n):
        return df.select(
            F.lit(v).alias("variant"), "nationkey", n.alias("n")
        )

    exc = tag(nn.exceptAll(s).distinct(), "except", one)
    itc = tag(c.intersect(s), "intersect", one)
    ita = c.intersectAll(s).groupBy("nationkey").agg(
        F.count(F.lit(1)).alias("_n")
    )
    ita = ita.select(
        F.lit("intersect_all").alias("variant"), "nationkey",
        F.col("_n").alias("n"),
    )
    uni = tag(c.union(s).distinct(), "union", one)
    return (
        exc.unionByName(itc)
        .unionByName(ita)
        .unionByName(uni)
        .orderBy("variant", "nationkey")
    )


@register(
    "fn_nondeterministic",
    oracle=None,  # uuid()/rand() outputs are nondeterministic by
    # definition — the check that CAN exist (format/range/uniqueness
    # invariants) runs in local tests; no cross-engine oracle is possible
    tags=("functions", "compat"),
)
def fn_nondeterministic(spark, sf_dir):
    """Reference builtins uuid() / random() / randint(a,b)
    (``builtins.ex`` misc section) — shape/range checked rows-only."""
    t = Tables(spark, sf_dir)
    return t.region.select(
        "r_regionkey",
        F.expr("uuid()").alias("row_uuid"),
        F.rand(seed=42).alias("random_val"),
        (F.floor(F.rand(seed=7) * 10) + 1).cast("int").alias("randint_1_10"),
    )


@register(
    "fn_fuzzy_strings",
    oracle="""
SELECT c_custkey,
       levenshtein(c_mktsegment, 'BUILDING') AS lev_building,
       CAST(jaccard(lower(c_mktsegment), 'building') >= 0.99 AS INT) AS is_building_jac
FROM customer
WHERE c_custkey <= 50
""",
    tags=("functions", "extension", "fuzzy"),
)
def fn_fuzzy_strings(spark, sf_dir):
    """Fuzzy string matching: edit distance (both engines agree
    exactly) + a character-set Jaccard equality check. The fuzzy-dedup
    primitive for short fields (names/titles)."""
    t = Tables(spark, sf_dir)
    seg = F.col("c_mktsegment")
    # DuckDB jaccard() is character-multiset based; replicate with a
    # char-split + array ops so both engines compute the same thing
    def charset(c):
        return F.array_distinct(F.split(F.lower(c), ""))

    inter = F.size(F.array_intersect(charset(seg), charset(F.lit("building"))))
    union = F.size(F.array_union(charset(seg), charset(F.lit("building"))))
    return t.customer.filter(F.col("c_custkey") <= 50).select(
        "c_custkey",
        F.levenshtein(seg, F.lit("BUILDING")).alias("lev_building"),
        ((inter / union) >= 0.99).cast("int").alias("is_building_jac"),
    )


# bitwise aggregates merged into agg_extremes_bitwise above
# (round-14 window-capacity consolidation).


@register(
    "sample_fraction",
    oracle=None,  # Spark's Bernoulli sampler (XORShift per partition)
    # is not reproducible in DuckDB — no exact oracle can exist; rate
    # and subset invariants are asserted locally
    tags=("extension", "scale"),
)
def sample_fraction(spark, sf_dir):
    """Bernoulli sampling with a fixed seed (deterministic within
    Spark) — the cheap way to develop against a 100 TB table."""
    t = Tables(spark, sf_dir)
    return t.lineitem.sample(fraction=0.1, seed=42).select(
        "l_orderkey", "l_linenumber"
    )


@register(
    "agg_listagg",
    oracle="""
SELECT r_name,
       string_agg(n_name, ',' ORDER BY n_name) AS nations
FROM nation JOIN region ON n_regionkey = r_regionkey
GROUP BY r_name
ORDER BY r_name
""",
    tags=("agg", "extension"),
)
def agg_listagg(spark, sf_dir):
    """SQL:2016 LISTAGG ... WITHIN GROUP (Spark 4 `listagg` ↔ DuckDB
    `string_agg(... ORDER BY)`): deterministic ordered string
    aggregation — the explicit within-group ORDER is what makes the
    result hash-stable across engines (a bare collect order is not)."""
    t = Tables(spark, sf_dir)
    return (
        t.nation.join(t.region, t.nation.n_regionkey == t.region.r_regionkey)
        .groupBy("r_name")
        .agg(
            F.expr("listagg(n_name, ',') WITHIN GROUP (ORDER BY n_name)").alias(
                "nations"
            )
        )
        .orderBy("r_name")
    )


@register(
    "unpivot_melt",
    oracle="""
SELECT l_orderkey, l_linenumber, measure, value FROM (
  SELECT l_orderkey, l_linenumber, 'l_quantity' AS measure, l_quantity AS value FROM lineitem
  UNION ALL
  SELECT l_orderkey, l_linenumber, 'l_extendedprice', l_extendedprice FROM lineitem
  UNION ALL
  SELECT l_orderkey, l_linenumber, 'l_discount', l_discount FROM lineitem
  UNION ALL
  SELECT l_orderkey, l_linenumber, 'l_tax', l_tax FROM lineitem
)
WHERE l_orderkey < 1000
ORDER BY l_orderkey, l_linenumber, measure
""",
    tags=("extension",),
)
def unpivot_melt(spark, sf_dir):
    """UNPIVOT/melt (pivot's inverse — `DataFrame.unpivot`, ANSI
    UNPIVOT semantics): wide measure columns become (measure, value)
    rows. The oracle states it as the portable UNION ALL desugaring.
    Narrow transform — fuses into the scan, rows fan out 4× with no
    shuffle."""
    t = Tables(spark, sf_dir)
    return (
        t.lineitem.filter(F.col("l_orderkey") < 1000)
        .select("l_orderkey", "l_linenumber", "l_quantity",
                "l_extendedprice", "l_discount", "l_tax")
        .unpivot(
            ["l_orderkey", "l_linenumber"],
            ["l_quantity", "l_extendedprice", "l_discount", "l_tax"],
            "measure",
            "value",
        )
        .orderBy("l_orderkey", "l_linenumber", "measure")
    )


@register(
    "skew_salted_agg",
    oracle="""
SELECT l_suppkey,
       count(*) AS n_items,
       floor(CAST(sum(CAST(l_quantity AS DECIMAL(25,6))) AS DOUBLE) * CAST(10000.0 AS DOUBLE) + 0.5)
         / CAST(10000.0 AS DOUBLE) AS total_qty
FROM lineitem
GROUP BY l_suppkey
""",
    tags=("extension", "scale", "skew"),
)
def skew_salted_agg(spark, sf_dir):
    """Two-stage salted aggregation (operators/skew.py): every key
    splits into 16 (key, salt) subkeys whose partials merge in a second
    stage — the heavy-hitter groupBy pattern when one key's reducer
    state would OOM. Counts and decimal sums are decomposable, so the
    result equals the plain GROUP BY exactly — which is precisely what
    the oracle checks (salting must never change answers)."""
    from exosql_spark.operators.skew import salted_agg

    t = Tables(spark, sf_dir)
    out = salted_agg(
        t.lineitem,
        ["l_suppkey"],
        [
            F.count(F.lit(1)).alias("_c"),
            F.sum(F.col("l_quantity").cast("decimal(25,6)")).alias("_s"),
        ],
        [F.sum("_c").alias("n_items"), F.sum("_s").alias("_sd")],
    )
    return out.select(
        "l_suppkey",
        "n_items",
        _u.fround(F.col("_sd").cast("double"), 4).alias("total_qty"),
    )


@register(
    "skew_salted_join",
    oracle="""
SELECT c_mktsegment,
       count(*) AS n_orders,
       floor(CAST(sum(CAST(o_totalprice AS DECIMAL(25,6))) AS DOUBLE) * CAST(10000.0 AS DOUBLE) + 0.5)
         / CAST(10000.0 AS DOUBLE) AS total_price
FROM orders JOIN customer ON o_custkey = c_custkey
GROUP BY c_mktsegment
""",
    tags=("extension", "scale", "skew"),
)
def skew_salted_join(spark, sf_dir):
    """Salted skew-resistant equi-join (operators/skew.py): the big
    side's key gets a random salt, the small side replicates across
    all 8 salt values, the join runs on (key, salt) — spreading a hot
    key over 8 tasks when AQE's skew splitting can't apply (e.g.
    broadcast-ineligible build sides). The oracle is the PLAIN join:
    salting must be invisible in the result."""
    from exosql_spark.operators.skew import salted_join

    t = Tables(spark, sf_dir)
    small = t.customer.select(
        F.col("c_custkey").alias("o_custkey"), "c_mktsegment"
    )
    joined = salted_join(t.orders, small, "o_custkey", n_salts=8)
    return joined.groupBy("c_mktsegment").agg(
        F.count(F.lit(1)).alias("n_orders"),
        _u.dsum("o_totalprice").alias("total_price"),
    )


@register(
    "stats_equidepth_histogram",
    oracle="""
WITH r AS (
  SELECT l_extendedprice,
         row_number() OVER (ORDER BY l_extendedprice, l_orderkey, l_linenumber)
           AS rnk,
         count(*) OVER () AS n
  FROM lineitem
)
SELECT CAST(floor(((rnk - 1) * 16) / CAST(n AS DOUBLE)) + 1 AS INT) AS bucket,
       CAST(count(*) AS BIGINT) AS n_rows,
       min(l_extendedprice) AS lo,
       max(l_extendedprice) AS hi
FROM r GROUP BY 1 ORDER BY 1
""",
    tags=("extension", "stats", "scale"),
    bench=True,  # plan-novel: third global-rank consumer, tracked since r12
)
def stats_equidepth_histogram(spark, sf_dir):
    """Equi-DEPTH (equal-population) 16-bucket histogram of
    ``l_extendedprice`` — the statistic optimizers and skew detectors
    want (equi-WIDTH buckets starve on skewed data; width_bucket is
    already covered by fn_math_width_bucket).  The oracle's
    ``row_number() OVER (ORDER BY …)`` / ``ntile`` desugaring is THE
    single-task global window; the Spark side reuses
    selection.global_rank (range partition → broadcast prefix-sum
    offsets → per-range windows), so the same exact bucket boundaries
    come out of a plan whose largest task sorts rows/P — the third
    consumer of the distributed-rank primitive (deciles, curriculum,
    now optimizer statistics)."""
    from exosql_spark.operators import selection

    t = Tables(spark, sf_dir)
    li = t.lineitem.select("l_extendedprice", "l_orderkey", "l_linenumber")
    ranked = selection.global_rank(
        li,
        [F.col("l_extendedprice"), F.col("l_orderkey"), F.col("l_linenumber")],
        rank_col="rnk",
        total_col="_n",
    )
    bucket = (
        F.floor(((F.col("rnk") - 1) * 16) / F.col("_n").cast("double")) + 1
    ).cast("int")
    return (
        ranked.withColumn("bucket", bucket)
        .groupBy("bucket")
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.min("l_extendedprice").alias("lo"),
            F.max("l_extendedprice").alias("hi"),
        )
        .orderBy("bucket")
    )


_ZORDER_TERMS = " + ".join(
    f"(((x >> {b}) & 1) << {2 * b}) + (((y >> {b}) & 1) << {2 * b + 1})"
    for b in range(6)
)


@register(
    "layout_zorder_key",
    oracle=f"""
WITH pts AS (
  SELECT CAST(doc_id % 64 AS BIGINT) AS x,
         CAST((doc_id // 64) % 64 AS BIGINT) AS y
  FROM documents
), keyed AS (
  SELECT x, y, {_ZORDER_TERMS} AS zkey FROM pts
)
SELECT CAST(zkey >> 8 AS BIGINT) AS zblock,
       CAST(count(*) AS BIGINT) AS n_rows,
       CAST(min(zkey) AS BIGINT) AS zmin,
       CAST(max(zkey) AS BIGINT) AS zmax,
       CAST(min(x) AS BIGINT) AS xmin, CAST(max(x) AS BIGINT) AS xmax,
       CAST(min(y) AS BIGINT) AS ymin, CAST(max(y) AS BIGINT) AS ymax
FROM keyed
GROUP BY 1 ORDER BY 1
""",
    tags=("extension", "layout", "scale"),
    bench=True,  # plan-novel: projection+write+pruned-read lifecycle, tracked since r13
)
def layout_zorder_key(spark, sf_dir):
    """Morton/Z-order interleave key cross-checked bit-for-bit against
    DuckDB's integer bit arithmetic (both engines compute the same
    shift/mask sum — a single wrong bit position scrambles zmin/zmax
    everywhere).  The per-zblock x/y bounding boxes in the output ARE
    the pruning story: each 256-cell z-range block covers a tight
    16x16 tile of the 64x64 grid, which is why per-file footer stats
    bound BOTH columns after a z-ordered write (measured file-by-file
    in tests/test_sinks.py::TestZOrderLayout) while a lexicographic
    sort bounds only its leading column.  sinks.zorder_key /
    write_zordered are the production write path."""
    from exosql_spark.sinks import zorder_key

    t = Tables(spark, sf_dir)
    pts = t.documents.select(
        (F.col("doc_id") % 64).cast("long").alias("x"),
        ((F.col("doc_id") / 64).cast("long") % 64).alias("y"),
    )
    keyed = pts.withColumn("zkey", zorder_key([F.col("x"), F.col("y")], bits=6))
    return (
        keyed.groupBy(F.shiftright("zkey", 8).alias("zblock"))
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.min("zkey").alias("zmin"),
            F.max("zkey").alias("zmax"),
            F.min("x").alias("xmin"),
            F.max("x").alias("xmax"),
            F.min("y").alias("ymin"),
            F.max("y").alias("ymax"),
        )
        .orderBy("zblock")
    )


@register(
    "stats_join_size_cms",
    oracle="""
WITH a AS (SELECT user_id FROM events
           WHERE event_type = 'view' AND user_id IS NOT NULL),
b AS (SELECT user_id FROM events
      WHERE event_type = 'purchase' AND user_id IS NOT NULL),
ds AS (SELECT unnest([0, 1, 2, 3]) AS d),
ad AS (
  SELECT d,
         CAST(('0x' || substr(md5(CAST(user_id AS VARCHAR) || ':jc'
                                  || CAST(d AS VARCHAR)), 1, 15)) AS BIGINT)
           % 1024 AS bucket,
         count(*) AS n
  FROM a CROSS JOIN ds GROUP BY 1, 2
),
bd AS (
  SELECT d,
         CAST(('0x' || substr(md5(CAST(user_id AS VARCHAR) || ':jc'
                                  || CAST(d AS VARCHAR)), 1, 15)) AS BIGINT)
           % 1024 AS bucket,
         count(*) AS n
  FROM b CROSS JOIN ds GROUP BY 1, 2
),
est AS (
  SELECT min(s) AS est FROM (
    SELECT ad.d, sum(ad.n * bd.n) AS s
    FROM ad JOIN bd ON ad.d = bd.d AND ad.bucket = bd.bucket
    GROUP BY 1
  )
),
ex AS (
  SELECT sum(x.an * y.bn) AS exact_size
  FROM (SELECT user_id, count(*) AS an FROM a GROUP BY 1) x
  JOIN (SELECT user_id, count(*) AS bn FROM b GROUP BY 1) y USING (user_id)
)
SELECT CAST(ex.exact_size AS BIGINT) AS exact_size,
       CAST(est.est AS BIGINT) AS cms_estimate
FROM ex, est
""",
    tags=("extension", "stats", "sketch", "scale"),
    bench=True,  # plan-novel: bounded sketch build + tiny broadcast compare, tracked since r13
)
def stats_join_size_cms(spark, sf_dir):
    """Join-cardinality estimation WITHOUT executing the join — the
    optimizer-statistics question that picks broadcast vs shuffle vs
    pre-bucket at 100 TB.  Count-min inner product (Cormode &
    Muthukrishnan 2005): each side's key-frequency vector sketches to
    a 4×1024 table in one map-side-combined pass (output bounded by
    depth×width, never the data); the estimate is min over depths of
    the bucketwise product sum, an upper bound on the true Σₖ aₖ·bₖ.
    Because the bucket hash is the engine-portable seeded md5
    (``hash60``), DuckDB builds the IDENTICAL sketch — the ESTIMATE
    itself is exact-oracled, not just the true size computed alongside
    (the sketch math can't drift silently).  The entry's single output
    row carries both; the CM guarantee (estimate ≥ exact, close under
    low collision load: 150 keys in 1024 buckets) is thereby
    driver-checked too."""
    from exosql_spark.operators import sketch

    t = Tables(spark, sf_dir)
    ev = t.events.filter(F.col("user_id").isNotNull())
    a = ev.filter(F.col("event_type") == "view").select("user_id")
    b = ev.filter(F.col("event_type") == "purchase").select("user_id")
    cms_a = sketch.cms_counts(a, F.col("user_id"), depth=4, width=1024, salt="jc")
    cms_b = sketch.cms_counts(b, F.col("user_id"), depth=4, width=1024, salt="jc")
    est = sketch.cms_join_size_estimate(cms_a, cms_b, width=1024)
    exact = (
        a.groupBy("user_id")
        .agg(F.count(F.lit(1)).alias("an"))
        .join(b.groupBy("user_id").agg(F.count(F.lit(1)).alias("bn")), "user_id")
        .agg(F.sum(F.col("an") * F.col("bn")).alias("exact_size"))
    )
    return exact.crossJoin(est).select(
        F.col("exact_size").cast("long"),
        F.col("est").cast("long").alias("cms_estimate"),
    )


@register(
    "stats_table_profile",
    oracle="""
SELECT col, CAST(n AS BIGINT) AS n, CAST(n_null AS BIGINT) AS n_null,
       CAST(ndv AS BIGINT) AS ndv, min_s, max_s
FROM (
  SELECT 'o_custkey' AS col, count(*) AS n,
         count(*) - count(o_custkey) AS n_null,
         count(DISTINCT o_custkey) AS ndv,
         CAST(min(o_custkey) AS VARCHAR) AS min_s,
         CAST(max(o_custkey) AS VARCHAR) AS max_s
  FROM orders
  UNION ALL
  SELECT 'o_orderpriority', count(*), count(*) - count(o_orderpriority),
         count(DISTINCT o_orderpriority),
         CAST(min(o_orderpriority) AS VARCHAR),
         CAST(max(o_orderpriority) AS VARCHAR)
  FROM orders
  UNION ALL
  SELECT 'o_totalprice', count(*), count(*) - count(o_totalprice),
         count(DISTINCT o_totalprice),
         CAST(CAST(min(o_totalprice) AS DECIMAL(18,2)) AS VARCHAR),
         CAST(CAST(max(o_totalprice) AS DECIMAL(18,2)) AS VARCHAR)
  FROM orders
)
ORDER BY col
""",
    tags=("extension", "stats"),
)
def stats_table_profile(spark, sf_dir):
    """ANALYZE-style per-column table profile — (rows, nulls, exact
    NDV, min, max) for a column list in ONE job: the statistics pass
    every warehouse runs before choosing join orders, and the shape
    cost-based optimization at 100 TB depends on.  Plan shape: one
    aggregate per profiled column over a single scan (Catalyst plans
    multi-count-distinct via Expand — rows × |cols| intermediate, each
    slice map-side-combined; exact NDV is the deliberate choice here,
    the sketched variant is ``approx_count_distinct`` /
    ``events_hll_sketch_rollup``), then a tiny union of 1-row frames.
    min/max stringify so heterogeneous column types share one output
    schema — same convention as DuckDB's SUMMARIZE.

    Reference parity: exosql exposes table statistics through its
    planner hooks (SURVEY.md §2 S1's pushdown metadata); this is the
    user-facing statistics surface."""
    t = Tables(spark, sf_dir)
    o = t.orders

    def _s(col):
        # doubles route through DECIMAL(18,2) before stringifying:
        # double→string FORMATTING is engine-specific (scientific
        # notation thresholds differ), decimal→string is not
        c = F.col(col)
        if dict(o.dtypes)[col] == "double":
            c = c.cast("decimal(18,2)")
        return c

    parts = []
    for c in ("o_custkey", "o_orderpriority", "o_totalprice"):
        parts.append(
            o.agg(
                F.lit(c).alias("col"),
                F.count(F.lit(1)).alias("n"),
                (F.count(F.lit(1)) - F.count(c)).alias("n_null"),
                F.count_distinct(F.col(c)).alias("ndv"),
                F.min(_s(c)).cast("string").alias("min_s"),
                F.max(_s(c)).cast("string").alias("max_s"),
            )
        )
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out.orderBy("col")


@register(
    "stats_quantile_bottomk",
    oracle="""
WITH s AS (
  SELECT CAST(('0x' || substr(md5(
           CAST(l_orderkey AS VARCHAR) || '-' || CAST(l_linenumber AS VARCHAR)
           || ':qk'), 1, 15)) AS BIGINT) AS hk,
         l_extendedprice AS x
  FROM lineitem
  ORDER BY hk LIMIT 512
),
r AS (
  SELECT x, row_number() OVER (ORDER BY x) AS rk, count(*) OVER () AS n
  FROM s
)
SELECT v.q AS q, r.x AS est, CAST(r.n AS BIGINT) AS sample_n
FROM r JOIN (VALUES (0.5), (0.9), (0.99)) v(q)
  ON r.rk = CAST(CEIL(v.q * r.n) AS INT)
ORDER BY q
""",
    tags=("extension", "stats", "sketch", "scale"),
)
def stats_quantile_bottomk(spark, sf_dir):
    """Mergeable quantile sketch — the percentile member of the sketch
    family (CMS join-size, HLL distinct-count, and now bottom-k
    quantiles): a fixed-k uniform sample by smallest seeded hash
    (operators/sketch.bottomk_sample, Cohen & Kaplan 2007), quantiles
    read off the sorted sample at rank ceil(q·n).  Because the sample
    is hash-determined rather than RNG-drawn, the ESTIMATES themselves
    are exact-oracled — DuckDB draws the identical 512 rows — and the
    sketch is mergeable (bottom-k of unions = bottom-k of parts'
    bottom-ks; asserted exactly in tests/test_operators.py).  At
    100 TB this is the one-pass bounded-memory percentile answer:
    per-partition k-heaps, a k-row merge, no full sort — the exact
    twin (stats_equidepth_histogram) pays a corpus-wide range
    exchange instead."""
    from exosql_spark.operators import sketch

    t = Tables(spark, sf_dir)
    li = t.lineitem.select(
        F.concat_ws(
            "-",
            F.col("l_orderkey").cast("string"),
            F.col("l_linenumber").cast("string"),
        ).alias("rid"),
        F.col("l_extendedprice").alias("x"),
    )
    s = sketch.bottomk_sample(li, F.col("rid"), k=512, salt="qk")
    est = sketch.quantiles_from_sample(s, [0.5, 0.9, 0.99])
    n = s.agg(F.count(F.lit(1)).alias("sample_n"))
    return est.crossJoin(F.broadcast(n)).orderBy("q")
