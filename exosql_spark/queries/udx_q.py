"""UDF/UDAF/UDTF catalog entries (SURVEY.md §2.10 — extension surface;
the reference's builtins are compile-time only)."""

from __future__ import annotations

from pyspark.sql import functions as F

from exosql_spark.catalog import register
from exosql_spark.io import Tables


@register(
    "udaf_weighted_avg",
    oracle="""
SELECT l_returnflag,
       floor((sum(l_extendedprice * l_quantity) / sum(l_quantity)) * 10000.0 + 0.5)
         / 10000.0 AS wavg_price
FROM lineitem
GROUP BY l_returnflag
""",
    tags=("udx", "agg"),
)
def udaf_weighted_avg(spark, sf_dir):
    """GROUPED_AGG pandas UDF (Arrow batches, numpy inside) checked
    against the algebraic oracle. Note: a UDAF blocks partial
    aggregation (all group rows shuffle to one place) — for 100 TB
    prefer algebraic forms (sum(v*w)/sum(w)) when they exist; the UDAF
    is for logic that genuinely isn't algebraic."""
    from exosql_spark.functions.udx import weighted_avg
    from exosql_spark.queries._util import fround

    t = Tables(spark, sf_dir)
    return t.lineitem.groupBy("l_returnflag").agg(
        fround(weighted_avg("l_extendedprice", "l_quantity"), 4).alias("wavg_price")
    )


@register(
    "udtf_split_words",
    oracle="""
SELECT d.doc_id, u.token, CAST(u.pos AS INT) AS pos
FROM (SELECT doc_id, string_split(text, ' ') AS toks
      FROM documents WHERE doc_id < 10) d,
     LATERAL (SELECT unnest(d.toks) AS token,
                     unnest(range(len(d.toks))) AS pos) u
""",
    tags=("udx", "source"),
)
def udtf_split_words(spark, sf_dir):
    """Python UDTF lateral-joined per document (the reference's only
    table function is hardcoded generate_series)."""
    from exosql_spark.functions.udx import register_all

    register_all(spark)
    t = Tables(spark, sf_dir)
    t.documents.filter(F.col("doc_id") < 10).createOrReplaceTempView("docs_small")
    return spark.sql(
        """
        SELECT d.doc_id, s.token, s.pos
        FROM docs_small d, LATERAL split_words(d.text) s
        """
    )


@register(
    "udf_scalar_rank_normalize",
    oracle="""
WITH r AS (
  SELECT c_custkey, c_nationkey,
         CAST(c_acctbal AS DOUBLE) AS bal,
         rank() OVER (PARTITION BY c_nationkey ORDER BY CAST(c_acctbal AS DOUBLE)) AS rk,
         count(*) OVER (PARTITION BY c_nationkey, c_acctbal) AS ties,
         count(*) OVER (PARTITION BY c_nationkey) AS n
  FROM customer
)
SELECT c_custkey, c_nationkey, bal,
       ((rk + (ties - 1) / 2.0) - 1) / greatest(n - 1, 1) AS acctbal_rank
FROM r
""",
    tags=("udx",),
)
def udf_scalar_rank_normalize(spark, sf_dir):
    """Arrow-batched pandas rank-normalize per nation group
    (applyInPandas — deterministic, unlike a per-batch scalar UDF, so
    the pandas path is exactly oracle-checkable against SQL window
    rank)."""
    from exosql_spark.functions.udx import rank_normalize_grouped

    t = Tables(spark, sf_dir)
    base = t.customer.select(
        "c_custkey", "c_nationkey", F.col("c_acctbal").cast("double").alias("bal")
    )
    return rank_normalize_grouped(base, "c_nationkey", "bal", "acctbal_rank")
