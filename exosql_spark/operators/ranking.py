"""Corpus term-ranking operators — TF-IDF term weighting and BM25
keyword retrieval over the documents table (beyond-reference LLM-
pipeline surface; the reference has no text-retrieval operators).

Scale design (both operators):

- One explode pass produces (doc, term) pairs; every aggregation
  after that is keyed on ``term`` or the document id, so the shuffles
  carry small (key, count) tuples — never document text.
- Corpus-level scalars (document count, average doc length) are
  computed as 1-row aggregates and attached via ``crossJoin`` of a
  broadcast single row: they stay inside the job graph (no driver
  ``collect``) and cost one broadcast of a few bytes.
- IDF / score arithmetic is written as the *same* IEEE-double
  expression sequence in the DataFrame code and the DuckDB oracle
  SQL, with :func:`exosql_spark.queries._util.fround` applied at the
  end, so cross-engine comparisons are bit-stable.

At 100 TB the explode output is wide but the two-stage hash
aggregation (partial map-side combine) reduces it before the
exchange; the term dictionary after aggregation is tiny relative to
the corpus, so the final ``broadcast`` joins of idf tables are the
right physical plan and are hinted explicitly.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from exosql_spark.cache import managed_persist_disk



def _terms(df: DataFrame, text_col: str, id_col: str) -> DataFrame:
    """(id, term) pairs — whitespace tokens, the corpus's native shape."""
    return df.select(
        F.col(id_col), F.explode(F.split(F.col(text_col), " ")).alias("term")
    )


# --------------------------------------------------------------------
# SQL-text expression builders (r18 optimization round, guide §1.2):
# the BM25/TF-IDF/RRF score trees below were composed through the
# Column API on every query construction (~0.17 ms of py4j round-trip
# latency per node; bm25_topk alone measured ~0.30 s of build per
# run across three bench entries). Rendering each aggregate/score as
# one F.expr/selectExpr string collapses the build to a handful of
# round trips. Double literals are spelled `CAST(x AS DOUBLE)`/`xD`
# so the SQL parses to the IDENTICAL double-typed tree F.lit builds
# (bare SQL decimals would silently switch the arithmetic to
# DECIMAL). Values pinned by TestSqlTextBuilderEquivalence.
# --------------------------------------------------------------------


def _sql_str(s: str) -> str:
    """Single-quote a string literal for embedding in SQL text."""
    return "'" + s.replace("\\", "\\\\").replace("'", "\\'") + "'"


def tfidf_top_terms(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 25,
    nd: int = 4,
) -> DataFrame:
    """Top-``k`` corpus terms by summed TF-IDF weight.

    Smoothed IDF (sklearn's convention): ``idf = ln((1+N)/(1+df)) + 1``
    with ``N`` = corpus size, ``df`` = number of documents containing
    the term. Score = ``total_tf * idf`` — the corpus-level mass each
    term contributes. Deterministic ordering: score desc, then term.
    """
    terms = _terms(df, text_col, id_col)
    n_docs = df.agg(F.count(F.lit(1)).alias("n_docs"))
    per_term = terms.groupBy("term").agg(
        F.expr("count(1) AS total_tf"),
        F.expr(f"count(DISTINCT `{id_col}`) AS doc_freq"),
    )
    # SQL-text score (r18 — block comment at _sql_str); same tree as
    # the fround(total_tf * idf) Column form.
    s = float(10**nd)
    idf = f"(ln(({1.0}D + n_docs) / ({1.0}D + doc_freq)) + {1.0}D)"
    tfidf = f"floor((total_tf * {idf}) * {s}D + 0.5D) / {s}D"
    return (
        per_term.crossJoin(F.broadcast(n_docs))
        .selectExpr("term", "total_tf", "doc_freq", f"{tfidf} AS tfidf")
        .orderBy(F.col("tfidf").desc(), "term")
        .limit(k)
    )


def tfidf_top_terms_sql(k: int = 25, nd: int = 4) -> str:
    """DuckDB oracle for :func:`tfidf_top_terms` — identical IEEE
    expression sequence (see module docstring)."""
    from exosql_spark.queries._util import fround_sql

    one = "CAST(1.0 AS DOUBLE)"  # keep DuckDB in pure-double arithmetic
    score = fround_sql(
        f"total_tf * (ln(({one} + n_docs) / ({one} + doc_freq)) + {one})", nd
    )
    return f"""
WITH terms AS (
  SELECT doc_id, unnest(string_split(text, ' ')) AS term FROM documents
),
per_term AS (
  SELECT term, count(*) AS total_tf, count(DISTINCT doc_id) AS doc_freq
  FROM terms GROUP BY term
),
n AS (SELECT count(*) AS n_docs FROM documents)
SELECT term, total_tf, doc_freq, {score} AS tfidf
FROM per_term, n
ORDER BY tfidf DESC, term
LIMIT {k}
"""


def bm25_topk(
    df: DataFrame,
    query_terms: list[str],
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 20,
    k1: float = 1.2,
    b: float = 0.75,
    nd: int = 4,
) -> DataFrame:
    """BM25 keyword retrieval: top-``k`` documents for ``query_terms``
    (Robertson/Sparck Jones; the standard Okapi form).

    ``idf(t) = ln(1 + (N - df + 0.5)/(df + 0.5))``;
    ``score(d) = Σ_t idf·tf·(k1+1) / (tf + k1·(1 - b + b·dl/avgdl))``.

    Plan shape: the query terms (a handful) pivot into per-term tf
    columns, so ONE corpus scan and ONE doc-keyed shuffle produce doc
    length + all tfs; corpus scalars and per-term doc frequencies come
    from a 1-row aggregate over that reduced frame and ride a
    broadcast crossJoin back in. Per-doc scores add term contributions
    in fixed left-to-right order (bit-stable vs the oracle; a row-wise
    Σ would sum in shuffle order). Deterministic ordering: score desc,
    then id. Only documents containing ≥1 query term are scored.
    """
    qt = [str(t) for t in query_terms]
    terms = _terms(df, text_col, id_col)
    # Pivot the (few) query terms into columns: ONE corpus scan, ONE
    # shuffle keyed on the doc id produces doc length + per-term tf.
    # SQL-text aggregates (r18 — block comment at _sql_str): one py4j
    # round trip per output column instead of ~10 per term.
    per_doc = terms.groupBy(id_col).agg(
        F.expr("count(1) AS dl"),
        *[
            F.expr(
                f"sum(CASE WHEN term = {_sql_str(t)} THEN 1 ELSE 0 END)"
                f" AS tf_{i}"
            )
            for i, t in enumerate(qt)
        ],
    )
    # per_doc feeds BOTH the stats aggregate and the scoring pass;
    # without a persist Catalyst re-expands the subtree and scans the
    # corpus twice (verified via executedPlan — 2 parquet scans).
    # per_doc is |docs| small rows, orders of magnitude below the
    # corpus, so MEMORY_AND_DISK is the right trade at any scale.
    per_doc = per_doc.transform(managed_persist_disk)
    # Corpus scalars + per-term doc frequencies in one 1-row aggregate
    # over the already-reduced per_doc frame; broadcast back in.
    stats = per_doc.agg(
        F.expr("count(1) AS n_docs"),
        F.expr("CAST(sum(dl) AS DOUBLE) / count(1) AS avgdl"),
        *[
            F.expr(f"sum(CAST(tf_{i} > 0 AS BIGINT)) AS df_{i}")
            for i in range(len(qt))
        ],
    )

    # BM25 score as ONE SQL-text expression (r18 — block comment at
    # _sql_str): same left-to-right term addition as the Column form —
    # bit-stable (a row-wise Σ over an exploded frame would sum in
    # shuffle order).
    def contrib(i: int) -> str:
        idf = (
            f"ln({1.0}D + (n_docs - df_{i} + {0.5}D) / (df_{i} + {0.5}D))"
        )
        denom = (
            f"tf_{i} + {float(k1)}D * ({1.0}D - {float(b)}D"
            f" + {float(b)}D * dl / avgdl)"
        )
        return f"{idf} * tf_{i} * {float(k1 + 1.0)}D / ({denom})"

    score = " + ".join(contrib(i) for i in range(len(qt)))
    any_term = " OR ".join(f"tf_{i} > 0" for i in range(len(qt)))
    s = float(10**nd)  # fround(score, nd) as SQL text
    bm25 = f"floor(({score}) * {s}D + 0.5D) / {s}D"
    return (
        per_doc.crossJoin(F.broadcast(stats))
        .where(any_term)
        .selectExpr(f"`{id_col}`", f"{bm25} AS bm25")
        .orderBy(F.col("bm25").desc(), id_col)
        .limit(k)
    )


def rrf_fuse(
    lists: list[DataFrame],
    k0: int = 60,
    k: int = 15,
    id_col: str = "doc_id",
    rank_col: str = "rank",
    nd: int = 6,
) -> DataFrame:
    """Reciprocal-rank fusion (Cormack/Clarke/Büttcher 2009) of ranked
    retrieval lists: ``rrf(d) = Σ_lists 1/(k0 + rank_list(d))`` — the
    standard score-free way to combine keyword (BM25) and vector
    (cosine/ANN) retrieval into one hybrid ranking.

    Each input frame needs (``id_col``, ``rank_col``); docs absent
    from a list simply contribute nothing for it. Determinism: the
    summed terms are exact IEEE doubles from integer ranks, identical
    in any engine; with ≤ 2 lists the two-term sum is additionally
    order-independent outright. With 3+ lists the summation ORDER is
    plan-dependent in the last ulp, so the rank window orders on the
    nd-ROUNDED score (the same value the output exposes) — rank and
    score can never disagree, and summation-order noise is absorbed
    by the round except exactly at a rounding boundary (a raw sum
    within one ulp of a .5·10⁻ⁿᵈ edge — measure-zero for reciprocal
    sums of integer ranks). Ties on the rounded score break on the
    id. The fused frame is Σ|list_i| rows — k-bounded by construction
    since every input is already a top-k list — so the single global
    rank window here is safe at any corpus scale (the scale lives in
    the stages that PRODUCED the lists).
    Columns: id, ``rrf`` (rounded), ``n_lists``, ``rank``.
    """
    u = None
    for df in lists:
        part = df.select(F.col(id_col).alias("_id"), F.col(rank_col).alias("_r"))
        u = part if u is None else u.unionByName(part)
    if u is None:
        raise ValueError("rrf_fuse needs at least one ranked list")
    # SQL-text aggregate + rank tail (r18 — block comment at _sql_str).
    s = float(10**nd)
    rrf_sum = f"sum({1.0}D / ({float(k0)}D + _r))"
    fused = u.groupBy("_id").agg(
        F.expr(f"floor(({rrf_sum}) * {s}D + 0.5D) / {s}D AS _rrf"),
        F.expr("count(1) AS n_lists"),
    )
    return (
        fused.selectExpr(
            "*", "row_number() OVER (ORDER BY _rrf DESC, _id) AS rank"
        )
        .where(f"rank <= {int(k)}")
        .selectExpr(f"_id AS `{id_col}`", "_rrf AS rrf", "n_lists", "rank")
    )


def rrf_hybrid_sql(
    query_terms: list[str],
    query_vec_id: int = 0,
    k_each: int = 20,
    k0: int = 60,
    k: int = 15,
    nd: int = 6,
) -> str:
    """DuckDB oracle for the BM25 ⊕ cosine hybrid: re-rank both top-k
    lists, UNION ALL, sum the reciprocal ranks, rank the fusion —
    the exact SQL mirror of ``rrf_fuse`` over ``bm25_topk`` and
    ``cosine_topk`` (vec_id ≡ doc_id in the testdata)."""
    from exosql_spark.queries._util import fround_sql

    bm25 = bm25_topk_sql(query_terms, k=k_each)
    score = fround_sql("rrf_raw", nd)
    return f"""
WITH b AS (SELECT doc_id, bm25 FROM ({bm25})),
br AS (
  SELECT doc_id, row_number() OVER (ORDER BY bm25 DESC, doc_id) AS r FROM b
),
cs AS (
  SELECT e.vec_id,
         list_cosine_similarity(CAST(e.embedding AS DOUBLE[]),
                                CAST(q.embedding AS DOUBLE[])) AS sim
  FROM embeddings e,
       (SELECT embedding FROM embeddings WHERE vec_id = {query_vec_id}) q
),
cr AS (
  SELECT vec_id AS doc_id, r FROM (
    SELECT vec_id, row_number() OVER (ORDER BY sim DESC, vec_id) AS r FROM cs
  ) WHERE r <= {k_each}
),
u AS (SELECT doc_id, r FROM br UNION ALL SELECT doc_id, r FROM cr),
f AS (
  SELECT doc_id,
         SUM(CAST(1.0 AS DOUBLE) / (CAST({k0}.0 AS DOUBLE) + r)) AS rrf_raw,
         count(*) AS n_lists
  FROM u GROUP BY doc_id
)
SELECT doc_id, rrf, n_lists, rank
FROM (SELECT doc_id, {score} AS rrf, n_lists,
             -- rank on the ROUNDED score, mirroring rrf_fuse: rank
             -- and exposed score must never disagree
             row_number() OVER (ORDER BY {score} DESC, doc_id) AS rank
      FROM f)
WHERE rank <= {k}
"""


def rrf_hybrid_ann_sql(
    query_terms: list[str],
    k_each: int = 20,
    k0: int = 60,
    k: int = 15,
    nd: int = 6,
) -> str:
    """DuckDB oracle for the PRODUCTION hybrid shape — BM25 ⊕ (IVFADC
    shortlist → exact rerank) — on a corpus planted with 10 exact
    copies of query vector 0: the ANN arm's exact-reranked top-10 is
    then CLOSED FORM (the 11 zero-distance rows — the query's own row
    plus its copies — tie-break by vec_id, so rank r holds vec_id
    (r−1)·100000), which makes the whole fusion SQL-expressible even
    though the compressed ADC stage itself is not. The BM25 arm is the
    real corpus-wide retrieval; only the vector arm is planted."""
    from exosql_spark.queries._util import fround_sql

    bm25 = bm25_topk_sql(query_terms, k=k_each)
    score = fround_sql("rrf_raw", nd)
    return f"""
WITH b AS (SELECT doc_id, bm25 FROM ({bm25})),
br AS (
  SELECT doc_id, row_number() OVER (ORDER BY bm25 DESC, doc_id) AS r FROM b
),
ar AS (SELECT (r - 1) * 100000 AS doc_id, r FROM range(1, 11) t(r)),
u AS (SELECT doc_id, r FROM br UNION ALL SELECT doc_id, r FROM ar),
f AS (
  SELECT doc_id,
         SUM(CAST(1.0 AS DOUBLE) / (CAST({k0}.0 AS DOUBLE) + r)) AS rrf_raw,
         count(*) AS n_lists
  FROM u GROUP BY doc_id
)
SELECT doc_id, rrf, n_lists, rank
FROM (SELECT doc_id, {score} AS rrf, n_lists,
             row_number() OVER (ORDER BY {score} DESC, doc_id) AS rank
      FROM f)
WHERE rank <= {k}
"""


def bm25_topk_sql(
    query_terms: list[str],
    k: int = 20,
    k1: float = 1.2,
    b: float = 0.75,
    nd: int = 4,
) -> str:
    """DuckDB oracle for :func:`bm25_topk`."""
    from exosql_spark.queries._util import fround_sql

    # CAST every fractional literal: DuckDB parses bare `1.2` as DECIMAL
    # and would run parts of the arithmetic in exact decimal, diverging
    # from Spark's pure-double sequence in the last ulp.
    d = "CAST({} AS DOUBLE)".format
    n = len(query_terms)
    tf_cols = ",\n         ".join(
        "sum(CASE WHEN term = '{}' THEN 1 ELSE 0 END) AS tf_{}".format(
            t.replace("'", "''"), i
        )
        for i, t in enumerate(query_terms)
    )
    df_cols = ",\n         ".join(
        f"sum(CASE WHEN tf_{i} > 0 THEN 1 ELSE 0 END) AS df_{i}" for i in range(n)
    )
    contribs = [
        (
            f"ln({d('1.0')} + (n_docs - df_{i} + {d('0.5')}) / (df_{i} + {d('0.5')})) "
            f"* tf_{i} * {d(repr(k1 + 1.0))} / "
            f"(tf_{i} + {d(repr(k1))} * ({d('1.0')} - {d(repr(b))} "
            f"+ {d(repr(b))} * dl / avgdl))"
        )
        for i in range(n)
    ]
    score = fround_sql(" + ".join(f"({c})" for c in contribs), nd)
    any_term = " OR ".join(f"tf_{i} > 0" for i in range(n))
    return f"""
WITH terms AS (
  SELECT doc_id, unnest(string_split(text, ' ')) AS term FROM documents
),
per_doc AS (
  SELECT doc_id, count(*) AS dl,
         {tf_cols}
  FROM terms GROUP BY doc_id
),
stats AS (
  SELECT count(*) AS n_docs, CAST(sum(dl) AS DOUBLE) / count(*) AS avgdl,
         {df_cols}
  FROM per_doc
)
SELECT doc_id, {score} AS bm25
FROM per_doc, stats
WHERE {any_term}
ORDER BY bm25 DESC, doc_id
LIMIT {k}
"""


# --------------------------------------------------------------------
# Cross-encoder-shaped rerank (retrieval tier 3)
# --------------------------------------------------------------------


def overlap_scorer(terms: list[str]):
    """Deterministic stand-in for a cross-encoder forward pass: the
    pair score of (query, doc) is the count of distinct query terms
    contained in the lowercased doc text (substring containment —
    states identically as SQL ``LIKE '%t%'`` sums, which is what makes
    the rerank entry exact-oracle-able).  Same Arrow batch signature a
    real model scorer has: two pandas Series in, one float64 Series
    out."""
    lowered = [t.lower() for t in terms]

    def score(query_text, doc_text):
        import pandas as pd

        return pd.Series(
            [
                float(sum(1 for t in lowered if t in (d or "").lower()))
                for d in doc_text
            ],
            dtype="float64",
        )

    return score


def cross_encoder_rerank(
    candidates: DataFrame,
    docs: DataFrame,
    query_text: str,
    scorer=None,
    id_col: str = "doc_id",
    text_col: str = "text",
    prior_col: str = "rrf",
    k: int | None = None,
) -> DataFrame:
    """Tier-3 pointwise reranker over a k-bounded candidate list — the
    stage that completes the production retrieval stack
    (retrieve-each-arm → RRF-fuse → cross-encoder rerank; e.g.
    Nogueira & Cho 2019's monoBERT shape).  ``candidates`` is a fused
    top-k frame (``id_col``, ``prior_col``, ...), ``docs`` the corpus
    table carrying ``text_col``.

    Scale shape — the part this operator owns regardless of which
    model scores the pairs:

    - the candidate list is k-bounded, so it BROADCASTS into the
      corpus scan: one broadcast hash join fetches the k texts, the
      100 TB table is touched exactly once, no shuffle;
    - (query, doc) pairs flow through an Arrow-batched ``pandas_udf``
      — the model-inference seam.  A real cross-encoder swaps into
      ``scorer`` unchanged (two Series in, float64 Series out, one
      forward pass per Arrow batch); the default
      :func:`overlap_scorer` is a deterministic stand-in whose scores
      are SQL-expressible, keeping the driver oracle exact;
    - the final rank is a window over ≤ k rows (score desc, prior
      desc, id) — never corpus-wide.

    Returns (``id_col``, ``ce_score``, ``prior_col``, ``rank``),
    rank ≤ k if given."""
    from pyspark.sql.functions import pandas_udf

    score_fn = scorer or overlap_scorer(query_text.split())
    score_udf = pandas_udf(score_fn, "double")
    pairs = docs.select(id_col, text_col).join(
        F.broadcast(candidates.select(id_col, prior_col)), id_col
    )
    scored = pairs.withColumn(
        "ce_score", score_udf(F.lit(query_text), F.col(text_col))
    )
    w = Window.orderBy(
        F.col("ce_score").desc(), F.col(prior_col).desc(), F.col(id_col)
    )
    out = scored.select(
        id_col, "ce_score", prior_col
    ).withColumn("rank", F.row_number().over(w))
    if k is not None:
        out = out.filter(F.col("rank") <= k)
    return out


def rrf_rerank_ce_sql(
    query_terms: list[str],
    query_vec_id: int = 0,
    k_each: int = 20,
    k0: int = 60,
    k: int = 15,
    k_out: int = 10,
) -> str:
    """DuckDB oracle for hybrid-RRF → cross-encoder rerank with the
    deterministic :func:`overlap_scorer`: the fused list is
    :func:`rrf_hybrid_sql`, the pair score the same LIKE-containment
    sum, the rerank the same (score desc, rrf desc, id) window."""
    fused = rrf_hybrid_sql(query_terms, query_vec_id=query_vec_id,
                           k_each=k_each, k0=k0, k=k)
    overlap = " + ".join(
        f"CASE WHEN lower(d.text) LIKE '%{t.lower()}%' THEN 1 ELSE 0 END"
        for t in query_terms
    )
    return f"""
WITH fused AS ({fused}),
scored AS (
  SELECT f.doc_id, CAST({overlap} AS DOUBLE) AS ce_score, f.rrf
  FROM fused f JOIN documents d ON d.doc_id = f.doc_id
)
SELECT doc_id, ce_score, rrf,
       row_number() OVER (ORDER BY ce_score DESC, rrf DESC, doc_id) AS rank
FROM scored
QUALIFY rank <= {k_out}
ORDER BY rank
"""
