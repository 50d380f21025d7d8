"""Query catalog — the single source of truth for operator coverage.

Every implemented operator from SURVEY.md §2 registers here with:
  - a Spark callable ``(spark, sf_dir) -> DataFrame``
  - an equivalent ANSI-SQL oracle string for DuckDB (or None for
    non-SQL-expressible ops → rows-only check)

``__spark_entry__.py``, ``tests/test_oracle.py`` and ``bench.py`` all
derive from this registry, so local tests exercise exactly the driver's
correctness gate.
"""

from __future__ import annotations

import importlib
from collections.abc import Callable
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]

# Modules that define catalog entries (imported lazily by all_queries()).
_QUERY_MODULES = (
    "exosql_spark.queries.core",
    "exosql_spark.queries.joins",
    "exosql_spark.queries.aggregates",
    "exosql_spark.queries.setops",
    "exosql_spark.queries.windows",
    "exosql_spark.queries.functions_q",
    "exosql_spark.queries.events_q",
    "exosql_spark.queries.llm_q",
    "exosql_spark.queries.sources_q",
    "exosql_spark.queries.udx_q",
    "exosql_spark.queries.extensions_q",
    "exosql_spark.queries.tpch_q",
    "exosql_spark.queries.streaming_q",
)

# Driver CORRECTNESS verifies entries in ``queries()`` iteration order and
# truncates after ~50.  Rounds 1–4 cumulatively blessed all 117 exact-oracle
# entries (every one driver-green) and ran all rows-only entries; the full
# local gate (tests/test_oracle.py) keeps them green between windows.  This
# list fronts, in priority order: entries new or promoted this round (round
# 5) that need their first driver-green row, the remaining rows-only tier
# (run-without-error checks — each entry's ``oracle=None`` comment documents
# why no exact oracle can exist), then high-value re-pins.  Names absent
# from the registry are ignored; registered names absent from this list
# follow in registration order.
_VERIFY_FIRST = (
    # -- new/promoted this round (round 5): exact oracles needing their
    #    first driver-green row --
    "streaming_running_stats_parity",  # stateful streaming ↔ batch parity
    "streaming_tumbling_parity",       # watermarked windows ↔ batch parity
    "streaming_sessions_parity",       # session windows ↔ gaps-and-islands
    "streaming_dedup_parity",          # dropDuplicatesWithinWatermark ↔ DISTINCT
    "streaming_attribution_parity",    # stream-stream interval join ↔ SQL join
    "streaming_sliding_parity",        # sliding windows ↔ unnest desugar
    "streaming_anomaly_parity",        # stateful alerting ↔ closed-form set
    "dedup_minhash_clusters_planted",  # LSH→components on planted dups
    "dedup_embedding_cosine",          # promoted: planted scaled copies
    "dedup_simhash_pairs",             # promoted: planted identical triples
    "dedup_ngram_jaccard",             # promoted: planted J=1.0 / 58/61 set
    "multimodal_features",             # promoted: byte-length + sha1 parity
    "dedup_incremental_batch",         # new: cross-snapshot dedup vs ref corpus
    "text_decontaminate_bloom",        # new: join-free Bloom decontamination
    "agg_listagg",                     # new: LISTAGG WITHIN GROUP
    "unpivot_melt",                    # new: UNPIVOT/melt
    "text_lm_score",                   # new: bigram-LM perplexity proxy
    "text_span_dedup",                 # new: ExactSubstr-style span removal
    "text_token_topk_approx",          # new: sketch heavy-hitters scale path
    "skew_salted_agg",                 # new: salting invisible in results
    "skew_salted_join",                # new: salted join == plain join
    "corpus_quality_report",           # new: GROUPING SETS corpus dashboard
    "events_resample_gapfill",         # new: hypertable-style gap filling
    "embedding_kmeans_planted",        # new: Lloyd convergence, exact oracle
    # -- rows-only tier (12 entries; weakest check, keep them running) --
    "dedup_minhash_pairs",
    "dedup_minhash_components",
    "similarity_topk_lsh",
    "similarity_topk_ivf",
    "similarity_topk_pq",
    "similarity_topk_ivfpq",
    "embedding_kmeans",
    "curate_corpus_pipeline",
    "export_training_corpus",
    "sample_stratified",
    "sample_fraction",
    "agg_approx_percentile",
    "fn_nondeterministic",
    "approx_count_distinct",
    # -- re-pins: high-value rows kept in-window to catch regressions,
    #    rotating older greens back through the window --
    "q1_pricing_summary",
    "join_inner_star",
    "scan_project_filter",
    "dedup_exact_groups",
    "similarity_topk_cosine",
    "text_line_dedup",
    "text_decontaminate",
    "fn_humanize_si",
    "tpch_q21_waiting_suppliers",
    "pack_sequences",
    "dedup_jaccard_exact_pairs",
    "join_asof_forward",
    "dedup_keep_best",
    "embedding_centroids",
    "events_time_bucket",
    "events_sessionize",
    "join_left_outer",
    "join_theta",
    "window_running_agg",
    "distinct_on",
    "udtf_split_words",
    "fn_coercion_sql",
    "events_json_props",
    "text_tfidf_topk",
    "text_quality_score",
    "chunk_documents",
    "mixture_sample",
    "shard_export_stats",
    "federation_cross_source_join",
    "udf_scalar_rank_normalize",
    "tpch_q3_shipping_priority",
    "tpch_q9_product_type_profit",
    "tpch_q18_large_volume_customers",
)


@dataclass
class Query:
    name: str
    fn: QueryFn
    oracle: str | None
    doc: str = ""
    tags: tuple[str, ...] = field(default_factory=tuple)
    bench: bool = False  # include in bench.py headline set


_REGISTRY: dict[str, Query] = {}
_LOADED = False


def register(
    name: str,
    oracle: str | None = None,
    doc: str = "",
    tags: tuple[str, ...] = (),
    bench: bool = False,
) -> Callable[[QueryFn], QueryFn]:
    def deco(fn: QueryFn) -> QueryFn:
        if name in _REGISTRY:
            raise ValueError(f"duplicate catalog entry {name!r}")
        _REGISTRY[name] = Query(name, fn, oracle, doc or (fn.__doc__ or ""), tags, bench)
        return fn

    return deco


def _load() -> None:
    global _LOADED
    if not _LOADED:
        for mod in _QUERY_MODULES:
            importlib.import_module(mod)
        _LOADED = True


def all_queries() -> dict[str, Query]:
    _load()
    ordered: dict[str, Query] = {}
    for name in _VERIFY_FIRST:
        if name in _REGISTRY:
            ordered[name] = _REGISTRY[name]
    for name, q in _REGISTRY.items():
        if name not in ordered:
            ordered[name] = q
    return ordered


def queries() -> dict[str, QueryFn]:
    return {name: q.fn for name, q in all_queries().items()}


def oracle_sql() -> dict[str, str]:
    return {name: q.oracle for name, q in all_queries().items() if q.oracle}


def bench_queries() -> dict[str, QueryFn]:
    return {name: q.fn for name, q in all_queries().items() if q.bench}
