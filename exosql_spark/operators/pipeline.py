"""End-to-end training-data curation pipeline — the composition the
individual operators exist for: one declarative DataFrame chain from
raw documents to a deduplicated, quality-filtered, token-counted
corpus. Runs as a single Spark job graph (Catalyst fuses the map
stages; the only shuffles are the dedup hash and the near-dup band
join).

    curated = curate_corpus(docs)          # lazy
    sinks.write_table(curated, path, partition_by=["lang_pred"])
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from exosql_spark.cache import managed_persist

from exosql_spark.operators import dedup, text


@dataclass
class CurateConfig:
    min_tokens: int = 10
    min_quality: float = 0.3
    near_dup_threshold: float = 0.5
    use_components: bool = False  # transitive clusters vs min-representative
    minhash_hashes: int = 64
    minhash_bands: int = 16
    #: When False, the MinHash signature is computed alongside the
    #: cheap per-row features so ONE persisted frame feeds every
    #: downstream consumer — some signature work is spent on rows exact
    #: dedup will drop, but no second cache is needed. When True, the
    #: signature is computed only on exact-dedup survivors — pays off
    #: when the exact-dup rate is high (signatures are the expensive
    #: stage), at the cost of a second persisted frame for the banding
    #: join. None (default) self-tunes: one digest-only pre-pass
    #: measures the corpus's exact-dup rate and picks True above
    #: AUTO_SIG_DUP_RATE (the digest agg shuffles 16-byte hashes — far
    #: cheaper than the signature stage it sizes; callers that already
    #: know their dup rate set the flag explicitly and skip the pass).
    #: Results are identical on every path (signatures are a pure
    #: function of text); only the plan shape changes. NOTE: the None
    #: probe is an EAGER action at plan-build time — see curate_corpus's
    #: docstring; inputs below one scan split per core skip it (the
    #: one-persist plan is fine regardless of dup rate at that size).
    sig_after_dedup: bool | None = None
    #: Run ExactSubstr-style repeated-span removal (text.span_dedup)
    #: BEFORE feature extraction, so quality/token stats and dedup
    #: signatures see the cleaned text. Adds one gram-count shuffle.
    span_dedup: bool = False
    span_len: int = 8
    #: When set, drop documents whose corpus-trained bigram-LM score
    #: (text.lm_score — the perplexity-proxy quality signal) falls
    #: below this bound. Adds two count aggregations + one join.
    min_lm_score: float | None = None


#: Auto-placement threshold: above this exact-duplicate rate the
#: signature work saved by deduping first outweighs the cost of a
#: second persisted frame. 0.2 is deliberately conservative — at low
#: dup rates the one-persist plan's simplicity wins even though a few
#: signatures are wasted.
AUTO_SIG_DUP_RATE = 0.2


def _probe_worthwhile(docs: DataFrame) -> bool:
    """Gate for the auto-placement probe: it is an eager full scan at
    plan-build time, only worth paying when the signature stage it
    sizes is itself big. Smallness comes from the optimizer's size
    estimate (no job), with the same one-split-per-core rule as
    dedup._parallelize; an unavailable estimate errs toward probing."""
    spark = docs.sparkSession
    try:
        size = int(docs._jdf.queryExecution().optimizedPlan().stats().sizeInBytes())
    except Exception:
        return True
    return size >= spark.sparkContext.defaultParallelism * dedup._conf_bytes(
        spark, "spark.sql.files.maxPartitionBytes", 128 << 20
    )


def _auto_sig_after_dedup(
    docs: DataFrame, text_col: str, threshold: float = AUTO_SIG_DUP_RATE
) -> bool:
    """Decision rule for CurateConfig.sig_after_dedup=None: measure the
    exact-duplicate rate with a digest-only pass (scan + md5 + count
    distinct — the shuffle carries 16-byte digests, so this is the
    cheapest possible full pass; the signature stage it sizes is 10×+
    heavier) and compute signatures after exact dedup iff the rate
    exceeds ``threshold``."""
    row = docs.select(text.fingerprint_md5(F.col(text_col)).alias("_h")).agg(
        F.count(F.lit(1)).alias("n"), F.count_distinct("_h").alias("d")
    ).first()
    return row.n > 0 and (row.n - row.d) / row.n > threshold


def curate_corpus(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    config: CurateConfig | None = None,
) -> DataFrame:
    """documents → lang-id → quality features/filter → exact dedup →
    MinHash near-dup removal → token counts. Returns the curated
    corpus with provenance columns (lang_pred, quality, n_tokens,
    content_hash).

    NOT fully lazy under the default config: ``sig_after_dedup=None``
    resolves signature placement with a digest-only pre-pass — an
    eager action (one scan) at plan-BUILD time. Inputs smaller than
    one scan split per core skip the probe (placement barely matters
    there); callers that need a pure plan builder, or already know
    their dup rate, set ``sig_after_dedup`` explicitly."""
    cfg = config or CurateConfig()

    # Spread small inputs across cores first: every downstream stage
    # (regex features, MinHash UDF) is a narrow map over this frame, and
    # a single-file local input would otherwise run the whole chain on
    # one partition. No-op at real scale (inputs arrive pre-split).
    docs = dedup._parallelize(docs)

    # 0. optional ExactSubstr-style span removal FIRST, so every later
    # stage (quality stats, hashes, signatures) sees the cleaned text.
    if cfg.span_dedup:
        cleaned = text.span_dedup(docs, text_col, id_col, span=cfg.span_len)
        docs = (
            docs.drop(text_col)
            .join(cleaned.select(id_col, text_col), id_col)
        )

    # 0b. optional LM-score floor (corpus-trained perplexity proxy).
    # LEFT join, not semi: lm_score only emits rows with ≥ 1 bigram
    # (≥ 2 tokens), so a semi-join would silently drop every sub-2-token
    # document regardless of the floor. Docs with no LM evidence pass
    # through (NULL score) — the min_tokens gate below governs them.
    if cfg.min_lm_score is not None:
        scores = text.lm_score(docs, text_col, id_col).select(id_col, "lm_score")
        docs = (
            docs.join(scores, id_col, "left")
            .filter(
                F.col("lm_score").isNull()
                | (F.col("lm_score") >= cfg.min_lm_score)
            )
            .drop("lm_score")
        )

    # Resolve the signature-placement choice (see CurateConfig): the
    # auto rule must run BEFORE the feature frame is built — once the
    # featured frame is persisted without a signature column, the
    # one-persist ordering is no longer reachable. Small inputs skip
    # the (eager) probe entirely: below one scan split per core the
    # one-persist plan wins on simplicity at any dup rate.
    sig_after = cfg.sig_after_dedup
    if sig_after is None:
        sig_after = _probe_worthwhile(docs) and _auto_sig_after_dedup(docs, text_col)

    # 1. cheap per-row features (pure map — fused into the scan), plus —
    # unless sig_after — the MinHash signature, so the SAME persisted
    # frame feeds every downstream consumer (see the config field's doc
    # for the ordering tradeoff).
    featured = text.quality_score(docs, text_col).withColumn(
        "lang_pred", text.lang_id(text_col)
    ).withColumn("n_tokens", F.col("q_n_tokens")).withColumn(
        "content_hash", text.fingerprint_md5(F.col(text_col))
    )
    if not sig_after:
        featured = featured.withColumn(
            "_sig", dedup.minhash_signature(text_col, cfg.minhash_hashes)
        )

    # 2. quality gate (pushable predicates)
    filtered = featured.filter(
        (F.col("n_tokens") >= cfg.min_tokens)
        & (F.col("quality") >= cfg.min_quality)
    ).transform(managed_persist)
    # persist: every downstream branch (exact-dedup keep set, minhash
    # banding, the two anti/semi joins back) re-reads this frame;
    # without the barrier the regex-heavy feature chain re-executes
    # once per branch (~4× measured), and Catalyst's projection
    # collapse would re-inline the signature into every band slice.
    # At 100 TB this is the "checkpoint curated features to parquet"
    # step. Tracked in exosql_spark.cache — long-lived sessions call
    # cache.release_caches(spark) at query boundaries.

    # 3. exact dedup on the already-computed content hash (shuffles
    # 16-byte digests only — dedup.exact_dedup would re-derive
    # md5(normalize) from raw text; the column is sitting right there)
    keep = (
        filtered.groupBy("content_hash")
        .agg(F.min(id_col).alias(id_col))
        .select(id_col)
    )
    # no broadcast hint: keep is one id per distinct document —
    # corpus-proportional, so forcing a broadcast would OOM at scale;
    # AQE still broadcasts it when the runtime size allows
    exact = filtered.join(keep, id_col, "left_semi").transform(managed_persist)
    # persist: exact-dedup survivors feed FOUR consumers (the optional
    # signature pass, the candidate-id semi-join and shingle verify
    # inside minhash_dedup_pairs, and the final anti-join) — without
    # the barrier each consumer re-embeds (and re-executes) the
    # content-hash groupBy + semi-join subtree above. Measured at
    # sf0.1 (alternated min-of-5): 2.63 → 2.50 s natural corpus,
    # 3.28 → 2.96 s planted — modest locally, but the avoided work is
    # a full-corpus shuffle per branch, which is what matters at
    # 100 TB. This is the second materialization point after the
    # feature frame, and the frame is already quality-gated and
    # deduped — the smallest the corpus gets.

    # 4. near-dup removal (LSH banding; optionally transitive clusters).
    # sig_after=False: signatures ride along from the persisted
    # feature frame — no recompute, no second cache. True: compute them
    # now, on survivors only, behind their own persist (the banding
    # self-consumes the frame once per band slice).
    if sig_after:
        signatures = exact.select(
            F.col(id_col).alias("_id"),
            dedup.minhash_signature(text_col, cfg.minhash_hashes).alias("_sig"),
        ).transform(managed_persist)
    else:
        signatures = exact.select(F.col(id_col).alias("_id"), "_sig")
    pairs = dedup.minhash_dedup_pairs(
        exact,
        text_col,
        id_col,
        threshold=cfg.near_dup_threshold,
        num_hashes=cfg.minhash_hashes,
        bands=cfg.minhash_bands,
        signatures=signatures,
    )
    if cfg.use_components:
        from exosql_spark.operators.components import dedup_components

        curated = dedup_components(exact, pairs, id_col)
    else:
        losers = pairs.select(F.col("id_b").alias(id_col)).distinct()
        curated = exact.join(losers, id_col, "left_anti")

    keep_cols = [c for c in docs.columns] + [
        "lang_pred",
        "quality",
        "n_tokens",
        "content_hash",
    ]
    return curated.select(*keep_cols)


def curate_with_metrics(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    config: CurateConfig | None = None,
):
    """:func:`curate_corpus` with free pipeline telemetry: input/output
    row counts and mean output quality ride the SAME action via
    ``DataFrame.observe`` (Spark accumulates observation metrics during
    the job — no second pass, no extra scan, works identically on a
    1000-executor cluster). Returns ``(curated, obs_in, obs_out)``;
    read ``obs.get`` AFTER an action has run.

    This is the production shape for yield monitoring: a nightly
    curation job reports docs-in / docs-kept / avg-quality per run
    from metrics it was already computing.
    """
    from pyspark.sql import Observation

    obs_in = Observation("curate_input")
    obs_out = Observation("curate_output")
    # Persist + materialize the observed frame BEFORE the pipeline
    # consumes it: with span_dedup or min_lm_score configured the docs
    # subtree has several physical consumers in one action, and a bare
    # CollectMetrics would fire once per occurrence (obs_in rows 2–3×
    # the input). One count() populates the cache and fires the
    # observation exactly once; every pipeline branch then reads the
    # cached frame (Observation is one-shot, so even a cache-eviction
    # recompute can't corrupt the captured value). At scale this is the
    # "stage your input" step; the handle is registered with
    # exosql_spark.cache — hosts release it (with every other operator
    # barrier) via cache.release_caches(spark) after materializing.
    docs = docs.observe(obs_in, F.count(F.lit(1)).alias("rows")).transform(managed_persist)
    docs.count()
    curated = curate_corpus(docs, text_col, id_col, config)
    curated = curated.observe(
        obs_out,
        F.count(F.lit(1)).alias("rows"),
        F.round(F.avg("quality"), 4).alias("avg_quality"),
    )
    return curated, obs_in, obs_out
