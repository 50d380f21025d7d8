"""Benchmark decontamination — flag training documents that share
word n-grams with an evaluation/benchmark set (the standard
contamination check run before LLM training, à la GPT-3 §C /
PaLM-style 8-gram overlap).

Scale design: the benchmark side is a *fixed evaluation suite* —
bounded by construction (benchmarks are MBs, not TBs) — so its
distinct n-gram set broadcasts and the corpus side streams through a
broadcast hash join with zero shuffle; the only shuffle is the final
per-doc hit count on doc_id (map-side partial combine applies). The
corpus is never collected, never all-pairs'd, and the n-gram explode
is a narrow fan-out fused into the scan.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from exosql_spark.operators.dedup import shingles


def ngrams(text_col: str, n: int = 8) -> F.Column:
    """Distinct word n-grams of normalized text (documents shorter than
    n words contribute their whole token sequence — same convention as
    MinHash shingling, so the two ops agree on what 'overlap' means)."""
    return shingles(text_col, n)


def decontaminate_hits(
    docs: DataFrame,
    benchmark: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 8,
    broadcast_benchmark: bool = True,
) -> DataFrame:
    """Per-document benchmark-overlap counts: one row per contaminated
    document — (id, n_hits) where n_hits = number of distinct document
    n-grams that appear anywhere in the benchmark set.

    ``broadcast_benchmark``: on by default — an evaluation suite's
    n-gram set is bounded by construction. Pass False for unusually
    large benchmark corpora and let AQE pick the join strategy.
    """
    grams = docs.select(
        F.col(id_col), F.explode(ngrams(text_col, n)).alias("_g")
    )
    bench = benchmark.select(F.explode(ngrams(text_col, n)).alias("_g")).distinct()
    if broadcast_benchmark:
        bench = F.broadcast(bench)
    return (
        grams.join(bench, "_g")
        .groupBy(id_col)
        .agg(F.count(F.lit(1)).alias("n_hits"))
    )


def decontaminate(
    docs: DataFrame,
    benchmark: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 8,
    min_hits: int = 1,
) -> DataFrame:
    """Drop contaminated documents (≥ min_hits distinct n-gram overlaps
    with the benchmark set) — anti-join against the flagged ids."""
    flagged = decontaminate_hits(docs, benchmark, text_col, id_col, n).filter(
        F.col("n_hits") >= min_hits
    )
    return docs.join(flagged.select(id_col), id_col, "left_anti")
