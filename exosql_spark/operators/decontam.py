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

import pandas as pd

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


def hits_against_gram_set(
    docs: DataFrame,
    gram_set: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 8,
    broadcast_benchmark: bool = True,
) -> DataFrame:
    """:func:`decontaminate_hits` against an EXTERNALLY MAINTAINED
    distinct n-gram set (first column = the gram strings) instead of
    benchmark documents — the probe side of an incrementally built
    contamination index (e.g. the stream-ingested parts store in
    ``streaming/decontam_ingest.py``, where new evaluation suites
    register over time and the gram set is the set-union-mergeable
    state).  Same join shape and same superset-free exactness as the
    document-input form."""
    grams = docs.select(
        F.col(id_col), F.explode(ngrams(text_col, n)).alias("_g")
    )
    bench = gram_set.select(F.col(gram_set.columns[0]).alias("_g")).distinct()
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


# --------------------------------------------------------------------
# Bloom-filter decontamination — the join-free variant at 100 TB
# --------------------------------------------------------------------
#
# The broadcast-join path above ships the benchmark's distinct n-gram
# SET to every executor (a hash table: ~30-60 bytes/gram). When the
# evaluation suite grows to 10^8+ n-grams that table is GBs; a Bloom
# filter of the same set at fpp=1e-6 is ~3.6 bytes/gram — a 10-15x
# smaller executor-resident probe structure, and probing is pure
# bit-math on the already-computed gram hashes: the corpus never
# joins, never shuffles anything but the final per-doc count.
#
# Hashing: gram hashes are computed SPARK-SIDE with the same
# engine-portable md5-based token hash the exact path uses
# (text._token_hash), so build and probe agree by construction; the
# k bit positions derive from splitmix64 double hashing. The probe is
# a vectorized Arrow-batched pandas UDF over the hash column (numpy
# bit tests — no per-row Python).


def _splitmix64_np(h):
    import numpy as np

    h = (h + np.uint64(0x9E3779B97F4A7C15)) & np.uint64(0xFFFFFFFFFFFFFFFF)
    h = ((h ^ (h >> np.uint64(30))) * np.uint64(0xBF58476D1CE4E5B9)) & np.uint64(
        0xFFFFFFFFFFFFFFFF
    )
    h = ((h ^ (h >> np.uint64(27))) * np.uint64(0x94D049BB133111EB)) & np.uint64(
        0xFFFFFFFFFFFFFFFF
    )
    return h ^ (h >> np.uint64(31))


def _bloom_positions(hashes, m_bits: int, k: int):
    """k bit positions per hash via Kirsch–Mitzenmacher double hashing:
    pos_i = (h1 + i*h2) mod m. hashes: uint64 numpy array → (len, k)."""
    import numpy as np

    h1 = hashes.astype(np.uint64)
    h2 = _splitmix64_np(h1) | np.uint64(1)  # odd → full-period stride
    i = np.arange(k, dtype=np.uint64)
    return ((h1[:, None] + i[None, :] * h2[:, None]) % np.uint64(m_bits)).astype(
        np.int64
    )


def build_bloom(
    benchmark: DataFrame,
    text_col: str = "text",
    n: int = 8,
    bits_per_item: int = 29,
    k: int = 20,
):
    """Build a Bloom bitset over the benchmark's distinct n-gram hashes
    (collected driver-side — the benchmark is bounded by construction,
    and only 8-byte hashes cross the wire, never gram strings).
    bits_per_item=29/k=20 → fpp ≈ 2^-20 ≈ 1e-6. Returns (bitset bytes
    as numpy uint8 array, m_bits)."""
    import numpy as np

    from exosql_spark.operators.text import _token_hash

    hashes = np.array(
        [
            r[0]
            for r in benchmark.select(
                F.explode(ngrams(text_col, n)).alias("_g")
            )
            .select(_token_hash(F.col("_g")).alias("_h"))
            .distinct()
            .collect()
        ],
        dtype=np.uint64,
    )
    m_bits = max(64, int(len(hashes) * bits_per_item))
    bitset = np.zeros((m_bits + 7) // 8, dtype=np.uint8)
    if len(hashes):
        pos = _bloom_positions(hashes, m_bits, k).ravel()
        np.bitwise_or.at(bitset, pos >> 3, np.uint8(1) << (pos & 7).astype(np.uint8))
    return bitset, m_bits


def decontaminate_hits_bloom(
    docs: DataFrame,
    benchmark: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 8,
    bits_per_item: int = 29,
    k: int = 20,
) -> DataFrame:
    """Per-document benchmark-overlap counts via Bloom probe — same
    output shape as :func:`decontaminate_hits` ((id, n_hits), one row
    per flagged doc) but join-free: gram hashes stream through a
    vectorized bitset test. Superset guarantee: a Bloom filter has no
    false negatives, so every exact hit is counted; false positives
    (≈1e-6 per distinct gram) can only ADD hits."""
    from pyspark.sql import types as T

    from exosql_spark.operators.text import _token_hash

    bitset, m_bits = build_bloom(benchmark, text_col, n, bits_per_item, k)

    @F.pandas_udf(T.BooleanType())
    def probe(h: pd.Series) -> pd.Series:
        import numpy as np

        hv = h.to_numpy(dtype=np.int64).astype(np.uint64)
        if not len(hv):
            return pd.Series([], dtype=bool)
        pos = _bloom_positions(hv, m_bits, k)
        bits = (bitset[pos >> 3] >> (pos & 7).astype(np.uint8)) & 1
        return pd.Series(bits.all(axis=1))

    grams = docs.select(
        F.col(id_col), F.explode(ngrams(text_col, n)).alias("_g")
    ).select(id_col, _token_hash(F.col("_g")).alias("_h"))
    return (
        grams.filter(probe(F.col("_h")))
        .groupBy(id_col)
        .agg(F.count(F.lit(1)).alias("n_hits"))
    )
