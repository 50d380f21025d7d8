"""Training-data export: deterministic sharding, greedy sequence
packing, reproducible mixture sampling.

Everything here is *deterministic by construction* — "random" order is
an md5-derived hash of the document id — so results are reproducible
run-to-run AND engine-portable (exact DuckDB oracles), which is the
property a 100 TB training-data export actually needs: re-running a
failed shard must produce byte-identical output.

Scale design:
- Shard assignment is a pure Column expression (no shuffle beyond the
  downstream groupBy on the 8-byte shard key).
- Packing is sequential *within a shard* only — shards are the
  parallelism unit, so the corpus packs in one `groupBy(shard).
  applyInPandas` pass (Arrow-batched). One shard must fit one
  executor (choose n_shards ≈ corpus_tokens / shard_budget).
- Mixture sampling is a window rank over the hash order — one shuffle
  on the stratum key, no driver involvement.
"""

from __future__ import annotations

import pandas as pd

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from exosql_spark.operators.text import token_count_ws

# --------------------------------------------------------------------
# Portable deterministic hash (identical in Spark and DuckDB)
# --------------------------------------------------------------------


def portable_hash60(col: Column | str) -> Column:
    """60-bit integer hash from the first 15 hex digits of md5 — the
    engine-portable pseudo-random source (md5 is bit-identical in
    Spark and DuckDB; xxhash64 is Spark-only). Used as the shard key
    and as the reproducible "random" sort key."""
    c = F.col(col) if isinstance(col, str) else col
    return F.conv(F.substring(F.md5(c.cast("string")), 1, 15), 16, 10).cast("long")


def shard_assign(col: Column | str, n_shards: int) -> Column:
    """Deterministic shard id in [0, n_shards)."""
    return F.pmod(portable_hash60(col), F.lit(n_shards).cast("long"))


# --------------------------------------------------------------------
# Shard export stats
# --------------------------------------------------------------------


def shard_stats(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n_shards: int = 8,
) -> DataFrame:
    """Per-shard export manifest: doc count, token total, byte total.
    The aggregation shuffles one long + two counters per document."""
    return (
        df.select(
            shard_assign(id_col, n_shards).alias("shard"),
            F.coalesce(token_count_ws(text_col), F.lit(0)).alias("_t"),
            F.coalesce(F.length(text_col), F.lit(0)).alias("_b"),
        )
        .groupBy("shard")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("_t").alias("n_tokens"),
            F.sum("_b").alias("n_bytes"),
        )
    )


# --------------------------------------------------------------------
# Greedy sequence packing
# --------------------------------------------------------------------


def pack_sequences(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    budget: int = 512,
    n_shards: int = 8,
) -> DataFrame:
    """First-fit-in-order packing of documents into fixed token-budget
    training sequences.

    Within each (deterministic) shard, documents are taken in id order
    and appended to the current sequence until adding the next one
    would exceed ``budget``; then a new sequence starts. A document
    longer than the budget gets a sequence of its own (callers
    truncate downstream). Output: one row per document with its
    ``(shard, seq_id)`` placement.

    Packing is inherently sequential, so the shard is the parallelism
    unit: `groupBy(shard).applyInPandas` runs each shard's greedy scan
    as one Arrow batch. At 100 TB you pick n_shards so a shard's
    (id, n_tokens) pairs — NOT its text — fit one executor; only two
    longs per document cross the shuffle.
    """
    base = df.select(
        F.col(id_col).alias("doc_id"),
        shard_assign(id_col, n_shards).alias("shard"),
        # null text packs as 0 tokens (NaN would poison the greedy fold)
        F.coalesce(token_count_ws(text_col), F.lit(0)).cast("long").alias("n_tokens"),
    )

    out_schema = T.StructType(
        [
            T.StructField("doc_id", base.schema["doc_id"].dataType),
            T.StructField("shard", T.LongType()),
            T.StructField("seq_id", T.LongType()),
            T.StructField("n_tokens", T.LongType()),
        ]
    )

    def _pack(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("doc_id").reset_index(drop=True)
        seq_ids = []
        seq, used = 0, 0
        for t in pdf["n_tokens"]:
            if used > 0 and used + t > budget:
                seq += 1
                used = 0
            used += t
            seq_ids.append(seq)
        pdf["seq_id"] = pd.Series(seq_ids, dtype="int64")
        return pdf[["doc_id", "shard", "seq_id", "n_tokens"]]

    return base.groupBy("shard").applyInPandas(_pack, schema=out_schema)


# --------------------------------------------------------------------
# Reproducible mixture sampling
# --------------------------------------------------------------------


def mixture_sample(
    df: DataFrame,
    fractions: dict[str, float],
    stratum_col: str = "lang",
    id_col: str = "doc_id",
) -> DataFrame:
    """Deterministic per-stratum subsample: rank documents by the
    portable hash of their id (a reproducible shuffle order) and keep
    the first ``ceil(frac * n_stratum)`` of each stratum. Unlike
    `sampleBy` this is exactly reproducible across runs and engines —
    the property a training-mixture spec needs. Strata absent from
    ``fractions`` are dropped. One shuffle (window over stratum)."""
    from pyspark.sql import Window

    frac = F.create_map(
        *[F.lit(x) for kv in fractions.items() for x in kv]
    )[F.col(stratum_col)]
    w = Window.partitionBy(stratum_col).orderBy(portable_hash60(id_col), F.col(id_col))
    return (
        df.withColumn("_rn", F.row_number().over(w))
        .withColumn("_n", F.count(F.lit(1)).over(Window.partitionBy(stratum_col)))
        .filter(F.col("_rn") <= F.ceil(frac * F.col("_n")))
        .drop("_rn", "_n")
    )


def stratified_take(
    df: DataFrame,
    n_per_stratum: int,
    stratum_col: str = "lang",
    id_col: str = "doc_id",
) -> DataFrame:
    """Deterministic EXACT-N per-stratum sample: the first
    ``n_per_stratum`` rows of each stratum under the portable-hash
    shuffle order (ties → id). The fixed-COUNT companion to
    :func:`mixture_sample`'s fixed-FRACTION rule — the "take 10k docs
    per language" eval-set/budget shape — with the same properties:
    byte-identical across runs and engines (no RNG), one shuffle
    (window over stratum), and stable under corpus growth in the sense
    that a document's selection changes only when higher-ranked
    documents enter its stratum. Strata smaller than N keep all rows."""
    from pyspark.sql import Window

    w = Window.partitionBy(stratum_col).orderBy(
        portable_hash60(id_col), F.col(id_col)
    )
    return (
        df.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") <= n_per_stratum)
        .drop("_rn")
    )


# --------------------------------------------------------------------
# Context-window chunking
# --------------------------------------------------------------------


def chunk_documents(
    df: DataFrame,
    budget: int = 128,
    overlap: int = 16,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Split documents into context-window chunks of ≤ ``budget``
    whitespace tokens with ``overlap`` tokens carried between
    consecutive chunks — the standard long-document → training-window
    transform. One row per chunk: (id, chunk_id, n_tokens, chunk).

    Pure Column math: token array → slice starts via `sequence` with
    step = budget-overlap → posexplode of slices. No shuffle at all —
    chunking fuses into the scan (the output is a Generate over the
    projection), so it scales exactly as the scan does."""
    if overlap >= budget:
        raise ValueError("overlap must be smaller than budget")
    step = budget - overlap

    from exosql_spark.operators.text import tokens

    def _chunks(toks: Column) -> Column:
        n = F.size(toks)
        # starts: 1, 1+step, ... while start <= max(n-overlap, 1) so the
        # final (short) tail isn't emitted twice
        starts = F.sequence(F.lit(1), F.greatest(n - F.lit(overlap), F.lit(1)), F.lit(step))
        return F.transform(starts, lambda s: F.slice(toks, s, budget))

    chunked = df.select(
        F.col(id_col),
        F.posexplode(
            F.transform(F.array(tokens(F.col(text_col))), _chunks)[0]
        ).alias("chunk_id", "_ctoks"),
    )
    return chunked.select(
        id_col,
        "chunk_id",
        F.size("_ctoks").alias("n_tokens"),
        F.array_join("_ctoks", " ").alias("chunk"),
    )
