"""Streaming corpus ingestion — the LLM-pipeline operators applied to
a document STREAM.

The text operators (:mod:`exosql_spark.operators.text`) are pure
Column expressions, so the exact same code runs batch or streaming —
this module is the streaming composition:

- :func:`read_documents_stream` — file-source stream over documents
  parquet (new files appear → new micro-batch; the ingestion shape
  for a crawl landing zone).
- :func:`curate_stream` — per-row curation (lang-id, quality gate,
  fingerprint, token count): map-only, zero state, unlimited scale.
- :func:`stream_exact_dedup` — streaming exact dedup on the content
  fingerprint via ``dropDuplicates`` (state = one digest per distinct
  doc; bound it with a watermark when the stream has event time —
  documents don't, so state grows with distinct content: at 100 TB
  use the batch dedup on landed data instead, which is why both
  exist).

Near-dup (MinHash) stays batch: LSH banding needs a self-join, which
streaming can't do unbounded — the production pattern is streaming
curation + periodic batch near-dup compaction over the landed corpus.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from exosql_spark.operators import text

DOCUMENTS_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("text", T.StringType()),
        T.StructField("lang", T.StringType()),
        T.StructField("source", T.StringType()),
        T.StructField("n_chars", T.LongType()),
    ]
)


def read_documents_stream(
    spark: SparkSession, parquet_path: str, max_files_per_trigger: int = 1
) -> DataFrame:
    from exosql_spark.streaming.events import _as_stream_dir

    return (
        spark.readStream.schema(DOCUMENTS_SCHEMA)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .parquet(_as_stream_dir(parquet_path))
    )


def curate_stream(
    docs: DataFrame,
    text_col: str = "text",
    min_tokens: int = 10,
    min_quality: float = 0.3,
) -> DataFrame:
    """Same per-row curation as the batch pipeline — identical Column
    expressions, streaming execution."""
    featured = (
        text.quality_score(docs, text_col)
        .withColumn("lang_pred", text.lang_id(text_col))
        .withColumn("content_hash", text.fingerprint_md5(F.col(text_col)))
    )
    return featured.filter(
        (F.col("q_n_tokens") >= min_tokens) & (F.col("quality") >= min_quality)
    )


def stream_exact_dedup(curated: DataFrame) -> DataFrame:
    """Streaming exact dedup on content_hash (unbounded state — see
    module docstring for the scale trade-off)."""
    return curated.dropDuplicates(["content_hash"])
