"""Streaming contamination-index ingest — the decontamination tier's
batch↔streaming story, same discipline as the CMS / IVF / edge-table
ingests (``index_ingest.py``, ``graph_ingest.py``): evaluation suites
REGISTER OVER TIME (a new benchmark lands, its n-grams must start
blocking training docs immediately), so the maintained state is the
benchmark's distinct n-gram set — SET-UNION-MERGEABLE, the easiest
kind.  Each micro-batch writes its batch-local distinct grams as an
idempotent batch-id-keyed partial; the read side unions the parts and
re-distincts, which is exactly the gram set one batch pass over all
registered suites would build (set union is associative, commutative
and idempotent — replays and cross-batch duplicates are both
absorbed).

The probe side never changes: ``operators.decontam
.hits_against_gram_set`` broadcasts the merged set into the corpus
scan — so a 100 TB corpus is decontaminated against the LIVE index
with the same zero-shuffle join the static entry uses.  At much
larger suite sizes the same store feeds ``build_bloom``'s input
instead; the parts layout is agnostic to which probe structure
compiles from it.

Delivery semantics: identical to the other ingests —
``sinks.append_batch_keyed`` turns foreachBatch's at-least-once into
exactly-once-effect via batch-keyed file names.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

BENCH_DOCS_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("text", T.StringType()),
    ]
)


def read_benchmark_stream(
    spark: SparkSession, parquet_path: str, max_files_per_trigger: int = 1
) -> DataFrame:
    """File-source stream over a benchmark-documents parquet dir;
    ``maxFilesPerTrigger=1`` makes each file its own micro-batch (one
    arriving evaluation suite ≈ one file)."""
    from exosql_spark.streaming.events import _as_stream_dir

    return (
        spark.readStream.schema(BENCH_DOCS_SCHEMA)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .parquet(_as_stream_dir(parquet_path))
    )


def benchmark_ingest_stream(
    stream_df: DataFrame,
    grams_path: str,
    checkpoint: str,
    n: int = 8,
    n_buckets: int = 8,
):
    """Start an availableNow foreachBatch query appending each
    micro-batch's DISTINCT n-grams into the bucket-partitioned parts
    store at ``grams_path`` (bucket = hash(gram) mod ``n_buckets`` —
    the parallel-compaction unit, not a join alignment).  Per-batch
    distinct bounds each partial by the batch's own vocabulary;
    cross-batch duplicates are the read side's distinct's job.
    Returns the running StreamingQuery; callers await/stop it."""
    from exosql_spark import sinks
    from exosql_spark.operators.decontam import ngrams

    def _append(batch_df: DataFrame, batch_id: int) -> None:
        grams = (
            batch_df.select(F.explode(ngrams("text", n)).alias("g"))
            .distinct()
            .select(
                "g", F.pmod(F.hash("g"), F.lit(n_buckets)).alias("bucket")
            )
        )
        sinks.append_batch_keyed(grams, grams_path, "bucket", batch_id)

    return (
        stream_df.writeStream.foreachBatch(_append)
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )


def read_benchmark_grams(spark: SparkSession, grams_path: str) -> DataFrame:
    """The live contamination gram set: distinct union over all
    appended partials — exactly the set a batch pass over every
    registered suite would produce (bucket column dropped — layout,
    not data)."""
    return spark.read.parquet(grams_path).select("g").distinct()
