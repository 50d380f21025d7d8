"""Streaming edge-table ingest — the graph tier's batch↔streaming
story (r13 verdict Next #8), same discipline as the CMS and IVF
ingest paths (`index_ingest.py`): micro-batches land IDEMPOTENTLY in
a partitioned store via batch-id-keyed files, incremental state that
is mergeable is maintained as merge-on-read PARTS, and the read side
reconstructs exactly what one batch pass over the union would build.

What is (and is not) incrementally maintainable for PageRank:

- The EDGE TABLE is append-only — trivially mergeable, so the store
  is a bucket-partitioned parquet layout fed by keyed appends
  (replayed micro-batches overwrite their own files; crash between
  append and offset commit is harmless — see index_ingest.py's
  delivery-semantics contract).
- OUT-STRENGTH (Σ weight per source; out-degree when unweighted) is
  a SUM — mergeable, so each micro-batch writes its own bounded
  partial and :func:`read_out_strength` sums parts at read time,
  exactly the CMS merge-on-read shape.  This is the per-vertex state
  an incremental rank refresher needs fresh on every edge arrival.
- The RANKS themselves are NOT mergeable (a global fixpoint): the
  honest streaming contract is store-maintenance + on-demand refresh
  — `operators.graph.pagerank` over :func:`read_edges` — not a
  pretend per-batch rank delta.  The parity entry
  (`streaming_pagerank_parity`) proves the refresh over the
  stream-built store lands on the closed-form answer.

Reference parity note: the reference engine (SURVEY.md §2.9) has no
streaming surface at all — this extension exists for the
training-data-pipeline story (link-graph quality priors over a
continuously crawled edge stream), not reference parity.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

EDGES_SCHEMA = T.StructType(
    [
        T.StructField("src", T.LongType()),
        T.StructField("dst", T.LongType()),
    ]
)


def read_edges_stream(
    spark: SparkSession, parquet_path: str, max_files_per_trigger: int = 1
) -> DataFrame:
    """File-source stream over an edges parquet dir;
    ``maxFilesPerTrigger=1`` makes each file its own micro-batch."""
    from exosql_spark.streaming.events import _as_stream_dir

    return (
        spark.readStream.schema(EDGES_SCHEMA)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .parquet(_as_stream_dir(parquet_path))
    )


def edge_ingest_stream(
    stream_df: DataFrame,
    edges_path: str,
    degrees_path: str,
    checkpoint: str,
    n_buckets: int = 8,
):
    """Start an availableNow foreachBatch query that appends each
    edge micro-batch into the bucket-partitioned store at
    ``edges_path`` AND its out-degree partial into the parts layout
    at ``degrees_path`` — both through ``sinks.append_batch_keyed``,
    so replays are idempotent for the pair together (same batch id
    keys both layouts' files).  The bucket is ``hash(src) mod
    n_buckets``: at scale it is the unit of parallel compaction and
    keeps any one ingest task's file count bounded; the rank
    refresher re-partitions by src itself (graph.pagerank persists
    the edge frame partitioned by source), so the store layout only
    has to be append-friendly, not join-aligned.  Returns the running
    StreamingQuery; callers await/stop it."""
    from exosql_spark import sinks

    def _append(batch_df: DataFrame, batch_id: int) -> None:
        edges = batch_df.select(
            "src", "dst", F.pmod(F.hash("src"), F.lit(n_buckets)).alias("bucket")
        )
        sinks.append_batch_keyed(edges, edges_path, "bucket", batch_id)
        deg = batch_df.groupBy(F.col("src").alias("id")).agg(
            F.count(F.lit(1)).cast("long").alias("deg")
        )
        parts = deg.select(
            "id", "deg", F.pmod(F.hash("id"), F.lit(n_buckets)).alias("bucket")
        )
        sinks.append_batch_keyed(parts, degrees_path, "bucket", batch_id)

    return (
        stream_df.writeStream.foreachBatch(_append)
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )


def read_edges(spark: SparkSession, edges_path: str) -> DataFrame:
    """The live edge table from the ingest store (bucket column
    dropped — it is layout, not data)."""
    return spark.read.parquet(edges_path).select("src", "dst")


def read_out_strength(spark: SparkSession, degrees_path: str) -> DataFrame:
    """The live out-degree table: sum over all appended partials —
    identical (exactly: integer addition) to ``edges.groupBy(src)
    .count()`` over the union of everything ingested."""
    return (
        spark.read.parquet(degrees_path)
        .groupBy("id")
        .agg(F.sum("deg").cast("long").alias("deg"))
    )
