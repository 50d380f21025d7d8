"""Streaming stored-index ingest — continuous ``ivf_append``.

The batch maintenance path (`similarity.ivf_append`: frozen-quantizer
assignment appended into the cell-partitioned layout) composed with
Structured Streaming's ``foreachBatch``: every micro-batch of new
vectors is assigned with the SAME frozen centroids and appended into
the SAME stored layout, so a probe sees vectors become searchable
batches after they arrive — the continuous-ingest shape of the 100 TB
index lifecycle (encode once → stream appends → compact periodically →
probe always).

Delivery semantics: the checkpoint's offset log makes each source
batch processed AT LEAST once — a crash between the parquet append and
the offset commit replays that batch on restart. Since round 10 the
append is IDEMPOTENT per batch: foreachBatch's batch id keys the
appended file names (``sinks.append_batch_keyed``), so a replayed
micro-batch purges and overwrites its own files instead of duplicating
rows — exactly-once-EFFECT output without a transactional table
format (replay-tested in tests/test_streaming.py: processing a batch
twice leaves probe results and the stored layout byte-identical to
once). The availableNow parity entry (`streaming_ivf_ingest_parity`)
drives the same keyed path end-to-end. The fragmentation this ingest
creates (one file per cell per micro-batch) is what
`sinks.compact_partitioned` exists to repair.

Reference parity note: the reference engine (SURVEY.md §2.9) has no
streaming surface at all — this extension exists for the
training-data-pipeline story, not reference parity.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

EMBEDDINGS_SCHEMA = T.StructType(
    [
        T.StructField("vec_id", T.LongType()),
        T.StructField("embedding", T.ArrayType(T.FloatType())),
    ]
)


def read_embeddings_stream(
    spark: SparkSession, parquet_path: str, max_files_per_trigger: int = 1
) -> DataFrame:
    """File-source stream over an embeddings parquet dir (or staged
    single file); ``maxFilesPerTrigger=1`` makes each file its own
    micro-batch, so multi-file inputs exercise true multi-batch
    ingest."""
    from exosql_spark.streaming.events import _as_stream_dir

    return (
        spark.readStream.schema(EMBEDDINGS_SCHEMA)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .parquet(_as_stream_dir(parquet_path))
    )


def ivf_ingest_stream(
    stream_df: DataFrame,
    centroids: list[list[float]],
    path: str,
    checkpoint: str,
    assigner: str = "expr",
):
    """Start an availableNow foreachBatch query appending each
    micro-batch into the cell-partitioned IVF layout at ``path`` with
    the frozen ``centroids``. Returns the running StreamingQuery;
    callers await/stop it. See the module docstring for the
    delivery-semantics contract (the batch id keys the appended files
    — replays are idempotent)."""
    from exosql_spark.operators.similarity import ivf_append

    def _append(batch_df: DataFrame, batch_id: int) -> None:
        ivf_append(batch_df, centroids, path, assigner=assigner, batch_id=batch_id)

    return (
        stream_df.writeStream.foreachBatch(_append)
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )


def sketch_ingest_stream(
    stream_df: DataFrame,
    key: str,
    path: str,
    checkpoint: str,
    depth: int = 4,
    width: int = 256,
    salt: str = "",
):
    """Continuous count-min maintenance: each micro-batch reduces to
    its own CMS PARTIAL (bounded depth×width rows regardless of batch
    size — the reduction happens before anything is written) which
    appends idempotently into a d-partitioned parts layout
    (``sinks.append_batch_keyed``: batch-id-keyed files, replays
    overwrite themselves).  The stored layout holds sketch PARTS; the
    live sketch is their entrywise sum at read time
    (:func:`read_sketch`) — merge-on-read, so there is no
    read-modify-write race and no transactional table requirement,
    exactly because CM sketches are mergeable by addition.  Compaction
    (many small part files → one part per d) is
    ``sinks.compact_partitioned``, same repair story as the IVF
    layout.  Returns the running availableNow StreamingQuery.

    ``depth``/``width`` defaults MATCH ``operators.sketch.cms_counts``
    (ADVICE r12: they diverged — 1024 here vs 256 there — so two
    default-built sketches silently produced a meaningless join-size
    estimate; tests/test_operators.py pins the equality)."""
    from pyspark.sql import functions as F

    from exosql_spark import sinks
    from exosql_spark.operators.sketch import cms_counts

    def _append(batch_df: DataFrame, batch_id: int) -> None:
        parts = cms_counts(
            batch_df, F.col(key), depth=depth, width=width, salt=salt
        )
        sinks.append_batch_keyed(parts, path, "d", batch_id)

    return (
        stream_df.writeStream.foreachBatch(_append)
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )


def read_sketch(spark: SparkSession, path: str) -> DataFrame:
    """The live sketch from a parts layout: entrywise sum over all
    appended partials — identical (exactly, not approximately) to the
    sketch a single batch pass over the union of the ingested data
    would build."""
    from pyspark.sql import functions as F

    return (
        spark.read.parquet(path)
        .groupBy("d", "bucket")
        .agg(F.sum("n").alias("n"))
    )
