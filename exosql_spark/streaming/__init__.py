"""Structured Streaming extension (SURVEY.md §2.9 — absent in the
reference; this is the beyond-reference streaming surface over event
tables)."""

from exosql_spark.streaming.events import (
    EVENTS_SCHEMA,
    read_events_stream,
    tumbling_counts,
    topk_event_types,
    sliding_value_avg,
    session_aggregate,
    dedup_within_watermark,
    run_to_memory,
    start_to_parquet,
    attribution_join,
    enrich_with_dimension,
)
from exosql_spark.streaming.graph_ingest import (
    EDGES_SCHEMA,
    edge_ingest_stream,
    read_canonical_edges,
    read_edges,
    read_edges_stream,
    read_out_strength,
    read_triangle_count,
    triangle_ingest_batch,
    triangle_ingest_stream,
)
from exosql_spark.streaming.decontam_ingest import (
    BENCH_DOCS_SCHEMA,
    benchmark_ingest_stream,
    read_benchmark_grams,
    read_benchmark_stream,
)
from exosql_spark.streaming.index_ingest import (
    EMBEDDINGS_SCHEMA,
    ivf_ingest_stream,
    read_embeddings_stream,
    read_sketch,
    sketch_ingest_stream,
)

__all__ = [
    "EDGES_SCHEMA",
    "edge_ingest_stream",
    "read_canonical_edges",
    "read_edges",
    "read_edges_stream",
    "read_triangle_count",
    "triangle_ingest_batch",
    "triangle_ingest_stream",
    "read_out_strength",
    "BENCH_DOCS_SCHEMA",
    "benchmark_ingest_stream",
    "read_benchmark_grams",
    "read_benchmark_stream",
    "EMBEDDINGS_SCHEMA",
    "ivf_ingest_stream",
    "read_embeddings_stream",
    "read_sketch",
    "sketch_ingest_stream",
    "EVENTS_SCHEMA",
    "read_events_stream",
    "tumbling_counts",
    "topk_event_types",
    "sliding_value_avg",
    "session_aggregate",
    "dedup_within_watermark",
    "run_to_memory",
    "start_to_parquet",
    "attribution_join",
    "enrich_with_dimension",
]
