"""Structured Streaming ingest for the CDC event log."""

from neo4j_to_clickhouse_spark.streaming.pipeline import (  # noqa: F401
    StreamConfig,
    drain,
    start_node_stream,
    start_relationship_stream,
)
