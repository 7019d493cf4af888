"""Structured Streaming ingest for the CDC event log."""

from neo4j_to_clickhouse_spark.streaming.monitoring import (  # noqa: F401
    session_counts,
    start_monitoring_stream,
    start_session_stream,
    windowed_event_counts,
)
from neo4j_to_clickhouse_spark.streaming.pipeline import (  # noqa: F401
    StreamConfig,
    dedup_within_watermark,
    drain,
    start_node_stream,
    start_relationship_stream,
)
from neo4j_to_clickhouse_spark.streaming.state import (  # noqa: F401
    start_latest_state_stream,
    tracked_latest_state,
)
