"""Streaming monitoring aggregation: windowed event-type counts with a
late-data watermark.

Beyond-parity operator (the reference has NO streaming aggregations,
SURVEY.md §2.10 — its monitoring queries poll the batch table,
`README.md:436-447`). A continuously-maintained per-minute count by
event type replaces polling and gives the consumer-lag-style health view
(`README.md:431`) directly from event time:

    events stream
      -> withWatermark(event_timestamp, <lateness bound>)
      -> groupBy(window(1 minute), event_type).count()
      -> append-mode parquet (finalized windows only)

Scale notes: the aggregation state is bounded by (windows within the
watermark) x (event types x months actively receiving data) — tiny by
construction, because the watermark finalizes and evicts old windows.
This is the Structured Streaming pattern every further streaming agg in
this engine should follow: event-time window + explicit lateness contract,
never processing-time state that grows with backlog.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming import StreamingQuery


def windowed_event_counts(
    events: DataFrame,
    window_duration: str = "1 minute",
    max_lateness: str = "10 minutes",
) -> DataFrame:
    """Event-time windowed counts by event_type over a streaming (or batch)
    event frame. In append mode a window emits exactly once, when the
    watermark passes its end — late events inside the lateness bound still
    count; later ones are dropped by contract (the reference's monthly
    partitioning 'absorbs' arbitrarily-late rows instead, but its monitor
    queries re-scan the whole table to see them).
    """
    return (
        events.withWatermark("event_timestamp", max_lateness)
        .groupBy(
            F.window("event_timestamp", window_duration).alias("w"),
            "event_type",
        )
        .agg(F.count("*").alias("cnt"))
        .select(
            F.col("w.start").alias("window_start"),
            F.col("w.end").alias("window_end"),
            "event_type",
            "cnt",
        )
    )


def start_monitoring_stream(
    events_stream: DataFrame,
    output_path: str,
    checkpoint_path: str,
    window_duration: str = "1 minute",
    max_lateness: str = "10 minutes",
    available_now: bool = False,
) -> StreamingQuery:
    """Run the windowed count as a continuous append-mode query.

    Append mode + watermark means the parquet output only ever contains
    finalized windows — downstream readers never see a count that will
    still change.
    """
    agg = windowed_event_counts(events_stream, window_duration, max_lateness)
    writer = (
        agg.writeStream.queryName("event_monitoring")
        .outputMode("append")
        .format("parquet")
        .option("path", output_path)
        .option("checkpointLocation", checkpoint_path)
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
