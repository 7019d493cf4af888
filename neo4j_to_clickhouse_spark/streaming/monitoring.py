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
        .agg(
            F.count("*").alias("cnt"),
            # HLL++ sketch agg works unchanged inside the watermarked
            # streaming window (it is a partial-aggregable function):
            # per-window distinct entities at sketch-size state cost —
            # the uniqState/uniqMerge rollup's streaming twin
            F.hll_sketch_estimate(
                F.hll_sketch_agg("entity_id")
            ).alias("approx_entities"),
        )
        .select(
            F.col("w.start").alias("window_start"),
            F.col("w.end").alias("window_end"),
            "event_type",
            "cnt",
            "approx_entities",
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


def session_counts(
    events: DataFrame,
    key_col: str = "user_id",
    time_col: str = "event_timestamp",
    gap: str = "30 minutes",
    max_lateness: str = "10 minutes",
) -> DataFrame:
    """Gap-based sessions as a streaming aggregation — the streaming twin
    of the batch :func:`..operators.analytics.sessionize` window, via
    Spark's native ``session_window`` (merging event-time windows that
    keep extending while events arrive within ``gap``).

    Output: (key, session_start, session_end, n_events) — one row per
    closed session. ``session_end`` is ``last event + gap`` (the native
    operator's convention). Boundary contract: ``session_window`` is
    half-open, so an event at EXACTLY ``gap`` after its predecessor
    starts a NEW session, where the batch form's ``diff > gap`` keeps it
    — equivalent everywhere except that zero-measure boundary.

    Scale shape: state is (keys with an open session) x (sessions inside
    the watermark), evicted as the watermark passes ``session_end`` —
    bounded by active keys, never by history. Works on a batch frame too
    (full session set, no watermark eviction), which is what the
    equivalence test exercises against the batch sessionizer.
    """
    return (
        events.withWatermark(time_col, max_lateness)
        .groupBy(
            F.session_window(F.col(time_col), gap).alias("s"),
            key_col,
        )
        .agg(F.count("*").alias("n_events"))
        .select(
            key_col,
            F.col("s.start").alias("session_start"),
            F.col("s.end").alias("session_end"),
            "n_events",
        )
    )


def start_session_stream(
    events_stream: DataFrame,
    output_path: str,
    checkpoint_path: str,
    key_col: str = "user_id",
    time_col: str = "event_timestamp",
    gap: str = "30 minutes",
    max_lateness: str = "10 minutes",
    available_now: bool = False,
) -> StreamingQuery:
    """Run sessionization continuously: append-mode parquet of CLOSED
    sessions only (a session emits once, when the watermark passes its
    end — no session is ever revised after landing)."""
    agg = session_counts(events_stream, key_col, time_col, gap, max_lateness)
    writer = (
        agg.writeStream.queryName("sessionization")
        .outputMode("append")
        .format("parquet")
        .option("path", output_path)
        .option("checkpointLocation", checkpoint_path)
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
