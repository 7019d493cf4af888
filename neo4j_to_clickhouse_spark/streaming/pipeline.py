"""Structured Streaming CDC ingest (SURVEY.md §2.10, §7 step 6).

The Spark analogue of the reference's continuous path — Kafka-engine table +
materialized view + MergeTree insert (`clickhouse/init/01-init-tables.sql:
40-49,71-90`) — as ONE streaming query per entity kind:

    source (Kafka topic / file stream)
      -> envelope parse + projection  (identical code to batch ingest)
      -> foreachBatch: month-partitioned parquet append + quarantine append

Design decisions, mapped to reference behavior:

- **Exactly-once effect.** The reference is at-least-once (auto-commit
  consumer, `clickhouse/config/config.xml:13-14`) and defers dedup to
  `OPTIMIZE FINAL`. We checkpoint offsets AND make the sink write itself
  idempotent: each micro-batch lands in a hidden staging dir, then moves
  into the table under deterministic ``batch-<id>-<i>`` file names, with
  any stale files of the same batch id removed first. A batch replayed
  after a crash (the at-least-once window between data write and
  checkpoint commit) therefore *replaces* its own partial output instead
  of appending a duplicate — raw-table consumers see each event once
  without needing ``dedup_exact_events`` (which remains as
  defense-in-depth for upstream producer duplicates). This is the local-FS
  realization; on a cluster the same protocol rides HDFS atomic rename, or
  a transactional table format (Delta/Iceberg) replaces it wholesale.
  ``StreamConfig(store=TxnLogPartitionStore())`` upgrades it in place:
  each batch publishes as one atomic commit-log entry, closing the
  rename protocol's partial-visibility window for concurrent readers.
- **Quarantine, not stall.** Poison messages blocked the reference's
  consumer until manual DETACH/ATTACH (`docs/ISSUES-AND-FIXES.md:188-205`).
  Here unparseable/incomplete envelopes land in a quarantine directory with
  a reason column (M5) and the stream never stops.
- **Latency SLO.** ``trigger(processingTime='1 second')`` matches the
  1 s CDC poll interval (`kafka-connect/neo4j-cdc-nodes-source.json:9`) and
  the <2 s end-to-end target (`docs/QUICKSTART.md:174`). Tests use
  ``availableNow`` for a drain-and-stop run over file fixtures.
- **Scale.** One task per Kafka partition; `maxOffsetsPerTrigger`
  (default 1,048,576 = the reference's `kafka_max_block_size`,
  `01-init-tables.sql:49`) bounds micro-batch size so executor memory is
  block-sized, not backlog-sized. The sink appends month-partitioned parquet;
  compaction of small streaming files is the existing
  :func:`..operators.maintenance.compact` job.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Callable

from pyspark.sql import DataFrame
from pyspark.sql.streaming import StreamingQuery

from neo4j_to_clickhouse_spark.operators.ingest import (
    IngestResult,
    node_events_from_raw,
    relationship_events_from_raw,
)
from neo4j_to_clickhouse_spark.sources.envelopes import parse_envelopes


@dataclass
class StreamConfig:
    """Sink layout + cadence for one entity-kind stream.

    ``store``: pass a
    :class:`~neo4j_to_clickhouse_spark.operators.txn_store.TxnLogPartitionStore`
    to publish each micro-batch as ONE atomic transaction-log commit —
    concurrent readers then never see a partially-promoted batch (the
    rename protocol's one remaining gap) and batch replay is an atomic
    replace. This is the RECOMMENDED sink protocol. Default ``None``
    resolves per-table, like the maintenance jobs
    (:func:`~neo4j_to_clickhouse_spark.operators.maintenance.resolve_store`):
    a ``_txn_log``-adopted table transacts automatically (rename-promoting
    into a logged table would land files the snapshot never sees), a
    plain table keeps the rename protocol. The quarantine sink always
    uses renames: it is an append-only audit log, not a snapshot-read
    table."""

    table_path: str
    quarantine_path: str
    checkpoint_path: str
    processing_time: str | None = "1 second"  # None -> availableNow drain
    coalesce_output: int | None = None  # small-file control per micro-batch
    store: object | None = None  # duck-typed: needs .commit_batch


def dedup_within_watermark(
    events: DataFrame,
    id_col: str = "event_id",
    time_col: str = "event_timestamp",
    max_lateness: str = "10 minutes",
) -> DataFrame:
    """In-flight guard against upstream PRODUCER duplicates (the same
    event id emitted twice by the source, possibly in different
    micro-batches) — the failure mode the sink's replay-idempotent
    rename protocol cannot see, because both copies are legitimate new
    data to the sink.

    ``dropDuplicatesWithinWatermark`` keeps one row per id while the id
    is inside the watermark, with state EVICTED as the watermark passes —
    bounded by the duplicate-arrival window, never by history (a plain
    streaming ``dropDuplicates`` would grow state forever). Batch-side
    ``dedup_exact_events`` remains the backstop for duplicates arriving
    farther apart than ``max_lateness``.
    """
    return events.withWatermark(time_col, max_lateness)\
        .dropDuplicatesWithinWatermark([id_col])


def _promote_staged(
    staging: str, dest_root: str, batch_id: int, query_name: str = ""
) -> None:
    """Move staged part-files into the table under deterministic
    ``batch-[<query>~]<id>-<i>`` names. Replay-safe: files from a
    previous (crashed) attempt of the same batch are removed first, so
    re-running a batch replaces its own output rather than duplicating
    it — which is why ``query_name`` must namespace the prefix when two
    queries share a destination (their batch-id sequences advance
    independently; un-namespaced, one query's promote would delete the
    other's committed files for the same id; the ``~`` separator keeps
    tags prefix-unambiguous, same grammar as the txn store's
    ``stage_batch_files``). Renames are same-filesystem ``os.replace``
    (atomic per file); the staging dir name starts with '.' so Spark's
    file listing never sees in-flight data."""
    import glob
    import os
    import shutil

    query = "".join(c for c in query_name if c.isalnum() or c in "_-")
    prefix = f"batch-{query + '~' if query else ''}{batch_id:09d}-"
    os.makedirs(dest_root, exist_ok=True)
    for pat in ("event_month=*/", ""):
        for stale in glob.glob(os.path.join(dest_root, pat + prefix + "*")):
            os.remove(stale)
    srcs = sorted(
        glob.glob(os.path.join(staging, "event_month=*", "part-*"))
        + glob.glob(os.path.join(staging, "part-*"))
    )
    for i, src in enumerate(srcs):
        part_dir = os.path.dirname(os.path.relpath(src, staging))
        dest_dir = os.path.join(dest_root, part_dir) if part_dir else dest_root
        os.makedirs(dest_dir, exist_ok=True)
        os.replace(src, os.path.join(dest_dir, f"{prefix}{i:05d}.parquet"))
    shutil.rmtree(staging, ignore_errors=True)


def _write_batch(
    result: IngestResult,
    config: StreamConfig,
    batch_id: int,
    query_name: str = "",
) -> None:
    """Sink one micro-batch: events to the month-partitioned table, bad rows
    to quarantine — idempotently (see module docstring). Runs on the driver
    per micro-batch (foreachBatch); the staged writes happen on executors,
    the promote is a driver-side batch of atomic renames."""
    import os

    events = result.events
    if config.coalesce_output:
        events = events.coalesce(config.coalesce_output)
    # the staging dir must be query-namespaced too: two queries sharing
    # the table reach the same batch ids near-simultaneously, and a
    # shared path would let one query's overwrite/rmtree eat the
    # other's in-flight staged files
    q = "".join(c for c in query_name if c.isalnum() or c in "_-")
    staging = os.path.join(
        config.table_path, f".staging-{q + '~' if q else ''}{batch_id}"
    )
    (
        events.write.mode("overwrite")
        .partitionBy("event_month")
        .parquet(staging)
    )
    store = config.store
    if store is None:
        from neo4j_to_clickhouse_spark.operators.maintenance import (
            resolve_store,
        )

        store = resolve_store(config.table_path)
    if hasattr(store, "commit_batch"):
        from neo4j_to_clickhouse_spark.operators.txn_store import (
            stage_batch_files,
        )

        # the query name namespaces the batch tag: two queries writing
        # the same table share batch-id sequences, and an un-namespaced
        # replay of one would remove the other's committed batch-N files
        adds, tag = stage_batch_files(
            config.table_path, staging, batch_id, query_name=query_name
        )
        store.commit_batch(config.table_path, adds, tag)
    else:
        _promote_staged(staging, config.table_path, batch_id, query_name)

    bad = result.quarantine
    if config.coalesce_output:
        bad = bad.coalesce(1)
    q_staging = os.path.join(
        config.quarantine_path, f".staging-{q + '~' if q else ''}{batch_id}"
    )
    bad.write.mode("overwrite").parquet(q_staging)
    _promote_staged(q_staging, config.quarantine_path, batch_id, query_name)


def _start(
    raw_stream: DataFrame,
    transform: Callable[[DataFrame], IngestResult],
    config: StreamConfig,
    query_name: str,
) -> StreamingQuery:
    def process(batch_df: DataFrame, batch_id: int) -> None:
        # events + quarantine are two actions over the same micro-batch;
        # persist the PARSED frame so the envelope JSON decode — the
        # expensive step — runs once, not once per sink
        parsed = parse_envelopes(batch_df).persist()
        try:
            _write_batch(transform(parsed), config, batch_id, query_name)
        finally:
            parsed.unpersist()

    writer = (
        raw_stream.writeStream.queryName(query_name)
        .foreachBatch(process)
        .option("checkpointLocation", config.checkpoint_path)
    )
    if config.processing_time is None:
        writer = writer.trigger(availableNow=True)
    else:
        writer = writer.trigger(processingTime=config.processing_time)
    return writer.start()


def start_node_stream(raw_stream: DataFrame, config: StreamConfig) -> StreamingQuery:
    """Continuous node ingest — the `nodes_kafka_mv` analogue
    (`clickhouse/init/01-init-tables.sql:71-90`). ``raw_stream`` is any
    streaming frame with a single ``raw`` string column (Kafka via
    :func:`..sources.kafka.read_kafka_envelopes`, or
    :func:`..sources.envelopes.read_envelope_file` with streaming=True).
    """
    return _start(raw_stream, node_events_from_raw, config, "node_cdc_ingest")


def start_relationship_stream(
    raw_stream: DataFrame, config: StreamConfig
) -> StreamingQuery:
    """Continuous relationship ingest — the `relationships_kafka_mv` analogue
    (`clickhouse/init/01-init-tables.sql:97-118`)."""
    return _start(
        raw_stream, relationship_events_from_raw, config, "rel_cdc_ingest"
    )


def drain(query: StreamingQuery, timeout_s: float = 120.0) -> None:
    """Block until an availableNow query finishes draining its source."""
    query.awaitTermination(timeout_s)
    if query.isActive:
        query.stop()
