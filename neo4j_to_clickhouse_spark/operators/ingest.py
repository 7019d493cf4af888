"""Envelope -> event-table transforms (SURVEY.md §2.2 P1/P2).

The Spark analogue of the two ClickHouse materialized views
``nodes_kafka_mv`` / ``relationships_kafka_mv``
(`clickhouse/init/01-init-tables.sql:71-90,97-118`): a single declarative
``select`` per entity kind, shared verbatim between batch replay and
Structured Streaming (same DataFrame expressions, different source).

Quarantine semantics (M5): rows whose envelope fails to parse or lacks the
required identity/timestamp fields are split out, not dropped and never able
to stall the pipeline — the design fix for the reference's stuck-consumer
runbook (`docs/ISSUES-AND-FIXES.md:188-205`).
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from neo4j_to_clickhouse_spark.functions.scalar import (
    event_month,
    lenient_timestamp,
    operation_to_event_type,
    valid_json_or_empty,
)
from neo4j_to_clickhouse_spark.schemas import NODE_EVENT_KIND, REL_EVENT_KIND
from neo4j_to_clickhouse_spark.sources.envelopes import PARSED_COL, RAW_COL, parse_envelopes


def _e(field: str) -> Column:
    return F.col(f"{PARSED_COL}.event.{field}")


def _common_columns() -> dict[str, Column]:
    """Columns shared by the node and relationship projections — mirrors the
    shared head of both MVs (`clickhouse/init/01-init-tables.sql:72-84,98-110`).
    """
    ts = lenient_timestamp(F.col(f"{PARSED_COL}.metadata.txStartTime.TZDT"))
    return {
        "event_id": F.col(f"{PARSED_COL}.id"),
        "event_type": operation_to_event_type(_e("operation")),
        "event_timestamp": ts,
        "entity_id": _e("elementId"),
        "properties_before": valid_json_or_empty(_e("state.before.properties")),
        "properties_after": valid_json_or_empty(_e("state.after.properties")),
        "metadata": F.col(RAW_COL),
        "event_month": event_month(ts),
    }


def _is_processable() -> Column:
    """A row is ingestible iff it parsed and carries identity + time.

    The reference would silently insert garbage or stall; we gate on the
    fields its sort key and entity identity require
    (`clickhouse/init/01-init-tables.sql:18,35`).
    """
    return (
        F.col(PARSED_COL).isNotNull()
        & F.col(f"{PARSED_COL}.id").isNotNull()
        & _e("elementId").isNotNull()
        & lenient_timestamp(
            F.col(f"{PARSED_COL}.metadata.txStartTime.TZDT")
        ).isNotNull()
    )


@dataclass
class IngestResult:
    """Good rows + quarantined raw rows from one transform application."""

    events: DataFrame
    quarantine: DataFrame


def _node_kind() -> Column:
    """``eventType='NODE_EVENT'`` when present; envelopes without an
    eventType are classified nodes iff they carry no relationship markers
    (the two topics are already segregated upstream,
    `kafka-connect/neo4j-cdc-nodes-source.json:6`)."""
    # eqNullSafe, not ==: with a NULL eventType plain equality yields SQL
    # NULL, which poisons the whole predicate (NULL | false = NULL) — and a
    # NULL predicate fails BOTH ``filter(kind)`` and ``filter(~kind)``, so
    # the row would vanish from events *and* quarantine.
    return _e("eventType").eqNullSafe(F.lit(NODE_EVENT_KIND)) | (
        _e("eventType").isNull()
        & _e("type").isNull()
        & _e("start.elementId").isNull()
    )


def _rel_kind() -> Column:
    return _e("eventType").eqNullSafe(F.lit(REL_EVENT_KIND)) | (
        _e("eventType").isNull() & _e("type").isNotNull()
    )


def _split(parsed: DataFrame, kind_filter: Column) -> tuple[DataFrame, DataFrame]:
    ok = _is_processable()
    good = parsed.filter(ok & kind_filter)
    # Quarantine keeps the raw text + a reason — the dead-letter pattern.
    # Note: from_json in PERMISSIVE mode yields an all-NULL struct (not a
    # NULL struct) for undecodable text, so "nothing extracted at all" is
    # the unparseable signal.
    nothing_parsed = (
        F.col(PARSED_COL).isNull()
        | (
            F.col(f"{PARSED_COL}.id").isNull()
            & F.col(f"{PARSED_COL}.event").isNull()
            & F.col(f"{PARSED_COL}.metadata").isNull()
        )
    )
    # Processable rows that match NEITHER kind (unknown eventType value, or
    # contradictory markers like start.elementId without type) are
    # unroutable by ANY transform — without this they'd silently vanish,
    # violating the M5 "split out, not dropped" contract. Rows matching the
    # *other* kind are not quarantined here: they belong to the other
    # topic's transform (a mixed-batch caller runs both transforms over the
    # same frame and unions the event outputs).
    unclassified = ok & ~_node_kind() & ~_rel_kind()
    bad = parsed.filter(~ok | unclassified).select(
        F.col(RAW_COL),
        F.when(nothing_parsed, "unparseable_json")
        .when(F.col(f"{PARSED_COL}.id").isNull(), "missing_event_id")
        .when(_e("elementId").isNull(), "missing_entity_id")
        .when(unclassified, "unclassified_kind")
        .otherwise("bad_timestamp")
        .alias("reason"),
    )
    return good, bad


def node_events_from_raw(raw_df: DataFrame) -> IngestResult:
    """Raw envelope JSON -> node event rows (P1, 8-column projection of
    `clickhouse/init/01-init-tables.sql:72-89` + the derived partition column).

    Kind selection: ``eventType='NODE_EVENT'`` when present; envelopes
    without an eventType are classified nodes iff they carry no
    relationship markers (the two topics are already segregated upstream,
    `kafka-connect/neo4j-cdc-nodes-source.json:6`).

    Accepts either a raw one-column frame or an already-parsed frame (so a
    caller splitting one batch into events + quarantine can persist the
    parse and pay the JSON decode once).
    """
    parsed = (
        raw_df if PARSED_COL in raw_df.columns else parse_envelopes(raw_df)
    )
    good, bad = _split(parsed, _node_kind())
    c = _common_columns()
    events = good.select(
        c["event_id"].alias("event_id"),
        c["event_type"].alias("event_type"),
        c["event_timestamp"].alias("event_timestamp"),
        c["entity_id"].alias("entity_id"),
        F.coalesce(_e("labels"), F.array().cast("array<string>")).alias("labels"),
        c["properties_before"].alias("properties_before"),
        c["properties_after"].alias("properties_after"),
        c["metadata"].alias("metadata"),
        c["event_month"].alias("event_month"),
    )
    return IngestResult(events=events, quarantine=bad)


def relationship_events_from_raw(raw_df: DataFrame) -> IngestResult:
    """Raw envelope JSON -> relationship event rows (P2, 10-column projection
    of `clickhouse/init/01-init-tables.sql:98-117`). Accepts raw or
    pre-parsed frames like :func:`node_events_from_raw`.
    """
    parsed = (
        raw_df if PARSED_COL in raw_df.columns else parse_envelopes(raw_df)
    )
    good, bad = _split(parsed, _rel_kind())
    c = _common_columns()
    events = good.select(
        c["event_id"].alias("event_id"),
        c["event_type"].alias("event_type"),
        c["event_timestamp"].alias("event_timestamp"),
        c["entity_id"].alias("entity_id"),
        F.coalesce(_e("type"), F.lit("")).alias("relationship_type"),
        F.coalesce(_e("start.elementId"), F.lit("")).alias("source_id"),
        F.coalesce(_e("end.elementId"), F.lit("")).alias("target_id"),
        c["properties_before"].alias("properties_before"),
        c["properties_after"].alias("properties_after"),
        c["metadata"].alias("metadata"),
        c["event_month"].alias("event_month"),
    )
    return IngestResult(events=events, quarantine=bad)
