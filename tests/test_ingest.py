"""Ingest transform tests: envelope -> event rows, quarantine, dedup,
latest-state (SURVEY.md §2.2 P1/P2, §2.9 M1/M2/M5)."""

from __future__ import annotations

from neo4j_to_clickhouse_spark.operators.ingest import (
    node_events_from_raw,
    relationship_events_from_raw,
)
from neo4j_to_clickhouse_spark.operators.latest_state import (
    current_state,
    dedup_exact_events,
    duplicate_entities,
    latest_events,
)


def test_node_projection(spark, node_raw):
    res = node_events_from_raw(node_raw)
    rows = {r.event_id: r for r in dedup_exact_events(res.events).collect()}
    assert set(rows) == {"n-001", "n-002", "n-003", "n-004", "n-005", "n-006"}
    assert rows["n-001"].event_type == "INSERT"
    assert rows["n-003"].event_type == "UPDATE"
    assert rows["n-006"].event_type == "DELETE"
    assert rows["n-002"].labels == ["Company", "Organization"]
    assert rows["n-001"].event_month == "202602"
    assert rows["n-005"].event_month == "202603"
    # CREATE has no before-state; normalized to '{}' (03-bulk-import.py:95-107)
    assert rows["n-001"].properties_before == "{}"
    assert '"age": 31' in rows["n-004"].properties_after


def test_quarantine(spark, node_raw):
    res = node_events_from_raw(node_raw)
    bad = res.quarantine.collect()
    assert len(bad) == 1
    assert bad[0].reason == "unparseable_json"
    assert bad[0].raw.startswith("{this")


def test_unclassified_kind_quarantined(spark):
    """A processable envelope matching NEITHER kind filter must land in
    quarantine (reason=unclassified_kind), never silently vanish (M5)."""
    import json

    weird = [
        # unknown eventType value
        json.dumps(
            {
                "id": "x-001",
                "metadata": {"txStartTime": {"TZDT": "2026-02-14T05:58:36.100+00:00"}},
                "event": {
                    "operation": "CREATE",
                    "eventType": "WEIRD_EVENT",
                    "elementId": "4:abc:9",
                },
            }
        ),
        # no eventType, no type, but a start marker: not node (marker
        # present), not rel (type null) -> contradictory
        json.dumps(
            {
                "id": "x-002",
                "metadata": {"txStartTime": {"TZDT": "2026-02-14T05:58:36.100+00:00"}},
                "event": {
                    "operation": "CREATE",
                    "elementId": "4:abc:9",
                    "start": {"elementId": "4:abc:1"},
                },
            }
        ),
    ]
    raw = spark.createDataFrame([(s,) for s in weird], ["raw"])
    for transform in (node_events_from_raw, relationship_events_from_raw):
        res = transform(raw)
        assert res.events.count() == 0
        bad = res.quarantine.collect()
        assert {r.reason for r in bad} == {"unclassified_kind"}
        assert len(bad) == 2


def test_relationship_projection(spark, rel_raw):
    res = relationship_events_from_raw(rel_raw)
    rows = {r.event_id: r for r in res.events.collect()}
    assert set(rows) == {"r-001", "r-002", "r-003", "r-004"}
    assert rows["r-001"].relationship_type == "KNOWS"
    assert rows["r-001"].source_id == "4:abc:1"
    assert rows["r-001"].target_id == "4:abc:2"
    assert rows["r-004"].event_type == "DELETE"
    assert res.quarantine.count() == 0


def test_event_dedup_replay(spark, node_raw):
    """Duplicate event ids (at-least-once replay) collapse to one row."""
    events = node_events_from_raw(node_raw).events
    assert events.count() == 7  # n-005 appears twice
    assert dedup_exact_events(events).count() == 6


def test_latest_state_tiebreak(spark, node_raw):
    """At identical timestamps the higher event_id wins — the reference's
    (event_timestamp, event_id) sort-key order (01-init-tables.sql:18)."""
    events = dedup_exact_events(node_events_from_raw(node_raw).events)
    latest = {r.entity_id: r for r in latest_events(events).collect()}
    assert latest["4:abc:1"].event_id == "n-004"  # ties n-003 at same ms
    assert latest["4:abc:1"].properties_after == '{"name": "Alice", "age": 31}'


def test_current_state_excludes_deleted(spark, node_raw):
    events = dedup_exact_events(node_events_from_raw(node_raw).events)
    live = {r.entity_id for r in current_state(events).collect()}
    assert live == {"4:abc:1", "4:abc:2"}  # 4:abc:3 deleted


def test_duplicate_entities_validation(spark, node_raw):
    events = node_events_from_raw(node_raw).events
    # no SNAPSHOT rows in the CDC corpus -> validation passes vacuously
    assert duplicate_entities(events).count() == 0


def test_out_of_range_timestamps_quarantined(spark):
    """A syntactically valid timestamp outside ClickHouse DateTime64's
    representable range [1900, 2299] is poison: the reference engine
    cannot store it, and unbounded it passed ingest and then crashed
    Python-side row materialization downstream (datetime year-0 range
    error on collect). It must quarantine as bad_timestamp instead."""
    from tests.conftest import _env

    from neo4j_to_clickhouse_spark.sources.envelopes import RAW_COL

    lines = [
        _env("ok-1", "CREATE", "NODE_EVENT", "4:t:1",
             "2026-02-14T05:58:36.100+00:00", labels=["U"], after={}),
        _env("lo-1", "CREATE", "NODE_EVENT", "4:t:2",
             "0001-01-01T00:00:00.000+00:00", labels=["U"], after={}),
        _env("lo-2", "CREATE", "NODE_EVENT", "4:t:3",
             "1899-12-31T23:59:59.999+00:00", labels=["U"], after={}),
        _env("hi-1", "CREATE", "NODE_EVENT", "4:t:4",
             "9999-12-31T23:59:59.999+00:00", labels=["U"], after={}),
        _env("edge-lo", "CREATE", "NODE_EVENT", "4:t:5",
             "1900-01-01T00:00:00.000+00:00", labels=["U"], after={}),
        _env("edge-hi", "CREATE", "NODE_EVENT", "4:t:6",
             "2299-12-31T23:59:59.000+00:00", labels=["U"], after={}),
    ]
    raw = spark.createDataFrame([(s,) for s in lines], [RAW_COL])
    res = node_events_from_raw(raw)
    good = {r.event_id for r in res.events.collect()}  # must not raise
    assert good == {"ok-1", "edge-lo", "edge-hi"}
    bad = {(r.reason) for r in res.quarantine.collect()}
    assert bad == {"bad_timestamp"}
    assert res.quarantine.count() == 3
