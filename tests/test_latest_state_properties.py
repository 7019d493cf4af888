"""Property-based tests for the latest-state semantics (hypothesis).

The reference's test strategy is purely observational scenario replay
(SURVEY.md §5 — no property tests, no asserted invariants). These pin the
engine's core derivation — "latest event per entity by the
(event_timestamp, event_id) total order; entity live iff that event is not
a DELETE" — against a pure-Python oracle over randomized event logs,
including the adversarial cases: duplicate timestamps (tie-break by
event_id), replayed event ids, interleaved DELETE/re-INSERT.
"""

from __future__ import annotations

from datetime import datetime, timezone

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from neo4j_to_clickhouse_spark.operators.latest_state import (
    current_state,
    dedup_exact_events,
    latest_events,
)

# Small domains force collisions: few entities, few timestamps, reused
# event-id suffixes.
_entity = st.sampled_from(["a", "b", "c"])
_etype = st.sampled_from(["INSERT", "UPDATE", "DELETE", "SNAPSHOT"])
_ts_ms = st.integers(min_value=0, max_value=5)
_eid = st.integers(min_value=0, max_value=9)

_event = st.tuples(_eid, _etype, _ts_ms, _entity)
_log = st.lists(_event, min_size=1, max_size=25)


def _rows(log):
    return [
        (
            f"e{eid}",
            etype,
            datetime(2026, 1, 1, 0, 0, 0, ms * 1000, tzinfo=timezone.utc),
            ent,
        )
        for (eid, etype, ms, ent) in log
    ]


def _py_latest(rows):
    """Reference semantics in plain Python: max by (ts, event_id) per entity.
    Ties beyond the total order (same ts AND same event_id for one entity)
    are excluded by the generator filter below."""
    best = {}
    for event_id, etype, ts, ent in rows:
        key = (ts, event_id)
        if ent not in best or key > (best[ent][2], best[ent][0]):
            best[ent] = (event_id, etype, ts, ent)
    return best


def _unambiguous(log):
    """The (event_timestamp, event_id) pair is the engine's total order;
    logs where one entity holds two DIFFERENT events with the same
    (ts, id) pair have no defined winner — exclude them (replays of the
    same id at the same ts with the same payload are fine and covered by
    dedup_exact_events)."""
    seen = {}
    for eid, etype, ms, ent in log:
        key = (ent, ms, eid)
        if key in seen and seen[key] != etype:
            return False
        seen[key] = etype
    return True


@settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow],
)
@given(_log.filter(_unambiguous))
def test_latest_events_matches_python_oracle(spark, log):
    rows = _rows(log)
    df = spark.createDataFrame(
        rows, "event_id string, event_type string, event_timestamp timestamp, entity_id string"
    )
    got = {
        r.entity_id: (r.event_id, r.event_type)
        for r in latest_events(df).collect()
    }
    want = {
        ent: (v[0], v[1]) for ent, v in _py_latest(rows).items()
    }
    assert got == want


@settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow],
)
@given(_log.filter(_unambiguous))
def test_current_state_excludes_deleted(spark, log):
    rows = _rows(log)
    df = spark.createDataFrame(
        rows, "event_id string, event_type string, event_timestamp timestamp, entity_id string"
    )
    live = {r.entity_id for r in current_state(df).collect()}
    want = {
        ent for ent, v in _py_latest(rows).items() if v[1] != "DELETE"
    }
    assert live == want


@settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow],
)
@given(_log)
def test_dedup_exact_events_idempotent_and_complete(spark, log):
    rows = _rows(log)
    df = spark.createDataFrame(
        rows, "event_id string, event_type string, event_timestamp timestamp, entity_id string"
    )
    once = dedup_exact_events(df)
    ids = [r.event_id for r in once.select("event_id").collect()]
    assert sorted(set(ids)) == sorted(ids)  # no id appears twice
    assert set(ids) == {f"e{eid}" for (eid, _, _, _) in log}  # none lost
    assert dedup_exact_events(once).count() == once.count()  # idempotent


# --- ingest robustness fuzz (M5: no envelope may crash or vanish) -----------

_field_mask = st.fixed_dictionaries(
    {
        "id": st.booleans(),
        "ts": st.booleans(),
        "operation": st.booleans(),
        "elementId": st.booleans(),
        "labels": st.booleans(),
        "after": st.booleans(),
    }
)


def _masked_envelope(mask, i):
    import json

    ev = {}
    if mask["operation"]:
        ev["operation"] = "CREATE"
    ev["eventType"] = "NODE_EVENT"
    if mask["elementId"]:
        ev["elementId"] = f"n{i}"
    if mask["labels"]:
        ev["labels"] = ["X"]
    if mask["after"]:
        ev["state"] = {"after": {"properties": "{\"a\": 1}"}}
    env = {"event": ev}
    if mask["id"]:
        env["id"] = f"e{i}"
    if mask["ts"]:
        env["metadata"] = {"txStartTime": {"TZDT": "2026-01-05T10:00:00Z"}}
    return json.dumps(env)


@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow],
)
@given(st.lists(_field_mask, min_size=1, max_size=12))
def test_ingest_partitions_every_envelope(spark, masks):
    """Every input row lands in exactly one of {events, quarantine}; a row
    is an event iff it carries identity (id, elementId) and a parseable
    timestamp — regardless of which other fields are missing."""
    from neo4j_to_clickhouse_spark.operators.ingest import node_events_from_raw

    raw = spark.createDataFrame(
        [(_masked_envelope(m, i),) for i, m in enumerate(masks)], ["raw"]
    )
    res = node_events_from_raw(raw)
    n_good, n_bad = res.events.count(), res.quarantine.count()
    assert n_good + n_bad == len(masks)
    expect_good = sum(1 for m in masks if m["id"] and m["ts"] and m["elementId"])
    assert n_good == expect_good
    # defaults applied, never nulls, for the processable rows
    if n_good:
        evs = res.events.collect()
        assert all(e.event_type in ("INSERT", "UPDATE", "DELETE") for e in evs)
        assert all(e.properties_after is not None for e in evs)
        assert all(e.labels is not None for e in evs)
