"""Replay of the reference's 7-scenario acceptance suite (SURVEY.md §5).

The reference's test suite (`test-scenarios/01-*.cypher` ... `07-*.cypher`)
produces a documented end state — **349 node CDC events (50 INSERT /
270 UPDATE / 29 DELETE)** and **199 relationship CDC events (36 INSERT /
131 UPDATE / 32 DELETE)**, per `docs/ISSUES-AND-FIXES.md:258-263`. This
module synthesizes an envelope stream with exactly those distribution
shapes (CREATE -> UPDATE* -> DELETE per entity, monotone timestamps,
multi-label nodes, typed relationships), drains it through the streaming
ingest path, and asserts the same acceptance numbers end-to-end:
ingest -> event table -> count-by-type -> latest-state.
"""

from __future__ import annotations

import json

import pytest
from pyspark.sql import functions as F

from neo4j_to_clickhouse_spark.operators.latest_state import (
    current_state,
    dedup_exact_events,
    duplicate_entities,
)
from neo4j_to_clickhouse_spark.sources.envelopes import read_envelope_file
from neo4j_to_clickhouse_spark.streaming import (
    StreamConfig,
    drain,
    start_node_stream,
    start_relationship_stream,
)

# the reference's verified end-state (docs/ISSUES-AND-FIXES.md:258-263)
NODE_SHAPE = {"INSERT": 50, "UPDATE": 270, "DELETE": 29}
REL_SHAPE = {"INSERT": 36, "UPDATE": 131, "DELETE": 32}

LABEL_SETS = [["Person"], ["Company", "Organization"], ["Product"], ["Device"]]
REL_TYPES = ["KNOWS", "WORKS_AT", "LOCATED_AT", "CONNECTS_TO"]


def _ts(i: int) -> str:
    """Monotone millisecond timestamps inside one month."""
    return f"2026-02-14T06:{i // 6000:02d}:{(i // 100) % 60:02d}.{i % 100:03d}+00:00"


def _env(eid, op, kind, element, seq, **event_extra):
    ev = {
        "operation": op,
        "eventType": kind,
        "elementId": element,
        "state": {
            "before": {"properties": json.dumps({"v": seq - 1})} if op != "CREATE" else None,
            "after": {"properties": json.dumps({"v": seq})} if op != "DELETE" else None,
        },
        **event_extra,
    }
    return json.dumps(
        {"id": eid, "metadata": {"txStartTime": {"TZDT": _ts(seq)}}, "event": ev}
    )


def scenario_envelopes() -> tuple[list[str], list[str]]:
    """The 7 scenarios' event stream, shape-exact: every entity is CREATEd
    first, UPDATEs round-robin across live entities, DELETEs come last on a
    prefix of the entities (scenarios 03/06 delete what 01/04 created)."""
    node_lines: list[str] = []
    seq = 0
    for i in range(NODE_SHAPE["INSERT"]):
        node_lines.append(
            _env(f"ne-{seq:05d}", "CREATE", "NODE_EVENT", f"4:g:{i}", seq,
                 labels=LABEL_SETS[i % len(LABEL_SETS)])
        )
        seq += 1
    for u in range(NODE_SHAPE["UPDATE"]):
        i = u % NODE_SHAPE["INSERT"]
        node_lines.append(
            _env(f"ne-{seq:05d}", "UPDATE", "NODE_EVENT", f"4:g:{i}", seq,
                 labels=LABEL_SETS[i % len(LABEL_SETS)])
        )
        seq += 1
    for i in range(NODE_SHAPE["DELETE"]):
        node_lines.append(
            _env(f"ne-{seq:05d}", "DELETE", "NODE_EVENT", f"4:g:{i}", seq,
                 labels=LABEL_SETS[i % len(LABEL_SETS)])
        )
        seq += 1

    rel_lines: list[str] = []
    seq = 0
    for i in range(REL_SHAPE["INSERT"]):
        rel_lines.append(
            _env(f"re-{seq:05d}", "CREATE", "RELATIONSHIP_EVENT", f"5:g:{i}", seq,
                 type=REL_TYPES[i % len(REL_TYPES)],
                 start={"elementId": f"4:g:{i}"},
                 end={"elementId": f"4:g:{(i + 1) % NODE_SHAPE['INSERT']}"})
        )
        seq += 1
    for u in range(REL_SHAPE["UPDATE"]):
        i = u % REL_SHAPE["INSERT"]
        rel_lines.append(
            _env(f"re-{seq:05d}", "UPDATE", "RELATIONSHIP_EVENT", f"5:g:{i}", seq,
                 type=REL_TYPES[i % len(REL_TYPES)],
                 start={"elementId": f"4:g:{i}"},
                 end={"elementId": f"4:g:{(i + 1) % NODE_SHAPE['INSERT']}"})
        )
        seq += 1
    for i in range(REL_SHAPE["DELETE"]):
        rel_lines.append(
            _env(f"re-{seq:05d}", "DELETE", "RELATIONSHIP_EVENT", f"5:g:{i}", seq,
                 type=REL_TYPES[i % len(REL_TYPES)],
                 start={"elementId": f"4:g:{i}"},
                 end={"elementId": f"4:g:{(i + 1) % NODE_SHAPE['INSERT']}"})
        )
        seq += 1
    return node_lines, rel_lines


@pytest.fixture(scope="module")
def replayed(spark, tmp_path_factory):
    root = tmp_path_factory.mktemp("scenario_replay")
    node_lines, rel_lines = scenario_envelopes()
    for kind, lines, start in (
        ("nodes", node_lines, start_node_stream),
        ("rels", rel_lines, start_relationship_stream),
    ):
        src = root / kind / "in"
        src.mkdir(parents=True)
        # split across files: several micro-batch input splits in the drain
        third = len(lines) // 3
        (src / "s1.ndjson").write_text("\n".join(lines[:third]) + "\n")
        (src / "s2.ndjson").write_text("\n".join(lines[third : 2 * third]) + "\n")
        (src / "s3.ndjson").write_text("\n".join(lines[2 * third :]) + "\n")
        config = StreamConfig(
            table_path=str(root / kind / "events"),
            quarantine_path=str(root / kind / "quarantine"),
            checkpoint_path=str(root / kind / "ckpt"),
            processing_time=None,
            coalesce_output=1,
        )
        drain(start(read_envelope_file(spark, str(src), streaming=True), config))
    return root


def test_node_event_distribution(spark, replayed):
    events = spark.read.parquet(str(replayed / "nodes" / "events"))
    assert events.count() == sum(NODE_SHAPE.values())  # 349
    by_type = {
        r.event_type: r.cnt
        for r in events.groupBy("event_type").agg(F.count("*").alias("cnt")).collect()
    }
    assert by_type == NODE_SHAPE


def test_relationship_event_distribution(spark, replayed):
    events = spark.read.parquet(str(replayed / "rels" / "events"))
    assert events.count() == sum(REL_SHAPE.values())  # 199
    by_type = {
        r.event_type: r.cnt
        for r in events.groupBy("event_type").agg(F.count("*").alias("cnt")).collect()
    }
    assert by_type == REL_SHAPE


def test_nothing_quarantined_nothing_duplicated(spark, replayed):
    for kind in ("nodes", "rels"):
        qdir = str(replayed / kind / "quarantine")
        assert spark.read.parquet(qdir).count() == 0  # zero quarantine
        events = spark.read.parquet(str(replayed / kind / "events"))
        assert dedup_exact_events(events).count() == events.count()
        assert duplicate_entities(events).count() == 0


def test_latest_state_after_replay(spark, replayed):
    """Survivor counts: created minus deleted, and every survivor's state
    is its LAST update (the round-robin makes the final per-entity v
    computable in closed form)."""
    nodes = current_state(spark.read.parquet(str(replayed / "nodes" / "events")))
    assert nodes.count() == NODE_SHAPE["INSERT"] - NODE_SHAPE["DELETE"]  # 21
    rels = current_state(spark.read.parquet(str(replayed / "rels" / "events")))
    assert rels.count() == REL_SHAPE["INSERT"] - REL_SHAPE["DELETE"]  # 4
    # entity 4:g:49 (never deleted): last UPDATE is round u where
    # u % 50 == 49 -> u=249, seq = 50 + 249 = 299 -> properties v=299
    survivor = nodes.filter(F.col("entity_id") == "4:g:49").collect()[0]
    assert json.loads(survivor.properties_after) == {"v": 299}
    # live rels are exactly the non-deleted prefix complement
    live_rel_ids = {r.entity_id for r in rels.collect()}
    assert live_rel_ids == {f"5:g:{i}" for i in range(32, 36)}


def test_label_distribution_after_replay(spark, replayed):
    """Scenario-01 style multi-label coverage survives the pipeline: the
    label histogram over live nodes matches the generator's assignment."""
    nodes = current_state(spark.read.parquet(str(replayed / "nodes" / "events")))
    got = {
        tuple(r.labels): r.cnt
        for r in nodes.groupBy("labels").agg(F.count("*").alias("cnt")).collect()
    }
    want: dict[tuple, int] = {}
    for i in range(NODE_SHAPE["DELETE"], NODE_SHAPE["INSERT"]):
        key = tuple(LABEL_SETS[i % len(LABEL_SETS)])
        want[key] = want.get(key, 0) + 1
    assert got == want
