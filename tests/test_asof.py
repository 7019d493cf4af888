"""As-of join semantics: at-or-before selection, exact-time ties,
no-history NULLs, atomic carry of multi-column state, and the one-shuffle
plan shape."""

from __future__ import annotations

from pyspark.sql import functions as F

from neo4j_to_clickhouse_spark.operators.asof import asof_join


def _events(spark, rows):
    return spark.createDataFrame(
        rows, "k long, t string, eid long, state string"
    ).select(
        "k", F.col("t").cast("timestamp").alias("ts"), "eid", "state"
    )


def test_asof_picks_latest_at_or_before(spark):
    ev = _events(
        spark,
        [
            (1, "2024-01-01 00:00:00", 10, "a"),
            (1, "2024-01-05 00:00:00", 11, "b"),
            (1, "2024-01-09 00:00:00", 12, "c"),
        ],
    )
    probes = spark.createDataFrame(
        [(1, "2024-01-05 00:00:00"), (1, "2024-01-06 00:00:00"),
         (1, "2023-12-30 00:00:00")],
        "k long, pt string",
    ).select("k", F.col("pt").cast("timestamp").alias("pt"))
    out = {
        r.pt.isoformat(): (r.eid, r.state)
        for r in asof_join(
            ev, probes, "k", "ts", "pt", ["eid", "state"], "eid"
        ).collect()
    }
    # exact-time event IS visible to the probe
    assert out["2024-01-05T00:00:00"] == (11, "b")
    assert out["2024-01-06T00:00:00"] == (11, "b")
    # probe before any history -> NULLs, row preserved (left semantics)
    assert out["2023-12-30T00:00:00"] == (None, None)


def test_asof_tie_break_and_atomic_state(spark):
    """Two events at one timestamp: the higher tie-break wins, and its
    state comes through whole — a NULL column in the winning event must
    NOT be backfilled from the older event (atomic struct carry)."""
    ev = _events(
        spark,
        [
            (1, "2024-01-01 00:00:00", 1, "old"),
            (1, "2024-01-02 00:00:00", 2, "x"),
            (1, "2024-01-02 00:00:00", 3, None),  # winner, NULL state
        ],
    )
    probes = spark.createDataFrame(
        [(1, "2024-01-03 00:00:00")], "k long, pt string"
    ).select("k", F.col("pt").cast("timestamp").alias("pt"))
    row = asof_join(
        ev, probes, "k", "ts", "pt", ["eid", "state"], "eid"
    ).collect()[0]
    assert row.eid == 3
    assert row.state is None  # not "x", not "old"


def test_asof_numeric_tie_break_order(spark):
    """Tie-break compares in the column's own type: event_id 10 must beat
    9 (a string cast would sort '10' < '9')."""
    ev = _events(
        spark,
        [
            (1, "2024-01-01 00:00:00", 9, "nine"),
            (1, "2024-01-01 00:00:00", 10, "ten"),
        ],
    )
    probes = spark.createDataFrame(
        [(1, "2024-01-02 00:00:00")], "k long, pt string"
    ).select("k", F.col("pt").cast("timestamp").alias("pt"))
    row = asof_join(
        ev, probes, "k", "ts", "pt", ["eid", "state"], "eid"
    ).collect()[0]
    assert (row.eid, row.state) == (10, "ten")


def test_asof_single_shuffle_plan(spark):
    """The whole as-of is ONE hash shuffle on the key (union feeds one
    window sort) — no join exchange, no per-probe scan."""
    ev = _events(spark, [(1, "2024-01-01 00:00:00", 1, "a")])
    probes = spark.createDataFrame(
        [(1, "2024-01-02 00:00:00")], "k long, pt string"
    ).select("k", F.col("pt").cast("timestamp").alias("pt"))
    out = asof_join(ev, probes, "k", "ts", "pt", ["eid", "state"], "eid")
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Exchange hashpartitioning") == 1
    assert "Join" not in plan


def test_asof_bucketed_matches_window_form_under_skew(spark):
    """The skew-safe bucketed variant must agree row-for-row with the
    single-window form on a hot key whose events cross many bucket
    boundaries, including probes in buckets with no in-bucket event
    (baseline fallback) and probes before any history (NULLs)."""
    from neo4j_to_clickhouse_spark.operators.asof import asof_join_bucketed

    # hot key 1: an event every 7 hours across January (crosses every
    # daily bucket boundary); key 2: two sparse events; key 3: no events
    ev_rows = [
        (1, f"2024-01-{1 + (7 * i) // 24:02d} {(7 * i) % 24:02d}:00:00",
         100 + i, f"s{i}")
        for i in range(100)
    ] + [
        (2, "2024-01-03 12:00:00", 900, "early"),
        (2, "2024-01-20 06:00:00", 901, "late"),
    ]
    ev = _events(spark, ev_rows)
    probe_rows = [
        (1, f"2024-01-{d:02d} {h:02d}:30:00")
        for d in range(1, 29)
        for h in (0, 13)
    ] + [
        (2, "2024-01-02 00:00:00"),   # before key 2's history -> NULLs
        (2, "2024-01-10 00:00:00"),   # empty bucket -> baseline fallback
        (2, "2024-01-20 06:00:00"),   # exact-time event visible
        (3, "2024-01-15 00:00:00"),   # key with no events at all
    ]
    probes = spark.createDataFrame(probe_rows, "k long, pt string").select(
        "k", F.col("pt").cast("timestamp").alias("pt")
    )
    args = (ev, probes, "k", "ts", "pt", ["eid", "state"], "eid")
    expect = sorted(
        (r.k, r.pt, r.eid, r.state) for r in asof_join(*args).collect()
    )
    got = sorted(
        (r.k, r.pt, r.eid, r.state)
        for r in asof_join_bucketed(*args, bucket_seconds=86400).collect()
    )
    assert got == expect
    # the fallback cases really exercised what they claim
    by = {(k, p.isoformat()): (e, s) for k, p, e, s in got}
    assert by[(2, "2024-01-02T00:00:00")] == (None, None)
    assert by[(2, "2024-01-10T00:00:00")] == (900, "early")
    assert by[(2, "2024-01-20T06:00:00")] == (901, "late")
    assert by[(3, "2024-01-15T00:00:00")] == (None, None)


def test_asof_bucketed_window_partitions_on_key_and_bucket(spark):
    """Plan evidence for the skew claim: the carry-forward window's
    partition spec must be (key, bucket) — a hot key is split across
    buckets instead of serializing into one window task."""
    import re

    from neo4j_to_clickhouse_spark.operators.asof import asof_join_bucketed

    ev = _events(spark, [(1, "2024-01-01 00:00:00", 1, "a")])
    probes = spark.createDataFrame(
        [(1, "2024-01-02 00:00:00")], "k long, pt string"
    ).select("k", F.col("pt").cast("timestamp").alias("pt"))
    out = asof_join_bucketed(
        ev, probes, "k", "ts", "pt", ["eid", "state"], "eid"
    )
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert re.search(r"windowspecdefinition\(__k#\d+L?, __b#", plan)


def test_range_join_containment_and_overlap(spark):
    """End-exclusive containment; an event inside two overlapping
    intervals matches both; cross-bin intervals still catch every event."""
    from neo4j_to_clickhouse_spark.operators.asof import range_join

    ev = spark.createDataFrame(
        [(1, "2024-01-02 00:00:00"), (2, "2024-01-04 23:59:59"),
         (3, "2024-01-05 00:00:00")],
        "eid long, t string",
    ).select("eid", F.col("t").cast("timestamp").alias("ts"))
    iv = spark.createDataFrame(
        [(10, "2024-01-01 12:00:00", "2024-01-05 00:00:00"),
         (20, "2024-01-03 00:00:00", "2024-01-06 00:00:00")],
        "iid long, s string, e string",
    ).select(
        "iid",
        F.col("s").cast("timestamp").alias("t_start"),
        F.col("e").cast("timestamp").alias("t_end"),
    )
    got = {
        (r.iid, r.eid)
        for r in range_join(ev, iv, "ts", "t_start", "t_end").collect()
    }
    # eid=3 sits exactly at interval 10's end -> excluded (end-exclusive),
    # but inside interval 20; eid=2 is in both
    assert got == {(10, 1), (10, 2), (20, 2), (20, 3)}


def test_range_join_is_equi_join_plan(spark):
    """The physical plan must be a hash equi-join on the bin — never the
    BroadcastNestedLoopJoin a raw inequality join degenerates to."""
    from neo4j_to_clickhouse_spark.operators.asof import range_join

    ev = spark.createDataFrame(
        [(1, "2024-01-02 00:00:00")], "eid long, t string"
    ).select("eid", F.col("t").cast("timestamp").alias("ts"))
    iv = spark.createDataFrame(
        [(10, "2024-01-01 00:00:00", "2024-01-05 00:00:00")],
        "iid long, s string, e string",
    ).select(
        "iid",
        F.col("s").cast("timestamp").alias("t_start"),
        F.col("e").cast("timestamp").alias("t_end"),
    )
    plan = (
        range_join(ev, iv, "ts", "t_start", "t_end")
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan
    # any equi-join strategy on __bin is fine; nested-loop is the failure
    assert ("HashJoin" in plan) or ("SortMergeJoin" in plan)


def test_asof_forward_edges(spark):
    """Forward as-of: exact-time events match; same-time ties take the
    LOWEST tie-break; keys with nothing after the probe get NULLs."""
    from neo4j_to_clickhouse_spark.operators.asof import asof_join_forward

    ev = spark.createDataFrame(
        [
            (1, 5, 100, "a"),
            (1, 5, 101, "b"),   # same-time tie: id 100 must win
            (1, 9, 102, "c"),
            (2, 3, 200, "d"),
        ],
        "k long, t long, eid long, val string",
    )
    pr = spark.createDataFrame(
        [(1, 5), (1, 6), (1, 10), (2, 1), (3, 4)], "k long, pt long"
    )
    out = {
        (r.k, r.pt): (r.eid, r.val)
        for r in asof_join_forward(
            ev, pr, "k", "t", "pt", ["eid", "val"], "eid"
        ).collect()
    }
    assert out[(1, 5)] == (100, "a")   # equality matches, lowest tie
    assert out[(1, 6)] == (102, "c")   # next later event
    assert out[(1, 10)] == (None, None)  # nothing after
    assert out[(2, 1)] == (200, "d")
    assert out[(3, 4)] == (None, None)   # key with no events


def test_asof_forward_null_tie_break_loses(spark):
    """An event whose tie_break_col is NULL must not beat non-null ids at
    the same timestamp (ADVICE r07: Spark's nulls-first ascending default
    would otherwise make it win the forward scan silently)."""
    from neo4j_to_clickhouse_spark.operators.asof import asof_join_forward

    ev = spark.createDataFrame(
        [(1, 5, None, "null-id"), (1, 5, 100, "a"), (1, 5, 101, "b")],
        "k long, t long, eid long, val string",
    )
    pr = spark.createDataFrame([(1, 5)], "k long, pt long")
    [row] = asof_join_forward(
        ev, pr, "k", "t", "pt", ["eid", "val"], "eid"
    ).collect()
    assert (row.eid, row.val) == (100, "a")
