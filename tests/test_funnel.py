"""windowFunnel semantics: interleaving tolerance of the plain funnel vs
strict_order's consecutive-chain requirement, and the window bound."""

from __future__ import annotations

from pyspark.sql import functions as F

from neo4j_to_clickhouse_spark.operators.analytics import (
    window_funnel,
    window_funnel_strict_order,
)

def _steps():
    return [
        F.col("e") == "A",
        F.col("e") == "B",
        F.col("e") == "C",
    ]


def _events(spark, rows):
    return spark.createDataFrame(
        rows, "k long, t string, eid long, e string"
    ).select(
        "k", F.col("t").cast("timestamp").alias("ts"), "eid", "e"
    )


def test_strict_order_breaks_on_interleaved_event(spark):
    ev = _events(
        spark,
        [
            # key 1: A B C consecutive -> depth 3
            (1, "2024-01-01 00:00:00", 1, "A"),
            (1, "2024-01-01 00:01:00", 2, "B"),
            (1, "2024-01-01 00:02:00", 3, "C"),
            # key 2: A B x C -> x breaks the chain after B -> depth 2
            (2, "2024-01-01 00:00:00", 1, "A"),
            (2, "2024-01-01 00:01:00", 2, "B"),
            (2, "2024-01-01 00:02:00", 3, "x"),
            (2, "2024-01-01 00:03:00", 4, "C"),
            # key 3: A x B C -> x right after A -> depth 1, but the later
            # bare A has no chain either -> stays 1
            (3, "2024-01-01 00:00:00", 1, "A"),
            (3, "2024-01-01 00:01:00", 2, "x"),
            (3, "2024-01-01 00:02:00", 3, "B"),
            (3, "2024-01-01 00:03:00", 4, "C"),
            # key 4: no A at all -> excluded from output
            (4, "2024-01-01 00:00:00", 1, "B"),
        ],
    )
    strict = {
        r.k: r.funnel_step
        for r in window_funnel_strict_order(
            ev, _steps(), "k", "ts", "eid"
        ).collect()
    }
    assert strict == {1: 3, 2: 2, 3: 1}
    # the PLAIN funnel tolerates the interleaving: keys 2 and 3 reach 3
    loose = {
        r.k: r.funnel_step
        for r in window_funnel(ev, _steps(), "k", "ts").collect()
    }
    assert loose == {1: 3, 2: 3, 3: 3}


def test_strict_order_window_bound(spark):
    """The chain's last step must land within window_seconds of its
    step-1 event — a consecutive but too-slow chain is cut."""
    ev = _events(
        spark,
        [
            (1, "2024-01-01 00:00:00", 1, "A"),
            (1, "2024-01-01 00:30:00", 2, "B"),
            (1, "2024-01-01 02:00:00", 3, "C"),  # 2h after A: outside 1h
        ],
    )
    got = {
        r.k: r.funnel_step
        for r in window_funnel_strict_order(
            ev, _steps(), "k", "ts", "eid", window_seconds=3600
        ).collect()
    }
    assert got == {1: 2}


def test_sequence_count_greedy_non_overlapping(spark):
    """Greedy matcher semantics: A A B B -> 1 (first A takes first B,
    second B has no open A); A B A B -> 2; interleaved non-step events
    are ignored; keys with zero matches are excluded."""
    from neo4j_to_clickhouse_spark.operators.analytics import sequence_count

    ev = _events(
        spark,
        [
            (1, "2024-01-01 00:00:00", 1, "A"),
            (1, "2024-01-01 00:01:00", 2, "A"),
            (1, "2024-01-01 00:02:00", 3, "B"),
            (1, "2024-01-01 00:03:00", 4, "B"),
            (2, "2024-01-01 00:00:00", 1, "A"),
            (2, "2024-01-01 00:01:00", 2, "x"),  # ignored
            (2, "2024-01-01 00:02:00", 3, "B"),
            (2, "2024-01-01 00:03:00", 4, "A"),
            (2, "2024-01-01 00:04:00", 5, "B"),
            (3, "2024-01-01 00:00:00", 1, "B"),  # B before any A: no match
            (3, "2024-01-01 00:01:00", 2, "A"),
        ],
    )
    got = {
        r.k: r.n_matches
        for r in sequence_count(
            ev, F.col("e") == "A", F.col("e") == "B", "k", "ts", "eid"
        ).collect()
    }
    assert got == {1: 1, 2: 2}


def test_strict_order_restart_after_break(spark):
    """A broken chain does not poison a LATER complete chain."""
    ev = _events(
        spark,
        [
            (1, "2024-01-01 00:00:00", 1, "A"),
            (1, "2024-01-01 00:01:00", 2, "x"),  # breaks first chain
            (1, "2024-01-01 00:02:00", 3, "A"),
            (1, "2024-01-01 00:03:00", 4, "B"),
            (1, "2024-01-01 00:04:00", 5, "C"),
        ],
    )
    got = {
        r.k: r.funnel_step
        for r in window_funnel_strict_order(
            ev, _steps(), "k", "ts", "eid"
        ).collect()
    }
    assert got == {1: 3}


def test_funnel_max_over_chain_starts(spark):
    """ClickHouse windowFunnel searches ALL chain starts: a later step-1
    event whose window reaches step 2 must win over an earlier step-1
    event whose window expired (greedy-from-earliest reports 1 here)."""
    ev = _events(
        spark,
        [
            (1, "2026-01-01 00:00:00", 1, "A"),  # early chain: B out of window
            (1, "2026-01-01 10:00:00", 2, "A"),  # late chain: B in window
            (1, "2026-01-01 10:30:00", 3, "B"),
        ],
    )
    got = window_funnel(
        ev, _steps()[:2], key_col="k", time_col="ts",
        window_seconds=3600,
    ).collect()
    assert [(r.k, r.funnel_step) for r in got] == [(1, 2)]


def test_funnel_matches_bruteforce_on_random_streams(spark):
    """Property: engine depth == brute-force max-over-chain-starts depth
    (greedy-earliest within a fixed chain start is optimal by exchange
    argument, so the reference enumerates starts and greedily extends).
    Few hypothesis examples, many independent keys per example — one
    Spark job each."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    types = ["A", "B", "C", "X"]
    steps = _steps()  # A -> B -> C
    window = 10

    def ref_depth(rows):  # [(t, e)] for one key
        rows = sorted(rows)
        best = 0
        for t0, e0 in rows:
            if e0 != "A":
                continue
            depth, t_prev = 1, t0
            for want in ("B", "C"):
                nxt = min(
                    (t for t, e in rows
                     if e == want and t > t_prev and t - t0 <= window),
                    default=None,
                )
                if nxt is None:
                    break
                depth, t_prev = depth + 1, nxt
            best = max(best, depth)
        return best

    @settings(max_examples=6, deadline=None)
    @given(
        data=st.lists(
            st.tuples(
                st.integers(0, 24),          # key
                st.integers(0, 30),          # epoch second
                st.sampled_from(types),
            ),
            min_size=1,
            max_size=120,
        )
    )
    def run(data):
        df = spark.createDataFrame(
            [(k, t, i, e) for i, (k, t, e) in enumerate(data)],
            "k long, sec long, eid long, e string",
        ).select("k", F.timestamp_seconds("sec").alias("ts"), "eid", "e")
        got = {
            r.k: r.funnel_step
            for r in window_funnel(
                df, steps, key_col="k", time_col="ts", window_seconds=window
            ).collect()
        }
        per_key = {}
        for k, t, e in data:
            per_key.setdefault(k, []).append((t, e))
        exp = {k: ref_depth(v) for k, v in per_key.items()}
        exp = {k: d for k, d in exp.items() if d > 0}
        assert got == exp, (got, exp)

    run()
