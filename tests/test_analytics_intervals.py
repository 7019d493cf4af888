"""SCD2 state-interval build: handcrafted-history exactness + a
brute-force property check over randomized micro event logs."""

from __future__ import annotations

import datetime as dt
import os
import sys

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from neo4j_to_clickhouse_spark.operators.analytics import state_intervals

_T0 = dt.datetime(2024, 1, 1)


def _ts(minutes):
    return _T0 + dt.timedelta(minutes=minutes)


def test_state_intervals_handcrafted(spark):
    # user 1: a->a->b->a (runs a[0,1], b[2], a[3] open)
    # user 2: single event (one open run)
    rows = [
        (1, _ts(0), "a", 10),
        (1, _ts(1), "a", 11),
        (1, _ts(2), "b", 12),
        (1, _ts(3), "a", 13),
        (2, _ts(5), "z", 14),
    ]
    df = spark.createDataFrame(
        rows, ["user_id", "ts", "event_type", "event_id"]
    )
    out = {
        (r["user_id"], r["valid_from"]): r
        for r in state_intervals(df).collect()
    }
    assert len(out) == 4
    r1 = out[(1, _ts(0))]
    assert (r1["state"], r1["n_events"], r1["valid_to"], r1["is_current"]) == (
        "a", 2, _ts(2), False
    )
    r2 = out[(1, _ts(2))]
    assert (r2["state"], r2["n_events"], r2["valid_to"]) == ("b", 1, _ts(3))
    r3 = out[(1, _ts(3))]
    assert (r3["state"], r3["valid_to"], r3["is_current"]) == ("a", None, True)
    r4 = out[(2, _ts(5))]
    assert (r4["state"], r4["is_current"]) == ("z", True)


def _py_intervals(events):
    """events: list of (user, minute, state, eid)."""
    by_user = {}
    for u, m, s, e in sorted(events, key=lambda r: (r[0], r[1], r[3])):
        by_user.setdefault(u, []).append((m, s))
    out = []
    for u, seq in by_user.items():
        runs = []
        for m, s in seq:
            if runs and runs[-1][0] == s:
                runs[-1][2] += 1
            else:
                runs.append([s, m, 1])
        for i, (s, m, n) in enumerate(runs):
            vt = runs[i + 1][1] if i + 1 < len(runs) else None
            out.append((u, s, m, vt, n, vt is None))
    return sorted(out, key=_sort_key)


def _sort_key(t):
    # ties in (user, state, valid_from) are possible (two same-state
    # runs can start in the same minute via an interleaved state at the
    # same timestamp); None valid_to sorts last instead of TypeError-ing
    u, s, m, vt, n, cur = t
    return (u, s, m, float("inf") if vt is None else vt, n, cur)


@given(
    st.lists(
        st.tuples(
            st.integers(0, 2),          # user
            st.integers(0, 5),          # minute
            st.sampled_from(["a", "b"]),  # state
        ),
        min_size=1,
        max_size=10,
    )
)
@settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
def test_state_intervals_matches_bruteforce(spark, raw):
    # unique, order-defining event ids (ties in ts are broken by id)
    events = [(u, m, s, i) for i, (u, m, s) in enumerate(raw)]
    df = spark.createDataFrame(
        [(u, _ts(m), s, e) for u, m, s, e in events],
        ["user_id", "ts", "event_type", "event_id"],
    )
    got = sorted(
        (
            (
                r["user_id"],
                r["state"],
                (r["valid_from"] - _T0).total_seconds() / 60,
                None
                if r["valid_to"] is None
                else (r["valid_to"] - _T0).total_seconds() / 60,
                r["n_events"],
                r["is_current"],
            )
            for r in state_intervals(df).collect()
        ),
        key=_sort_key,
    )
    expect = [
        (u, s, float(m), None if vt is None else float(vt), n, cur)
        for u, s, m, vt, n, cur in _py_intervals(events)
    ]
    assert got == expect
