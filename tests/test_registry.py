"""Registry driver-window invariants (SURVEY.md §8, VERDICT r03 item 1).

The verification driver certifies only the first 50 entries of
``__spark_entry__.queries()``.  These tests pin the reordering that puts
the round-2/3 flagship operators (as-of joins, sessionization, funnels,
ROLLUP, percentiles, argMax, moving aggregates) inside that window, and
guarantee the window + rotation partition stays in sync with the
registry.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from neo4j_to_clickhouse_spark.plans import queries as Q

# Queries still waiting on their first driver-green CORRECTNESS row:
# registered after position 50 in rounds 2-3, then ERRed in round 4 when
# the regenerated events fixture broke the loader (VERDICT r04).  They
# must stay inside the window until certified.  (dedup_survivors_minhash
# from the original promotion earned its green row in r04 and has been
# rotated out.)
PROMOTED = [
    "asof_user_state",
    "asof_user_state_bucketed",
    "range_join_interval_stats",
    "sessionization",
    "session_window_counts",
    "window_funnel_steps",
    "window_funnel_strict_order_steps",
    "sequence_count_histogram",
    "retention_cohort_counts",
    "rollup_event_counts",
    "value_percentiles_by_type",
    "conditional_aggregates",
    "argmax_event_per_user",
    "daily_moving_stats",
    "value_histogram",
    "first_events_per_user",
]

# Round-5 rotation: swapped in from _ROTATION so each re-earns a driver
# row (last driver-green in r03).
ROTATED_IN_R5 = [
    "filter_json_path_variant",
    "duplicate_keys",
    "latest_events",
    "order_priority_count",
    "acctbal_by_segment",
    "decontamination_overlap",       # new in r5 — first driver row
    "sample_temperature_weighted",   # new in r5 — first driver row
    "tfidf_source_profile",          # new in r5 — first driver row
]


def test_promoted_queries_inside_driver_window():
    first_50 = list(Q.QUERIES)[:50]
    missing = [n for n in PROMOTED + ROTATED_IN_R5 if n not in first_50]
    assert not missing, (
        f"queries without a driver CORRECTNESS row fell outside the first 50 "
        f"registry positions: {missing}"
    )


def test_window_and_rotation_partition_registry():
    window, rotation = Q._DRIVER_WINDOW, Q._ROTATION
    assert len(window) == 50, "driver window must hold exactly 50 entries"
    union = window + rotation
    assert len(union) == len(set(union)), "duplicate names in window+rotation"
    assert set(union) == set(Q.QUERIES), (
        "window+rotation must cover the registry exactly — update "
        "_DRIVER_WINDOW/_ROTATION when registering a new query"
    )
    assert list(Q.QUERIES) == union, "registry must be materialized in window order"


def test_entry_contract_exposes_reordered_registry():
    import __spark_entry__ as E

    qnames = list(E.queries())
    assert qnames[:50] == Q._DRIVER_WINDOW
    oracles = E.oracle_sql()
    # every in-window query except documented rows-only specs has an oracle
    rows_only = {n for n, spec in Q.QUERIES.items() if spec.oracle is None}
    assert rows_only == {"random_sample", "dedup_simhash", "embedding_ivf_topk"}
    for name in Q._DRIVER_WINDOW:
        if name not in rows_only:
            assert name in oracles, f"in-window query {name} lost its oracle"
