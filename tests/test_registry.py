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

# Round-6 window (VERDICT r05 items 1+4): the 8 operators that have
# NEVER had a driver CORRECTNESS row (debuted in _ROTATION in round 5)
# must sit inside the first 50 until certified, together with the
# rotation members whose last driver row predates the r04 fixture
# regeneration.
NEVER_CERTIFIED = [
    "count_distinct_salted",
    "first_event_salted",
    "train_val_test_split_counts",
    "sequence_packing_stats",
    "supplier_triangle_count",
    "supplier_pagerank",
    "embedding_dimension_stats",
    "dedup_jaccard_capped",
]

# Last driver-green before the r04 fixture regeneration — re-earning
# their row in round 6.
STALE_FIXTURE_GREENS = [
    "dedup_survivors_minhash",
    "embedding_near_duplicates",
    "langid_distribution",
    "quality_bands",
    "repetition_by_source",
    "fingerprint_uniqueness",
    "sample_stratified_per_source",
    "top_revenue_orders",
    "summary_stats",
    "union_counts",
    "word_distribution",
    "payload_profile",
    "sorted_regions",
    "filter_event_type",
    "filter_array_membership",
    "dedup_survivors_by_source",
    "token_count_extremes",
]


def test_promoted_queries_inside_driver_window():
    first_50 = list(Q.QUERIES)[:50]
    missing = [n for n in NEVER_CERTIFIED + STALE_FIXTURE_GREENS if n not in first_50]
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


def test_readme_query_counts_match_registry():
    """Pin README's query-count claims to the registry so the docs can't
    drift again (VERDICT r05 item 4: README said 66/63 vs actual 78/75)."""
    import pathlib

    text = pathlib.Path(__file__).resolve().parent.parent.joinpath(
        "README.md"
    ).read_text()
    n = len(Q.QUERIES)
    n_oracle = sum(1 for s in Q.QUERIES.values() if s.oracle is not None)
    assert f"{n}-query inventory" in text, (
        f"README '-query inventory' count != registry ({n})"
    )
    assert f"All {n} inventory queries" in text, (
        f"README 'All N inventory queries' count != registry ({n})"
    )
    assert f"({n_oracle} value-hashed" in text, (
        f"README value-hashed count != registry oracle count ({n_oracle})"
    )


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
