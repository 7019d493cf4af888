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

# Round-9 window (VERDICT r08 item 1 — finish the certification): the 21
# round-7 debuts that missed the r08 window (the whole promotion queue)
# hold the head slots; the other 29 slots RE-certify the stalest
# hard-oracle rows (last driver-green in CORRECTNESS_r06). After this
# window certifies, every hard-oracle query in the registry holds a
# driver row on the current fixture.
NEVER_CERTIFIED = [
    "signup_to_purchase_latency",
    "order_line_count_histogram",
    "user_activity_percentiles",
    "dedup_token_savings_by_source",
    "grouping_sets_event_report",
    "revenue_pareto_report",
    "cube_event_counts",
    "value_deciles_by_type",
    "event_type_pivot",
    "clicker_purchaser_intersect",
    "daily_counts_gapfilled",
    "hourly_event_windows",
    "ngram_diversity_by_source",
    "events_by_dow_hour",
    "doc_length_magnitude_histogram",
    "user_entropy_bands",
    "value_mad_by_type",
    "orders_monthly_growth",
    "event_share_of_total",
    "duplicate_metadata_conflicts",
    "revenue_by_part_type",
]

RECERTIFYING: list[str] = [
    # stalest 29: every driver row dates from CORRECTNESS_r06
    "sample_temperature_weighted",
    "multimodal_inventory",
    "embedding_ivf_full_probe",
    "decontamination_overlap",
    "value_percentiles_by_type",
    "range_join_interval_stats",
    "tfidf_source_profile",
    "conditional_aggregates",
    "argmax_event_per_user",
    "first_events_per_user",
    "count_distinct_salted",
    "first_event_salted",
    "train_val_test_split_counts",
    "supplier_triangle_count",
    "supplier_pagerank",
    "embedding_dimension_stats",
    "dedup_jaccard_capped",
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
]


def test_promoted_queries_inside_driver_window():
    first_50 = list(Q.QUERIES)[:50]
    missing = [n for n in NEVER_CERTIFIED + RECERTIFYING if n not in first_50]
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


def test_operator_index_is_current():
    """docs/OPERATORS.md is generated from the registry — regenerate with
    `python tools/gen_operator_index.py` after registering a query."""
    import pathlib

    sys.path.insert(
        0,
        str(pathlib.Path(__file__).resolve().parent.parent / "tools"),
    )
    from gen_operator_index import render

    on_disk = pathlib.Path(__file__).resolve().parent.parent.joinpath(
        "docs", "OPERATORS.md"
    ).read_text()
    assert on_disk == render(), (
        "docs/OPERATORS.md is stale — run python tools/gen_operator_index.py"
    )
