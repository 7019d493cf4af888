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

# Round-7 window (VERDICT r06 items 1, 4, 5): queries without a hard
# driver green on the current fixture must sit inside the first 50 until
# certified — the r06 red whose oracle was fixed, and the new recall
# certification debuting this round.
NEVER_CERTIFIED = [
    "sequence_packing_stats",   # r06 hash-fail (oracle HUGEINT, now CAST)
    "embedding_ivf_recall",     # new in round 7
    "pii_redaction_stats",      # new in round 7
    "curation_funnel_report",   # new in round 7
    "decontamination_bloom",    # new in round 7
    # round-7 second wave
    "lm_quality_by_source",
    "repeated_span_stats",
    "shard_balance_report",
    "tokenizer_comparison_by_source",
    "embedding_kmeans_cells",
    "span_dedup_rewrite_stats",
    "chunking_stats",
    "state_interval_stats",
    "embedding_quantization_report",
    "approx_distinct_users_bound",
    "cross_source_span_overlap",
    "semantic_dedup_survivors",
    "embedding_pq_codes",
]

# r05-green entries rotated out for round 6, rotating back in to
# re-earn their row per SURVEY §8 policy.
RECERTIFYING = [
    "filter_json_path_variant",
    "duplicate_keys",
    "latest_events",
    "order_priority_count",
    "acctbal_by_segment",
    "count_by_event_type",
    "count_distinct_by_type",
    "topk_words_approx",
    "global_totals",
    "orders_per_customer_topk",
    "filter_json_path",
    "filter_time_range",
    "conjunctive_filters",
    "latest_state_per_entity",
    "dedup_validation",
    "retention_candidates",
    "pricing_summary",
    "revenue_by_nation",
    "graph_two_hop_topk",
    "graph_degree_topk",
    "dedup_exact_docs",
    "dedup_ngram_jaccard",
    "dedup_clusters",
    "dedup_simhash_planted",
    "embedding_knn",
    "embedding_lsh_near_dup",
    "text_stats_by_source",
    "sample_hash_fraction",
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
