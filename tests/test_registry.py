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

def test_driver_window_is_the_stalest_50():
    """From round 10 the window is mechanical (VERDICT r09 item 4): the
    50 stalest hard-oracle queries, never-certified first, oldest
    driver-green round next, name tie-break — recomputed here from the
    committed CORRECTNESS_r*.json ledger so a curated drift fails."""
    import pathlib

    repo = pathlib.Path(__file__).resolve().parent.parent
    sys.path.insert(0, str(repo / "tools"))
    from driver_window import ledger, stalest_window

    rows_only = {n for n, s in Q.QUERIES.items() if s.oracle is None}
    window, _rotation = stalest_window(
        list(Q.QUERIES), rows_only, repo=str(repo),
        upto_round=Q._WINDOW_ROUND,
    )
    assert Q._DRIVER_WINDOW == window, (
        "_DRIVER_WINDOW is not the mechanical stalest-50 — regenerate "
        "with `python tools/driver_window.py`"
    )
    # rows-only specs occupy a window slot only for their one debut
    # driver row (VERDICT r13 item 2): anything rows-only in the window
    # must never have appeared in a prior CORRECTNESS file.
    from driver_window import ever_recorded

    seen = ever_recorded(str(repo), upto_round=Q._WINDOW_ROUND)
    in_window_rows_only = set(Q._DRIVER_WINDOW) & rows_only
    assert not (in_window_rows_only & seen)
    # staleness must be monotone non-decreasing across the hard-oracle
    # tail of the window (debut rows-only specs head it)
    last = ledger(str(repo), upto_round=Q._WINDOW_ROUND)
    hard_tail = [q for q in window if q not in rows_only]
    rounds = [last.get(q, 0) for q in hard_tail]
    assert rounds == sorted(rounds)


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
    assert rows_only == {
        "random_sample",
        "dedup_simhash",
        "embedding_ivf_topk",
        # r13: iterative training loops — merge learning and integer-GD
        # classifier fitting have no SQL form; both are pinned
        # bit-exactly by pytest (test_bpe.py, test_classifier_fit.py)
        "bpe_learned_merges",
        "classifier_training_report",
    }
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
