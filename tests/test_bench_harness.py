"""Smoke tests for the bench harness (VERDICT r10 items 3+4): the
headline set carries the broadened shapes, every registry name resolves,
and the self-archive path is derivable so a bench run always leaves a
complete JSON in docs/evidence regardless of driver stdout truncation.
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import bench
from neo4j_to_clickhouse_spark.plans import QUERIES
from neo4j_to_clickhouse_spark.plans.queries import _WINDOW_ROUND


def test_headline_queries_resolve_in_registry():
    missing = [n for n in bench.BENCH_QUERIES if n not in QUERIES]
    assert missing == []


def test_headline_set_covers_broadened_shapes():
    # window family, as-of carry join, Arrow multimodal probe, and the
    # maintenance rewrite each hold a standing wall-time row
    for name in ("sessionization", "asof_user_state", "multimodal_probe_stats"):
        assert name in bench.BENCH_QUERIES, name
    assert bench.BENCH_MAINTENANCE == ["maintenance_compact"]


def test_evidence_path_is_round_stamped(tmp_path):
    p = bench._evidence_path(str(tmp_path))
    assert p == str(
        tmp_path / "docs" / "evidence" / f"BENCH_r{_WINDOW_ROUND}_local.json"
    )
    # a smoke run at another SF must not clobber the sf0.1 record
    p2 = bench._evidence_path(str(tmp_path), "0.001")
    assert p2.endswith(f"BENCH_r{_WINDOW_ROUND}_sf0.001_local.json")


def test_bm25_index_jobs_shape(spark):
    """The indexed-BM25 job persists the term-bucket index once in
    setup; its timed run scores the standing query set off the pruned
    postings and returns the per-query top-k row count — repeatable
    (the index is read-only)."""
    jobs = bench._bm25_index_jobs(spark, "/root/testdata/sf0.001")
    assert [j[0] for j in jobs] == ["bm25_indexed_query"]
    _, prepare, run_once = jobs[0]
    prepare(spark)
    n = run_once(spark)
    assert n > 0
    assert run_once(spark) == n


def test_minhash_probe_and_classifier_prod_jobs_execute(spark):
    """Every EXTRA bench job must actually run once under test — a
    name/import slip inside a job body otherwise survives to the real
    bench run (caught live in r13: an F reference without its import
    inside _classifier_prod_jobs)."""
    for maker in (
        bench._minhash_probe_jobs,
        bench._classifier_prod_jobs,
        bench._classifier_broadcast_jobs,
        bench._bpe_prod_jobs,
    ):
        jobs = maker(spark, "/root/testdata/sf0.001")
        for name, prepare, run_once in jobs:
            prepare(spark)
            n = run_once(spark)
            assert n > 0, name
            assert run_once(spark) == n, name


def test_maintenance_jobs_shape(spark, tmp_path):
    """The compact job stages a real month-partitioned table and its
    timed run returns the affected-month count (>0 on the sf0.001
    events fixture)."""
    jobs = bench._maintenance_jobs(spark, "/root/testdata/sf0.001")
    assert [j[0] for j in jobs] == ["maintenance_compact"]
    name, prepare, run_once = jobs[0]
    prepare(spark)
    months = run_once(spark)
    assert months > 0
    # a second prepare() restores a fresh copy: compact is repeatable
    prepare(spark)
    assert run_once(spark) == months
