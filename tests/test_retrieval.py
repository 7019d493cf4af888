"""BM25 retrieval operator: hand-computed scores on a tiny corpus plus
plan-shape guards (broadcast stats/df, no full sort for top-k)."""

import math

import pytest
from pyspark.sql import functions as F

from neo4j_to_clickhouse_spark.operators.retrieval import bm25_topk


@pytest.fixture(scope="module")
def corpus(spark):
    rows = [
        (1, "spark fast spark"),
        (2, "slow table scan"),
        (3, "spark query"),
        (4, "the a the a"),
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def _bm25_ref(corpus_rows, terms, k1=1.2, b=0.75):
    docs = {i: t.split(" ") for i, t in corpus_rows}
    n = len(docs)
    avgdl = sum(len(t) for t in docs.values()) / n
    scores = {}
    for t in terms:
        df = sum(1 for toks in docs.values() if t in toks)
        if not df:
            continue
        idf = math.log((n - df + 0.5) / (df + 0.5) + 1.0)
        for i, toks in docs.items():
            tf = toks.count(t)
            if not tf:
                continue
            c = round(
                idf * (tf * (k1 + 1)) / (tf + k1 * (1 - b + b * len(toks) / avgdl)),
                8,
            )
            scores[i] = scores.get(i, 0.0) + c
    return {i: round(s, 6) for i, s in scores.items()}


def test_bm25_matches_hand_computation(corpus):
    rows = [(1, "spark fast spark"), (2, "slow table scan"),
            (3, "spark query"), (4, "the a the a")]
    want = _bm25_ref(rows, ("spark", "query"))
    got = {
        r.doc_id: r.score
        for r in bm25_topk(corpus, ("spark", "query"), k=10).collect()
    }
    assert got == pytest.approx(want)
    # doc 3 matches both terms; rarity of 'query' (df=1) outweighs
    # doc 1's double 'spark' (df=2, tf saturation)
    assert max(got, key=got.get) == 3


def test_bm25_k_cuts_and_orders(corpus):
    out = bm25_topk(corpus, ("spark",), k=1).collect()
    assert len(out) == 1
    assert out[0].doc_id == 1  # tf=2 in the shortest matching doc


def test_bm25_unknown_terms_empty(corpus):
    assert bm25_topk(corpus, ("nonexistent",), k=5).count() == 0


def test_bm25_per_query_matches_single_query(spark, corpus):
    from neo4j_to_clickhouse_spark.operators.retrieval import (
        bm25_topk_per_query,
    )

    qdf = spark.createDataFrame(
        [("a", "spark"), ("a", "query"), ("b", "scan")],
        "query_id string, term string",
    )
    multi = {
        (r.query_id, r.doc_id): r.score
        for r in bm25_topk_per_query(corpus, qdf, k=10).collect()
    }
    # each query's scores equal the single-query operator's
    for qid, terms in (("a", ("spark", "query")), ("b", ("scan",))):
        single = {
            r.doc_id: r.score
            for r in bm25_topk(corpus, terms, k=10).collect()
        }
        assert {d: s for (q, d), s in multi.items() if q == qid} == single


def test_bm25_per_query_rank_and_k(spark, corpus):
    from neo4j_to_clickhouse_spark.operators.retrieval import (
        bm25_topk_per_query,
    )

    qdf = spark.createDataFrame(
        [("a", "spark")], "query_id string, term string"
    )
    out = bm25_topk_per_query(corpus, qdf, k=1).collect()
    assert len(out) == 1
    assert out[0].rank == 1 and out[0].doc_id == 1


def test_bm25_per_query_plan_uses_window_group_limit(spark, corpus):
    from neo4j_to_clickhouse_spark.operators.retrieval import (
        bm25_topk_per_query,
    )

    qdf = spark.createDataFrame(
        [("a", "spark"), ("b", "scan")], "query_id string, term string"
    )
    plan = (
        bm25_topk_per_query(corpus, qdf, k=3)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "CartesianProduct" not in plan
    assert "WindowGroupLimit" in plan  # k-cut heaps in the shuffle read


def test_bm25_indexed_equals_direct(spark, corpus, tmp_path):
    from neo4j_to_clickhouse_spark.operators.retrieval import (
        bm25_topk_indexed,
        bm25_topk_per_query,
        build_bm25_index,
    )

    qdf = spark.createDataFrame(
        [("a", "spark"), ("a", "query"), ("b", "scan"), ("b", "slow")],
        "query_id string, term string",
    )
    want = sorted(
        map(tuple, bm25_topk_per_query(corpus, qdf, k=10).collect())
    )
    postings, stats = build_bm25_index(corpus)
    # round-trip the index through its persisted form: the production
    # path never re-reads document text
    pdir = str(tmp_path / "postings")
    sdir = str(tmp_path / "stats")
    postings.write.parquet(pdir)
    stats.write.parquet(sdir)
    got = sorted(
        map(
            tuple,
            bm25_topk_indexed(
                spark.read.parquet(pdir), spark.read.parquet(sdir), qdf, k=10
            ).collect(),
        )
    )
    assert got == want


def test_bm25_partitioned_index_prunes_and_matches(spark, corpus, tmp_path):
    # VERDICT r11 item 6: the term-bucket-partitioned store must (a)
    # return bit-identical scores and (b) actually prune — the query
    # scan opens only the queried terms' bucket directories and pushes
    # In(term, ...) into parquet.
    from neo4j_to_clickhouse_spark.operators.retrieval import (
        bm25_topk_indexed,
        bm25_topk_per_query,
        build_bm25_index,
        load_bm25_index,
        write_bm25_index,
    )

    qdf = spark.createDataFrame(
        [("a", "spark"), ("a", "query"), ("b", "scan")],
        "query_id string, term string",
    )
    want = sorted(
        map(tuple, bm25_topk_per_query(corpus, qdf, k=10).collect())
    )
    postings, stats = build_bm25_index(corpus)
    path = str(tmp_path / "idx")
    write_bm25_index(postings, stats, path, n_buckets=8)

    full, _ = load_bm25_index(spark, path)
    pruned, pstats = load_bm25_index(spark, path, queries=qdf)
    got = sorted(
        map(tuple, bm25_topk_indexed(pruned, pstats, qdf, k=10).collect())
    )
    assert got == want

    # partition pruning is real: the scan's own numFiles metric
    # (inputFiles() lists the relation pre-pruning, so it can't prove
    # this) — 3 query terms open at most 3 of the 8 bucket files
    def files_read(df) -> int:
        df.collect()
        leaf = (
            df._jdf.queryExecution().executedPlan().collectLeaves().head()
        )
        return leaf.metrics().apply("numFiles").value()

    n_full, n_pruned = files_read(full), files_read(pruned)
    assert n_full > 3  # tiny corpus still spans >3 buckets
    assert n_pruned < n_full
    assert n_pruned <= 3

    # and the filters land where they should in the scan node
    plan = pruned._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan and "term_bucket" in plan
    assert "PushedFilters" in plan and "In(term, [" in plan


def test_bm25_plan_shape(corpus):
    plan = bm25_topk(corpus, ("spark", "query"), k=5)._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
    # corpus stats arrive broadcast; per-term df is a window count on
    # the hit table (r15 — the old broadcast dfreq re-executed the
    # corpus explode to build its build side), so exactly one
    # data-independent broadcast remains
    assert plan.count("BroadcastExchange") >= 1
    assert "Window" in plan
    # top-k is a heap, not a global sort
    assert "TakeOrderedAndProject" in plan
