"""Unigram-LM scoring semantics (operators/lm.py).

The oracle certifies the registered per-source report on the fixture;
these pin the model contract on micro-corpora with hand-computable
probabilities: Laplace smoothing arithmetic, top-V tie-breaking, OOV
accounting, and empty-document handling.
"""

from __future__ import annotations

import math

from neo4j_to_clickhouse_spark.operators.lm import (
    lm_quality_report,
    term_counts,
    top_vocab,
)


def _report(spark, rows, top_v):
    df = spark.createDataFrame(rows, ["doc_id", "source", "text"])
    return {
        r["source"]: r.asDict()
        for r in lm_quality_report(df, "source", "text", top_v=top_v).collect()
    }


def test_hand_computed_probabilities(spark):
    # corpus: a=3 b=1 c=1 -> N=5, V=3; top_v=2 keeps {a, b} (count desc,
    # term asc tie-break), so c is OOV.  p = (cnt+1)/(N+V).
    out = _report(
        spark, [(1, "s", "a a b"), (2, "s", "a c")], top_v=2
    )["s"]
    assert out["n_docs"] == 2
    assert out["n_tokens"] == 5
    assert out["oov_tokens"] == 1
    assert out["oov_rate"] == 0.2
    contribs = [round(math.log(p), 6) for p in (0.5, 0.5, 0.5, 0.25, 0.125)]
    assert out["avg_nll"] == round(-sum(contribs) / 5, 6)


def test_vocab_tiebreak_is_total_order(spark):
    df = spark.createDataFrame(
        [(1, "s", "b c a")], ["doc_id", "source", "text"]
    )
    vocab = top_vocab(term_counts(df), 2).collect()
    # all counts equal: term asc picks a, b
    assert sorted(r["term"] for r in vocab) == ["a", "b"]


def test_full_vocab_has_no_oov(spark):
    out = _report(spark, [(1, "s", "x y z")], top_v=10)["s"]
    assert out["oov_tokens"] == 0
    assert out["oov_rate"] == 0.0


def test_empty_document_counts_as_doc_not_tokens(spark):
    out = _report(
        spark, [(1, "s", "a a"), (2, "s", "")], top_v=4
    )["s"]
    assert out["n_docs"] == 2
    assert out["n_tokens"] == 2


def test_sources_scored_against_shared_corpus_model(spark):
    # the model is corpus-global: a source of typical text scores lower
    # NLL than a source of corpus-rare text under the same vocab
    rows = [(i, "typical", "the the the cat") for i in range(5)]
    rows += [(99, "weird", "zq zq zq zq")]
    out = _report(spark, rows, top_v=2)
    assert out["typical"]["avg_nll"] < out["weird"]["avg_nll"]


def test_bigram_lm_hand_computation(spark):
    from neo4j_to_clickhouse_spark.operators.lm import bigram_lm_report

    # corpus: "a b a b" + "a b c" with top_v=2 -> vocab {a, b} (a:3,
    # b:3 tie broken by term; c maps to <unk>). Bigrams:
    # doc1: (a,b)(b,a)(a,b); doc2: (a,b)(b,<unk>)
    # counts: (a,b)=3, (b,a)=1, (b,<unk>)=1; ctx: a=3, b=2; V=2
    import math

    docs = spark.createDataFrame(
        [("s", "a b a b"), ("s", "a b c")], "source string, text string"
    )
    out = bigram_lm_report(docs, top_v=2).collect()[0]
    assert out.n_docs == 2
    assert out.n_bigrams == 5
    assert out.unk_bigrams == 1
    assert out.unk_rate == 0.2
    from decimal import Decimal

    def nll(b, c):
        return Decimal(str(round(math.log((b + 1) / (c + 3)), 6)))

    total = 3 * nll(3, 3) + nll(1, 2) + nll(1, 2)
    want = round(-float(total) / 5, 6)
    assert out.avg_nll == want


def test_bigram_lm_no_corpus_shuffle(spark):
    from neo4j_to_clickhouse_spark.operators.lm import bigram_lm_report

    docs = spark.createDataFrame(
        [("s", "x y z")], "source string, text string"
    )
    plan = (
        bigram_lm_report(docs, top_v=4)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    # model tables arrive broadcast (the scoring joins), pairing is
    # array expressions on the scan, zero Python. (The final
    # group-rollup join of two group-cardinality aggregates may plan
    # SMJ statically; AQE converts it at runtime — not asserted.)
    assert plan.count("BroadcastHashJoin") >= 2
    for marker in ("BatchEvalPython", "ArrowEvalPython", "MapInPandas"):
        assert marker not in plan
