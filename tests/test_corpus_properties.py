"""Property-based tests for the round-7 corpus operators (hypothesis).

Each new operator is pinned against a pure-Python brute-force oracle
over randomized micro-corpora with collision-forcing domains (tiny
vocabularies make spans repeat and vocab caps bite), plus a Java-vs-RE2
regex-compat canary for the interpolated pre-tokenizer pattern.
"""

from __future__ import annotations

import math
import re
from collections import Counter

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

_SETTINGS = dict(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)


def _r6(x):
    """Engine-faithful 6-decimal rounding: Spark's round() is
    BigDecimal.valueOf(x).setScale(6, HALF_UP) — i.e. HALF_UP on the
    shortest decimal repr — where Python's round() is half-even on the
    binary value. Micro-corpora hit exact .5 boundaries (sums of
    6-decimal values divided by small counts), so the reference must
    mirror the engine."""
    from decimal import ROUND_HALF_UP, Decimal

    return float(
        Decimal(repr(x)).quantize(Decimal("1e-6"), rounding=ROUND_HALF_UP)
    )

# tiny vocabulary -> forced span repeats and OOV collisions
_word = st.sampled_from(["aa", "bb", "cc", "dd"])
_text = st.lists(_word, min_size=0, max_size=6).map(" ".join)
_corpus = st.lists(_text, min_size=1, max_size=8)


def _py_spans(text, w):
    toks = text.split() if text.strip() else []
    return [
        " ".join(toks[i : i + w]) for i in range(len(toks) - w + 1)
    ]


@given(_corpus)
@settings(**_SETTINGS)
def test_repeated_span_report_matches_bruteforce(spark, corpus):
    from neo4j_to_clickhouse_spark.operators.dedup import (
        repeated_span_report,
    )

    w = 2
    rows = [(i, "s", t) for i, t in enumerate(corpus)]
    df = spark.createDataFrame(rows, ["doc_id", "source", "text"])
    got = {
        r["source"]: r.asDict()
        for r in repeated_span_report(df, "doc_id", "source", "text", w=w)
        .collect()
    }
    span_docs = {}
    for i, t in enumerate(corpus):
        for sp in set(_py_spans(t, w)):
            span_docs.setdefault(sp, set()).add(i)
    total = rep = flagged = 0
    any_spans = False
    for i, t in enumerate(corpus):
        sps = _py_spans(t, w)
        if not sps:
            continue
        any_spans = True
        n_rep = sum(1 for sp in sps if len(span_docs[sp]) >= 2)
        total += len(sps)
        rep += n_rep
        flagged += 1 if n_rep * 2 >= len(sps) else 0
    if not any_spans:
        assert got == {}
        return
    out = got["s"]
    assert out["total_spans"] == total
    assert out["repeated_spans"] == rep
    assert out["flagged_docs"] == flagged
    assert out["repeated_ratio"] == _r6(rep / total)


@given(_corpus, st.integers(min_value=1, max_value=5))
@settings(**_SETTINGS)
def test_lm_report_matches_bruteforce(spark, corpus, top_v):
    from neo4j_to_clickhouse_spark.operators.lm import lm_quality_report

    rows = [(i, "s", t) for i, t in enumerate(corpus)]
    df = spark.createDataFrame(rows, ["doc_id", "source", "text"])
    out = {
        r["source"]: r.asDict()
        for r in lm_quality_report(df, "source", "text", top_v=top_v)
        .collect()
    }["s"]
    toks = [w for t in corpus for w in t.split()]
    assert out["n_docs"] == len(corpus)
    assert out["n_tokens"] == len(toks)
    if not toks:
        # 0/0 rates are NULL by contract
        assert out["oov_tokens"] == 0
        assert out["oov_rate"] is None and out["avg_nll"] is None
        return
    counts = Counter(toks)
    n_total, v_distinct = sum(counts.values()), len(counts)
    vocab = dict(
        sorted(counts.items(), key=lambda kv: (-kv[1], kv[0]))[:top_v]
    )
    oov = sum(1 for w in toks if w not in vocab)
    assert out["oov_tokens"] == oov
    assert out["oov_rate"] == _r6(oov / len(toks))
    nll = [
        _r6(math.log((vocab.get(w, 0) + 1) / (n_total + v_distinct)))
        for w in toks
    ]
    # the engine sums per-token nll as exact DECIMAL, casts the SUM to
    # double once, then divides — a Python float sum accumulates error
    # the decimal sum doesn't, which flips .5e-6 round boundaries
    # (observed: sum -10.865396 exact vs -10.865395999999999 chained)
    from decimal import Decimal

    nll_sum = float(sum(Decimal(repr(v)) for v in nll))
    assert out["avg_nll"] == _r6(-nll_sum / len(toks))


@given(
    st.lists(
        st.text(
            alphabet=st.characters(
                min_codepoint=32, max_codepoint=0x2FF
            ),
            max_size=30,
        ),
        min_size=1,
        max_size=6,
    )
)
@settings(**_SETTINGS)
def test_pretoken_pattern_java_matches_python_re(spark, texts):
    """The interpolated pre-tokenizer regex must count identically under
    Java regex (Spark side) and Python re (a proxy pinning the restricted
    syntax the oracle's RE2 also implements)."""
    from pyspark.sql import functions as F

    from neo4j_to_clickhouse_spark.plans.queries import _PRETOKEN_PATTERN

    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], ["i", "t"]
    )
    got = {
        r["i"]: r["n"]
        for r in df.select(
            "i", F.regexp_count("t", F.lit(_PRETOKEN_PATTERN)).alias("n")
        ).collect()
    }
    for i, t in enumerate(texts):
        assert got[i] == len(re.findall(_PRETOKEN_PATTERN, t)), repr(t)


def _py_rewrite(corpus, w):
    first = {}
    for i, t in enumerate(corpus):
        toks = t.split()
        for s in range(max(len(toks) - w + 1, 0)):
            sp = " ".join(toks[s : s + w])
            first.setdefault(sp, (i, s))
    out = []
    for i, t in enumerate(corpus):
        toks = t.split()
        covered = set()
        for s in range(max(len(toks) - w + 1, 0)):
            sp = " ".join(toks[s : s + w])
            if first[sp] != (i, s):
                covered.update(range(s, s + w))
        out.append(" ".join(tok for p, tok in enumerate(toks) if p not in covered))
    return out


@given(_corpus)
@settings(**_SETTINGS)
def test_remove_repeated_spans_matches_bruteforce(spark, corpus):
    from neo4j_to_clickhouse_spark.operators.dedup import (
        remove_repeated_spans,
    )

    w = 2
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(corpus)], ["doc_id", "text"]
    )
    got = {
        r["doc_id"]: (r["text"], r["n_tokens_before"], r["n_tokens_after"])
        for r in remove_repeated_spans(df, "doc_id", "text", w=w).collect()
    }
    expect = _py_rewrite(corpus, w)
    for i, t in enumerate(corpus):
        toks_before = len(t.split())
        assert got[i] == (
            expect[i],
            toks_before,
            len(expect[i].split()),
        ), f"doc {i}"


def _py_chunks(text, w, s):
    toks = text.split()
    n = len(toks)
    if n == 0:
        return []
    k = -(-max(n - w, 0) // s) + 1
    return [
        (i, i * s, min(w, n - i * s), " ".join(toks[i * s : i * s + w]))
        for i in range(k)
    ]


@given(_corpus, st.integers(1, 4))
@settings(**_SETTINGS)
def test_chunk_documents_matches_bruteforce(spark, corpus, w):
    from neo4j_to_clickhouse_spark.operators.text import chunk_documents

    s = max(w - 1, 1)
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(corpus)], ["doc_id", "text"]
    )
    rows = chunk_documents(df, "doc_id", "text", window=w, stride=s).collect()
    got = {}
    for r in rows:
        got.setdefault(r["doc_id"], []).append(
            (r["chunk_id"], r["chunk_start"], r["n_chunk_tokens"], r["chunk_text"])
        )
    for i, t in enumerate(corpus):
        assert sorted(got.get(i, [])) == _py_chunks(t, w, s), f"doc {i}"


@given(_corpus)
@settings(**_SETTINGS)
def test_dedup_incremental_matches_bruteforce(spark, corpus):
    import hashlib

    from neo4j_to_clickhouse_spark.operators.dedup import (
        content_hash,
        dedup_incremental,
    )
    from pyspark.sql import functions as F

    # even ids are the batch, odd ids are history
    rows = [(i, t) for i, t in enumerate(corpus)]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    batch = df.filter(F.col("doc_id") % 2 == 0)
    store = (
        df.filter(F.col("doc_id") % 2 != 0)
        .select(content_hash("text").alias("h"))
        .distinct()
    )
    got = sorted(
        r["doc_id"]
        for r in dedup_incremental(batch, store, "doc_id", "text").collect()
    )
    seen = {
        hashlib.md5(t.encode()).hexdigest()
        for i, t in rows
        if i % 2 != 0
    }
    expect = []
    batch_seen = set()
    for i, t in rows:
        if i % 2 != 0:
            continue
        h = hashlib.md5(t.encode()).hexdigest()
        if h in seen or h in batch_seen:
            continue
        batch_seen.add(h)
        expect.append(i)
    assert got == sorted(expect)


@given(st.lists(st.integers(1, 50), min_size=1, max_size=30), st.integers(1, 8))
@settings(**_SETTINGS)
def test_priority_sample_matches_bruteforce(spark, weights, k):
    import hashlib

    from neo4j_to_clickhouse_spark.operators.sampling import priority_sample

    rows = [(i, w) for i, w in enumerate(weights)]
    df = spark.createDataFrame(rows, ["doc_id", "w"])
    got = [
        (r["doc_id"], r["priority"])
        for r in priority_sample(df, "doc_id", "w", k=k).collect()
    ]

    def prio(i, w):
        hx = int(hashlib.md5(str(i).encode()).hexdigest()[:8], 16)
        return w / ((hx + 1.0) / 16**8)

    expect = sorted(
        ((i, prio(i, w)) for i, w in rows),
        key=lambda t: (-t[1], t[0]),
    )[:k]
    assert got == expect


def test_sampling_membership_is_layout_invariant(spark):
    """The whole point of md5-keyed sampling (vs df.sample/randomSplit):
    membership is a pure function of the data — identical across
    repartitionings, orderings, and partition counts. Checked for all
    four samplers over four adversarial physical layouts."""
    from pyspark.sql import functions as F

    from neo4j_to_clickhouse_spark.operators.sampling import (
        hash_sample,
        hash_split,
        priority_sample,
        stratified_sample,
    )

    base = spark.range(2000).select(
        F.concat(F.lit("doc"), F.col("id")).alias("doc_id"),
        (F.col("id") % 7).alias("stratum"),
        (F.col("id") % 100 + 1).cast("double").alias("w"),
    )
    layouts = [
        base,
        base.repartition(17),
        base.repartition(1),
        base.orderBy(F.desc("doc_id")),
    ]

    def snapshots(df):
        return {
            "hash_sample": frozenset(
                r.doc_id for r in hash_sample(df, "doc_id", 0.1).collect()
            ),
            "hash_split": frozenset(
                (r.doc_id, r.split)
                for r in hash_split(
                    df, "doc_id", {"train": 0.8, "val": 0.1, "test": 0.1}
                ).collect()
            ),
            "stratified": frozenset(
                r.doc_id
                for r in stratified_sample(df, "stratum", "doc_id", 5).collect()
            ),
            "priority": frozenset(
                r.doc_id
                for r in priority_sample(df, "doc_id", "w", k=50).collect()
            ),
        }

    ref = snapshots(layouts[0])
    assert ref["hash_sample"] and ref["stratified"] and ref["priority"]
    for i, lay in enumerate(layouts[1:], start=1):
        got = snapshots(lay)
        for name in ref:
            assert got[name] == ref[name], f"{name} drifted at layout {i}"
