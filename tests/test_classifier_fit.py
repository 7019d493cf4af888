"""Distributed classifier training (operators/classifier.py::fit_classifier
— VERDICT r12 item 5).

The fit must be bit-deterministic: residuals quantize to integer
micro-units on the executors (order-independent BIGINT gradient sums)
and the driver applies fixed integer updates — so a pure-Python replica
of the algorithm reproduces the final weight vector EXACTLY, across any
partitioning. A planted separable corpus then shows the loop actually
learns (perfect confusion at threshold 0), and the trained vector plugs
straight into the certified inference path.
"""

from __future__ import annotations

import hashlib
import math
import re

import pytest
from pyspark.sql import functions as F

from neo4j_to_clickhouse_spark.operators.classifier import (
    WEIGHT_SCALE,
    confusion_counts,
    fit_classifier,
    score_documents,
)

SEED = 7
N_BUCKETS = 64


# --- pure-Python replica (the determinism contract) -------------------


def _tokens(text: str) -> list[str]:
    t = re.sub(r"^\s+|\s+$", "", text)
    return re.split(r"\s+", t) if t else []


def _grams(text: str, bigrams: bool) -> list[str]:
    toks = _tokens(text)
    if not bigrams:
        return toks
    return toks + [
        f"{toks[i]} {toks[i + 1]}" for i in range(len(toks) - 1)
    ]


def _bucket(gram: str, n_buckets: int, seed: int = SEED) -> int:
    h = hashlib.md5(f"{seed}:{gram}".encode()).hexdigest()[:8]
    return int(h, 16) % n_buckets


def _round_half_up(x: float) -> int:
    # Spark's round(x, 0): HALF_UP = away from zero
    return int(math.floor(abs(x) + 0.5)) * (1 if x >= 0 else -1)


def _fit_reference(
    rows: list[tuple[str, int]],
    n_buckets: int,
    iters: int,
    lr: float,
    bigrams: bool = True,
    l2: float = 0.0,
) -> list[int]:
    docs = []
    for text, y in rows:
        buckets = [
            _bucket(g, n_buckets) for g in _grams(text, bigrams)
        ]
        if buckets:
            docs.append((buckets, y))
    w = [0] * n_buckets
    for _ in range(iters):
        grad = [0] * n_buckets
        for buckets, y in docs:
            n = len(buckets)
            margin = sum(w[b] for b in buckets) / (n * WEIGHT_SCALE)
            p = 1.0 / (1.0 + math.exp(-margin))
            rq = _round_half_up((p - y) / n * WEIGHT_SCALE)
            for b in buckets:
                grad[b] += rq
        for b in range(n_buckets):
            step = round(lr * grad[b] / len(docs))
            if l2:
                step += round(lr * l2 * w[b])
            w[b] -= int(step)
    return w


def _planted(n=120):
    # separable: positives carry the marker 'goodword', negatives
    # 'badword'; shared filler words in both classes
    rows = []
    filler = ["alpha", "beta", "gamma", "delta", "epsilon"]
    for i in range(n):
        pad = " ".join(filler[j % 5] for j in range(i % 4 + 2))
        if i % 2 == 0:
            rows.append((f"{pad} goodword {pad}", 1))
        else:
            rows.append((f"{pad} badword {pad}", 0))
    return rows


def test_fit_matches_pure_python_replica_exactly(spark):
    rows = _planted(40)
    df = spark.createDataFrame(rows, "text string, y int").repartition(7)
    got = fit_classifier(
        df, "text", "y", n_buckets=N_BUCKETS, iters=5, lr=2.0
    )
    want = _fit_reference(rows, N_BUCKETS, iters=5, lr=2.0)
    assert got == want
    assert any(w != 0 for w in got)


def test_fit_is_partitioning_invariant(spark):
    rows = _planted(30)
    one = fit_classifier(
        spark.createDataFrame(rows, "text string, y int").coalesce(1),
        "text",
        "y",
        n_buckets=N_BUCKETS,
        iters=3,
        lr=2.0,
    )
    many = fit_classifier(
        spark.createDataFrame(rows, "text string, y int").repartition(13),
        "text",
        "y",
        n_buckets=N_BUCKETS,
        iters=3,
        lr=2.0,
    )
    assert one == many


def test_fit_learns_separable_corpus_perfectly(spark):
    rows = _planted(120)
    df = spark.createDataFrame(rows, "text string, y int")
    w = fit_classifier(
        df, "text", "y", n_buckets=N_BUCKETS, iters=20, lr=4.0
    )
    scored = score_documents(df, "text", w, seed=SEED)
    conf = confusion_counts(scored, "score", "y", threshold=0.0).first()
    assert (conf["tp"], conf["tn"]) == (60, 60)
    assert (conf["fp"], conf["fn"]) == (0, 0)


def test_fit_l2_shrinks_weights(spark):
    rows = _planted(40)
    df = spark.createDataFrame(rows, "text string, y int")
    plain = fit_classifier(
        df, "text", "y", n_buckets=N_BUCKETS, iters=10, lr=4.0
    )
    shrunk = fit_classifier(
        df, "text", "y", n_buckets=N_BUCKETS, iters=10, lr=4.0, l2=0.05
    )
    assert shrunk == _fit_reference(
        rows, N_BUCKETS, iters=10, lr=4.0, l2=0.05
    )
    assert sum(abs(x) for x in shrunk) < sum(abs(x) for x in plain)


def test_fit_input_validation(spark):
    df = spark.createDataFrame(
        [("", 1), ("   ", 0)], "text string, y int"
    )
    with pytest.raises(ValueError, match="no documents"):
        fit_classifier(df, "text", "y", n_buckets=8, iters=1)
    # non-binary and NULL labels fail loudly instead of silently
    # poisoning every gradient
    bad = spark.createDataFrame(
        [("a b", 1), ("c d", 5)], "text string, y int"
    )
    with pytest.raises(ValueError, match="binary"):
        fit_classifier(bad, "text", "y", n_buckets=8, iters=1)
    nulls = spark.createDataFrame(
        [("a b", 1), ("c d", None)], "text string, y int"
    )
    with pytest.raises(ValueError, match="binary"):
        fit_classifier(nulls, "text", "y", n_buckets=8, iters=1)
    ok = spark.createDataFrame([("a b", 1)], "text string, y int")
    with pytest.raises(ValueError, match="init has"):
        fit_classifier(ok, "text", "y", n_buckets=8, init=[0] * 4)
    with pytest.raises(ValueError, match="iters"):
        fit_classifier(ok, "text", "y", n_buckets=8, iters=0)
    # fractional labels are caught PRE-cast (ADVICE r13): 0.9 would
    # truncate to a legal 0 under cast('int') — the "score column
    # passed as label" case the check exists for
    frac = spark.createDataFrame(
        [("a b", 1.0), ("c d", 0.9)], "text string, y double"
    )
    with pytest.raises(ValueError, match="binary"):
        fit_classifier(frac, "text", "y", n_buckets=8, iters=1)
    # explicit plan-literal strategy above the ceiling fails at call
    # time, not at the plan-compile cliff (ADVICE r13/r14); auto
    # routes to broadcast instead (test below)
    with pytest.raises(ValueError, match="plan-literal ceiling"):
        fit_classifier(
            ok,
            "text",
            "y",
            n_buckets=100_001,
            iters=1,
            weight_strategy="literal",
        )
    # the broadcast TRAINING path has its own driver-side ceiling
    # (n_buckets gradient rows collected per round)
    with pytest.raises(ValueError, match="training ceiling"):
        fit_classifier(ok, "text", "y", n_buckets=4_000_001, iters=1)


def test_fit_broadcast_strategy_bit_equal(spark):
    """The broadcast-gather margin kernel produces the EXACT weight
    vector the plan-literal path produces — the two formulations are
    interchangeable below the ceiling, so auto-routing above it cannot
    change results."""
    rows = _planted(40)
    df = spark.createDataFrame(rows, "text string, y int").repartition(5)
    lit = fit_classifier(
        df, "text", "y", n_buckets=N_BUCKETS, iters=4, lr=2.0,
        weight_strategy="literal",
    )
    bc = fit_classifier(
        df, "text", "y", n_buckets=N_BUCKETS, iters=4, lr=2.0,
        weight_strategy="broadcast",
    )
    assert lit == bc


def test_fit_and_score_above_plan_literal_ceiling(spark):
    """A 1M-bucket feature space works end-to-end (VERDICT r14 item 5):
    auto routes fit AND score to the broadcast-gather kernel, the fit
    matches the pure-python replica bit-for-bit, and scoring the
    fitted model reproduces the replica's margins exactly."""
    from neo4j_to_clickhouse_spark.operators.classifier import (
        ClassifierModel,
    )

    rows = _planted(16)
    nb = 1_000_000
    df = spark.createDataFrame(rows, "text string, y int")
    w = fit_classifier(df, "text", "y", n_buckets=nb, iters=2, lr=2.0)
    assert w == _fit_reference(rows, nb, iters=2, lr=2.0)
    model = ClassifierModel(
        weights=tuple(w), hasher="md5", seed=SEED, bigrams=True
    )
    scored = {
        r["text"]: r["score"]
        for r in score_documents(df.distinct(), "text", model).collect()
    }
    for text in {t for t, _ in rows}:
        buckets = [_bucket(g, nb) for g in _grams(text, True)]
        exp = round(
            sum(w[b] for b in buckets) / (len(buckets) * WEIGHT_SCALE), 6
        )
        assert scored[text] == exp


def test_fit_classifier_model_artifact(spark):
    """fit_classifier_model bundles the bucket space with the weights;
    scoring through the model equals scoring through the raw vector
    with matching parameters, a conflicting explicit parameter raises,
    and the JSON round-trip is exact."""
    from neo4j_to_clickhouse_spark.operators.classifier import (
        ClassifierModel,
        fit_classifier_model,
    )

    df = spark.createDataFrame(
        [("good fine text", 1), ("junk junk junk", 0)] * 4,
        "text string, y int",
    )
    model = fit_classifier_model(
        df, "text", "y", n_buckets=16, seed=3, bigrams=False, iters=4,
        hasher="xxhash64",
    )
    assert model.n_buckets == 16
    raw = fit_classifier(
        df, "text", "y", n_buckets=16, seed=3, bigrams=False, iters=4,
        hasher="xxhash64",
    )
    assert list(model.weights) == raw
    via_model = score_documents(df, "text", model).collect()
    via_raw = score_documents(
        df, "text", raw, seed=3, bigrams=False, hasher="xxhash64"
    ).collect()
    assert via_model == via_raw
    with pytest.raises(ValueError, match="conflicts"):
        score_documents(df, "text", model, seed=7)
    with pytest.raises(ValueError, match="conflicts"):
        score_documents(df, "text", model, hasher="md5")
    # matching explicit args are accepted
    score_documents(df, "text", model, seed=3, bigrams=False)
    rt = ClassifierModel.from_json(model.to_json())
    assert rt == model
    with pytest.raises(ValueError, match="unknown hasher"):
        ClassifierModel(weights=(0,), hasher="sha1")


def test_confusion_counts_by_group(spark):
    df = spark.createDataFrame(
        [
            ("a", 0.5, 1),
            ("a", 0.5, 0),
            ("a", -0.5, 0),
            ("b", -0.5, 1),
        ],
        "g string, score double, y int",
    )
    rows = {
        r["g"]: (r["tp"], r["fp"], r["tn"], r["fn"])
        for r in confusion_counts(
            df, "score", "y", threshold=0.0, by="g"
        ).collect()
    }
    assert rows == {"a": (1, 1, 1, 0), "b": (0, 0, 0, 1)}


def test_classifier_model_file_roundtrip(tmp_path):
    from neo4j_to_clickhouse_spark.operators.classifier import (
        ClassifierModel,
        load_classifier_model,
        save_classifier_model,
    )

    model = ClassifierModel(
        weights=(5, -3, 0, 12), hasher="xxhash64", seed=11, bigrams=False
    )
    p = str(tmp_path / "artifacts" / "quality.model.json")
    save_classifier_model(model, p)
    assert load_classifier_model(p) == model
    # a corrupted/foreign-scale artifact fails loudly on load
    import json

    d = json.loads(model.to_json())
    d["weight_scale"] = 1000
    (tmp_path / "bad.json").write_text(json.dumps(d))
    with pytest.raises(ValueError, match="weight_scale"):
        load_classifier_model(str(tmp_path / "bad.json"))
