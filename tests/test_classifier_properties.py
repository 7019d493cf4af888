"""Property-based tests (hypothesis) for the selection/mixture operators.

Pins two invariants no example-based test fully covers:
- select_top_fraction == the naive global row_number window for ANY
  score multiset (heavy ties, all-equal, NULLs, tiny fractions) — the
  histogram-threshold algorithm's boundary-residue arithmetic is the
  part worth fuzzing;
- budget_mixture's member set is a pure function of (key, rate): the
  same rows survive under any partitioning, and every kept row's hash
  value actually falls under its group's threshold (the Python mirror
  recomputes the md5 threshold test exactly).
"""

from __future__ import annotations

import hashlib
import math

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import Window
from pyspark.sql import functions as F

from neo4j_to_clickhouse_spark.operators.classifier import (
    select_top_fraction,
)
from neo4j_to_clickhouse_spark.operators.sampling import budget_mixture

# small score domain forces heavy ties; None exercises the NULL lanes
_score = st.one_of(
    st.none(), st.sampled_from([-1.5, 0.0, 0.25, 0.5, 2.0])
)
_scores = st.lists(_score, min_size=1, max_size=24)
_fraction = st.sampled_from([0.1, 0.34, 0.5, 1.0])


@settings(
    max_examples=25,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow],
)
@given(scores=_scores, fraction=_fraction)
def test_select_top_fraction_equals_naive_window(
    spark, scores, fraction
):
    df = spark.createDataFrame(
        [(i, s) for i, s in enumerate(scores)],
        "id long, score double",
    )
    got = sorted(
        r["id"]
        for r in select_top_fraction(df, "score", "id", fraction)
        .select("id")
        .collect()
    )
    w = Window.orderBy(
        F.col("score").desc_nulls_last(), F.col("id")
    )
    k = math.ceil(fraction * len(scores))
    exp = sorted(
        r["id"]
        for r in df.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") <= k)
        .select("id")
        .collect()
    )
    assert got == exp


_weights = st.sampled_from([0.0, 0.1, 0.5, 1.0])
_budget = st.sampled_from([0, 50, 500, 100000])


@settings(
    max_examples=15,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow],
)
@given(wa=_weights, wb=_weights, budget=_budget, parts=st.sampled_from([1, 7]))
def test_budget_mixture_member_set_is_pure(spark, wa, wb, budget, parts):
    n = 60
    df = spark.range(n).select(
        F.col("id"),
        F.when(F.col("id") % 2 == 0, "a").otherwise("b").alias("g"),
        F.lit(5).alias("tok"),
    )
    kept = budget_mixture(
        df.repartition(parts, "id"),
        "g",
        "id",
        {"a": wa, "b": wb},
        budget,
        "tok",
    ).collect()
    # Python mirror: rate = min(1, budget*w / tok_g); keep iff the
    # 32-bit md5 prefix of the key < floor(rate * 2^32)
    tok_g = {"a": 5 * (n // 2), "b": 5 * (n // 2)}
    for r in kept:
        w = {"a": wa, "b": wb}[r["g"]]
        rate = min(1.0, (float(budget) * w) / tok_g[r["g"]])
        h = int(
            hashlib.md5(str(r["id"]).encode()).hexdigest()[:8], 16
        )
        assert h < math.floor(rate * 4294967296.0)
        assert r["mixture_rate"] == rate
    # completeness: every id the mirror admits is present
    kept_ids = {r["id"] for r in kept}
    for i in range(n):
        g = "a" if i % 2 == 0 else "b"
        w = {"a": wa, "b": wb}[g]
        rate = min(1.0, (float(budget) * w) / tok_g[g])
        h = int(hashlib.md5(str(i).encode()).hexdigest()[:8], 16)
        if h < math.floor(rate * 4294967296.0):
            assert i in kept_ids


_batch = st.integers(min_value=0, max_value=4)
_rows = st.lists(
    st.tuples(_batch, _score), min_size=1, max_size=30
)
_window = st.sampled_from([1, 2, 3])


@settings(
    max_examples=25,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow],
)
@given(rows=_rows, fraction=_fraction, window=_window)
def test_rolling_threshold_report_equals_python_replica(
    spark, rows, fraction, window
):
    """rolling_threshold_report == a direct python restatement for ANY
    (batch, score) multiset — heavy ties, NULL scores, sparse batch
    ids, window > span. The trailing-window pool, the
    descending-cumulative threshold row (incl. the NULL-group
    boundary), and the ties-kept gate count are the parts worth
    fuzzing beyond the fixture-shaped oracle."""
    from collections import Counter

    from neo4j_to_clickhouse_spark.operators.classifier import (
        rolling_threshold_report,
    )

    df = spark.createDataFrame(rows, "batch int, score double")
    got = {
        r["batch"]: (
            r["threshold"],
            r["pool_docs"],
            r["batch_docs"],
            r["batch_kept"],
        )
        for r in rolling_threshold_report(
            df, "score", "batch", fraction, window=window
        ).collect()
    }
    exp = {}
    for b in sorted({bb for bb, _ in rows}):
        pool = [s for bb, s in rows if b - window < bb <= b]
        k = math.ceil(fraction * len(pool))
        cnt = Counter(pool)
        keys = sorted(
            (x for x in cnt if x is not None), reverse=True
        ) + ([None] if None in cnt else [])
        t, c = "missing", 0
        for s_ in keys:
            c += cnt[s_]
            if c >= k and c - cnt[s_] < k:
                t = s_
                break
        assert t != "missing"
        bd = sum(1 for bb, _ in rows if bb == b)
        kept = (
            0
            if t is None
            else sum(
                1
                for bb, s_ in rows
                if bb == b and s_ is not None and s_ >= t
            )
        )
        exp[b] = (
            None if t is None else t + 0.0,
            len(pool),
            bd,
            kept,
        )
    assert got == exp
