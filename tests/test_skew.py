"""Skew-safe aggregation variants: exactness vs the plain formulations,
plan shape (two aggregate pairs, no rank window), and edge cases."""

from __future__ import annotations

import os
import sys

import pytest

from pyspark.sql import functions as F

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from neo4j_to_clickhouse_spark.operators.skew import (
    salted_count_distinct,
    salted_min_by,
)


@pytest.fixture(scope="module")
def skewed(spark):
    # one hot key with 5000 rows over 137 distinct values + cold keys
    rows = [("hot", i % 137, f"p{i}") for i in range(5000)]
    rows += [("cold1", 1, "x"), ("cold1", 2, "y"), ("cold2", 7, "z")]
    return spark.createDataFrame(rows, ["k", "v", "payload"])


def test_salted_count_distinct_matches_plain(skewed):
    plain = {
        r.k: r.d
        for r in skewed.groupBy("k")
        .agg(F.count_distinct("v").alias("d"))
        .collect()
    }
    for buckets in (1, 4, 64):
        salted = {
            r.k: r.n_distinct
            for r in salted_count_distinct(
                skewed, ["k"], "v", buckets=buckets
            ).collect()
        }
        assert salted == plain, buckets
    assert plain["hot"] == 137


def test_salted_min_by_matches_window_argmin(skewed):
    w_plain = (
        skewed.groupBy("k")
        .agg(F.min(F.struct("v", "payload")).alias("m"))
        .select("k", "m.v", "m.payload")
    )
    plain = {(r.k, r.v, r.payload) for r in w_plain.collect()}
    for buckets in (1, 8):
        got = {
            (r.k, r.v, r.payload)
            for r in salted_min_by(
                skewed, ["k"], "v", buckets=buckets
            ).collect()
        }
        assert got == plain, buckets


def test_salted_rejects_bad_buckets(skewed):
    with pytest.raises(ValueError, match="buckets"):
        salted_count_distinct(skewed, ["k"], "v", buckets=0)
    with pytest.raises(ValueError, match="buckets"):
        salted_min_by(skewed, ["k"], "v", buckets=-1)


def test_salted_count_distinct_plan_has_no_expand_skew(skewed):
    """The salted plan must contain the bucket column in the first-stage
    grouping (bounded merge fan-in) and no rank window."""
    plan = salted_count_distinct(skewed, ["k"], "v", buckets=16)._jdf.queryExecution().executedPlan().toString()
    assert "Window" not in plan
    assert "xxhash64" in plan.lower() or "pmod" in plan.lower()


def test_hash_split_is_partition_and_deterministic(spark):
    """Every row gets exactly one label; splits are disjoint/exhaustive;
    reruns and degenerate fractions behave."""
    from neo4j_to_clickhouse_spark.operators.sampling import hash_split

    df = spark.range(2000).withColumnRenamed("id", "k")
    out = hash_split(df, "k", {"train": 0.8, "val": 0.1, "test": 0.1})
    counts = {r.split: r.n for r in out.groupBy("split").agg(F.count("*").alias("n")).collect()}
    assert sum(counts.values()) == 2000
    assert set(counts) == {"train", "val", "test"}
    # roughly proportional (Bernoulli-style deviation)
    assert 1400 < counts["train"] < 1800
    # determinism
    a = {(r.k, r.split) for r in out.collect()}
    b = {
        (r.k, r.split)
        for r in hash_split(
            df, "k", {"train": 0.8, "val": 0.1, "test": 0.1}
        ).collect()
    }
    assert a == b
    # a saturating first range absorbs everything, later labels are empty
    all_a = hash_split(df, "k", {"a": 1.0, "b": 0.0})
    assert all_a.filter("split <> 'a'").count() == 0
    import pytest

    with pytest.raises(ValueError, match="sum to 1"):
        hash_split(df, "k", {"a": 0.5})
