"""Token-budget mixture sampling (operators/sampling.py::budget_mixture).

Covers: rate arithmetic (cap at 1.0, proportionality), dict- and
expression-weights, zero-weight drop, partitioning-invariance of the
member set, and the kept rows carrying their group's rate.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from neo4j_to_clickhouse_spark.operators.sampling import (
    budget_mixture,
    mixture_rates,
)


def _corpus(spark, n=400):
    # two groups, 10 tokens per row -> group token sums are exact
    return spark.range(n).select(
        F.col("id"),
        F.when(F.col("id") % 2 == 0, "a").otherwise("b").alias("g"),
        F.lit(10).alias("tok"),
    )


def test_rates_cap_and_proportion(spark):
    df = _corpus(spark)  # 200 rows/group * 10 tok = 2000 tok/group
    rates = {
        r["g"]: r["mixture_rate"]
        for r in mixture_rates(
            df, "g", {"a": 0.5, "b": 0.1}, 4000, "tok"
        ).collect()
    }
    assert rates["a"] == 1.0  # 4000*0.5 = 2000 >= 2000 -> capped
    assert rates["b"] == 0.2  # 4000*0.1 = 400 / 2000


def test_budget_mixture_members_and_rate_column(spark):
    df = _corpus(spark)
    kept = budget_mixture(df, "g", "id", {"a": 0.5, "b": 0.1}, 4000, "tok")
    rows = kept.collect()
    a = [r for r in rows if r["g"] == "a"]
    b = [r for r in rows if r["g"] == "b"]
    assert len(a) == 200  # rate 1.0 keeps everything
    # rate 0.2: Bernoulli by hash — expected 40, loose bounds
    assert 15 <= len(b) <= 70
    assert all(r["mixture_rate"] == 1.0 for r in a)
    assert all(r["mixture_rate"] == 0.2 for r in b)


def test_zero_weight_group_dropped(spark):
    df = _corpus(spark)
    kept = budget_mixture(df, "g", "id", {"a": 1.0}, 4000, "tok")
    assert kept.filter("g = 'b'").count() == 0
    assert kept.filter("g = 'a'").count() == 200


def test_zero_token_groups_follow_the_weight_contract(spark):
    # a group whose token sum is 0: weight 0 must still DROP it (the
    # unguarded 0.0/0.0 was NaN, and least(1.0, NaN) = 1.0 kept it in
    # full); a positive weight keeps it in full (costs no budget)
    df = spark.range(6).select(
        F.col("id"),
        F.when(F.col("id") % 3 == 0, "a")
        .when(F.col("id") % 3 == 1, "z0")
        .otherwise("zp")
        .alias("g"),
        F.when(F.col("id") % 3 == 0, 10).otherwise(0).alias("tok"),
    )
    rates = {
        r["g"]: r["mixture_rate"]
        for r in mixture_rates(
            df, "g", {"a": 1.0, "zp": 0.5}, 40, "tok"
        ).collect()
    }
    assert rates["z0"] == 0.0  # zero tokens, weight 0 -> dropped
    assert rates["zp"] == 1.0  # zero tokens, positive weight -> kept
    assert rates["a"] == 1.0
    kept = budget_mixture(df, "g", "id", {"a": 1.0, "zp": 0.5}, 40, "tok")
    assert kept.filter("g = 'z0'").count() == 0
    assert kept.filter("g = 'zp'").count() == 2


def test_expression_weight(spark):
    df = _corpus(spark)
    w = F.when(F.col("g") == "a", 0.25).otherwise(0.05)
    rates = {
        r["g"]: r["mixture_rate"]
        for r in mixture_rates(df, "g", w, 4000, "tok").collect()
    }
    assert rates["a"] == 0.5 and rates["b"] == 0.1


def test_member_set_partitioning_invariant(spark):
    df = _corpus(spark)
    kept1 = budget_mixture(
        df, "g", "id", {"a": 0.3, "b": 0.3}, 4000, "tok"
    )
    kept2 = budget_mixture(
        df.repartition(13, "id"),
        "g",
        "id",
        {"a": 0.3, "b": 0.3},
        4000,
        "tok",
    )
    ids1 = sorted(r["id"] for r in kept1.select("id").collect())
    ids2 = sorted(r["id"] for r in kept2.select("id").collect())
    assert ids1 == ids2 and len(ids1) > 0
