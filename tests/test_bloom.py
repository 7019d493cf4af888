"""Bloom-filter semi-join reduction (operators/bloom.py).

The registered query certifies exact-result equivalence on the fixture;
these pin the operator properties that make that equivalence sound: the
probe has NO false negatives (the safety property the exact-verify join
relies on), it actually rejects most non-members (the point of the
reduction), the bitmap is deterministic, and the probe stays JVM-side.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from neo4j_to_clickhouse_spark.operators.bloom import (
    bloom_bitmap,
    bloom_prefilter,
    ngram_contamination_bloom,
)

BITS = 1 << 14  # small bitmap so FPs are plausible yet bounded
K = 4


@pytest.fixture(scope="module")
def member_keys(spark):
    return spark.range(500).select(
        F.concat(F.lit("key-"), F.col("id")).alias("k")
    )


@pytest.fixture(scope="module")
def bitmap(member_keys):
    return bloom_bitmap(member_keys, "k", BITS, K).cache()


def test_no_false_negatives(spark, member_keys, bitmap):
    kept = bloom_prefilter(member_keys, F.col("k"), bitmap, BITS, K).count()
    assert kept == 500, "a Bloom filter must never drop a true member"


def test_rejects_most_non_members(spark, bitmap):
    others = spark.range(2000).select(
        F.concat(F.lit("other-"), F.col("id")).alias("k")
    )
    fp = bloom_prefilter(others, F.col("k"), bitmap, BITS, K).count()
    # (1 - e^(-kn/m))^k at n=500, m=2^14, k=4 ≈ 0.016% -> a handful at
    # most out of 2000; 5% is a generous determinism-safe ceiling
    assert fp <= 100, f"false-positive rate degenerate: {fp}/2000 passed"


def test_bitmap_shape_and_determinism(member_keys):
    row1 = bloom_bitmap(member_keys, "k", BITS, K).collect()[0]
    row2 = bloom_bitmap(member_keys, "k", BITS, K).collect()[0]
    assert len(row1["bloom"]) == BITS // 64
    assert row1["bloom"] == row2["bloom"], "bitmap must be deterministic"


def test_num_bits_must_be_word_aligned(member_keys):
    with pytest.raises(ValueError):
        bloom_bitmap(member_keys, "k", 1000, K)


def test_probe_stays_jvm_side(spark, member_keys, bitmap):
    plan = (
        bloom_prefilter(member_keys, F.col("k"), bitmap, BITS, K)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    for marker in ("BatchEvalPython", "ArrowEvalPython", "MapInPandas"):
        assert marker not in plan


def test_equivalence_with_exact_operator(spark):
    """Bloom path == exact path on a corpus with planted contamination."""
    from neo4j_to_clickhouse_spark.operators.dedup import ngram_contamination

    docs = spark.createDataFrame(
        [
            (1, "alpha beta gamma delta epsilon zeta"),
            (2, "one two three four five six seven"),
            (3, "alpha beta gamma delta other words here"),
            (4, "totally unrelated text content words"),
        ],
        ["doc_id", "text"],
    )
    bench = spark.createDataFrame(
        [(99, "alpha beta gamma delta epsilon")], ["doc_id", "text"]
    )
    exact = {
        r["id"]: (r["n_shingles"], r["n_hits"])
        for r in ngram_contamination(docs, bench, n=3).collect()
    }
    bloom = {
        r["id"]: (r["n_shingles"], r["n_hits"])
        for r in ngram_contamination_bloom(docs, bench, n=3).collect()
    }
    assert exact == bloom and len(exact) > 0
