"""Contract tests for the synthetic scale-data generator
(`tools/gen_scale_data.py`): the K-times replica must scale global
cardinalities by exactly K while PRESERVING per-key group sizes and
not collapsing replicas into exact duplicates — the properties the
two-decade scale-curve fits in docs/SCALING.md rely on."""

from __future__ import annotations

import os
import sys

import pytest

sys.path.insert(
    0, os.path.join(os.path.dirname(os.path.dirname(__file__)), "tools")
)

SRC = "/root/testdata/sf0.001"
K = 3


@pytest.fixture(scope="module")
def scaled(spark, tmp_path_factory):
    if not os.path.exists(os.path.join(SRC, "lineitem.parquet")):
        pytest.skip("driver fixture not present")
    from gen_scale_data import TABLES, scale_table

    out = tmp_path_factory.mktemp("scaled")
    dirs = {}
    for name in TABLES:
        dest = str(out / f"{name}.parquet")
        scale_table(spark, SRC, name, K).write.parquet(dest)
        dirs[name] = dest
    return dirs


def _counts(spark, path):
    return spark.read.parquet(path).count()


def test_cardinalities_scale_by_k(spark, scaled):
    for name in ("orders", "lineitem", "events", "documents", "embeddings"):
        src_n = _counts(spark, os.path.join(SRC, f"{name}.parquet"))
        assert _counts(spark, scaled[name]) == K * src_n, name
    # dimensions stay as-is
    for name in ("region", "nation"):
        src_n = _counts(spark, os.path.join(SRC, f"{name}.parquet"))
        assert _counts(spark, scaled[name]) == src_n, name


def test_keys_stay_unique_and_per_key_histories_preserved(spark, scaled):
    import pyspark.sql.functions as F

    ev = spark.read.parquet(scaled["events"])
    assert ev.select("event_id").distinct().count() == ev.count()
    # per-user history sizes: same distribution as the source, K users
    src = spark.read.parquet(os.path.join(SRC, "events.parquet"))
    src_hist = sorted(
        r[1] for r in src.groupBy("user_id").count().collect()
    )
    out_hist = sorted(
        r[1] for r in ev.groupBy("user_id").count().collect()
    )
    assert out_hist == sorted(src_hist * K)
    # referential integrity: every scaled lineitem joins a scaled order
    li = spark.read.parquet(scaled["lineitem"])
    orders = spark.read.parquet(scaled["orders"])
    dangling = li.join(
        orders, li.l_orderkey == orders.o_orderkey, "left_anti"
    ).count()
    assert dangling == 0


def test_replicas_are_not_exact_text_duplicates(spark, scaled):
    import pyspark.sql.functions as F

    docs = spark.read.parquet(scaled["documents"])
    n = docs.count()
    distinct_texts = docs.select("text").distinct().count()
    # rotation keeps most replica texts distinct (short docs may cycle
    # back); an all-duplicates corpus would show n/K distinct
    assert distinct_texts > 0.9 * n
    # token multiset per doc is preserved: lengths unchanged
    src = spark.read.parquet(os.path.join(SRC, "documents.parquet"))
    src_len = sorted(r[0] for r in src.select(F.length("text")).collect())
    out_len = sorted(r[0] for r in docs.select(F.length("text")).collect())
    assert out_len == sorted(src_len * K)
