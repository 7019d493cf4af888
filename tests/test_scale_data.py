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


def test_permute_mode_preserves_multisets_and_kills_similarity(
    spark, tmp_path
):
    """mode=permute: token/dim multisets preserved exactly per replica,
    but cross-replica shingle overlap and cosine collapse to chance —
    the constant-duplicate-density corpus model."""
    import pyspark.sql.functions as F

    if not os.path.exists(os.path.join(SRC, "documents.parquet")):
        pytest.skip("driver fixture not present")
    from gen_scale_data import scale_table

    docs = scale_table(spark, SRC, "documents", 2, mode="permute")
    docs.write.parquet(str(tmp_path / "docs.parquet"))
    d = spark.read.parquet(str(tmp_path / "docs.parquet"))
    src = spark.read.parquet(os.path.join(SRC, "documents.parquet"))
    # token multiset preserved: sorted token arrays of replica 1 match
    # the source doc's sorted tokens exactly
    srt = F.array_sort(F.split("text", " "))
    a = {r[0]: r[1] for r in src.select("doc_id", srt).collect()}
    big = d.filter(F.col("doc_id") >= 10**12).select(
        (F.col("doc_id") - 10**12).alias("doc_id"), srt
    )
    b = {r[0]: r[1] for r in big.collect()}
    assert a == b
    # shingle-level similarity is destroyed: 8-gram overlap between a
    # replica and its source is (near) zero for non-trivial docs
    sh = d.select(
        "doc_id",
        F.split("text", " ").alias("t"),
    ).select(
        "doc_id",
        F.expr(
            "transform(sequence(1, greatest(size(t) - 7, 0)), "
            "i -> concat_ws(' ', slice(t, i, 8)))"
        ).alias("sh"),
    )
    base = sh.filter(F.col("doc_id") < 10**12).select(
        "doc_id", F.col("sh").alias("sh_a")
    )
    rep = sh.filter(F.col("doc_id") >= 10**12).select(
        (F.col("doc_id") - 10**12).alias("doc_id"),
        F.col("sh").alias("sh_b"),
    )
    joined = base.join(rep, "doc_id").select(
        F.size("sh_a").alias("n"),
        F.size(F.array_intersect("sh_a", "sh_b")).alias("common"),
    )
    tot = joined.agg(
        F.sum("n").alias("n"), F.sum("common").alias("common")
    ).collect()[0]
    assert tot["common"] < 0.02 * max(tot["n"], 1)

    emb = scale_table(spark, SRC, "embeddings", 2, mode="permute")
    emb.write.parquet(str(tmp_path / "emb.parquet"))
    e = spark.read.parquet(str(tmp_path / "emb.parquet"))
    # norms preserved exactly (same values, reordered)
    nrm = F.aggregate(
        "embedding",
        F.lit(0.0),
        lambda acc, x: acc + x.cast("double") * x.cast("double"),
    )
    na = {
        r[0]: r[1]
        for r in e.filter(F.col("vec_id") < 10**12)
        .select("vec_id", nrm)
        .collect()
    }
    nb = {
        r[0] - 10**12: r[1]
        for r in e.filter(F.col("vec_id") >= 10**12)
        .select("vec_id", nrm)
        .collect()
    }
    assert all(abs(na[k] - nb[k]) < 1e-9 for k in na)
    # cross-replica cosine collapses to chance (not near-dup): check
    # the mean |cosine| between each vector and its permuted replica
    # is far below any near-dup threshold
    pair = (
        e.filter(F.col("vec_id") < 10**12)
        .select("vec_id", F.col("embedding").alias("va"))
        .join(
            e.filter(F.col("vec_id") >= 10**12).select(
                (F.col("vec_id") - 10**12).alias("vec_id"),
                F.col("embedding").alias("vb"),
            ),
            "vec_id",
        )
        .select(
            (
                F.aggregate(
                    F.zip_with(
                        "va", "vb", lambda x, y: x.cast("double") * y
                    ),
                    F.lit(0.0),
                    lambda acc, x: acc + x,
                )
                / F.sqrt(
                    F.aggregate(
                        "va",
                        F.lit(0.0),
                        lambda acc, x: acc + x.cast("double") * x,
                    )
                    * F.aggregate(
                        "vb",
                        F.lit(0.0),
                        lambda acc, x: acc + x.cast("double") * x,
                    )
                )
            ).alias("cos")
        )
    )
    mean_abs = pair.agg(F.avg(F.abs("cos"))).collect()[0][0]
    assert mean_abs < 0.3


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
