"""Deterministic shard export (operators/export.py).

The oracle certifies the balance report on the fixture; these pin the
export contract itself: shard ids match an independent md5 computation,
the written shards are a pure function of the data (byte-identical
across reruns and input partitionings), and intra-shard order follows
the md5 order key.
"""

from __future__ import annotations

import hashlib

from neo4j_to_clickhouse_spark.operators.export import (
    assign_shards,
    shard_balance_report,
    write_training_shards,
)


def _expected_shard(key, n):
    return int(hashlib.md5(str(key).encode()).hexdigest()[:8], 16) % n


def _docs(spark, n=40, parts=None):
    rows = [(i, f"w{i} w{i + 1} w{i + 2}") for i in range(n)]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    return df.repartition(parts) if parts else df


def test_shard_matches_independent_md5(spark):
    out = assign_shards(_docs(spark), "doc_id", 8).collect()
    for r in out:
        assert r["shard"] == _expected_shard(r["doc_id"], 8)
        assert r["sort_key"] == hashlib.md5(
            str(r["doc_id"]).encode()
        ).hexdigest()


def test_balance_report_conserves_docs(spark):
    rep = shard_balance_report(_docs(spark), "doc_id", 8).collect()
    assert sum(r["n_docs"] for r in rep) == 40
    assert all(0 <= r["shard"] < 8 for r in rep)


def _read_shards(spark, path):
    df = spark.read.parquet(path)
    rows = sorted(
        df.collect(), key=lambda r: (r["shard"], r["sort_key"], r["doc_id"])
    )
    # partition-column type inference may surface `shard` as a string
    return [(int(r["shard"]), r["doc_id"]) for r in rows]


def test_written_shards_are_layout_invariant(spark, tmp_path):
    a, b = str(tmp_path / "a"), str(tmp_path / "b")
    write_training_shards(_docs(spark, parts=2), a, "doc_id", 4)
    write_training_shards(_docs(spark, parts=7), b, "doc_id", 4)
    assert _read_shards(spark, a) == _read_shards(spark, b)
    # membership matches the closed-form hash
    for shard, doc_id in _read_shards(spark, a):
        assert shard == _expected_shard(doc_id, 4)


def test_intra_shard_order_is_the_md5_order(spark, tmp_path):
    path = str(tmp_path / "s")
    write_training_shards(_docs(spark), path, "doc_id", 2)
    df = spark.read.parquet(path)
    for shard in (0, 1):
        # physical row order within the shard's files is the sort order
        got = [
            r["doc_id"]
            for r in df.filter(df.shard.cast("int") == shard).collect()
        ]
        expect = sorted(
            got, key=lambda d: hashlib.md5(str(d).encode()).hexdigest()
        )
        assert got == expect
