"""Sharded JSONL training export (sources/export.py)."""

import gzip
import json
import os

from neo4j_to_clickhouse_spark.sources.export import (
    read_jsonl_shards,
    write_jsonl_shards,
)


def test_roundtrip_manifest_and_sharding(spark, tmp_path):
    docs = spark.createDataFrame(
        [(i, f"doc {i} café 汉字", [1.0, float(i)]) for i in range(57)],
        "doc_id long, text string, embedding array<double>",
    ).repartition(2)
    path = str(tmp_path / "shards")
    man = write_jsonl_shards(docs, path, max_records_per_file=10)
    assert man["n_rows"] == 57
    assert man["columns"] == ["doc_id", "text", "embedding"]
    # maxRecordsPerFile respected: 57 rows / <=10 per shard over 2
    # tasks -> at least 6 shards, none above the bound
    assert man["n_shards"] >= 6
    assert all(s["n_rows"] <= 10 for s in man["shards"])
    assert sum(s["n_rows"] for s in man["shards"]) == 57

    # the manifest matches the bytes on disk
    disk = json.load(open(os.path.join(path, "MANIFEST.json")))
    assert disk == man

    # shards are plain gzip JSONL any loader can stream
    shard = os.path.join(path, man["shards"][0]["file"])
    with gzip.open(shard, "rt", encoding="utf-8") as fh:
        first = json.loads(fh.readline())
    assert set(first) == {"doc_id", "text", "embedding"}
    assert "café" in first["text"] or "汉字" in first["text"]

    # Spark read-back is lossless
    back = read_jsonl_shards(spark, path, schema=docs.schema)
    assert sorted(map(tuple, back.collect())) == sorted(
        map(tuple, docs.collect())
    )


def test_uncompressed_and_no_manifest(spark, tmp_path):
    docs = spark.createDataFrame([(1, "a")], "doc_id long, text string")
    path = str(tmp_path / "plain")
    man = write_jsonl_shards(
        docs, path, compress=False, manifest=False
    )
    assert man == {}
    assert not os.path.exists(os.path.join(path, "MANIFEST.json"))
    back = read_jsonl_shards(spark, path, schema=docs.schema)
    assert back.collect()[0].text == "a"
