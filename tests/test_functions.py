"""Scalar / JSON function tests (SURVEY.md §2.8)."""

from __future__ import annotations

from pyspark.sql import functions as F

from neo4j_to_clickhouse_spark.functions import (
    human_readable_size,
    json_extract_array,
    json_extract_string,
    json_first_array_element,
    normalize_labels,
    operation_to_event_type,
    valid_json_or_empty,
)


def _one(spark, col, value=None):
    df = spark.createDataFrame([(value,)], ["v"]) if value is not None else spark.range(1)
    return df.select(col.alias("out")).first().out


def test_operation_mapping(spark):
    df = spark.createDataFrame(
        [("CREATE",), ("UPDATE",), ("DELETE",), ("MERGE",), (None,)], ["op"]
    )
    out = [r.out for r in df.select(operation_to_event_type("op").alias("out")).collect()]
    # multiIf default is INSERT (01-init-tables.sql:75-80)
    assert out == ["INSERT", "UPDATE", "DELETE", "INSERT", "INSERT"]


def test_normalize_labels_json_and_csv(spark):
    cases = {
        '["Device","Router"]': ["Device", "Router"],
        "Device, Router": ["Device", "Router"],
        "Device": ["Device"],
        "": [],
        "[not valid json": ["[not valid json"],  # '[' prefix but bad JSON -> empty
    }
    df = spark.createDataFrame([(k,) for k in cases], ["v"])
    got = {
        r.v: r.out
        for r in df.select("v", normalize_labels("v").alias("out")).collect()
    }
    assert got['["Device","Router"]'] == ["Device", "Router"]
    assert got["Device, Router"] == ["Device", "Router"]
    assert got["Device"] == ["Device"]
    assert got[""] == []
    assert got["[not valid json"] == []


def test_valid_json_or_empty(spark):
    df = spark.createDataFrame(
        [('{"a": 1}',), ("not json",), ("",), (None,)], ["v"]
    )
    out = [r.out for r in df.select(valid_json_or_empty("v").alias("out")).collect()]
    assert out == ['{"a": 1}', "{}", "{}", "{}"]


def test_json_extract(spark):
    v = '{"a": {"b": "x"}, "names": ["n1", "n2"]}'
    assert _one(spark, json_extract_string(F.col("v"), "a", "b"), v) == "x"
    assert _one(spark, json_extract_array(F.col("v"), "names"), v) == ["n1", "n2"]
    assert _one(spark, json_first_array_element(F.col("v"), "names"), v) == "n1"


def test_human_readable_size(spark):
    df = spark.createDataFrame([(512,), (2048,), (3 * 1024**2,)], ["v"])
    out = [r.out for r in df.select(human_readable_size("v").alias("out")).collect()]
    assert out == ["512 B", "2.0 KiB", "3.0 MiB"]


def test_cluster_conf_arithmetic():
    from neo4j_to_clickhouse_spark.session import cluster_conf

    c = cluster_conf(executors=1000, cores_per_executor=4, dataset_tb=100.0)
    # 100 TB full shuffle at ~1 GiB/partition needs >= 102400 partitions,
    # which dominates the 12000 core-waves floor
    assert int(c["spark.sql.shuffle.partitions"]) == 102400
    small = cluster_conf(executors=100, cores_per_executor=4, dataset_tb=1.0)
    # 1 TB: core-waves floor dominates (1200 > 1024)
    assert int(small["spark.sql.shuffle.partitions"]) == 1200
    assert c["spark.executor.instances"] == "1000"
