"""Variant-typed properties (Spark 4 VariantType): lenient parse, typed
navigation, parquet round-trip."""

from __future__ import annotations

from pyspark.sql import functions as F

from neo4j_to_clickhouse_spark.functions.variant import (
    vget,
    with_variant_properties,
)


def test_variant_parse_and_typed_get(spark):
    df = spark.createDataFrame(
        [
            ('{"name":"Router-01","port":8080,"tags":["a","b"]}',),
            ("not json at all",),
            (None,),
        ],
        ["properties_after"],
    )
    v = with_variant_properties(df)
    rows = v.select(
        vget("properties_after_v", "$.name").alias("name"),
        vget("properties_after_v", "$.port", "int").alias("port"),
        vget("properties_after_v", "$.tags[1]").alias("t1"),
        F.col("properties_after_v").isNull().alias("is_null"),
    ).collect()
    assert (rows[0].name, rows[0].port, rows[0].t1) == ("Router-01", 8080, "b")
    assert rows[1].is_null  # garbage -> NULL, quarantine-compatible
    assert rows[2].is_null


def test_variant_survives_parquet(spark, tmp_path):
    df = with_variant_properties(
        spark.createDataFrame([('{"k": 7}',)], ["properties_after"])
    )
    df.write.parquet(str(tmp_path / "t"))
    back = spark.read.parquet(str(tmp_path / "t"))
    assert dict(back.dtypes)["properties_after_v"] == "variant"
    assert back.select(
        vget("properties_after_v", "$.k", "int").alias("k")
    ).collect()[0].k == 7
