"""Benchmark/testdata table loading and SQL view registration."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from neo4j_to_clickhouse_spark.schemas import TESTDATA_TABLES


def load_tables(
    spark: SparkSession, sf_dir: str, names: tuple[str, ...] = TESTDATA_TABLES
) -> dict[str, DataFrame]:
    """Load the driver-provided parquet tables (TESTDATA.md)."""
    return {n: spark.read.parquet(f"{sf_dir}/{n}.parquet") for n in names}


def register_views(
    spark: SparkSession, sf_dir: str, names: tuple[str, ...] = TESTDATA_TABLES
) -> dict[str, DataFrame]:
    """Load and register each table as a temp view for ``spark.sql`` use —
    the engine's interactive analytics surface (SURVEY.md §3.3).
    """
    tables = load_tables(spark, sf_dir, names)
    for n, df in tables.items():
        df.createOrReplaceTempView(n)
    return tables
