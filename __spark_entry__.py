"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs each
``queries()[name]`` at sf=0.01 and compares it against the matching
``oracle_sql()[name]`` via DuckDB (row-count + schema + order-insensitive
value-hash -> CORRECTNESS_r{N}.json).

The real inventory lives in :mod:`neo4j_to_clickhouse_spark.plans.queries`;
this module just adapts it to the driver's calling convention.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from neo4j_to_clickhouse_spark.plans import QUERIES  # noqa: E402


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001: the TPC-H Q1-style pricing
    summary over the fact table (decimal-exact aggregates, group-by rollup)."""
    return QUERIES["pricing_summary"].spark(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2 + north-star ops."""
    return {name: spec.spark for name, spec in QUERIES.items()}


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable ANSI SQL oracle for every SQL-expressible query.

    Omitted entries (seeded sampling, xxhash64-based MinHash/SimHash
    signatures, approximate IVF search) are engine-specific by nature; the
    driver records the weaker rows-only check for those.
    """
    return {
        name: spec.oracle for name, spec in QUERIES.items() if spec.oracle
    }
