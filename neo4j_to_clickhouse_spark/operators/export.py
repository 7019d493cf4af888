"""Deterministic training-shard export (north star).

The last step of every pre-training data pipeline is a global
pseudo-random shuffle of the curated corpus into a fixed number of
shards, so that any contiguous read of any shard is an unbiased sample
and multi-epoch training never replays pipeline ordering artifacts.
Engines usually reach for ``repartition(n)`` + random sort — both
non-deterministic under retries/layout changes.  This module makes the
shuffle a *pure function of the data*: shard membership and intra-shard
order are both md5-derived, so the same corpus produces byte-identical
shards on any engine, any partitioning, any rerun — the property that
makes training runs reproducible and shard-level resume safe.
Reference scope: the reference ends at ClickHouse tables and has no
export surface; this is the downstream step its training-data consumers
script by hand.

Scale design: shard assignment and the order key are scan-side flat
expressions (zero shuffle); the write is exactly ONE hash shuffle on
``shard`` (``repartition(num_shards, shard)``) with an intra-partition
sort that spills — Spark's sort-based shuffle handles shards far larger
than executor memory.  The balance report aggregates map-side first.
Choose ``num_shards`` ~ corpus_bytes / desired_shard_bytes; md5
uniformity bounds the shard-size spread at O(sqrt(docs_per_shard)).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from neo4j_to_clickhouse_spark.operators.sampling import _hash_key
from neo4j_to_clickhouse_spark.operators.text import token_count


def shard_key(key: Column | str, num_shards: int) -> Column:
    """Shard id in ``[0, num_shards)``: the first 8 hex chars of
    ``md5(key)`` parsed as an integer, mod ``num_shards`` — reproducible
    by any engine with md5 (DuckDB: ``CAST('0x' || substr(md5(k),1,8) AS
    BIGINT) % n``)."""
    if num_shards < 1:
        raise ValueError(f"num_shards must be >= 1, got {num_shards}")
    h = F.substring(_hash_key(key), 1, 8)
    return (F.conv(h, 16, 10).cast("long") % num_shards).cast("int")


def order_key(key: Column | str) -> Column:
    """Deterministic intra-shard shuffle order: the full md5 hex (with the
    raw key as final tie-break appended by callers if keys may collide).
    Sorting by it decorrelates neighbors from any pipeline ordering."""
    return _hash_key(key)


def assign_shards(
    df: DataFrame, key_col: str, num_shards: int
) -> DataFrame:
    """Add ``shard`` and ``sort_key`` columns — scan-side, zero shuffle."""
    return df.withColumn(
        "shard", shard_key(key_col, num_shards)
    ).withColumn("sort_key", order_key(key_col))


def write_training_shards(
    df: DataFrame,
    path: str,
    key_col: str,
    num_shards: int,
    fmt: str = "parquet",
) -> None:
    """Materialize the deterministic global shuffle: one hash shuffle into
    ``num_shards`` partitions, each sorted by the md5 order key (then the
    raw key, so colliding hashes still order totally).  With
    ``spark.sql.adaptive.enabled`` the single-shuffle plan is preserved —
    ``repartition(n, col)`` is a user-specified distribution AQE won't
    coalesce away."""
    out = assign_shards(df, key_col, num_shards)
    (
        out.repartition(num_shards, "shard")
        .sortWithinPartitions("shard", "sort_key", key_col)
        .write.format(fmt)
        .partitionBy("shard")
        .mode("overwrite")
        .save(path)
    )


def shard_balance_report(
    df: DataFrame,
    key_col: str,
    num_shards: int,
    text_col: str = "text",
) -> DataFrame:
    """Per-shard balance audit: doc and token counts plus each shard's
    deviation from the mean doc load — the number an operator checks
    before pointing a 1000-worker training job at the shards."""
    out = assign_shards(df, key_col, num_shards)
    per_shard = out.groupBy("shard").agg(
        F.count("*").alias("n_docs"),
        F.sum(token_count(text_col)).alias("n_tokens"),
    )
    mean_docs = per_shard.agg(
        (F.sum("n_docs").cast("double") / F.lit(float(num_shards))).alias(
            "mean_docs"
        )
    )
    return (
        per_shard.crossJoin(mean_docs)
        .select(
            "shard",
            "n_docs",
            "n_tokens",
            (
                F.round(
                    F.col("n_docs").cast("double") / F.col("mean_docs") - 1.0,
                    6,
                )
                + F.lit(0.0)
            ).alias("dev_from_mean"),
        )
        .orderBy("shard")
    )
