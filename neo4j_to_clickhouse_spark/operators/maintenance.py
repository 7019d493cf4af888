"""Maintenance jobs: compaction, dedup-materialize, retention (SURVEY.md §2.9).

ClickHouse gets these from the MergeTree engine (`OPTIMIZE TABLE ... FINAL`,
`ALTER TABLE ... DELETE`); vanilla Spark+Parquet needs them as explicit —
and partition-surgical — batch rewrites. Partition-level operation is the
point: at 100 TB you never rewrite the whole table, only the month
partitions the operation touches.
"""

from __future__ import annotations

import shutil
from pathlib import Path

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from neo4j_to_clickhouse_spark.operators.latest_state import (
    dedup_exact_events,
    latest_events,
)


def compact(
    spark: SparkSession,
    table_path: str,
    months: list[str] | None = None,
    keep: str = "latest",
) -> None:
    """`OPTIMIZE TABLE ... FINAL` equivalent
    (`initial-load/scripts/04-optimize-tables.sql:26-48`): rewrite the given
    month partitions with duplicates removed.

    keep='latest'  -> one row per entity (window dedup, M1);
    keep='events'  -> drop only replayed duplicate event ids.

    The rewrite goes to a dot-prefixed temp dir (invisible to parquet
    readers) and is then swapped in for every month that was READ — not
    just every month that produced output. Dynamic partition overwrite
    alone is wrong here: an entity whose survivor lands in month B leaves
    its superseded month-A row in place if no other survivor lands in A,
    because A is never among the written partitions. Months read are the
    months that must be replaced (or removed, when fully deduped away).
    Untouched months' files are never rewritten. On a cluster filesystem
    the same swap is the table format's transactional partition replace
    (e.g. Delta `replaceWhere`); the direct directory swap is the plain-
    parquet realization.
    """
    df = spark.read.parquet(table_path)
    if months:
        df = df.filter(F.col("event_month").isin(months))
    affected = [r[0] for r in df.select("event_month").distinct().collect()]
    deduped = latest_events(df) if keep == "latest" else dedup_exact_events(df)
    tmp = Path(table_path) / ".compact_tmp"
    (
        deduped.repartition("event_month")
        .sortWithinPartitions("event_timestamp", "event_id")
        .write.mode("overwrite")
        .partitionBy("event_month")
        .parquet(str(tmp))
    )
    for month in affected:
        old = Path(table_path) / f"event_month={month}"
        new = tmp / f"event_month={month}"
        if old.exists():
            shutil.rmtree(old)
        if new.exists():
            new.rename(old)
    shutil.rmtree(tmp, ignore_errors=True)


def retention_months(now_month: str, days: int = 90) -> str:
    """Cutoff month (yyyyMM) for a retention window ending `days` before
    the given month — months strictly older can be dropped wholesale."""
    year, month = int(now_month[:4]), int(now_month[4:])
    back = max(1, round(days / 30))
    month -= back
    while month <= 0:
        month += 12
        year -= 1
    return f"{year:04d}{month:02d}"


def apply_retention(
    spark: SparkSession, table_path: str, cutoff_month: str
) -> list[str]:
    """M3: `ALTER TABLE ... DELETE WHERE event_timestamp < cutoff`
    (`README.md:582-584`) realized as month-partition drops — O(metadata),
    no data rewrite, the same trick ClickHouse's monthly partitioning
    enables. Returns the dropped partition names."""
    root = Path(table_path)
    dropped = []
    for p in sorted(root.glob("event_month=*")):
        month = p.name.split("=", 1)[1]
        if month < cutoff_month:
            shutil.rmtree(p)
            dropped.append(month)
    return dropped
