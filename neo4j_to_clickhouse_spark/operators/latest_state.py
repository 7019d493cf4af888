"""Latest-state / deduplication views (SURVEY.md §2.5, §2.9 M1-M2).

The reference defers "keep the latest version of each entity" to
``OPTIMIZE TABLE ... FINAL`` (`initial-load/scripts/04-optimize-tables.sql:26-48`)
— engine-magic we replace with an explicit window:

    row_number() OVER (PARTITION BY entity_id
                       ORDER BY event_timestamp DESC, event_id DESC) = 1

``(event_timestamp, event_id)`` is the reference's own total order (its
MergeTree sort key, `clickhouse/init/01-init-tables.sql:18,35`); using it as
the tie-break makes dedup deterministic at identical millisecond timestamps.

Scale note: the window shuffles once on ``entity_id``. At 100 TB the right
physical shape is exactly this — one hash shuffle, no driver involvement —
and AQE splits skewed entities. For the common "latest state as of now" on a
month-partitioned log, pair with a time filter so partition pruning bounds
the scan before the shuffle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

def latest_order() -> list:
    """The reference's MergeTree sort-key order, descending — the total
    order used to pick "latest" (`clickhouse/init/01-init-tables.sql:18,35`).
    """
    return [F.col("event_timestamp").desc(), F.col("event_id").desc()]


def latest_events(df: DataFrame, key: str = "entity_id") -> DataFrame:
    """One row per entity: its most recent event (SNAPSHOT included).

    This is the engine's `OPTIMIZE FINAL` equivalent as a *view* — the log
    stays append-only (SURVEY.md §1.1) and callers materialize when needed
    (:func:`neo4j_to_clickhouse_spark.operators.maintenance.compact`).
    """
    w = Window.partitionBy(key).orderBy(*latest_order())
    return (
        df.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__rn")
    )


def current_state(df: DataFrame, key: str = "entity_id") -> DataFrame:
    """The live graph derived from the log: latest event per entity,
    excluding entities whose latest event is DELETE.

    DELETE-awareness is the semantic the reference never implements (its
    "current graph" queries read the raw log); SURVEY.md §7 flags it as a
    genuinely hard part — the decision here: an entity exists iff its
    latest event by ``(event_timestamp, event_id)`` is not a DELETE, and its
    properties are that event's ``properties_after``.
    """
    return latest_events(df, key).filter(F.col("event_type") != "DELETE")


def duplicate_entities(df: DataFrame, key: str = "entity_id") -> DataFrame:
    """Entities holding >1 SNAPSHOT row — the post-optimize dedup validation
    (M2, `initial-load/scripts/04-optimize-tables.sql:64-87`). Empty result
    == healthy.
    """
    return (
        df.filter(F.col("event_type") == "SNAPSHOT")
        .groupBy(key)
        .agg(F.count("*").alias("cnt"))
        .filter(F.col("cnt") > 1)
    )


def dedup_exact_events(df: DataFrame) -> DataFrame:
    """Drop exact duplicate *events* (same event_id), keeping one — replay
    protection for at-least-once upstreams (FIXTURES.md §1 requires duplicate
    event ids be tolerated). ``dropDuplicates`` is a hash-shuffle on the id:
    the minimal-cost exact dedup at any scale.
    """
    return df.dropDuplicates(["event_id"])
