"""SparkSession factory with scale-oriented defaults.

Local testing runs on ``local[N]`` but every knob here is chosen for the
1000-executor / 100 TB deployment the engine targets:

- AQE on (runtime join-strategy switches, skew-join splitting, partition
  coalescing) — replaces the reference's reliance on ClickHouse's internal
  planner (SURVEY.md §4).
- Arrow enabled for the few pandas-UDF operators (similarity / multimodal).
- Shuffle partition count is a *default*; jobs that know their output
  cardinality repartition explicitly.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

DEFAULT_SHUFFLE_PARTITIONS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))


def get_spark(
    app_name: str = "neo4j_to_clickhouse_spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or reuse) a SparkSession tuned for the event-log workload.

    At cluster scale the same configs apply; only ``master`` changes. The
    conf choices map to reference behaviors:

    - ``spark.sql.adaptive.*``: ClickHouse picks join/agg strategy at run
      time inside the server; AQE is Spark's equivalent (SURVEY.md §4).
    - ``spark.sql.shuffle.partitions``: sized so a shuffle partition at
      target SF fits in executor memory; AQE coalesces when over-provisioned.
    - ``spark.sql.files.maxPartitionBytes`` 128m: parquet scan granularity,
      the analogue of MergeTree ``index_granularity`` scan blocks
      (`clickhouse/init/01-init-tables.sql:20`).
    - session timezone pinned to UTC so event-time semantics are stable
      across driver/executor locales (the reference stores UTC DateTime64,
      `clickhouse/init/01-init-tables.sql:11`).
    """
    n = shuffle_partitions or DEFAULT_SHUFFLE_PARTITIONS
    builder = (
        SparkSession.builder.appName(app_name)
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.shuffle.partitions", str(n))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        .config("spark.sql.files.maxPartitionBytes", str(128 * 1024 * 1024))
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.parquet.compression.codec", "snappy")
        .config("spark.sql.sources.partitionOverwriteMode", "dynamic")
        # event_month is a 'yyyyMM' STRING by contract (schemas.py); without
        # this, reading the partitioned table back infers it as int.
        .config("spark.sql.sources.partitionColumnTypeInference.enabled", "false")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g"))
    )
    if master:
        builder = builder.master(master)
    elif not SparkSession.getActiveSession():
        cpus = os.environ.get("SPARK_GRAFT_CPUS", "*")
        builder = builder.master(f"local[{cpus}]")
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    return builder.getOrCreate()
