"""Kafka streaming source config (SURVEY.md §2.1 S1-S3).

Maps the ClickHouse Kafka-engine settings
(`clickhouse/init/01-init-tables.sql:40-49,52-61`) and consumer config
(`clickhouse/config/config.xml:12-15`) onto Structured Streaming options.
The container has no Kafka broker or spark-sql-kafka package, so this module
only *builds* the reader; tests exercise the identical downstream transform
via the file source (:func:`..sources.envelopes.read_envelope_file`).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from neo4j_to_clickhouse_spark.sources.envelopes import RAW_COL

NODES_TOPIC = "neo4j-cdc-nodes"  # kafka-connect/neo4j-cdc-nodes-source.json:6
RELS_TOPIC = "neo4j-cdc-relationships"  # ...-relationships-source.json:6

# kafka_max_block_size=1048576 (`clickhouse/init/01-init-tables.sql:49,61`):
# per-poll batch cap -> maxOffsetsPerTrigger.
DEFAULT_MAX_OFFSETS_PER_TRIGGER = 1_048_576


def read_kafka_envelopes(
    spark: SparkSession,
    brokers: str,
    topic: str,
    starting_offsets: str = "earliest",  # auto_offset_reset (config.xml:12)
    max_offsets_per_trigger: int = DEFAULT_MAX_OFFSETS_PER_TRIGGER,
) -> DataFrame:
    """Kafka topic -> one-column ``raw`` streaming frame.

    ``startingOffsets=earliest`` + a checkpointed sink reproduces (and
    upgrades to exactly-once) the reference's replay-from-start at-least-once
    consumer (`clickhouse/config/config.xml:12-15`). One Spark task per Kafka
    partition; scale the topic's partition count, not the engine.
    """
    return (
        spark.readStream.format("kafka")
        .option("kafka.bootstrap.servers", brokers)
        .option("subscribe", topic)
        .option("startingOffsets", starting_offsets)
        .option("maxOffsetsPerTrigger", max_offsets_per_trigger)
        .option("failOnDataLoss", "false")
        .load()
        .select(F.col("value").cast("string").alias(RAW_COL))
    )
