"""Raw CDC envelope source: JSON text -> structured envelope rows.

Spark analogue of the ClickHouse Kafka-engine tables that land each message
as one raw String (``kafka_format='JSONAsString'``,
`clickhouse/init/01-init-tables.sql:40-49,52-61`). Batch and streaming share
the same parse: the input is a DataFrame with a single ``raw`` string column,
whether it came from ``spark.read.text``, ``spark.readStream.text`` or
``kafka`` (``CAST(value AS STRING)``).

Malformed JSON parses to a NULL struct instead of failing — that NULL is the
quarantine signal (SURVEY.md §2.9 M5; the reference recovers stuck consumers
manually, `docs/ISSUES-AND-FIXES.md:188-205` — we route poison rows instead).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from neo4j_to_clickhouse_spark.schemas import ENVELOPE_SCHEMA

RAW_COL = "raw"
PARSED_COL = "envelope"


def read_envelope_file(
    spark: SparkSession, path: str, streaming: bool = False
) -> DataFrame:
    """Read newline-delimited envelope JSON as a one-column ``raw`` frame.

    The file source stands in for Kafka in tests exactly as the reference's
    test scenarios stand in for production traffic (SURVEY.md §5); swap in
    :func:`neo4j_to_clickhouse_spark.sources.kafka.read_kafka_envelopes` for
    the real topic.
    """
    reader = spark.readStream if streaming else spark.read
    return reader.text(path).withColumnRenamed("value", RAW_COL)


def parse_envelopes(raw_df: DataFrame) -> DataFrame:
    """``raw`` JSON strings -> (raw, envelope struct) rows.

    ``from_json`` in PERMISSIVE mode returns NULL for undecodable text;
    downstream ingest splits on ``envelope IS NULL`` for the quarantine path.
    Keeping ``raw`` alongside matches the reference's decision to store the
    raw envelope in ``metadata`` (`clickhouse/init/01-init-tables.sql:89,117`).
    """
    return raw_df.withColumn(
        PARSED_COL, F.from_json(F.col(RAW_COL), ENVELOPE_SCHEMA)
    )
