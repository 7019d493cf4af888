"""Schemas: CDC envelope, node/relationship event tables, snapshot CSVs.

The envelope structure mirrors the JSON the reference's Kafka Connect Neo4j
CDC source emits and that the ClickHouse materialized views pick apart with
``JSONExtract*`` (`clickhouse/init/01-init-tables.sql:64-70,93-96`). The event
tables mirror `nodes_cdc` / `relationships_cdc`
(`clickhouse/init/01-init-tables.sql:8-20,23-37`), unified with the batch
loader's `SNAPSHOT` event type
(`initial-load/scripts/03-bulk-import.py:112,189`) per SURVEY.md §0 caveat 2.
"""

from __future__ import annotations

from pyspark.sql import types as T

# Domain of event_type across streaming + batch paths. The reference splits
# this across an Enum8('INSERT','UPDATE','DELETE')
# (`clickhouse/init/01-init-tables.sql:10,25`) and a batch-only 'SNAPSHOT'
# (`initial-load/scripts/03-bulk-import.py:112`); we unify into one domain.
EVENT_TYPES = ("SNAPSHOT", "INSERT", "UPDATE", "DELETE")

# CDC operation vocabulary of the upstream connector; mapped to event types by
# the ingest transform (the reference's multiIf at
# `clickhouse/init/01-init-tables.sql:75-80`).
CDC_OPERATIONS = ("CREATE", "UPDATE", "DELETE")

NODE_EVENT_KIND = "NODE_EVENT"
REL_EVENT_KIND = "RELATIONSHIP_EVENT"


def _state_struct() -> T.StructType:
    # properties kept as raw JSON text — the reference stores them as String
    # and extracts lazily (`clickhouse/init/01-init-tables.sql:14-15`).
    return T.StructType(
        [
            T.StructField(
                "before",
                T.StructType([T.StructField("properties", T.StringType())]),
            ),
            T.StructField(
                "after",
                T.StructType([T.StructField("properties", T.StringType())]),
            ),
        ]
    )


# Raw CDC envelope (one JSON document per Kafka message / file line).
# Field-for-field the structure documented at
# `clickhouse/init/01-init-tables.sql:64-70` (nodes) and `:93-96` (rels).
ENVELOPE_SCHEMA = T.StructType(
    [
        T.StructField("id", T.StringType()),
        T.StructField(
            "metadata",
            T.StructType(
                [
                    T.StructField(
                        "txStartTime",
                        T.StructType([T.StructField("TZDT", T.StringType())]),
                    )
                ]
            ),
        ),
        T.StructField(
            "event",
            T.StructType(
                [
                    T.StructField("operation", T.StringType()),
                    T.StructField("eventType", T.StringType()),
                    T.StructField("elementId", T.StringType()),
                    T.StructField("labels", T.ArrayType(T.StringType())),
                    T.StructField("type", T.StringType()),
                    T.StructField(
                        "start",
                        T.StructType([T.StructField("elementId", T.StringType())]),
                    ),
                    T.StructField(
                        "end",
                        T.StructType([T.StructField("elementId", T.StringType())]),
                    ),
                    T.StructField("state", _state_struct()),
                ]
            ),
        ),
    ]
)

# Core node event table — Spark analogue of `nodes_cdc`
# (`clickhouse/init/01-init-tables.sql:8-20`). event_month is the derived
# partition column standing in for PARTITION BY toYYYYMM(event_timestamp).
NODE_EVENTS_SCHEMA = T.StructType(
    [
        T.StructField("event_id", T.StringType(), False),
        T.StructField("event_type", T.StringType(), False),
        T.StructField("event_timestamp", T.TimestampType(), False),
        T.StructField("entity_id", T.StringType(), False),
        T.StructField("labels", T.ArrayType(T.StringType())),
        T.StructField("properties_before", T.StringType()),
        T.StructField("properties_after", T.StringType()),
        T.StructField("metadata", T.StringType()),
        T.StructField("event_month", T.StringType()),
    ]
)

# Relationship event table — analogue of `relationships_cdc`
# (`clickhouse/init/01-init-tables.sql:23-37`).
REL_EVENTS_SCHEMA = T.StructType(
    [
        T.StructField("event_id", T.StringType(), False),
        T.StructField("event_type", T.StringType(), False),
        T.StructField("event_timestamp", T.TimestampType(), False),
        T.StructField("entity_id", T.StringType(), False),
        T.StructField("relationship_type", T.StringType(), False),
        T.StructField("source_id", T.StringType(), False),
        T.StructField("target_id", T.StringType(), False),
        T.StructField("properties_before", T.StringType()),
        T.StructField("properties_after", T.StringType()),
        T.StructField("metadata", T.StringType()),
        T.StructField("event_month", T.StringType()),
    ]
)

# Batch snapshot CSV schemas (`initial-load/scripts/01-export-nodes.cypher:14-17`,
# `02-export-relationships.cypher:14-19`). labels may arrive either as JSON
# array text or comma-separated (`03-bulk-import.py:82-89`).
SNAPSHOT_NODES_CSV_SCHEMA = T.StructType(
    [
        T.StructField("entity_id", T.StringType()),
        T.StructField("labels", T.StringType()),
        T.StructField("properties", T.StringType()),
        T.StructField("export_timestamp", T.LongType()),
    ]
)

SNAPSHOT_RELS_CSV_SCHEMA = T.StructType(
    [
        T.StructField("entity_id", T.StringType()),
        T.StructField("relationship_type", T.StringType()),
        T.StructField("source_id", T.StringType()),
        T.StructField("target_id", T.StringType()),
        T.StructField("properties", T.StringType()),
        T.StructField("export_timestamp", T.LongType()),
    ]
)

# Multimodal asset table (north-star extension, SURVEY.md §7 step 9): opaque
# binary payload + typed metadata, the standard layout for image/audio/video
# corpora at 100 TB (content-addressed, partitioned by modality/shard).
MULTIMODAL_SCHEMA = T.StructType(
    [
        T.StructField("asset_id", T.StringType(), False),
        T.StructField("modality", T.StringType(), False),  # image|audio|video
        T.StructField("media_type", T.StringType()),  # MIME
        T.StructField("payload", T.BinaryType()),
        T.StructField("n_bytes", T.LongType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("duration_ms", T.LongType()),
        T.StructField("sha256", T.StringType()),
    ]
)

# Names of the driver-provided benchmark tables (TESTDATA.md).
TESTDATA_TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)
