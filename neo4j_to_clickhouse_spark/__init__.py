"""neo4j_to_clickhouse_spark — PySpark-native CDC event-log analytics engine.

A from-scratch reimplementation of the capabilities of the reference
``maruthiprithivi/neo4j_to_clickhouse`` pipeline (Neo4j CDC -> Kafka ->
ClickHouse), re-expressed Spark-first:

- **Data model** (:mod:`.schemas`): append-only node/relationship change-event
  tables (envelope `StructType`, JSON property payloads), month-partitioned,
  time-sorted — the Spark analogue of the reference's MergeTree DDL
  (`clickhouse/init/01-init-tables.sql:8-37`).
- **Ingest** (:mod:`.operators.ingest`, :mod:`.sources`): raw CDC envelope JSON
  -> typed event rows, batch (snapshot CSV) and streaming (Kafka / file stream)
  — the analogue of the Kafka-engine tables + materialized views
  (`01-init-tables.sql:40-118`) and the bulk loader
  (`initial-load/scripts/03-bulk-import.py`).
- **Views** (:mod:`.operators.latest_state`): windowed latest-state /
  deduplication views replacing `OPTIMIZE TABLE ... FINAL`
  (`initial-load/scripts/04-optimize-tables.sql:26-48`).
- **Analytics** (:mod:`.operators.analytics`, :mod:`.operators.graph`): the
  full query surface inventoried in SURVEY.md §2 as composable DataFrame
  functions.
- **Maintenance** (:mod:`.operators.maintenance`): compaction and retention as
  explicit partition-level jobs (`README.md:582-584`).
- **Scale-out operators** (:mod:`.operators.dedup`, :mod:`.operators.similarity`,
  :mod:`.operators.text`, :mod:`.operators.multimodal`): LLM-training-data
  pipeline operators designed for 100 TB (MinHash-LSH dedup, ANN search,
  multimodal binary columns, text statistics).

Everything is declarative DataFrame API so Catalyst/AQE owns physical
planning; Python UDFs appear only where Spark lacks the primitive, and then
always as Arrow-batched pandas UDFs.
"""

__version__ = "0.1.0"

from neo4j_to_clickhouse_spark.session import get_spark  # noqa: F401
