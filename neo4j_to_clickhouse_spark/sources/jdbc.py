"""JDBC source/sink: the batch-transfer path between external stores.

BASELINE.json's stated approach for Neo4j↔columnar-store migration is
"DataFrame reads + JDBC writes". This module supplies that surface with
the reference's operational parameters baked in as defaults:

- write batch size 100,000 rows — the bulk loader's insert batch
  (`initial-load/scripts/03-bulk-import.py:29`);
- partitioned reads by an id-range column — the export scripts' id-range
  sharding (`initial-load/scripts/01-export-nodes.cypher:112-145`,
  `02-export-relationships.cypher:120-157`) expressed as Spark's native
  ``partitionColumn/lowerBound/upperBound/numPartitions`` split, which
  gives one concurrent cursor per shard exactly like the reference's
  per-range export files.

No JDBC driver jar ships in this container, so these build the
reader/writer declaratively; ``.load()``/``.save()`` execute only where a
driver is on the classpath (cluster deploys add
``spark.jars.packages=com.clickhouse:clickhouse-jdbc:...`` or the
vendor's driver).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, DataFrameReader, SparkSession

# `initial-load/scripts/03-bulk-import.py:29` — BATCH_SIZE = 100_000
DEFAULT_BATCH_SIZE = 100_000


def jdbc_reader_sharded(
    spark: SparkSession,
    url: str,
    table: str,
    partition_column: str,
    lower_bound: int,
    upper_bound: int,
    num_partitions: int = 32,
    fetch_size: int = 10_000,
    options: dict[str, str] | None = None,
) -> DataFrameReader:
    """Sharded JDBC read: `num_partitions` concurrent range cursors over
    ``partition_column`` — the id-range export pattern. ``fetch_size``
    10,000 mirrors the reference's export batchSize
    (`01-export-nodes.cypher:20`). Call ``.load()`` to execute.
    """
    reader = (
        spark.read.format("jdbc")
        .option("url", url)
        .option("dbtable", table)
        .option("partitionColumn", partition_column)
        .option("lowerBound", str(lower_bound))
        .option("upperBound", str(upper_bound))
        .option("numPartitions", str(num_partitions))
        .option("fetchsize", str(fetch_size))
    )
    for k, v in (options or {}).items():
        reader = reader.option(k, v)
    return reader


def jdbc_writer(
    df: DataFrame,
    url: str,
    table: str,
    mode: str = "append",
    batch_size: int = DEFAULT_BATCH_SIZE,
    options: dict[str, str] | None = None,
):
    """Bulk JDBC write: one batched insert stream per partition, batch size
    defaulting to the reference's 100k-row insert blocks. Repartition the
    frame upstream to control sink concurrency (each task holds one
    connection). Call ``.save()`` to execute.
    """
    writer = (
        df.write.format("jdbc")
        .mode(mode)
        .option("url", url)
        .option("dbtable", table)
        .option("batchsize", str(batch_size))
        .option("isolationLevel", "NONE")  # bulk-load posture, no XA cost
    )
    for k, v in (options or {}).items():
        writer = writer.option(k, v)
    return writer
