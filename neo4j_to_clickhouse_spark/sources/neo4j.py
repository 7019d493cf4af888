"""Neo4j graph source (SURVEY.md §2.1 S8-S9): the snapshot-export path as
a direct Spark read.

The reference snapshots the graph through APOC CSV exports staged to disk
(`initial-load/scripts/01-export-nodes.cypher`, `02-export-relationships.cypher`)
and a pandas loader. The Spark-native replacement reads the graph straight
into DataFrames with the public Neo4j Spark Connector
(``org.neo4j.spark.DataSource``), sharding exactly the way the reference's
id-range export variants do (`01-export-nodes.cypher:112-145`):
``partitions`` splits the Cypher read into concurrent range queries.

The connector jar is not in this container, so these builders are gated —
they assemble the reader declaratively and ``.load()`` executes on
clusters that add ``org.neo4j:neo4j-connector-apache-spark``. The CSV
drop path (:mod:`.snapshot`) remains the dependency-free default; both
feed the same SNAPSHOT event synthesis.
"""

from __future__ import annotations

from pyspark.sql import DataFrameReader, SparkSession

NEO4J_FORMAT = "org.neo4j.spark.DataSource"


def _base(
    spark: SparkSession, url: str, partitions: int, options: dict[str, str] | None
) -> DataFrameReader:
    reader = (
        spark.read.format(NEO4J_FORMAT)
        .option("url", url)
        .option("partitions", str(partitions))
    )
    for k, v in (options or {}).items():
        reader = reader.option(k, v)
    return reader


def neo4j_nodes_reader(
    spark: SparkSession,
    url: str,
    labels: str = "",
    partitions: int = 32,
    options: dict[str, str] | None = None,
) -> DataFrameReader:
    """All nodes (or one ``:Label``) with elementId, labels, properties —
    the projection of `01-export-nodes.cypher:14-17`. Empty ``labels``
    reads the whole graph like the pattern ``()`` connector config
    (`kafka-connect/neo4j-cdc-nodes-source.json:10`)."""
    query = (
        "MATCH (n"
        + (f":{labels}" if labels else "")
        + ") RETURN elementId(n) AS entity_id, labels(n) AS labels, "
        "properties(n) AS properties"
    )
    return _base(spark, url, partitions, options).option("query", query)


def neo4j_relationships_reader(
    spark: SparkSession,
    url: str,
    rel_type: str = "",
    partitions: int = 32,
    options: dict[str, str] | None = None,
) -> DataFrameReader:
    """All relationships (or one type) with endpoints — the projection of
    `02-export-relationships.cypher:14-19`."""
    query = (
        "MATCH (a)-[r"
        + (f":{rel_type}" if rel_type else "")
        + "]->(b) RETURN elementId(r) AS entity_id, type(r) AS relationship_type, "
        "elementId(a) AS source_id, elementId(b) AS target_id, "
        "properties(r) AS properties"
    )
    return _base(spark, url, partitions, options).option("query", query)
