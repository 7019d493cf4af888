"""Graph-pattern operators over the event log (SURVEY.md §2.3 J2, §7 step 8).

The Cypher surface the log must answer — ``MATCH (a)-[r]->(b)`` — is the
edge table joined to the node table twice
(`initial-load/scripts/02-export-relationships.cypher:185-204`). Built on the
latest-state views so deleted entities/edges are excluded.

Scale: node latest-state is entity-count-sized (usually << event count).
For a two-hop the node side is joined twice — we broadcast it when small,
otherwise both joins shuffle on entity id; pre-bucketing node/edge tables by
entity id makes the second join shuffle-free.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from neo4j_to_clickhouse_spark.operators.latest_state import current_state


def two_hop(
    node_events: DataFrame,
    rel_events: DataFrame,
    broadcast_nodes: bool = True,
) -> DataFrame:
    """``(a)-[r]->(b)`` motif: one row per live edge with both endpoint
    states attached (J2). The node latest-state feeds BOTH endpoint joins;
    Catalyst won't reuse the differently-aliased subplans, so it is
    persisted — computed once, broadcast twice.

    Cache lifetime is caller-owned: the entry is keyed on the canonicalized
    plan, so repeated calls over the same input REUSE it (no accumulation);
    distinct inputs each hold one MEMORY_AND_DISK entry until LRU eviction
    or ``spark.catalog.clearCache()``. Same contract as
    :func:`..dedup.jaccard_pairs` / :func:`..dedup.minhash_lsh_dedup`."""
    nodes = current_state(node_events).select(
        F.col("entity_id"), F.col("labels"), F.col("properties_after")
    ).persist()
    edges = current_state(rel_events).select(
        F.col("entity_id").alias("edge_id"),
        F.col("relationship_type"),
        F.col("source_id"),
        F.col("target_id"),
        F.col("properties_after").alias("edge_properties"),
    )
    n = F.broadcast(nodes) if broadcast_nodes else nodes
    src = n.select(
        F.col("entity_id").alias("source_id"),
        F.col("labels").alias("source_labels"),
        F.col("properties_after").alias("source_properties"),
    )
    dst = n.select(
        F.col("entity_id").alias("target_id"),
        F.col("labels").alias("target_labels"),
        F.col("properties_after").alias("target_properties"),
    )
    return edges.join(src, "source_id", "inner").join(dst, "target_id", "inner")


def degree(
    rel_events: DataFrame, direction: str = "out", by_type: bool = False
) -> DataFrame:
    """Per-node degree over live edges — generalizes the reference's
    interfaces-per-device count (`initial-load/scripts/04-optimize-tables.sql:206-218`).
    Pre-aggregated on the edge side: shuffles counts, not edges.
    """
    edges = current_state(rel_events)
    key = "source_id" if direction == "out" else "target_id"
    groups = [key] + (["relationship_type"] if by_type else [])
    return (
        edges.groupBy(*groups)
        .agg(F.count("*").alias("degree"))
        .withColumnRenamed(key, "entity_id")
    )
