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


def triangle_count(
    edges: DataFrame, src: str = "src", dst: str = "dst"
) -> DataFrame:
    """Exact triangle count of an undirected graph, degree-ordered.

    The naive three-way edge self-join enumerates every wedge at a hub
    vertex — a single celebrity node with degree d contributes d^2 join
    rows and the job dies at scale. The standard fix (node-iterator with
    degree ordering): orient each undirected edge from its lower-degree
    endpoint to its higher-degree endpoint (ties by id), then join
    oriented wedges ``u->v, u->w (v<w by the same order)`` against the
    oriented edge set. Every triangle is counted exactly once from its
    lowest-degree corner, and per-vertex join fan-out is bounded by that
    vertex's ORIENTED out-degree, which is O(sqrt(E)) for any graph —
    the hub's d^2 blowup cannot happen.

    Input may contain duplicates, self-loops, or both edge directions;
    all are canonicalized away. Returns a single-row frame
    ``(n_triangles)``.
    """
    e = (
        edges.select(
            F.least(F.col(src), F.col(dst)).alias("a"),
            F.greatest(F.col(src), F.col(dst)).alias("b"),
        )
        .filter(F.col("a") != F.col("b"))
        .distinct()
    )
    deg = (
        e.select(F.col("a").alias("n"))
        .unionAll(e.select(F.col("b").alias("n")))
        .groupBy("n")
        .agg(F.count("*").alias("d"))
    )
    da = deg.select(F.col("n").alias("a"), F.col("d").alias("da"))
    db = deg.select(F.col("n").alias("b"), F.col("d").alias("db"))
    # orient low-degree -> high-degree (ties by id): (u, v) with u "before" v
    oriented = (
        e.join(da, "a")
        .join(db, "b")
        .select(
            F.when(
                (F.col("da") < F.col("db"))
                | ((F.col("da") == F.col("db")) & (F.col("a") < F.col("b"))),
                F.struct(F.col("a").alias("u"), F.col("b").alias("v")),
            )
            .otherwise(
                F.struct(F.col("b").alias("u"), F.col("a").alias("v"))
            )
            .alias("o")
        )
        .select("o.u", "o.v")
    )
    w1 = oriented.select(F.col("u"), F.col("v").alias("x"))
    w2 = oriented.select(F.col("u"), F.col("v").alias("y"))
    wedges = w1.join(w2, "u").filter(F.col("x") < F.col("y"))
    # a wedge (x, y), x<y by id, closes iff the undirected edge {x, y}
    # exists — which is exactly a row of the canonical edge set
    closing = e.select(F.col("a").alias("x"), F.col("b").alias("y"))
    return wedges.join(closing, ["x", "y"]).agg(
        F.count("*").alias("n_triangles")
    )


def pagerank(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    damping: float = 0.85,
    iterations: int = 10,
    checkpoint_every: int = 4,
) -> DataFrame:
    """Directed PageRank by fixed-iteration power method: (node, rank),
    ranks summing to ~1. Centrality over a domain/citation graph is a
    standard crawl-quality signal in training-data curation (the role
    harmonic/PageRank centrality plays in public Common Crawl
    pipelines), which is why it lives here rather than in a graph
    library.

    Scale shape per iteration: one join of the edge list with the
    rank-per-source frame (shuffles ranks, not edges, when the edge list
    is pre-partitioned by ``src``), one sum-aggregate on ``dst``, and a
    1-row dangling-mass aggregate cross-joined back (no driver
    collect). Lineage is cut with ``localCheckpoint`` every
    ``checkpoint_every`` iterations — without it the iterated plan grows
    exponentially and the optimizer itself becomes the bottleneck
    (same pattern as :func:`..dedup.duplicate_clusters`).

    Deterministic: fixed iteration count, no convergence test (a
    convergence test needs a per-iteration action; callers wanting one
    can run ``iterations=1`` in their own loop).
    """
    if not 0 < damping < 1:
        raise ValueError(f"damping must be in (0, 1), got {damping}")
    if iterations < 1:
        raise ValueError(f"iterations must be >= 1, got {iterations}")
    e = edges.select(F.col(src).alias("s"), F.col(dst).alias("t")).distinct()
    nodes = (
        e.select(F.col("s").alias("node"))
        .union(e.select(F.col("t").alias("node")))
        .distinct()
        .persist()
    )
    n_total = nodes.agg(F.count("*").alias("__n"))
    outdeg = e.groupBy("s").agg(F.count("*").alias("__od"))
    rank = nodes.crossJoin(n_total).select(
        "node", (F.lit(1.0) / F.col("__n")).alias("rank")
    )
    for i in range(iterations):
        with_deg = rank.join(
            outdeg, rank["node"] == outdeg["s"], "left"
        ).select("node", "rank", "__od")
        dangling = with_deg.filter(F.col("__od").isNull()).agg(
            F.coalesce(F.sum("rank"), F.lit(0.0)).alias("__dm")
        )
        contribs = (
            e.join(with_deg.filter(F.col("__od").isNotNull()),
                   e["s"] == F.col("node"))
            .select(F.col("t").alias("node"),
                    (F.col("rank") / F.col("__od")).alias("__c"))
            .groupBy("node")
            .agg(F.sum("__c").alias("__in"))
        )
        rank = (
            nodes.join(contribs, "node", "left")
            .crossJoin(n_total)
            .crossJoin(dangling)
            .select(
                "node",
                (
                    (1.0 - damping) / F.col("__n")
                    + damping
                    * (F.coalesce(F.col("__in"), F.lit(0.0))
                       + F.col("__dm") / F.col("__n"))
                ).alias("rank"),
            )
        )
        if (i + 1) % checkpoint_every == 0 and i + 1 < iterations:
            rank = rank.localCheckpoint(eager=True)
    # Eagerly checkpoint the final (node, rank) frame — one small row per
    # node — so the cached ``nodes`` frame can be released here instead
    # of accumulating silently across calls on distinct graphs in a long
    # session (ADVICE r05). The returned plan has no lazy reference left.
    rank = rank.localCheckpoint(eager=True)
    nodes.unpersist()
    return rank
