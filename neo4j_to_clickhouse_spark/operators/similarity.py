"""Embedding similarity search (north star, SURVEY.md §7 step 9).

Operates on an ``array<float>`` embedding column. Two tiers:

- :func:`brute_force_topk` — exact cosine top-k, the correctness baseline.
  The dot product is a native ``aggregate(zip_with(...))`` fold (JVM-side,
  whole-stage codegen); the per-query top-k is a window rank, so the
  whole thing is broadcast-join + project + rank — no Python.
- :func:`ivf_topk` — the scale path: an IVF (inverted-file) index built
  from deterministic centroids; each vector is assigned to its nearest
  centroid once, queries probe only ``nprobe`` cells. At 100 TB this
  turns a full-corpus scan per query into a scan of
  ``nprobe/num_centroids`` of the corpus, with the centroid assignment
  amortized across all queries. Partitioning the corpus by ``cell``
  makes the probe a partition-pruned scan.

Cosine near-duplicate detection for dedup lives here too
(:func:`cosine_near_duplicates`) since it shares the machinery.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def dot(a: Column, b: Column) -> Column:
    """Native dot product over two array columns (JVM fold, no UDF)."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def norm(a: Column) -> Column:
    return F.sqrt(
        F.aggregate(
            F.transform(a, lambda x: x.cast("double") * x.cast("double")),
            F.lit(0.0),
            lambda acc, v: acc + v,
        )
    )


def cosine(a: Column, b: Column) -> Column:
    return dot(a, b) / (norm(a) * norm(b))


def with_norm(df: DataFrame, vec_col: str = "embedding") -> DataFrame:
    """Precompute the L2 norm once per vector — at scale norms are computed
    at ingest and stored, never recomputed per query."""
    return df.withColumn("__norm", norm(F.col(vec_col)))


def brute_force_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact cosine top-k: (query_id, neighbor_id, rank, cosine_sim).

    queries is broadcast (queries are few, the corpus is the big side);
    rank ties broken by neighbor id for determinism. Self-matches
    (same id) are excluded.
    """
    c = with_norm(corpus, vec_col).select(
        F.col(id_col).alias("neighbor_id"),
        F.col(vec_col).alias("__cv"),
        F.col("__norm").alias("__cn"),
    )
    q = with_norm(queries, vec_col).select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).alias("__qv"),
        F.col("__norm").alias("__qn"),
    )
    scored = (
        c.join(F.broadcast(q), F.col("query_id") != F.col("neighbor_id"))
        .withColumn(
            "cosine_sim",
            dot(F.col("__qv"), F.col("__cv")) / (F.col("__qn") * F.col("__cn")),
        )
        .select("query_id", "neighbor_id", "cosine_sim")
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine_sim").desc(), F.col("neighbor_id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "rank", "cosine_sim")
    )


def cosine_near_duplicates(
    df: DataFrame,
    threshold: float = 0.4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """All pairs with cosine >= threshold, a<b — embedding near-dup dedup.

    Brute self-join baseline. At 100 TB use :func:`assign_cells` first and
    only compare within a cell (plus neighboring cells for recall) — the
    same candidate-bounding trick as MinHash banding.
    """
    n = with_norm(df, vec_col)
    a = n.select(
        F.col(id_col).alias("id_a"), F.col(vec_col).alias("__va"), F.col("__norm").alias("__na")
    )
    b = n.select(
        F.col(id_col).alias("id_b"), F.col(vec_col).alias("__vb"), F.col("__norm").alias("__nb")
    )
    return (
        a.join(b, F.col("id_a") < F.col("id_b"))
        .withColumn(
            "cosine_sim",
            dot(F.col("__va"), F.col("__vb")) / (F.col("__na") * F.col("__nb")),
        )
        .filter(F.col("cosine_sim") >= threshold)
        .select("id_a", "id_b", "cosine_sim")
    )


# --- IVF (scale path) --------------------------------------------------------

def pick_centroids(
    corpus: DataFrame,
    num_centroids: int = 16,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Deterministic centroid selection: the `num_centroids` corpus vectors
    with the lowest xxhash64(id) — a seeded uniform sample with no RNG
    state, reproducible across runs/engines. (A k-means refinement loop
    can replace this without changing the probe path.)"""
    w = Window.orderBy(F.xxhash64(F.col(id_col)), F.col(id_col))
    return (
        corpus.withColumn("__r", F.row_number().over(w))
        .filter(F.col("__r") <= num_centroids)
        .select(
            F.col("__r").alias("cell"),
            F.col(vec_col).alias("centroid"),
        )
    )


def assign_cells(
    corpus: DataFrame,
    centroids: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Assign every corpus vector to its nearest centroid (max cosine).

    Broadcast the centroids (tiny), score all (vector, centroid) pairs,
    keep the argmax per vector — one narrow pass over the corpus. The
    result is the IVF index; at scale write it partitioned by ``cell``.
    """
    n = with_norm(corpus, vec_col)
    cent = with_norm(centroids, "centroid").select(
        "cell", F.col("centroid"), F.col("__norm").alias("__cn")
    )
    scored = n.crossJoin(F.broadcast(cent)).withColumn(
        "__sim",
        dot(F.col(vec_col), F.col("centroid")) / (F.col("__norm") * F.col("__cn")),
    )
    w = Window.partitionBy(id_col).orderBy(F.col("__sim").desc(), F.col("cell"))
    return (
        scored.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .select(F.col(id_col), F.col(vec_col), F.col("cell"))
    )


def ivf_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    num_centroids: int = 16,
    nprobe: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Approximate cosine top-k via IVF probing: each query scores only the
    vectors in its ``nprobe`` nearest cells. Same output shape as
    :func:`brute_force_topk`; recall governed by nprobe/num_centroids."""
    centroids = pick_centroids(corpus, num_centroids, id_col, vec_col)
    indexed = assign_cells(corpus, centroids, id_col, vec_col)
    # query -> nprobe candidate cells
    qn = with_norm(queries, vec_col)
    cent = with_norm(centroids, "centroid").select(
        "cell", "centroid", F.col("__norm").alias("__cn")
    )
    qcells_scored = qn.crossJoin(F.broadcast(cent)).withColumn(
        "__sim",
        dot(F.col(vec_col), F.col("centroid")) / (F.col("__norm") * F.col("__cn")),
    )
    wq = Window.partitionBy(id_col).orderBy(F.col("__sim").desc(), F.col("cell"))
    probes = (
        qcells_scored.withColumn("__rn", F.row_number().over(wq))
        .filter(F.col("__rn") <= nprobe)
        .select(
            F.col(id_col).alias("query_id"),
            F.col(vec_col).alias("__qv"),
            F.col("cell"),
        )
    )
    # probe: join queries to their cells' vectors only (cell equi-join —
    # partition-pruned when the index is stored partitioned by cell)
    cand = probes.join(
        indexed.select(
            F.col(id_col).alias("neighbor_id"),
            F.col(vec_col).alias("__cv"),
            F.col("cell"),
        ),
        "cell",
    ).filter(F.col("query_id") != F.col("neighbor_id"))
    scored = cand.withColumn(
        "cosine_sim", cosine(F.col("__qv"), F.col("__cv"))
    ).select("query_id", "neighbor_id", "cosine_sim")
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine_sim").desc(), F.col("neighbor_id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "rank", "cosine_sim")
    )
