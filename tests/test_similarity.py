"""Similarity-search tests: exact brute-force top-k correctness against a
NumPy oracle, IVF recall on clustered data, cosine near-dup pairs."""

from __future__ import annotations

import numpy as np
import pytest

from pyspark.sql import functions as F
from pyspark.sql import types as T

from neo4j_to_clickhouse_spark.operators import similarity as S

RNG = np.random.default_rng(7)
DIM = 8
N = 60


def _make_vectors():
    # three well-separated clusters so IVF probing has structure to find
    centers = RNG.normal(size=(3, DIM)) * 10
    rows = []
    for i in range(N):
        c = centers[i % 3]
        rows.append((i, (c + RNG.normal(size=DIM)).astype(float).tolist()))
    return rows


VECTORS = _make_vectors()


@pytest.fixture(scope="module")
def emb(spark):
    schema = T.StructType(
        [
            T.StructField("vec_id", T.LongType()),
            T.StructField("embedding", T.ArrayType(T.DoubleType())),
        ]
    )
    return spark.createDataFrame(VECTORS, schema)


def _numpy_topk(query_id: int, k: int = 5):
    vecs = {i: np.array(v) for i, v in VECTORS}
    q = vecs[query_id]
    sims = sorted(
        (
            (float(q @ v / (np.linalg.norm(q) * np.linalg.norm(v))), i)
            for i, v in vecs.items()
            if i != query_id
        ),
        key=lambda t: (-t[0], t[1]),
    )
    return [i for _, i in sims[:k]]


def test_brute_force_matches_numpy(emb):
    out = S.brute_force_topk(emb, emb.filter(F.col("vec_id") < 3), k=5)
    got = {}
    for r in out.orderBy("query_id", "rank").collect():
        got.setdefault(r.query_id, []).append(r.neighbor_id)
    for qid in range(3):
        assert got[qid] == _numpy_topk(qid), f"query {qid}"


def test_ivf_recall_on_clustered_data(emb):
    """With nprobe covering half the cells on clustered data, IVF top-1
    must agree with exact search for nearly all queries."""
    queries = emb.filter(F.col("vec_id") < 10)
    exact = {
        r.query_id: r.neighbor_id
        for r in S.brute_force_topk(emb, queries, k=1).collect()
    }
    approx = {
        r.query_id: r.neighbor_id
        for r in S.ivf_topk(emb, queries, k=1, num_centroids=6, nprobe=3).collect()
    }
    hits = sum(exact[q] == approx.get(q) for q in exact)
    assert hits >= 8, f"IVF top-1 recall too low: {hits}/10"


def test_cosine_near_duplicates_symmetric_pairs(spark):
    schema = T.StructType(
        [
            T.StructField("vec_id", T.LongType()),
            T.StructField("embedding", T.ArrayType(T.DoubleType())),
        ]
    )
    df = spark.createDataFrame(
        [
            (1, [1.0, 0.0, 0.0]),
            (2, [1.0, 0.001, 0.0]),  # ~identical to 1
            (3, [0.0, 1.0, 0.0]),  # orthogonal
        ],
        schema,
    )
    pairs = {(r.id_a, r.id_b) for r in S.cosine_near_duplicates(df, 0.99).collect()}
    assert pairs == {(1, 2)}


def test_dot_and_norm_expressions(spark):
    df = spark.createDataFrame([(1,)], ["x"]).select(
        S.dot(F.array(F.lit(1.0), F.lit(2.0)), F.array(F.lit(3.0), F.lit(4.0))).alias("d"),
        S.norm(F.array(F.lit(3.0), F.lit(4.0))).alias("n"),
    )
    row = df.collect()[0]
    assert row.d == 11.0
    assert row.n == 5.0


def test_lsh_near_duplicates_finds_planted_pairs(spark):
    """Hyperplane-LSH near-dup: planted near-identical vector pairs
    (cosine ~0.99) must be recovered; every emitted pair is exactly
    verified so results are a subset of the brute-force operator's."""
    import random

    random.seed(7)
    rows = []
    for i in range(60):
        v = [random.gauss(0, 1) for _ in range(32)]
        rows.append((i, v))
        if i < 10:  # plant a near-duplicate of the first 10
            rows.append((1000 + i, [x + random.gauss(0, 0.01) for x in v]))
    df = spark.createDataFrame(rows, ["vec_id", "embedding"]).select(
        "vec_id", F.col("embedding").cast("array<float>").alias("embedding")
    )
    lsh = {
        (r.id_a, r.id_b)
        for r in S.lsh_near_duplicates(df, threshold=0.95).collect()
    }
    brute = {
        (r.id_a, r.id_b)
        for r in S.cosine_near_duplicates(df, threshold=0.95).collect()
    }
    planted = {(i, 1000 + i) for i in range(10)}
    assert planted <= brute  # sanity: the pairs really are near-dups
    assert lsh <= brute  # exact verification -> no false positives
    assert len(lsh & planted) >= 8  # >=80% recall on planted dups


def test_refine_centroids_converges_to_cluster_means(spark):
    """Three well-separated clusters, 2 seeded centroids per cluster worth
    of initial picks: after refinement every vector's nearest centroid is
    in its own cluster, and cell means sit inside the cluster."""
    import random

    random.seed(11)
    centers = [[10.0 if d == c else 0.0 for d in range(8)] for c in range(3)]
    rows = []
    for i in range(90):
        c = i % 3
        rows.append(
            (i, [x + random.gauss(0, 0.2) for x in centers[c]])
        )
    df = spark.createDataFrame(rows, ["vec_id", "embedding"]).select(
        "vec_id", F.col("embedding").cast("array<float>").alias("embedding")
    )
    cent0 = S.pick_centroids(df, num_centroids=3)
    refined = S.refine_centroids(df, cent0, iterations=3)
    assigned = S.assign_cells(df, refined)
    # every cell must be pure: all members from one ground-truth cluster
    purity = (
        assigned.withColumn("truth", F.col("vec_id") % 3)
        .groupBy("cell")
        .agg(F.countDistinct("truth").alias("n_truths"))
        .collect()
    )
    assert all(r.n_truths == 1 for r in purity)
    assert len(purity) == 3  # no cluster lost


# --- certified Lloyd k-means (flat twin vs GEMM path) ------------------------

def _np_kmeans(V, lab, iterations):
    import numpy as np

    cells = sorted(set(lab.tolist()))
    C = np.array([V[lab == c].mean(axis=0) for c in cells])
    assign = None
    for _ in range(iterations + 1):
        D = ((V[:, None, :] - C[None, :, :]) ** 2).sum(axis=2)
        assign = np.array(cells)[np.argmin(D, axis=1)]
        C = np.array(
            [
                V[assign == c].mean(axis=0) if (assign == c).any() else C[i]
                for i, c in enumerate(cells)
            ]
        )
    return assign


def _fixture_embeddings(spark):
    import numpy as np

    df = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    rows = df.select("vec_id", "label", "embedding").collect()
    ids = np.array([r["vec_id"] for r in rows])
    lab = np.array([r["label"] for r in rows])
    V = np.array([list(r["embedding"]) for r in rows], dtype=np.float64)
    return df, ids, lab, V


def test_kmeans_report_matches_numpy_reference(spark):
    import numpy as np

    df, ids, lab, V = _fixture_embeddings(spark)
    assign = _np_kmeans(V, lab, iterations=2)
    out = {
        r["cell"]: (r["n_vecs"], r["n_own_label"])
        for r in S.kmeans_cells_report(
            df, "vec_id", "embedding", "label", iterations=2
        ).collect()
    }
    for c in sorted(set(lab.tolist())):
        n = int((assign == c).sum())
        own = int(((assign == c) & (lab == c)).sum())
        assert out[c] == (n, own), f"cell {c}"


def test_gemm_euclidean_path_matches_flat_assignments(spark):
    import numpy as np
    from pyspark.sql import functions as F

    df, ids, lab, V = _fixture_embeddings(spark)
    expected = dict(zip(ids.tolist(), _np_kmeans(V, lab, 0).tolist()))
    # label-mean centroids as the GEMM path consumes them
    cent = (
        df.select("label", F.posexplode("embedding").alias("pos", "v"))
        .groupBy(F.col("label").alias("cell"), "pos")
        .agg((F.sum(F.col("v").cast("double")) / F.count("*")).alias("m"))
        .groupBy("cell")
        .agg(
            F.array_sort(
                F.collect_list(F.struct(F.col("pos"), F.col("m")))
            ).alias("__a")
        )
        .select(
            "cell",
            F.transform("__a", lambda x: x["m"].cast("float")).alias(
                "centroid"
            ),
        )
    )
    assigned = S.assign_cells(df, cent, metric="euclidean")
    got = {r["vec_id"]: r["cell"] for r in assigned.collect()}
    # float32 centroid truncation shifts distances ~1e-8, far below the
    # fixture's measured >=1.2e-4 assignment margin — must agree exactly
    assert got == expected


def test_assign_cells_rejects_unknown_metric(spark):
    df, *_ = _fixture_embeddings(spark)
    import pytest as _pytest

    with _pytest.raises(ValueError):
        S.assign_cells(df, df.limit(1), metric="manhattan")


def test_semantic_dedup_survivors_keep_lowest(emb):
    """Every near-dup pair's higher id is dropped; lowest id of each
    neighborhood survives — pinned against numpy pairwise cosine."""
    thr = 0.9
    vecs = {i: np.array(v) for i, v in VECTORS}
    dropped = set()
    for a in vecs:
        for b in vecs:
            if a < b:
                sim = float(
                    vecs[a] @ vecs[b]
                    / (np.linalg.norm(vecs[a]) * np.linalg.norm(vecs[b]))
                )
                if sim >= thr:
                    dropped.add(b)
    out = {
        r["vec_id"]: r["is_survivor"]
        for r in S.semantic_dedup_survivors(emb, threshold=thr).collect()
    }
    assert set(out) == set(vecs)
    for i in vecs:
        assert out[i] == (i not in dropped), f"vec {i}"


def test_quantize_embeddings_matches_numpy(emb):
    rows = S.quantize_embeddings(emb, "vec_id", "embedding").collect()
    V = np.array([v for _, v in VECTORS], dtype=float)
    ids = [i for i, _ in VECTORS]
    vmin, vmax = V.min(axis=0), V.max(axis=0)
    got = {(r["vec_id"], r["dim"]): r["code"] for r in rows}
    assert len(got) == V.size
    for r_i, i in enumerate(ids):
        for d in range(V.shape[1]):
            span = vmax[d] - vmin[d]
            exp = (
                0
                if span == 0
                else int(np.floor((V[r_i, d] - vmin[d]) / span * 255 + 0.5))
            )
            assert got[(i, d)] == exp, f"vec {i} dim {d}"
            assert 0 <= got[(i, d)] <= 255


def _np_pq(V, lab, m, iterations):
    import numpy as np

    n, D = V.shape
    w = D // m
    assigns = np.zeros((n, m), dtype=int)
    for s in range(m):
        X = V[:, s * w : (s + 1) * w]
        cells = sorted(set(lab.tolist()))
        cent = {c: X[lab == c].mean(axis=0) for c in cells}
        a = None
        for _ in range(iterations + 1):
            dist = np.stack(
                [((X - cent[c]) ** 2).sum(axis=1) for c in cells], axis=1
            )
            a = np.array([cells[i] for i in dist.argmin(axis=1)])
            cent = {
                c: X[a == c].mean(axis=0) for c in cells if (a == c).any()
            }
            cells = sorted(cent)
        assigns[:, s] = a
    return assigns


def test_pq_report_matches_numpy_reference(spark):
    import numpy as np

    df, ids, lab, V = _fixture_embeddings(spark)
    assigns = _np_pq(V, lab, m=4, iterations=1)
    out = {
        (r["sub"], r["cell"]): (r["n_vecs"], r["n_own_label"])
        for r in S.pq_report(
            df, "vec_id", "embedding", "label", m=4, iterations=1
        ).collect()
    }
    for s in range(4):
        for c in sorted(set(assigns[:, s].tolist())):
            n = int((assigns[:, s] == c).sum())
            own = int(((assigns[:, s] == c) & (lab == c)).sum())
            assert out[(s, c)] == (n, own), f"sub {s} cell {c}"


def test_pq_adc_topk_fitted_matches_inline_fit(spark):
    """pq_adc_topk(fitted=pq_fit(...)) must return exactly the inline-fit
    result — the amortized production shape (fit once, persist codes,
    search many) cannot drift from the certified one-shot form."""
    from neo4j_to_clickhouse_spark.operators import similarity as S

    df, ids, lab, V = _fixture_embeddings(spark)
    queries = df.orderBy("vec_id").limit(3)
    inline = sorted(
        (r.query_id, r.neighbor_id, r.rank)
        for r in S.pq_adc_topk(df, queries, k=4).collect()
    )
    fitted = S.pq_fit(df)
    amortized = sorted(
        (r.query_id, r.neighbor_id, r.rank)
        for r in S.pq_adc_topk(df, queries, k=4, fitted=fitted).collect()
    )
    assert inline == amortized and len(inline) > 0
