"""ANN scale-path crossover probe (VERDICT r07 item 3).

Two questions the correctness gate certifies but never times:

1. **PQ-ADC vs exact brute force** — `pq_adc_topk` exists so that, once
   the corpus is quantized, a search touches m small ints per vector
   instead of the full dimension. Exact `euclidean_topk_flat` is one
   broadcast-GEMM corpus scan, so at toy scale it wins; the probe
   records both, with the one-time PQ fit separated from the amortized
   per-search cost (the production shape: fit once, persist codes,
   search forever).

2. **SemDeDup over exact vs LSH candidate pairs** — the survivor
   algebra is identical; only candidate generation changes from the
   O(n²) all-pairs GEMM to hyperplane-LSH buckets. The probe times the
   registered per-label retention rollup over both pair sources and
   records each source's pair count (LSH recall < 1 by design — the
   scale path trades a bounded miss rate for bucketed candidates).

   The LSH hash length is matched to the probed threshold: a bucket
   collision needs all ``bits`` hyperplane signs to agree, probability
   ``(1 - arccos(t)/pi) ** bits`` per table — the default 16 bits is
   tuned for the t>=0.9 near-dup regime (p=0.58/table) and collapses to
   p=6e-4 at this fixture's t=0.4, so the probe uses 4-bit hashes
   (p=0.16/table, ~75% recall over 8 tables) and records the recall it
   actually bought. Shorter hashes mean bigger buckets — THAT is the
   crossover being measured.

Usage: python tools/bench_ann_crossover.py [sf ...]   (default 0.01 0.1)
Prints one JSON line.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from neo4j_to_clickhouse_spark.operators import similarity as S
from neo4j_to_clickhouse_spark.session import get_spark

ROOT = os.environ.get("SPARK_GRAFT_TESTDATA", "/root/testdata")
N_QUERIES = 25
K = 10


def timed(label, thunk, runs=2):
    best = float("inf")
    for _ in range(runs):
        t0 = time.perf_counter()
        thunk()
        best = min(best, time.perf_counter() - t0)
    print(f"# {label}: {best:.3f}s", file=sys.stderr)
    return round(best, 3)


def consume(sdf):
    sdf.collect()


def main() -> None:
    sfs = sys.argv[1:] or ["0.01", "0.1"]
    spark = get_spark(
        "bench-ann-crossover",
        master=f"local[{os.environ.get('SPARK_GRAFT_CPUS', '32')}]",
        shuffle_partitions=32,
    )
    out: dict[str, dict] = {}
    for sf in sfs:
        emb = spark.read.parquet(f"{ROOT}/sf{sf}/embeddings.parquet")
        n = emb.count()
        queries = emb.orderBy("vec_id").limit(N_QUERIES).localCheckpoint()
        res: dict[str, float | int] = {"n_vectors": n}

        res["exact_topk"] = timed(
            f"sf{sf} exact euclidean top-{K}",
            lambda: consume(S.euclidean_topk_flat(emb, queries, k=K)),
        )
        res["pq_fit_plus_search"] = timed(
            f"sf{sf} PQ fit+ADC search",
            lambda: consume(S.pq_adc_topk(emb, queries, k=K)),
        )
        cent, codes = S.pq_fit(emb)
        fitted = (cent.localCheckpoint(), codes.localCheckpoint())
        res["pq_search_amortized"] = timed(
            f"sf{sf} ADC search (codes cached)",
            lambda: consume(S.pq_adc_topk(emb, queries, k=K, fitted=fitted)),
        )

        def survivors(pairs):
            return (
                S.semantic_dedup_survivors(emb, pairs=pairs, threshold=0.4)
                .groupBy("label")
                .agg(
                    F.count("*").alias("n"),
                    F.sum(F.col("is_survivor").cast("long")).alias("surv"),
                )
            )

        res["semdedup_exact_pairs"] = timed(
            f"sf{sf} SemDeDup exact all-pairs",
            lambda: consume(survivors(None)),
        )
        lsh_pairs = S.lsh_near_duplicates(
            emb, threshold=0.4, bits=4
        ).localCheckpoint()
        res["semdedup_lsh_pairs"] = timed(
            f"sf{sf} SemDeDup over LSH candidates",
            lambda: consume(survivors(lsh_pairs)),
        )
        res["pairs_exact"] = S.cosine_near_duplicates(emb, threshold=0.4).count()
        res["pairs_lsh"] = lsh_pairs.count()
        out[sf] = res
        spark.catalog.clearCache()

    print(
        json.dumps(
            {"metric": "ann_crossover", "unit": "sec", "by_sf": out}
        )
    )


if __name__ == "__main__":
    main()
