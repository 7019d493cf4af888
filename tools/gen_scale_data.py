"""Synthesize a K-times-larger replica of a test fixture for scale probes.

The driver fixtures stop at sf0.1 (~600k lineitem rows), so the measured
scale curves in docs/SCALING.md fit their exponents on a single decade
(sf0.01 -> sf0.1). This tool manufactures sf1-class (or larger) inputs
from sf0.1 by replicating every non-dimension table K times with
KEY-REMAPPED replicas, letting `tools/bench_scale_curve.py --extra`
extend the fit one or two decades further.

Faithfulness contract (documented, not hidden):
- per-key history/group sizes are PRESERVED (each replica remaps its
  keys into a disjoint range, so users gain no extra events, orders no
  extra lines, baskets no extra items — the per-group distributions that
  drive window/self-join costs are those of the source fixture);
- global cardinalities scale by K (users, orders, documents, vectors);
- region/nation stay as-is (dimensions);
- timestamps are untouched: K-times the events in the same wall-clock
  window models a busier deployment, which is the scale story.

Two corpus-growth models for the similarity-bearing columns
(documents.text, embeddings.embedding) — pick per probe, because they
answer different questions:

- mode=rotate (default): replica text is the source text with tokens
  CYCLED by the replica index; embeddings get a micro-offset on dim 0.
  Replicas are not exact duplicates but remain NEAR-duplicates of each
  other (a rotation preserves all but ~w wrap-crossing shingles), so
  duplicate density grows with K: every source doc becomes a K-clone
  near-dup cluster whose true pair count is K(K-1)/2. This models
  boilerplate/mirror growth — the adversarial regime for dedup
  operators — and any correct pair-emitting detector has
  quadratically growing OUTPUT on it by construction. Use it to probe
  guard paths (caps, banding); don't read a super-linear exponent on
  it as an operator flaw when the truth itself is quadratic.
- mode=permute: replica text tokens are deterministically PERMUTED by
  a replica-seeded hash ordering; embedding dims likewise permuted.
  Token/dim multisets, lengths, and norms are exactly preserved, but
  shingle-level and cosine similarity across replicas collapses to
  chance, so duplicate density per document stays that of the source
  corpus as K grows. This models "a plain 10x bigger corpus" — the
  right regime for asymptotic exponent fits of dedup/similarity
  operators whose output should stay linear.

The output is for TIMING ONLY — result values are synthetic; the
correctness gate never runs here.

Usage: python tools/gen_scale_data.py [K] [src_dir] [out_dir] [mode]
Defaults: K=10, src=/root/testdata/sf0.1,
out=/tmp/spark_graft_sf_x<K>[p], mode=rotate.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from neo4j_to_clickhouse_spark.session import get_spark

TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]

# BIGINT key columns remapped per replica: key + replica * OFFSET keeps
# every replica's keyspace disjoint (source keys are far below 10^12).
_OFFSET = 10**12
_KEY_COLS = {
    "customer": ["c_custkey"],
    "supplier": ["s_suppkey"],
    "part": ["p_partkey"],
    "orders": ["o_orderkey", "o_custkey"],
    "lineitem": ["l_orderkey", "l_partkey", "l_suppkey"],
    "events": ["event_id", "user_id"],
    "documents": ["doc_id"],
    "embeddings": ["vec_id"],
}


def _hash_permuted(arr, r_col):
    """A deterministic replica-seeded permutation of an array column:
    each element sorts by md5(value|position|replica), so the multiset
    is exactly preserved while the order is effectively random and
    differs per replica."""
    keyed = F.transform(
        arr,
        lambda x, i: F.struct(
            F.md5(
                F.concat_ws(
                    "|",
                    x.cast("string"),
                    i.cast("string"),
                    r_col.cast("string"),
                )
            ).alias("k"),
            x.alias("v"),
        ),
    )
    return F.transform(F.array_sort(keyed), lambda s: s["v"])


def scale_table(spark, src: str, name: str, k: int, mode: str = "rotate"):
    if mode not in ("rotate", "permute"):
        raise ValueError(f"unknown mode {mode!r}")
    df = spark.read.parquet(os.path.join(src, f"{name}.parquet"))
    if name in ("region", "nation") or k == 1:
        return df
    reps = F.explode(F.array(*[F.lit(i) for i in range(k)])).alias("__r")
    out = df.select("*", reps)
    for col in _KEY_COLS.get(name, []):
        out = out.withColumn(
            col, F.col(col) + F.col("__r").cast("long") * F.lit(_OFFSET)
        )
    if name == "documents" and mode == "rotate":
        # rotate tokens by the replica index: same token statistics,
        # no exact cross-replica duplicate texts (replicas stay
        # near-duplicates — duplicate density grows with K)
        out = (
            out.withColumn("__t", F.split(F.col("text"), " "))
            .withColumn("__n", F.size("__t"))
            .withColumn("__s", (F.col("__r") % F.col("__n")) + 1)
            .withColumn(
                "text",
                F.when(F.col("__r") == 0, F.col("text")).otherwise(
                    F.concat_ws(
                        " ",
                        F.slice(
                            "__t", F.col("__s"), F.col("__n") - F.col("__s") + 1
                        ),
                        F.slice("__t", F.lit(1), F.col("__s") - 1),
                    )
                ),
            )
            .drop("__t", "__n", "__s")
        )
    elif name == "documents":
        # permute tokens: multiset/length preserved exactly, shingle
        # overlap across replicas collapses to chance (duplicate
        # density stays that of the source corpus)
        out = out.withColumn(
            "text",
            F.when(F.col("__r") == 0, F.col("text")).otherwise(
                F.concat_ws(
                    " ",
                    _hash_permuted(F.split(F.col("text"), " "), F.col("__r")),
                )
            ),
        )
    if name == "embeddings" and mode == "rotate":
        out = out.withColumn(
            "embedding",
            F.transform(
                "embedding",
                lambda x, i: F.when(
                    i == 0,
                    x + F.col("__r").cast("float") * F.lit(1e-3),
                ).otherwise(x).cast("float"),
            ),
        )
    elif name == "embeddings":
        # permute dims: norm and value multiset preserved exactly,
        # cross-replica cosine collapses to chance
        out = out.withColumn(
            "embedding",
            F.when(F.col("__r") == 0, F.col("embedding")).otherwise(
                _hash_permuted(F.col("embedding"), F.col("__r"))
            ),
        )
    return out.drop("__r").select(*df.columns)


def main() -> None:
    k = int(sys.argv[1]) if len(sys.argv) > 1 else 10
    src = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.1"
    mode = sys.argv[4] if len(sys.argv) > 4 else "rotate"
    out_dir = (
        sys.argv[3]
        if len(sys.argv) > 3 and sys.argv[3] != "-"
        else f"/tmp/spark_graft_sf_x{k}{'p' if mode == 'permute' else ''}"
    )
    spark = get_spark("gen_scale_data")
    os.makedirs(out_dir, exist_ok=True)
    for name in TABLES:
        dest = os.path.join(out_dir, f"{name}.parquet")
        scale_table(spark, src, name, k, mode).write.mode(
            "overwrite"
        ).parquet(dest)
        print(f"{name}: -> {dest}")
    print(out_dir)


if __name__ == "__main__":
    main()
