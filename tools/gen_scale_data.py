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
- document text is ROTATED by the replica index (tokens cycled), so
  token/length statistics are identical per replica but replicas do not
  collapse into exact duplicates of each other (which would degenerate
  every dedup probe into an all-duplicates corpus);
- embeddings get a deterministic per-replica micro-offset on dim 0
  (i * 1e-3) so replicated vectors are near- but not exact duplicates;
- region/nation stay as-is (dimensions);
- timestamps are untouched: K-times the events in the same wall-clock
  window models a busier deployment, which is the scale story.

The output is for TIMING ONLY — result values are synthetic; the
correctness gate never runs here.

Usage: python tools/gen_scale_data.py [K] [src_dir] [out_dir]
Defaults: K=10, src=/root/testdata/sf0.1, out=/tmp/spark_graft_sf<K*src>.
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


def scale_table(spark, src: str, name: str, k: int):
    df = spark.read.parquet(os.path.join(src, f"{name}.parquet"))
    if name in ("region", "nation") or k == 1:
        return df
    reps = F.explode(F.array(*[F.lit(i) for i in range(k)])).alias("__r")
    out = df.select("*", reps)
    for col in _KEY_COLS.get(name, []):
        out = out.withColumn(
            col, F.col(col) + F.col("__r").cast("long") * F.lit(_OFFSET)
        )
    if name == "documents":
        # rotate tokens by the replica index: same token statistics,
        # no exact cross-replica duplicate texts
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
    if name == "embeddings":
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
    return out.drop("__r").select(*df.columns)


def main() -> None:
    k = int(sys.argv[1]) if len(sys.argv) > 1 else 10
    src = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.1"
    out_dir = (
        sys.argv[3]
        if len(sys.argv) > 3
        else f"/tmp/spark_graft_sf_x{k}"
    )
    spark = get_spark("gen_scale_data")
    os.makedirs(out_dir, exist_ok=True)
    for name in TABLES:
        dest = os.path.join(out_dir, f"{name}.parquet")
        scale_table(spark, src, name, k).write.mode("overwrite").parquet(dest)
        print(f"{name}: -> {dest}")
    print(out_dir)


if __name__ == "__main__":
    main()
