"""A/B harness for classifier-scoring formulations (guide §1/§4).

Variants (all must produce IDENTICAL collected results to v0):
  v0  current score_documents literal path (md5 + plan-literal weights)
  v1  grams materialized in their own projection, then the same literal
      aggregate (kills the ~10x re-evaluation of split/zip_with seen in
      the before-plan; the word_shingles trick)
  v2  grams materialized -> transform to buckets -> Arrow numpy gather
  v3  full Arrow kernel: tokenize+bigrams+md5+gather in one pandas UDF
      returning (total, n); division+round stays JVM-side
  x0  current xxhash64 literal path
  x1  grams materialized + xxhash64 literal aggregate
  x2  grams materialized + xxhash64 transform buckets + Arrow gather
  b0  current broadcast path @1M buckets (xxhash64)
  b1  grams materialized broadcast path @1M

Usage: python tools/ab_classifier_kernels.py [sf_dir] [runs]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import pandas as pd  # noqa: E402
from pyspark.sql import functions as F  # noqa: E402

from neo4j_to_clickhouse_spark.operators.classifier import (  # noqa: E402
    WEIGHT_SCALE,
    _gather_sum_udf,
    hash_bucket,
    ngram_features,
    score_documents,
    weight_table,
)
from neo4j_to_clickhouse_spark.plans.queries import _t  # noqa: E402
from neo4j_to_clickhouse_spark.session import get_spark  # noqa: E402


def _score_from(total, n):
    return F.when(
        n > 0,
        F.round(total / (n.cast("double") * float(WEIGHT_SCALE)), 6),
    ).otherwise(F.lit(0.0))


def v1(df, weights, seed, hasher):
    n_buckets = len(weights)
    w_arr = F.array(*[F.lit(int(w)) for w in weights])
    g = ngram_features("text", bigrams=True)
    staged = df.withColumn("__g", g)
    total = F.aggregate(
        F.col("__g"),
        F.lit(0).cast("long"),
        lambda acc, gg: acc
        + F.element_at(
            w_arr,
            (hash_bucket(gg, n_buckets, seed, hasher) + 1).cast("int"),
        ),
    )
    return staged.withColumn(
        "score", _score_from(total, F.size("__g"))
    ).drop("__g")


def v2(df, weights, seed, hasher):
    n_buckets = len(weights)
    g = ngram_features("text", bigrams=True)
    staged = df.withColumn(
        "__b",
        F.transform(
            g, lambda gg: hash_bucket(gg, n_buckets, seed, hasher).cast("int")
        ),
    )
    total = _gather_sum_udf(weights)(F.col("__b"))
    return staged.withColumn(
        "score", _score_from(total, F.size("__b"))
    ).drop("__b")


def v3(df, weights, seed):
    import hashlib
    import re

    import numpy as np
    from pyspark.sql.functions import pandas_udf

    w = list(weights)
    nb = len(w)
    ws = re.compile(r"\s+", re.ASCII)
    pre = f"{seed}:".encode()

    @pandas_udf("struct<total:long, n:int>")
    def kern(texts: pd.Series) -> pd.DataFrame:
        totals = np.zeros(len(texts), dtype=np.int64)
        ns = np.full(len(texts), -1, dtype=np.int32)
        md5 = hashlib.md5
        for i, t in enumerate(texts):
            if t is None:
                continue
            s = t.strip(" \t\n\r\f\x0b")
            toks = ws.split(s) if s else []
            grams = toks + [
                toks[j] + " " + toks[j + 1] for j in range(len(toks) - 1)
            ]
            tot = 0
            for gm in grams:
                h = int(md5(pre + gm.encode()).hexdigest()[:8], 16)
                tot += w[h % nb]
            totals[i] = tot
            ns[i] = len(grams)
        return pd.DataFrame({"total": totals, "n": ns})

    staged = df.withColumn("__k", kern("text"))
    return staged.withColumn(
        "score", _score_from(F.col("__k.total"), F.col("__k.n"))
    ).drop("__k")


def rollup(scored):
    return (
        scored.groupBy("source")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum(F.when(F.col("score") > 0, 1).otherwise(0)).alias(
                "n_positive"
            ),
            (F.round(F.avg("score"), 6) + F.lit(0.0)).alias("avg"),
        )
        .orderBy("source")
    )


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    runs = int(sys.argv[2]) if len(sys.argv) > 2 else 3
    spark = get_spark("ab-cls", master="local[32]", shuffle_partitions=32)
    spark.read.parquet(f"{sf_dir}/documents.parquet").count()
    docs = _t(spark, sf_dir, "documents")
    w256 = weight_table(256, 7)
    w1m = weight_table(1_000_000, 7)

    variants = {
        "v0": lambda: score_documents(docs, "text", w256, seed=7),
        "v1": lambda: v1(docs, w256, 7, "md5"),
        "v2": lambda: v2(docs, w256, 7, "md5"),
        "v3": lambda: v3(docs, w256, 7),
        "x0": lambda: score_documents(
            docs, "text", w256, seed=7, hasher="xxhash64"
        ),
        "x1": lambda: v1(docs, w256, 7, "xxhash64"),
        "x2": lambda: v2(docs, w256, 7, "xxhash64"),
        "b0": lambda: score_documents(
            docs, "text", w1m, seed=7, hasher="xxhash64",
            weight_strategy="broadcast",
        ),
        "b1": lambda: v2(docs, w1m, 7, "xxhash64"),
    }

    # correctness: exact row equality of the per-doc scores vs the ref
    ref_md5 = sorted(
        (r.doc_id, r.score)
        for r in score_documents(docs, "text", w256, seed=7)
        .select("doc_id", "score")
        .collect()
    )
    ref_xx = sorted(
        (r.doc_id, r.score)
        for r in score_documents(
            docs, "text", w256, seed=7, hasher="xxhash64"
        )
        .select("doc_id", "score")
        .collect()
    )
    ref_b = sorted(
        (r.doc_id, r.score)
        for r in score_documents(
            docs, "text", w1m, seed=7, hasher="xxhash64",
            weight_strategy="broadcast",
        )
        .select("doc_id", "score")
        .collect()
    )
    refs = {
        "v0": ref_md5, "v1": ref_md5, "v2": ref_md5, "v3": ref_md5,
        "x0": ref_xx, "x1": ref_xx, "x2": ref_xx,
        "b0": ref_b, "b1": ref_b,
    }
    for name, make in variants.items():
        got = sorted(
            (r.doc_id, r.score)
            for r in make().select("doc_id", "score").collect()
        )
        ok = got == refs[name]
        print(f"EQ {name}: {'OK' if ok else 'MISMATCH'}", flush=True)
        if not ok:
            bad = [
                (a, b) for a, b in zip(got, refs[name]) if a != b
            ][:3]
            print(f"   first diffs: {bad}", flush=True)

    for name, make in variants.items():
        ts = []
        for _ in range(runs):
            spark.sparkContext.setJobDescription(f"ab:{name}")
            t0 = time.perf_counter()
            rollup(make()).collect()
            ts.append(round(time.perf_counter() - t0, 3))
        print(f"TIME {name}: {ts} min={min(ts)}", flush=True)


if __name__ == "__main__":
    main()


def _staged_grams(df, bigrams=True):
    from neo4j_to_clickhouse_spark.operators.dedup import ngram_array, tokens

    staged = df.withColumn("__tk", tokens("text"))
    toks = F.col("__tk")
    if bigrams:
        bg = F.slice(
            ngram_array(toks, 2), 1, F.greatest(F.size(toks) - 1, F.lit(0))
        )
        g = F.concat(toks, bg)
    else:
        g = toks
    return staged.withColumn("__g", g).drop("__tk")


def v1b(df, weights, seed, hasher):
    n_buckets = len(weights)
    w_arr = F.array(*[F.lit(int(w)) for w in weights])
    staged = _staged_grams(df)
    total = F.aggregate(
        F.col("__g"),
        F.lit(0).cast("long"),
        lambda acc, gg: acc
        + F.element_at(
            w_arr,
            (hash_bucket(gg, n_buckets, seed, hasher) + 1).cast("int"),
        ),
    )
    return staged.withColumn(
        "score", _score_from(total, F.size("__g"))
    ).drop("__g")


def v2b(df, weights, seed, hasher):
    n_buckets = len(weights)
    staged = _staged_grams(df).withColumn(
        "__b",
        F.transform(
            F.col("__g"),
            lambda gg: hash_bucket(gg, n_buckets, seed, hasher).cast("int"),
        ),
    ).drop("__g")
    total = _gather_sum_udf(weights)(F.col("__b"))
    return staged.withColumn(
        "score", _score_from(total, F.size("__b"))
    ).drop("__b")


def main2() -> None:
    sf_dir = "/root/testdata/sf0.1"
    runs = 4
    spark = get_spark("ab-cls2", master="local[32]", shuffle_partitions=32)
    spark.read.parquet(f"{sf_dir}/documents.parquet").count()
    docs = _t(spark, sf_dir, "documents")
    w256 = weight_table(256, 7)
    w1m = weight_table(1_000_000, 7)
    variants = {
        "v1": lambda: v1(docs, w256, 7, "md5"),
        "v1b": lambda: v1b(docs, w256, 7, "md5"),
        "x1": lambda: v1(docs, w256, 7, "xxhash64"),
        "x1b": lambda: v1b(docs, w256, 7, "xxhash64"),
        "b1": lambda: v2(docs, w1m, 7, "xxhash64"),
        "b1b": lambda: v2b(docs, w1m, 7, "xxhash64"),
    }
    ref = sorted(
        (r.doc_id, r.score)
        for r in score_documents(docs, "text", w256, seed=7)
        .select("doc_id", "score").collect()
    )
    refx = sorted(
        (r.doc_id, r.score)
        for r in score_documents(docs, "text", w256, seed=7, hasher="xxhash64")
        .select("doc_id", "score").collect()
    )
    refb = sorted(
        (r.doc_id, r.score)
        for r in score_documents(
            docs, "text", w1m, seed=7, hasher="xxhash64",
            weight_strategy="broadcast",
        ).select("doc_id", "score").collect()
    )
    refs = {"v1": ref, "v1b": ref, "x1": refx, "x1b": refx, "b1": refb, "b1b": refb}
    for name, make in variants.items():
        got = sorted(
            (r.doc_id, r.score)
            for r in make().select("doc_id", "score").collect()
        )
        print(f"EQ {name}: {'OK' if got == refs[name] else 'MISMATCH'}", flush=True)
    for name, make in variants.items():
        ts = []
        for _ in range(runs):
            t0 = time.perf_counter()
            rollup(make()).collect()
            ts.append(round(time.perf_counter() - t0, 3))
        print(f"TIME {name}: {ts} min={min(ts)}", flush=True)
