"""A/B: word_shingles formulations — corpus-wide distinct exchange vs
per-document array_distinct (and the downstream exact-Jaccard /
LSH-verify shapes built on them).

Equality contract: identical sorted (id, shingle) row sets — the
per-doc form may only change WHERE the dedup happens (inside the row's
gram array instead of a corpus-wide shuffle), never the set itself.
Downstream: identical (id_a, id_b, jaccard) rows from jaccard_pairs and
minhash_lsh_dedup under both shingle forms.

Run:  python tools/ab_shingles.py [sf_dir]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from neo4j_to_clickhouse_spark.operators.dedup import (  # noqa: E402
    ngram_array,
    spread,
    tokens,
)
from neo4j_to_clickhouse_spark.plans.queries import _t  # noqa: E402
from neo4j_to_clickhouse_spark.session import get_spark  # noqa: E402


def shingles_distinct_exchange(df, id_col="doc_id", text_col="text", n=3):
    """The pre-r16 formulation: explode every gram, corpus-wide
    distinct on (id, shingle)."""
    return (
        spread(df)
        .select(F.col(id_col).alias("id"), tokens(text_col).alias("__tk"))
        .select(
            "id", F.explode(ngram_array(F.col("__tk"), n)).alias("shingle")
        )
        .filter(F.col("shingle").isNotNull())
        .distinct()
    )


def shingles_array_distinct(df, id_col="doc_id", text_col="text", n=3):
    """Per-document dedup: slice the trailing nulls off the gram array
    (they are exactly the last n-1 slots), array_distinct in place,
    explode. No shuffle."""
    toks = F.col("__tk")
    grams = F.array_distinct(
        F.slice(
            ngram_array(toks, n),
            1,
            F.greatest(F.size(toks) - (n - 1), F.lit(0)),
        )
    )
    return (
        spread(df)
        .select(F.col(id_col).alias("id"), tokens(text_col).alias("__tk"))
        .select("id", F.explode(grams).alias("shingle"))
    )


def _rows(df):
    return sorted(tuple(r) for r in df.collect())


def _time(label, fn, runs=3):
    best = float("inf")
    for _ in range(runs):
        t0 = time.perf_counter()
        fn()
        best = min(best, time.perf_counter() - t0)
    print(f"{label}: {best:.3f}s (min of {runs})")
    return best


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    spark = get_spark("ab_shingles", master="local[32]", shuffle_partitions=32)
    docs = _t(spark, sf_dir, "documents")

    a = shingles_distinct_exchange(docs)
    b = shingles_array_distinct(docs)
    ra, rb = _rows(a), _rows(b)
    assert ra == rb, (
        f"shingle sets differ: {len(ra)} vs {len(rb)} rows; first "
        f"mismatch {next((x, y) for x, y in zip(ra, rb) if x != y)}"
    )
    print(f"shingle rows identical: {len(ra)}")

    def run(df):
        return lambda: df.write.format("noop").mode("overwrite").save()

    _time("shingles distinct-exchange", run(a))
    _time("shingles array_distinct   ", run(b))

    # downstream: the two heaviest bench consumers
    from neo4j_to_clickhouse_spark.operators.dedup import (
        jaccard_pairs,
        minhash_lsh_dedup,
    )

    spark.catalog.clearCache()
    pj = sorted(
        tuple(r)
        for r in jaccard_pairs(docs, "doc_id", "text", n=3, threshold=0.5)
        .select("id_a", "id_b", F.round("jaccard", 6).alias("j"))
        .collect()
    )
    spark.catalog.clearCache()
    pl = sorted(
        tuple(r)
        for r in minhash_lsh_dedup(
            docs, "doc_id", "text", n=3, num_hashes=64, bands=32,
            threshold=0.5,
        )
        .select("id_a", "id_b", F.round("jaccard", 6).alias("j"))
        .collect()
    )
    print(f"jaccard_pairs rows: {len(pj)}; lsh rows: {len(pl)}")
    out = os.path.join("/tmp", "ab_shingles_expected.json")
    import json

    with open(out, "w") as fh:
        json.dump({"jaccard": pj, "lsh": pl}, fh)
    print(f"wrote expected downstream rows -> {out}")


if __name__ == "__main__":
    main()
