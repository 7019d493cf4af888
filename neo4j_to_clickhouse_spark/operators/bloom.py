"""JVM-side Bloom-filter semi-join reduction (north star, scale path).

The exact decontamination join (`dedup.ngram_contamination`) shuffles
EVERY corpus shingle through its per-document aggregate — correct, and
fine while AQE can broadcast the eval side — but at 100 TB the corpus
side of that shuffle is the whole job. The classic reduction is a Bloom
filter on the small side probed scan-side on the big side, so only
probable hits ever enter a shuffle. Catalyst ships exactly this rewrite
(`spark.sql.optimizer.runtime.bloomFilter.*`) but will not inject it
when the creation side contains a Generate (explode) — which every
shingle plan does — so the engine provides it as an explicit operator.

Representation: the filter is ONE DataFrame row holding an
``array<long>`` bitmap. Build = explode each key to its ``num_hashes``
bit positions, ``bit_or`` per 64-bit word, densify once with a
single-row ``transform`` (the only higher-order lambda, executed once).
Probe = broadcast that row (BroadcastNestedLoopJoin of exactly one row)
and evaluate ``num_hashes`` flat ``element_at`` + bit-AND expressions —
whole-stage codegen, no Python, no UDF.

No false negatives by construction, so following the probe with an
exact verify join reproduces the exact operator's results bit-for-bit —
which is how the driver certifies it (the bloom variant shares the
exact variant's DuckDB oracle). False-positive rate for m bits, k
hashes, n keys ≈ (1 - e^(-kn/m))^k: the 2^20-bit default holds ~1.8%
at n = 100k eval shingles, k = 4; size the bitmap at ~10 bits/key.
Broadcast cost is m/8 bytes (128 KiB at the default) — an eval suite of
100M shingles needs 2^30 bits = 128 MiB, at which point raise
``num_bits`` and accept the broadcast or shard the eval set.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from neo4j_to_clickhouse_spark.operators.dedup import (
    ngram_array,
    spread,
    tokens,
    word_shingles,
)


def bloom_bitmap(
    keys: DataFrame, key_col: str, num_bits: int, num_hashes: int = 4
) -> DataFrame:
    """Aggregate a key column into a 1-row ``array<long>`` Bloom bitmap.

    Hash family: ``xxhash64(key, j)`` for seed j — the same
    seed-folding construction the MinHash signatures use
    (`dedup.minhash_signatures`), deterministic across runs and
    partitionings.
    """
    if num_bits % 64 != 0:
        raise ValueError("num_bits must be a multiple of 64")
    words = num_bits // 64
    pos = [
        F.pmod(F.xxhash64(F.col(key_col), F.lit(j)), F.lit(num_bits))
        for j in range(num_hashes)
    ]
    sparse = (
        keys.select(F.explode(F.array(*pos)).alias("pos"))
        .select(
            (F.col("pos") / 64).cast("long").alias("w"),
            F.expr(
                "shiftleft(CAST(1 AS BIGINT), CAST(pos % 64 AS INT))"
            ).alias("bit"),
        )
        .groupBy("w")
        .agg(F.bit_or("bit").alias("word"))
    )
    # densify the sparse (word_idx, word) rows into one array row; the
    # transform lambda runs once over num_bits/64 elements, not per key
    return sparse.agg(
        F.map_from_entries(F.collect_list(F.struct("w", "word"))).alias("m")
    ).select(
        F.transform(
            F.sequence(F.lit(0).cast("long"), F.lit(words - 1).cast("long")),
            lambda i: F.coalesce(
                F.element_at(F.col("m"), i), F.lit(0).cast("long")
            ),
        ).alias("bloom")
    )


def bloom_prefilter(
    df: DataFrame,
    key: Column,
    bitmap: DataFrame,
    num_bits: int,
    num_hashes: int = 4,
) -> DataFrame:
    """Rows of ``df`` whose key MIGHT be in the bitmap's key set
    (no false negatives; FP rate per the module formula).

    The probe is ``num_hashes`` flat codegen expressions per row; the
    1-row bitmap broadcasts once per executor.
    """
    probed = df.crossJoin(F.broadcast(bitmap)).withColumn("__bk", key)
    keep = F.lit(True)
    tmp = ["__bk"]
    for j in range(num_hashes):
        p = f"__bp{j}"
        tmp.append(p)
        probed = probed.withColumn(
            p, F.pmod(F.xxhash64(F.col("__bk"), F.lit(j)), F.lit(num_bits))
        )
        word = F.element_at("bloom", (F.col(p) / 64).cast("int") + 1)
        bit = F.expr(f"shiftleft(CAST(1 AS BIGINT), CAST({p} % 64 AS INT))")
        keep = keep & (word.bitwiseAND(bit) != 0)
    return probed.filter(keep).drop("bloom", *tmp)


def ngram_contamination_bloom(
    docs: DataFrame,
    bench: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 5,
    num_bits: int = 1 << 20,
    num_hashes: int = 4,
) -> DataFrame:
    """`dedup.ngram_contamination` with the Bloom-reduced plan: identical
    results (FN-free probe + exact verify), shuffle proportional to the
    CONTAMINATION RATE instead of the corpus size.

    Two plan changes vs the exact operator:
    - per-document shingle totals are computed scan-side as a flat
      ``size(array_distinct(slice(...)))`` expression — the corpus-wide
      (id, shingle) shuffle the exact operator pays for its groupBy
      disappears entirely;
    - only shingles surviving the Bloom probe reach the verify semi-join
      and the per-document hit aggregate.
    """
    bench_sh = (
        word_shingles(bench, id_col, text_col, n).select("shingle").distinct()
    )
    bm = bloom_bitmap(bench_sh, "shingle", num_bits, num_hashes)

    # two-stage projection: the gram array is built ONCE per row — the
    # previous single select evaluated the whole tokenize+ngram tree
    # twice (size + explode), and ngram_array references its token input
    # 2(n-1) times with no CSE through higher-order lambdas (see
    # dedup.word_shingles)
    toks = F.col("__tk")
    valid = F.greatest(F.size(toks) - (n - 1), F.lit(0))
    grams = F.array_distinct(F.slice(ngram_array(toks, n), F.lit(1), valid))
    exploded = (
        spread(docs)
        .select(F.col(id_col).alias("id"), tokens(text_col).alias("__tk"))
        .select("id", grams.alias("__grams"))
        .select(
            "id",
            F.size("__grams").alias("n_shingles"),
            F.explode("__grams").alias("shingle"),
        )
    )
    cand = bloom_prefilter(
        exploded, F.col("shingle"), bm, num_bits, num_hashes
    )
    return (
        cand.join(bench_sh, "shingle", "left_semi")
        .groupBy("id", "n_shingles")
        .agg(F.count("*").alias("n_hits"))
        .withColumn("contamination", F.col("n_hits") / F.col("n_shingles"))
        .select("id", "n_shingles", "n_hits", "contamination")
    )
