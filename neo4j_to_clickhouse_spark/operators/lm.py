"""Unigram language-model scoring for corpus quality filtering (north star).

CCNet-class pre-training pipelines score every document against a
reference language model and keep/bucket by perplexity; the unigram LM
is the dependency-free, fully deterministic member of that family, and
its negative-log-likelihood-per-token is the standard cheap quality
signal (high = unusual vocabulary = likely junk/noise, extremely low =
degenerate repetition).  Reference scope: the CDC pipeline has no
model-based scoring surface (`initial-load/scripts/03-bulk-import.py`
ships payloads through unmodified); this is the curation-side extension
a training-data consumer of the reference would bolt on.

Model: Laplace-smoothed corpus unigram with a top-V vocabulary cap —
``p(term) = (vocab_count(term) + 1) / (N + V)`` where ``N`` is the
corpus token count, ``V`` the corpus distinct-term count, and
``vocab_count`` is the corpus frequency for the ``top_v`` most frequent
terms and 0 (out-of-vocabulary) for the tail.  The cap is the
real-pipeline move — open-vocab web corpora have unbounded typo tails —
and is what makes the scoring join broadcastable at any corpus size.

Determinism contract (cross-engine certifiable): ``p`` is a ratio of
exact integers evaluated in one IEEE double division, and each token's
``ln(p)`` is rounded to 6 decimals and cast to DECIMAL *before*
summation, so every aggregate is exact and ordering-independent; see
the house rule in ``plans/queries.py`` module docstring.

Scale design: one token-count shuffle (map-side combined) builds the
vocabulary; the top-V vocab and the 1-row totals frame are tiny by
construction, so AQE broadcasts both joins hint-free; the report is a
second map-side-combined shuffle on the group key.  No per-document
shuffle exists at all — the per-source metrics aggregate straight off
the scored token scan.  At 100 TB the cost is two scans of the token
stream (count pass + score pass) and two small-key shuffles, with the
vocabulary build reusable across runs via ``persist_vocab``-style
checkpointing by the caller.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from neo4j_to_clickhouse_spark.operators.dedup import spread, tokens

#: ln(p) is rounded to this many decimals and summed as DECIMAL — exact,
#: ordering-independent, and wide enough that a 1-ulp libm difference
#: between engines cannot flip the rounded value except on astronomically
#: unlikely boundaries.
_LOG_SCALE = 6


def term_counts(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Corpus term-frequency table ``(term, cnt)`` — one map-side-combined
    shuffle over the exploded token stream."""
    return (
        spread(df)
        .select(F.explode(tokens(text_col)).alias("term"))
        .groupBy("term")
        .agg(F.count("*").alias("cnt"))
    )


def top_vocab(counts: DataFrame, top_v: int) -> DataFrame:
    """The ``top_v`` most frequent terms under a total order (count desc,
    term asc) — deterministic regardless of partition layout."""
    return counts.orderBy(F.col("cnt").desc(), "term").limit(top_v)


def corpus_totals(counts: DataFrame) -> DataFrame:
    """One row: ``(n_total, v_distinct)`` — the smoothing denominator."""
    return counts.agg(
        F.sum("cnt").alias("n_total"),
        F.count("*").alias("v_distinct"),
    )


def lm_quality_report(
    df: DataFrame,
    group_col: str = "source",
    text_col: str = "text",
    top_v: int = 256,
) -> DataFrame:
    """Per-group unigram-LM quality rollup.

    Columns: ``n_docs``, ``n_tokens``, ``oov_tokens``, ``oov_rate``
    (fraction of tokens outside the top-V vocabulary), ``avg_nll``
    (mean negative ln-likelihood per token, nats — the perplexity
    exponent).  Higher ``avg_nll`` = less corpus-typical text.
    """
    from pyspark import StorageLevel

    # counts feeds BOTH the top-V vocabulary and the smoothing totals;
    # Catalyst only reuses identical subplans when persisted, so without
    # this the token-count shuffle (the corpus-sized work) executes
    # twice (r15 optimization round — same caller-owned-cache contract
    # as minhash_lsh_dedup: MEMORY_AND_DISK, LRU-evicted; the table is
    # one row per distinct term, tiny next to the corpus)
    counts = term_counts(df, text_col).persist(
        StorageLevel.MEMORY_AND_DISK
    )
    vocab = top_vocab(counts, top_v)
    totals = corpus_totals(counts)

    toks = spread(df).select(
        F.col(group_col).alias("grp"),
        F.explode(tokens(text_col)).alias("term"),
    )
    # p = (vocab_cnt + 1) / (N + V): exact-integer ratio, one double
    # division; per-token ln rounded to DECIMAL before any summation.
    scored = (
        toks.join(vocab, "term", "left")
        .crossJoin(totals)
        .select(
            "grp",
            F.col("cnt").isNull().cast("long").alias("oov"),
            F.round(
                F.log(
                    (F.coalesce(F.col("cnt"), F.lit(0)) + F.lit(1)).cast(
                        "double"
                    )
                    / (F.col("n_total") + F.col("v_distinct")).cast("double")
                ),
                _LOG_SCALE,
            )
            .cast(f"decimal(28,{_LOG_SCALE})")
            .alias("nll"),
        )
    )
    per_grp = scored.groupBy("grp").agg(
        F.count("*").alias("n_tokens"),
        F.sum("oov").alias("oov_tokens"),
        (F.round(F.sum("oov").cast("double") / F.count("*"), 6) + F.lit(0.0))
        .alias("oov_rate"),
        (
            F.round(-F.sum("nll").cast("double") / F.count("*"), 6)
            + F.lit(0.0)
        ).alias("avg_nll"),
    )
    docs = df.groupBy(F.col(group_col).alias("grp")).agg(
        F.count("*").alias("n_docs")
    )
    # a group whose documents are all empty has no token rows: counts
    # coalesce to 0; the per-token rates stay NULL (0/0 is undefined)
    return docs.join(per_grp, "grp", "left").select(
        F.col("grp").alias(group_col),
        "n_docs",
        F.coalesce("n_tokens", F.lit(0)).alias("n_tokens"),
        F.coalesce("oov_tokens", F.lit(0)).alias("oov_tokens"),
        "oov_rate",
        "avg_nll",
    )


def bigram_lm_report(
    df: DataFrame,
    group_col: str = "source",
    text_col: str = "text",
    top_v: int = 64,
) -> DataFrame:
    """Per-group BIGRAM-LM quality rollup — the next rung toward
    CCNet's n-gram scoring above :func:`lm_quality_report`'s unigram.

    Model: tokens map to the top-``top_v`` vocabulary or ``<unk>``
    BEFORE pairing, so the bigram alphabet is at most ``(V+1)^2`` — the
    trick that keeps every model table broadcast-tiny at any corpus
    size. Laplace-smoothed conditional:
    ``p(w2|w1) = (b(w1,w2) + 1) / (ctx(w1) + V + 1)`` with exact
    integer counts; per-bigram ``ln(p)`` rounds to 6 decimals and sums
    as DECIMAL (the module's determinism contract).

    Scale design: the vocabulary is one map-side-combined count
    shuffle; the top-V terms come back as a 64-literal codegen array
    (a contract-bounded collect, the `similarity.py` pattern), so the
    token->vocab mapping and the in-document PAIRING are pure array
    expressions on the scan — the corpus never shuffles. Bigram and
    context counts shuffle <= (V+1)^2 keys; scoring joins broadcast.

    Columns: ``n_docs``, ``n_bigrams``, ``unk_bigrams`` (pairs
    touching ``<unk>``), ``unk_rate``, ``avg_nll`` (mean negative
    ln-likelihood per bigram, nats)."""
    from neo4j_to_clickhouse_spark.operators.dedup import spread, tokens

    counts = term_counts(df, text_col)
    vocab_terms = [
        r.term for r in top_vocab(counts, top_v).collect()
    ]  # <= top_v rows — contract-bounded
    v_eff = len(vocab_terms)
    vocab_arr = F.array(*[F.lit(t) for t in vocab_terms])

    mapped = F.transform(
        tokens(text_col),
        lambda t: F.when(
            F.array_contains(vocab_arr, t), t
        ).otherwise(F.lit("<unk>")),
    )
    n = F.size(mapped)
    pairs = F.zip_with(
        F.slice(mapped, 1, F.greatest(n - 1, F.lit(0))),
        F.slice(mapped, 2, F.greatest(n - 1, F.lit(0))),
        lambda x, y: F.struct(x.alias("w1"), y.alias("w2")),
    )
    bgs = spread(df).select(
        F.col(group_col).alias("grp"),
        F.explode(pairs).alias("b"),
    ).select("grp", F.col("b.w1").alias("w1"), F.col("b.w2").alias("w2"))

    bcounts = bgs.groupBy("w1", "w2").agg(F.count("*").alias("bcnt"))
    ctx = bcounts.groupBy("w1").agg(F.sum("bcnt").alias("ccnt"))

    scored = (
        bgs.join(F.broadcast(bcounts), ["w1", "w2"])
        .join(F.broadcast(ctx), "w1")
        .select(
            "grp",
            (
                (F.col("w1") == "<unk>") | (F.col("w2") == "<unk>")
            ).cast("long").alias("unk"),
            F.round(
                F.log(
                    (F.col("bcnt") + F.lit(1)).cast("double")
                    / (F.col("ccnt") + F.lit(v_eff + 1)).cast("double")
                ),
                _LOG_SCALE,
            )
            .cast(f"decimal(28,{_LOG_SCALE})")
            .alias("nll"),
        )
    )
    per_grp = scored.groupBy("grp").agg(
        F.count("*").alias("n_bigrams"),
        F.sum("unk").alias("unk_bigrams"),
        (F.round(F.sum("unk").cast("double") / F.count("*"), 6) + F.lit(0.0))
        .alias("unk_rate"),
        (
            F.round(-F.sum("nll").cast("double") / F.count("*"), 6)
            + F.lit(0.0)
        ).alias("avg_nll"),
    )
    docs = df.groupBy(F.col(group_col).alias("grp")).agg(
        F.count("*").alias("n_docs")
    )
    return docs.join(per_grp, "grp", "left").select(
        F.col("grp").alias(group_col),
        "n_docs",
        F.coalesce("n_bigrams", F.lit(0)).alias("n_bigrams"),
        F.coalesce("unk_bigrams", F.lit(0)).alias("unk_bigrams"),
        "unk_rate",
        "avg_nll",
    )
