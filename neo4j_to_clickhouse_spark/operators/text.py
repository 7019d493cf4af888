"""Text analysis operators for training-data curation (north star).

Language-ID, quality scoring, token counting, fingerprinting — each a pure
column expression or narrow aggregation so the whole module rides
whole-stage codegen. These run *per document* with no shuffle except the
final aggregations, i.e. they are scan-bound at 100 TB, which is optimal.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from neo4j_to_clickhouse_spark.operators.dedup import ngram_array, tokens

# Tiny per-language marker lexicons for the n-gram/stopword heuristic.
# Real deployments swap in fastText etc. via the pandas-UDF escape hatch;
# the heuristic keeps the reference pipeline dependency-free + deterministic.
LANG_MARKERS: dict[str, tuple[str, ...]] = {
    "en": ("the", "and", "of", "to", "a", "in", "is", "it"),
    "de": ("der", "die", "das", "und", "ist", "nicht", "ein"),
    "es": ("el", "la", "los", "que", "de", "es", "un", "una"),
    "fr": ("le", "la", "les", "et", "est", "une", "des", "dans"),
}


def token_count(text: Column | str) -> Column:
    """Whitespace token count. A BPE-ish subword estimate is chars/4 —
    provided separately so both are cheap scans."""
    return F.size(tokens(text))


def subword_estimate(text: Column | str) -> Column:
    """Rough BPE token estimate (≈1 token per 4 chars) — the standard
    pre-tokenizer sizing heuristic for LLM corpus accounting."""
    c = F.col(text) if isinstance(text, str) else text
    return F.ceil(F.length(c) / F.lit(4.0)).cast("long")


def punct_ratio(text: Column | str) -> Column:
    c = F.col(text) if isinstance(text, str) else text
    stripped = F.regexp_replace(c, r"[^\w\s]", "")
    return (F.length(c) - F.length(stripped)) / F.greatest(
        F.length(c), F.lit(1)
    )


def _marker_hits(low_toks: Column, markers: tuple[str, ...]) -> Column:
    """Occurrences of any marker word in a lowercased token array, as flat
    per-marker ``size - size(array_remove)`` counts summed — markers are
    distinct so a token matches at most one, making the sum exactly the
    count a filter-by-membership lambda would produce, but in whole-stage
    codegen instead of the interpreted higher-order evaluator."""
    counts = [
        F.size(low_toks) - F.size(F.array_remove(low_toks, m))
        for m in markers
    ]
    total = counts[0]
    for extra in counts[1:]:
        total = total + extra
    return total


def stopword_ratio(text: Column | str, lang: str = "en") -> Column:
    c = F.col(text) if isinstance(text, str) else text
    low = tokens(F.lower(c))  # lower-then-split == split-then-lower-each
    hits = _marker_hits(low, LANG_MARKERS[lang])
    return hits / F.greatest(F.size(low), F.lit(1))


def mean_token_length(text: Column | str) -> Column:
    """Sum of token lengths == count of non-whitespace characters, so the
    numerator is one flat regexp_replace+length instead of an interpreted
    higher-order fold over the token array (identical values, stays in
    whole-stage codegen)."""
    c = F.col(text) if isinstance(text, str) else text
    total = F.length(F.regexp_replace(c, r"\s+", ""))
    return total / F.greatest(F.size(tokens(c)), F.lit(1))


def quality_score(text: Column | str) -> Column:
    """Composite [0,1] quality heuristic: length band + mean token length
    band + low punctuation — the classic cheap pre-filters (Gopher-style
    rules) as one expression. Tune weights per corpus."""
    c = F.col(text) if isinstance(text, str) else text
    n_tok = token_count(c)
    mtl = mean_token_length(c)
    len_ok = F.when((n_tok >= 5) & (n_tok <= 100000), 1.0).otherwise(0.0)
    mtl_ok = F.when((mtl >= 2.0) & (mtl <= 12.0), 1.0).otherwise(0.0)
    punct_ok = F.when(punct_ratio(c) <= 0.3, 1.0).otherwise(0.0)
    return (len_ok + mtl_ok + punct_ok) / F.lit(3.0)


def detect_language(text: Column | str) -> Column:
    """Marker-word language ID: the language whose marker lexicon hits the
    most tokens; 'und' (undetermined) when nothing hits. Deterministic
    tie-break by language code order via the (hits, -index) sort key.
    All-flat scoring (see :func:`_marker_hits`) — no interpreted lambdas."""
    c = F.col(text) if isinstance(text, str) else text
    low = tokens(F.lower(c))
    scored = []
    for i, (lang, markers) in enumerate(sorted(LANG_MARKERS.items())):
        hits = _marker_hits(low, markers)
        scored.append(F.struct(hits.alias("hits"), F.lit(-i).alias("prio"),
                               F.lit(lang).alias("lang")))
    best = F.array_max(F.array(*scored))
    return F.when(best["hits"] > 0, best["lang"]).otherwise(F.lit("und"))


def ngram_repetition(text: Column | str, n: int = 3) -> tuple[Column, Column]:
    """(total_ngrams, distinct_ngrams) over word n-grams — the raw counts
    behind the standard intra-document repetition signal (Gopher-style
    "fraction of duplicate n-grams"): boilerplate, template spam, and
    decoding loops all push distinct/total far below 1. Returned as counts
    (not the ratio) so callers can aggregate corpus-level ratios exactly.

    Flat expressions only: the valid-gram count is arithmetic on
    ``size(tokens)``, and the distinct count is ``array_distinct`` over a
    ``slice`` of the n-gram array — no interpreted filter lambda."""
    toks = tokens(text)
    total = F.greatest(F.size(toks) - (n - 1), F.lit(0))
    grams = F.slice(ngram_array(toks, n), F.lit(1), total)
    return total.cast("long"), F.size(F.array_distinct(grams)).cast("long")


def fingerprint(text: Column | str) -> Column:
    """Document fingerprint: md5 of whitespace-normalized lowercase text.
    Stable under reflow/case changes — the cheap canonical-form dedup key."""
    c = F.col(text) if isinstance(text, str) else text
    return F.md5(F.lower(F.trim(F.regexp_replace(c, r"\s+", " "))))


def rolling_fingerprints(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text",
    n: int = 5, keep: int = 8,
) -> DataFrame:
    """Winnowing-style signature: the `keep` smallest n-gram rolling hashes
    per document -> (id, signature array). Shared n-gram machinery with
    MinHash (:func:`..dedup.ngram_array` — the O(words) zip_with form, not
    the O(words^2) captured-slice form); robust to local edits where the
    full-text fingerprint breaks."""
    grams = F.filter(
        ngram_array(F.col("__tk"), n), lambda g: g.isNotNull()
    )
    hashes = F.transform(grams, lambda g: F.xxhash64(g))
    # token array projected first — ngram_array references it 2(n-1)
    # times and CSE does not reach through higher-order lambdas (see
    # dedup.word_shingles)
    return df.select(
        F.col(id_col).alias("id"), tokens(text_col).alias("__tk")
    ).select(
        "id",
        F.slice(F.array_sort(F.array_distinct(hashes)), 1, keep).alias(
            "signature"
        ),
    )


def text_stats(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Per-document stat row: the full curation feature set in one scan."""
    c = F.col(text_col)
    return df.select(
        F.col(id_col),
        F.length(c).alias("n_chars"),
        token_count(c).alias("n_tokens"),
        subword_estimate(c).alias("n_subwords_est"),
        F.round(mean_token_length(c), 4).alias("mean_token_len"),
        F.round(punct_ratio(c), 4).alias("punct_ratio"),
        F.round(stopword_ratio(c), 4).alias("stopword_ratio"),
        F.round(quality_score(c), 4).alias("quality"),
        detect_language(c).alias("detected_lang"),
        fingerprint(c).alias("fingerprint"),
    )


def tfidf_by_group(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    group_col: str = "source",
) -> DataFrame:
    """Corpus-level TF-IDF profile: ``(group, term, tfidf)`` where tfidf
    is the mean, over the group's documents containing the term, of
    ``(tf / doc_len) * (ln((N+1)/(df+1)) + 1)`` — smoothed IDF over the
    WHOLE corpus, so group profiles are comparable.

    All flat codegen expressions; the term-frequency aggregate is reused
    by both the document-frequency branch and the scoring branch through
    Spark's exchange reuse, and the two scalar/short dimension frames
    (corpus size, per-term df) join hint-free so AQE broadcasts them.
    At corpus scale the only big shuffles are the two (id, term)
    aggregations — both map-side combined.
    """
    from neo4j_to_clickhouse_spark.operators.dedup import spread

    toks = spread(df).select(
        F.col(id_col).alias("id"),
        F.col(group_col).alias("grp"),
        F.explode(tokens(text_col)).alias("term"),
    )
    tf = toks.groupBy("id", "grp", "term").agg(F.count("*").alias("tf"))
    dlen = toks.groupBy("id").agg(F.count("*").alias("n_terms"))
    dfreq = tf.groupBy("term").agg(F.count("*").alias("df"))
    n_docs = df.agg(F.count("*").alias("n_docs"))
    scored = (
        tf.join(dlen, "id")
        .join(dfreq, "term")
        .crossJoin(n_docs)
        .withColumn(
            "s",
            (F.col("tf").cast("double") / F.col("n_terms"))
            * (
                F.log((F.col("n_docs") + F.lit(1.0)) / (F.col("df") + F.lit(1.0)))
                + F.lit(1.0)
            ),
        )
    )
    return (
        scored.groupBy("grp", "term")
        .agg(F.avg("s").alias("tfidf"))
        .select(F.col("grp").alias(group_col), "term", "tfidf")
    )


def chunk_documents(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    window: int = 256,
    stride: int = 192,
) -> DataFrame:
    """Fixed-window overlapping chunking — the complement of
    ``pack_sequences``: split each document that exceeds the context
    window into overlapping ``window``-token chunks advancing by
    ``stride`` tokens (sliding-window long-document handling for
    training and retrieval indexing).

    Contract: chunk starts are ``0, stride, 2*stride, …`` with exactly
    ``ceil(max(n - window, 0) / stride) + 1`` chunks for an ``n``-token
    document (0 chunks for an empty one) — every token is covered when
    ``stride <= window``, every chunk except possibly the last is
    exactly ``window`` tokens, and the last is never longer than
    ``window``. Emits one row per chunk:
    ``(id, chunk_id, chunk_start, n_chunk_tokens, chunk_text)``.

    Scale shape: per-document integer arithmetic + posexplode — NO
    shuffle at all; output size is input tokens × (window/stride)
    amplification, produced scan-side so downstream aggregations
    map-side combine. Integer-exact, so any SQL engine reproduces the
    accounting bit-for-bit.
    """
    if window < 1 or stride < 1:
        raise ValueError(f"window/stride must be >= 1: {window}/{stride}")
    if stride > window:
        raise ValueError(
            f"stride {stride} > window {window} would skip tokens"
        )
    toks = tokens(text_col)
    n = F.size(toks)
    n_chunks = (
        F.when(n == 0, F.lit(0))
        .otherwise(
            F.ceil(
                F.greatest(n - window, F.lit(0))
                / F.lit(float(stride))
            ).cast("long")
            + 1
        )
    )
    starts = F.when(
        n_chunks > 0,
        F.sequence(
            F.lit(0).cast("long"),
            (n_chunks - 1) * stride,
            F.lit(stride).cast("long"),
        ),
    ).otherwise(F.array().cast("array<long>"))
    return (
        df.select(
            F.col(id_col).alias("id"),
            toks.alias("__toks"),
            F.posexplode(starts).alias("chunk_id", "chunk_start"),
        )
        .select(
            F.col("id").alias(id_col),
            "chunk_id",
            "chunk_start",
            F.least(
                F.lit(window).cast("long"),
                F.size("__toks") - F.col("chunk_start"),
            ).alias("n_chunk_tokens"),
            F.array_join(
                F.slice(
                    "__toks",
                    (F.col("chunk_start") + 1).cast("int"),
                    window,
                ),
                " ",
            ).alias("chunk_text"),
        )
    )


def pack_sequences(
    df: DataFrame,
    shard_col: str = "source",
    order_col: str = "doc_id",
    text_col: str = "text",
    budget: int = 512,
    count_col: str | None = None,
) -> DataFrame:
    """Concat-and-chunk sequence packing: assign each document the
    training-sequence bin where its first token lands when the shard's
    documents are concatenated in ``order_col`` order and cut every
    ``budget`` tokens — the packing model autoregressive training
    pipelines use to fill fixed-length context windows without padding.

    Adds ``pack_id`` (bin index within the shard) and ``pack_offset``
    (token offset of the document's start inside its bin). Pure integer
    window arithmetic: ONE shuffle, partitioned by shard — the running
    sum parallelizes across shards, so pick shards sized for one task's
    sort (the same contract as any partitioned window; a single global
    ordering would serialize the corpus through one task).

    ``count_col`` supplies REAL per-document token counts (e.g.
    ``operators/bpe.bpe_token_count``'s column) instead of the default
    whitespace estimate over ``text_col`` — the packing arithmetic is
    identical, only the length measure changes.
    """
    if budget < 1:
        raise ValueError(f"budget must be >= 1, got {budget}")
    from pyspark.sql import Window

    w = (
        Window.partitionBy(shard_col)
        .orderBy(order_col)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    n_tok = (
        F.col(count_col)
        if count_col is not None
        else F.size(tokens(text_col))
    )
    start = (F.sum(n_tok).over(w) - n_tok).cast("long")
    return (
        df.withColumn("__start", start)
        .withColumn(
            "pack_id", (F.col("__start") - F.col("__start") % budget) / budget
        )
        .withColumn("pack_id", F.col("pack_id").cast("long"))
        .withColumn("pack_offset", F.col("__start") % budget)
        .drop("__start")
    )


def pack_token_sequences(
    df: DataFrame,
    ids_col: str = "token_ids",
    shard_col: str = "source",
    order_col: str = "doc_id",
    budget: int = 512,
    out_col: str = "token_ids",
) -> DataFrame:
    """MATERIALIZE the packed training sequences: one row per
    ``(shard, pack_id)`` whose ``out_col`` is the fixed-length window's
    actual token ids — documents concatenated in ``order_col`` order
    and cut every ``budget`` tokens, the emission step a training
    pipeline consumes (:func:`pack_sequences` only PLANS the layout;
    this produces it). The trailing partial pack of each shard is kept
    (its array is shorter than ``budget``). Empty/NULL id arrays
    contribute nothing.

    Scale shape: token ids necessarily move once — that IS the output —
    in ONE shuffle: the trailing ``(shard, pack_id)`` aggregate reuses
    the window exchange's shard partitioning (grouping-key superset),
    verified in the compiled plan. Every output row is bounded by
    ``budget``; the per-shard running sum is the same single
    partitioned window as :func:`pack_sequences` (shard-sized sort,
    never global). Order inside a pack is restored by an
    ``array_sort`` over (offset, id) structs — exact positions, no
    reliance on collect order.

    ``order_col`` must be UNIQUE per shard (like every ordered window
    in the engine): ties make the concatenation order — and therefore
    the emitted windows — nondeterministic across runs.
    """
    if budget < 1:
        raise ValueError(f"budget must be >= 1, got {budget}")
    from pyspark.sql import Window

    w = (
        Window.partitionBy(shard_col)
        .orderBy(order_col)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    n = F.coalesce(F.size(ids_col), F.lit(0))
    start = (F.sum(n).over(w) - n).cast("long")
    # the running sum MUST resolve before the explode: a window and a
    # generator in one select evaluates the window over the exploded
    # rows (each token row re-adds its doc's full length)
    staged = df.select(
        F.col(shard_col), F.col(ids_col), start.alias("__start")
    )
    tok = staged.select(
        F.col(shard_col),
        F.col("__start"),
        F.posexplode(ids_col).alias("__p", "__id"),
    ).select(
        shard_col,
        (
            (F.col("__start") + F.col("__p"))
            - (F.col("__start") + F.col("__p")) % budget
        ).cast("long").alias("__cut"),
        ((F.col("__start") + F.col("__p")) % budget)
        .cast("int")
        .alias("__off"),
        F.col("__id"),
    )
    return (
        tok.groupBy(
            shard_col,
            (F.col("__cut") / budget).cast("long").alias("pack_id"),
        )
        .agg(
            F.array_sort(
                F.collect_list(F.struct(F.col("__off"), F.col("__id")))
            ).alias("__s")
        )
        .select(
            shard_col,
            "pack_id",
            F.transform(F.col("__s"), lambda x: x["__id"]).alias(
                out_col
            ),
        )
    )


def compression_ratio_column(
    df: DataFrame, text_col: str, out_col: str = "compression_ratio"
) -> DataFrame:
    """zlib compression ratio (compressed/raw bytes) per document — the
    CCNet/Gopher-family gibberish signal: boilerplate/repetition
    compresses far below normal prose (ratio << 0.3) while random or
    encrypted junk refuses to compress (ratio >> 0.5). The one
    deliberately-Python stage in this module (zlib needs bytes), run
    as an Arrow-batched pure map — bytes-proportional, zero shuffle,
    same posture as the codec probes. Empty/NULL text -> NULL."""
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("double")
    def _ratio(col: pd.Series) -> pd.Series:
        import zlib  # noqa: PLC0415 — executor-side

        def ratio(s: str):
            b = s.encode("utf-8")
            if not b:
                return None
            return len(zlib.compress(b, 6)) / len(b)

        return col.map(ratio, na_action="ignore")

    return df.withColumn(out_col, _ratio(F.col(text_col)))
