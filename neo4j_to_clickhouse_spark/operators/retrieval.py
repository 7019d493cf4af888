"""BM25 retrieval scoring over a document corpus.

Training-data pipelines use lexical retrieval at scale for
retrieval-based decontamination (find corpus docs matching eval-set
queries), quality-by-query curation, and dedup candidate generation.
The reference ships raw text to ClickHouse and has no retrieval surface
(`README.md:316-588` query list); this is a pipeline extension in the
same family as `operators/dedup.py`.

Scoring is Okapi BM25 with the Lucene-style non-negative idf:

    idf(t)   = ln((N - df_t + 0.5) / (df_t + 0.5) + 1)
    score(d) = sum_t idf(t) * tf_td*(k1+1) / (tf_td + k1*(1-b + b*|d|/avgdl))

100 TB design: the per-term document frequencies and the corpus stats
(N, avgdl) are tiny — one row per query term and one global row — so
both sides broadcast; the only data-sized work is ONE scan that
explodes to query-term hits (the `isin` filter prunes the explode
output immediately, so the shuffle carries only matching (doc, term)
pairs — for selective queries that is orders of magnitude below corpus
size) and a TakeOrdered heap for the top-k (never a full sort).
Per-term contributions round to 8 dp and sum as DECIMAL, so scores are
ordering- and partitioning-independent (the lm.py pattern) and the
DuckDB oracle can reproduce them bit-exactly.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def bm25_topk(
    docs: DataFrame,
    terms: Sequence[str],
    k: int = 20,
    k1: float = 1.2,
    b: float = 0.75,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Top-``k`` documents by BM25 score for the query ``terms``
    (whitespace tokenization, consistent with the text family).
    Returns ``(id_col, score)`` with ``score`` rounded to 6 dp,
    ordered by score descending then ``id_col`` (deterministic)."""
    toks = docs.select(
        F.col(id_col),
        F.split(F.col(text_col), " ").alias("toks"),
    ).withColumn("dl", F.size("toks"))
    # corpus stats: ONE row (broadcast via the 1-row crossJoin pattern)
    stats = toks.agg(
        F.count("*").alias("n_docs"), F.avg("dl").alias("avgdl")
    )
    tf = (
        toks.select(id_col, "dl", F.explode("toks").alias("term"))
        .where(F.col("term").isin(list(terms)))
        .groupBy(id_col, "dl", "term")
        .agg(F.count("*").alias("tf"))
    )
    # per-term df as a window count over tf (r15: tf carries one row
    # per (doc, term), so count(*) over the term partition IS
    # count_distinct(doc) — the old broadcast dfreq re-executed the
    # whole corpus explode a second time to build its build side)
    from pyspark.sql import Window

    tf = tf.withColumn(
        "df", F.count("*").over(Window.partitionBy("term"))
    )

    # expression shapes mirror the oracle SQL EXACTLY (same constant
    # folding, same operation order) so doubles agree bit-for-bit
    # before the 8 dp rounding
    k1p1 = k1 + 1.0
    one_minus_b = 1.0 - b
    idf: Column = F.log(
        (F.col("n_docs") - F.col("df") + 0.5) / (F.col("df") + 0.5) + 1.0
    )
    denom = F.col("tf") + k1 * (
        one_minus_b + b * F.col("dl") / F.col("avgdl")
    )
    contrib = F.round(idf * (F.col("tf") * k1p1) / denom, 8).cast(
        "decimal(20,8)"
    )
    scored = (
        tf.crossJoin(F.broadcast(stats))
        .withColumn("c", contrib)
        .groupBy(id_col)
        .agg(F.sum("c").alias("score_dec"))
        .select(
            id_col,
            F.round(F.col("score_dec").cast("double"), 6).alias("score"),
        )
    )
    return scored.orderBy(F.col("score").desc(), F.col(id_col)).limit(k)


def bm25_topk_per_query(
    docs: DataFrame,
    queries: DataFrame,
    k: int = 5,
    k1: float = 1.2,
    b: float = 0.75,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Batch BM25: top-``k`` documents PER QUERY for a whole query set
    — the retrieval-based-decontamination shape (thousands of eval-set
    queries against the full corpus in one pass).

    ``queries`` is ``(query_id, term)`` (one row per query term; a
    multi-token query is several rows). Returns ``(query_id, id_col,
    score, rank)`` with rank 1..k per query.

    100 TB design: the corpus is scanned and exploded ONCE; a literal
    ``In(term,…)`` filter from the (driver-bounded) query vocabulary
    prunes the explode output to hits inside codegen, per-(doc, term)
    contributions are computed once and shared across every query
    containing the term (a term in 1000 queries costs one computation,
    not 1000), per-term document frequency is a window count on the
    same hit table (not a broadcast build that re-executes the corpus
    explode), and the per-query top-k runs as a rank window — Spark's
    WindowGroupLimit pushes the k-cut into the shuffle read as a heap,
    so giant result groups are never fully sorted or materialized.
    """
    toks = docs.select(
        F.col(id_col),
        F.split(F.col(text_col), " ").alias("toks"),
    ).withColumn("dl", F.size("toks"))
    stats = toks.agg(
        F.count("*").alias("n_docs"), F.avg("dl").alias("avgdl")
    )
    # query vocabulary as a literal IN filter on the explode output
    # (r15: the vocabulary is driver-bounded by contract — a codegen
    # filter replaces the broadcast build job), and per-term df as a
    # window count over tf (one row per (doc, term) by construction,
    # so count(*) over the term partition IS count_distinct(doc) — the
    # old broadcast dfreq re-executed the corpus explode a second time)
    terms = sorted({r.term for r in queries.select("term").collect()})
    tf = (
        toks.select(id_col, "dl", F.explode("toks").alias("term"))
        .where(F.col("term").isin(terms))
        .groupBy(id_col, "dl", "term")
        .agg(F.count("*").alias("tf"))
    )
    from pyspark.sql import Window

    tf = tf.withColumn(
        "df", F.count("*").over(Window.partitionBy("term"))
    )
    k1p1 = k1 + 1.0
    one_minus_b = 1.0 - b
    idf = F.log(
        (F.col("n_docs") - F.col("df") + 0.5) / (F.col("df") + 0.5) + 1.0
    )
    denom = F.col("tf") + k1 * (
        one_minus_b + b * F.col("dl") / F.col("avgdl")
    )
    contrib = (
        tf.crossJoin(F.broadcast(stats))
        .withColumn(
            "c",
            F.round(idf * (F.col("tf") * k1p1) / denom, 8).cast(
                "decimal(20,8)"
            ),
        )
        .select(id_col, "term", "c")
    )

    w = Window.partitionBy("query_id").orderBy(
        F.col("score").desc(), F.col(id_col)
    )
    return (
        contrib.join(F.broadcast(queries), "term")
        .groupBy("query_id", id_col)
        .agg(
            F.round(F.sum("c").cast("double"), 6).alias("score")
        )
        .withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
    )


def build_bm25_index(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> tuple[DataFrame, DataFrame]:
    """Materialize the BM25 inverted index: the production "index once,
    query many" shape. Returns ``(postings, stats)`` where postings is
    ``(term, id_col, tf, dl)`` — one row per (document, distinct term)
    — and stats is the one-row ``(n_docs, avgdl)`` frame.

    At 100 TB the corpus is scanned exactly once here; every subsequent
    query set joins the postings on ``term`` (selective predicate
    pushdown if persisted partitioned/bucketed by term — parquet scans
    then read only the queried terms' row groups) instead of
    re-tokenizing petabytes. Per-term df is derivable from postings
    (`groupBy(term).count()`), so nothing else needs the raw text.
    """
    toks = docs.select(
        F.col(id_col),
        F.split(F.col(text_col), " ").alias("toks"),
    ).withColumn("dl", F.size("toks"))
    stats = toks.agg(
        F.count("*").alias("n_docs"), F.avg("dl").alias("avgdl")
    )
    postings = (
        toks.select(id_col, "dl", F.explode("toks").alias("term"))
        .groupBy("term", id_col, "dl")
        .agg(F.count("*").alias("tf"))
        .select("term", id_col, "tf", "dl")
    )
    return postings, stats


def write_bm25_index(
    postings: DataFrame,
    stats: DataFrame,
    path: str,
    n_buckets: int = 64,
) -> None:
    """Persist the inverted index term-bucket-partitioned — the layout
    that turns the query-time postings filter into PARTITION PRUNING
    (VERDICT r11 item 6). Terms hash into ``n_buckets`` directories
    (``term_bucket=pmod(xxhash64(term), n)``): a query set touches only
    its terms' buckets, so the scan never opens the other directories'
    files at all, and within a bucket the rows are sorted by term so
    parquet min/max row-group pruning serves the pushed ``In(term,…)``
    filter. Millions of raw terms would make ``partitionBy("term")``
    itself a small-files catastrophe at 100 TB; bounded hash buckets
    keep directory count fixed (raise ``n_buckets`` into the thousands
    for a petabyte-scale index so each bucket stays executor-sized)."""
    (
        postings.withColumn(
            "term_bucket",
            F.pmod(F.xxhash64("term"), F.lit(n_buckets)),
        )
        .repartition(n_buckets, F.col("term_bucket"))
        .sortWithinPartitions("term")
        .write.partitionBy("term_bucket")
        .mode("overwrite")
        .parquet(f"{path}/postings")
    )
    stats.write.mode("overwrite").parquet(f"{path}/stats")
    spark = postings.sparkSession
    spark.createDataFrame(
        [(int(n_buckets),)], "n_buckets int"
    ).write.mode("overwrite").parquet(f"{path}/meta")


def load_bm25_index(
    spark,
    path: str,
    queries: DataFrame | None = None,
) -> tuple[DataFrame, DataFrame]:
    """Load ``(postings, stats)`` from :func:`write_bm25_index`. With a
    ``queries`` frame (``query_id, term``) the postings read is pruned
    to the query terms' buckets: the bucket keys compute with the SAME
    JVM hash expression the writer used (one query-vocabulary-bounded
    collect — the contract-bounded pattern of `similarity.py`), then
    land as literal IN filters so Catalyst prunes partitions on
    ``term_bucket`` and pushes ``In(term,…)`` into the parquet scan.

    The KB-sized metadata halves never launch a distributed job (r15
    optimization round): ``meta`` and ``stats`` are single-row sidecar
    files, read driver-side via pyarrow — reading them through a Spark
    scan cost two scheduler round-trips per query set — and ``stats``
    returns as a local (in-memory) DataFrame so its broadcast later
    builds from driver data instead of another parquet scan job. The
    bucket keys for a local ``queries`` frame likewise compute in one
    constant-folded local projection (``ConvertToLocalRelation``), not
    a distinct+hash shuffle job.
    """
    import glob
    import json

    import pyarrow.parquet as pq

    meta_tbl = pq.read_table(f"{path}/meta")
    n_buckets = int(meta_tbl.column("n_buckets")[0].as_py())
    stats_rows = pq.read_table(f"{path}/stats").to_pylist()
    stats = spark.createDataFrame(
        [(r["n_docs"], r["avgdl"]) for r in stats_rows],
        "n_docs bigint, avgdl double",
    )
    # explicit read schema from ONE footer, driver-side: Spark's own
    # row metadata rides in the footer, and the partition column stays
    # the string the session's disabled type inference would yield —
    # skips the distributed footer-inference job over the bucket dirs
    schema = None
    files = glob.glob(f"{path}/postings/term_bucket=*/*.parquet")
    if files:
        from pyspark.sql.types import StringType, StructType

        meta = pq.read_schema(files[0]).metadata or {}
        row_meta = meta.get(b"org.apache.spark.sql.parquet.row.metadata")
        if row_meta:
            schema = StructType.fromJson(json.loads(row_meta)).add(
                "term_bucket", StringType()
            )
    postings = (
        spark.read.schema(schema).parquet(f"{path}/postings")
        if schema is not None
        else spark.read.parquet(f"{path}/postings")
    )
    if queries is None:
        return postings.drop("term_bucket"), stats
    # ONE collect for terms AND buckets: the hash projects per query
    # row (no distinct exchange — the query vocabulary is driver-
    # bounded by contract, so the dedupe is a driver set-build), and a
    # local queries frame constant-folds the whole projection
    rows = queries.select(
        "term",
        F.pmod(F.xxhash64("term"), F.lit(n_buckets)).alias("b"),
    ).collect()
    terms = sorted({r.term for r in rows})
    buckets = sorted({int(r.b) for r in rows})
    pruned = postings.where(
        F.col("term_bucket").isin(buckets) & F.col("term").isin(terms)
    )
    return pruned.drop("term_bucket"), stats


def bm25_topk_indexed(
    postings: DataFrame,
    stats: DataFrame,
    queries: DataFrame,
    k: int = 5,
    k1: float = 1.2,
    b: float = 0.75,
    id_col: str = "doc_id",
) -> DataFrame:
    """Batch BM25 over a prebuilt index from :func:`build_bm25_index`
    (or loaded from its persisted parquet). Bit-identical scores to
    :func:`bm25_topk_per_query` — asserted by tests — without touching
    document text. The postings filter (a literal ``In(term,…)`` built
    from the driver-bounded query vocabulary, r15: replaces a broadcast
    distinct+join — the IN predicate pushes into the parquet scan,
    where the old broadcast build was an extra exchange+job) is the
    only data-sized read; a term-partitioned store turns it into
    partition pruning."""
    terms = sorted({r.term for r in queries.select("term").collect()})
    from pyspark.sql import Window

    # per-term document frequency as a window count over the ONE
    # postings scan (r15: replaces a second scan + groupBy +
    # broadcast-build job): postings carry one row per (document,
    # distinct term) by build_bm25_index's contract, so count(*) over
    # the term partition IS count_distinct(doc) — same exchange the
    # scoring shuffle needs anyway, constant window state
    w_t = Window.partitionBy("term")
    hits = postings.where(F.col("term").isin(terms)).withColumn(
        "df", F.count("*").over(w_t)
    )
    k1p1 = k1 + 1.0
    one_minus_b = 1.0 - b
    idf = F.log(
        (F.col("n_docs") - F.col("df") + 0.5) / (F.col("df") + 0.5) + 1.0
    )
    denom = F.col("tf") + k1 * (
        one_minus_b + b * F.col("dl") / F.col("avgdl")
    )
    contrib = (
        hits.crossJoin(F.broadcast(stats))
        .withColumn(
            "c",
            F.round(idf * (F.col("tf") * k1p1) / denom, 8).cast(
                "decimal(20,8)"
            ),
        )
        .select(id_col, "term", "c")
    )

    w = Window.partitionBy("query_id").orderBy(
        F.col("score").desc(), F.col(id_col)
    )
    return (
        contrib.join(F.broadcast(queries), "term")
        .groupBy("query_id", id_col)
        .agg(F.round(F.sum("c").cast("double"), 6).alias("score"))
        .withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
    )
