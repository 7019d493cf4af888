"""Streaming corpus ingestion: ``.warc.gz`` drops -> documents table.

The batch corpus chain (WARC parse -> HTTP filter -> URL
canonicalization -> robots filter -> charset decode -> HTML extraction,
each stage oracle-certified) composed over Structured Streaming
(VERDICT r11 item 5): crawls land as file drops, and the engine's
ingest paths run both ways (SURVEY §2.10). The transform is ONE shared
function (:func:`corpus_documents`) applied identically by the batch
reader and by every micro-batch, so batch/stream equivalence is by
construction — asserted in ``tests/test_corpus_stream.py``.

Sink: the same checkpointed idempotent machinery as CDC ingest —
``foreachBatch`` staging + :func:`.._promote_staged`'s deterministic
``batch-<query>~<id>-<i>`` renames, so a replayed micro-batch (crash
between data write and checkpoint commit) replaces its own output
instead of duplicating it, and a restart against the same checkpoint
never re-reads drained files. Undecodable bodies flow to the
quarantine lane (raw bytes + reason) exactly as in batch.

100 TB design: the file-stream source hands whole ``.warc.gz`` files
to executors (file-granular parallelism, ``maxFilesPerTrigger`` as the
backpressure knob); every stage below is the batch chain's plan —
Arrow map for WARC/decode/extract, codegen for canon, broadcast +
array-aggregate for robots — so the stream inherits the batch plan's
zero-URL-shuffle shape unchanged.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.streaming import StreamingQuery

from ..functions.url import canonicalize_url, url_host, url_path
from ..operators.charset import (
    charset_column,
    decode_text_column,
    split_decoded,
)
from ..operators.html import extract_text_column
from ..sources.robots import apply_robots
from ..sources.warc import warc_records

# binaryFile's fixed schema — streaming file sources require it spelled
# out (Spark refuses schema inference on a stream)
_BINARY_FILE_SCHEMA = (
    "path string, modificationTime timestamp, length long, content binary"
)


def _file_stream(
    spark: SparkSession,
    path: str,
    glob: str,
    max_files_per_trigger: int | None,
) -> DataFrame:
    reader = (
        spark.readStream.format("binaryFile")
        .schema(_BINARY_FILE_SCHEMA)
        .option("pathGlobFilter", glob)
    )
    if max_files_per_trigger is not None:
        reader = reader.option(
            "maxFilesPerTrigger", str(max_files_per_trigger)
        )
    return reader.load(path)


def read_warc_file_stream(
    spark: SparkSession,
    path: str,
    max_files_per_trigger: int | None = None,
) -> DataFrame:
    """Streaming source over a drop directory of ``.warc``/``.warc.gz``
    files (one row per NEW file; the checkpoint's file log makes the
    source exactly-once across restarts)."""
    return _file_stream(spark, path, "*.warc*", max_files_per_trigger)


def corpus_documents(
    files: DataFrame,
    rules: DataFrame,
    agent: str = "*",
    enrich: bool = False,
) -> tuple[DataFrame, DataFrame]:
    """The shared batch/stream transform: ``binaryFile`` rows ->
    ``(documents, quarantine)``. Documents carry the canonical URL,
    resolved charset, and extracted text; quarantine keeps raw bytes +
    reason for undecodable bodies (M5 dead-letter). With ``enrich``
    the curation signals land in the same scan (all pure codegen —
    free at any scale): ``lang`` (marker-lexicon language ID),
    ``quality_score``, and ``n_tokens``."""
    recs = warc_records(files)
    resp = recs.where(
        (F.col("warc_type") == "response")
        & (F.col("http_status") == 200)
    )
    canon = (
        resp.withColumn("canonical", canonicalize_url(F.col("target_uri")))
        .withColumn("host", url_host("canonical"))
        .withColumn("path", url_path("canonical"))
    )
    allowed = apply_robots(canon, rules, agent=agent).where(
        F.col("crawl_allowed")
    )
    dec = decode_text_column(
        allowed.withColumn(
            "charset", charset_column("content_type", "body")
        ),
        out_col="html",
    )
    good, quar = split_decoded(dec)
    docs = extract_text_column(good, "html", "text").select(
        "file",
        "record_id",
        "canonical",
        "host",
        "content_type",
        "charset",
        "text",
        F.length("text").alias("n_chars"),
    )
    if enrich:
        from ..operators.text import (
            detect_language,
            quality_score,
            token_count,
        )

        docs = (
            docs.withColumn("lang", detect_language("text"))
            .withColumn("quality_score", quality_score("text"))
            .withColumn("n_tokens", token_count("text"))
        )
    quarantine = quar.select(
        "file",
        "record_id",
        "canonical",
        "host",
        "content_type",
        "charset",
        "body",
        "reason",
    )
    return docs, quarantine


def read_wet_file_stream(
    spark: SparkSession,
    path: str,
    max_files_per_trigger: int | None = None,
) -> DataFrame:
    """Streaming source over a drop directory of ``.wet``/``.wet.gz``
    files (Common Crawl extracted text)."""
    return _file_stream(spark, path, "*.wet*", max_files_per_trigger)


def _stage_outputs(
    outputs, batch_id: int, query_name: str
) -> None:
    """Stage-and-promote every ``(frame, root)`` pair under
    deterministic batch-tagged names (`.pipeline._promote_staged`) —
    the ONE idempotent-sink body every file-ingest stream shares."""
    import os

    from .pipeline import _promote_staged

    for frame, root in outputs:
        staging = os.path.join(root, f".staging-{query_name}~{batch_id}")
        frame.write.mode("overwrite").parquet(staging)
        _promote_staged(staging, root, batch_id, query_name)


def _start_foreach(
    files_stream: DataFrame,
    process,
    checkpoint_path: str,
    processing_time: str | None,
    query_name: str,
) -> StreamingQuery:
    """Shared writer wiring: checkpointed foreachBatch; with
    ``processing_time=None`` the query drains available files and stops
    (``availableNow`` — the test/backfill mode)."""
    writer = (
        files_stream.writeStream.queryName(query_name)
        .foreachBatch(process)
        .option("checkpointLocation", checkpoint_path)
    )
    if processing_time is None:
        writer = writer.trigger(availableNow=True)
    else:
        writer = writer.trigger(processingTime=processing_time)
    return writer.start()


def _start_multi_ingest(
    files_stream: DataFrame,
    outputs_fn,
    checkpoint_path: str,
    processing_time: str | None,
    query_name: str,
) -> StreamingQuery:
    """Checkpointed foreachBatch sink over
    ``outputs_fn(batch_df, batch_id) -> [(frame, root), ...]``."""

    def process(batch_df: DataFrame, batch_id: int) -> None:
        _stage_outputs(outputs_fn(batch_df, batch_id), batch_id, query_name)

    return _start_foreach(
        files_stream, process, checkpoint_path, processing_time, query_name
    )


def _start_file_ingest(
    files_stream: DataFrame,
    transform,
    table_path: str,
    quarantine_path: str,
    checkpoint_path: str,
    processing_time: str | None,
    coalesce_output: int | None,
    query_name: str,
) -> StreamingQuery:
    """The shared checkpointed idempotent sink: per micro-batch,
    ``transform(batch) -> (docs, quarantine)``, both staged and
    promoted under deterministic batch-tagged names."""

    def outputs(batch_df: DataFrame, batch_id: int):
        docs, quar = transform(batch_df)
        if coalesce_output:
            docs = docs.coalesce(coalesce_output)
            quar = quar.coalesce(1)
        return ((docs, table_path), (quar, quarantine_path))

    return _start_multi_ingest(
        files_stream, outputs, checkpoint_path, processing_time, query_name
    )


def start_wet_stream(
    files_stream: DataFrame,
    table_path: str,
    quarantine_path: str,
    checkpoint_path: str,
    processing_time: str | None = None,
    coalesce_output: int | None = None,
    query_name: str = "wet_ingest",
) -> StreamingQuery:
    """WET drops -> documents table, continuously: conversion records
    strictly UTF-8 decoded (quarantine lane for broken bodies) through
    the same checkpointed idempotent sink as the WARC stream. The
    transform is `sources.warc.wet_documents` verbatim — batch/stream
    equivalence by construction."""
    from ..sources.warc import wet_documents

    return _start_file_ingest(
        files_stream,
        wet_documents,
        table_path,
        quarantine_path,
        checkpoint_path,
        processing_time,
        coalesce_output,
        query_name,
    )


def start_corpus_stream(
    files_stream: DataFrame,
    rules: DataFrame,
    table_path: str,
    quarantine_path: str,
    checkpoint_path: str,
    agent: str = "*",
    processing_time: str | None = None,
    coalesce_output: int | None = None,
    query_name: str = "corpus_ingest",
    enrich: bool = False,
) -> StreamingQuery:
    """Run the corpus chain continuously into ``table_path`` with the
    checkpointed idempotent sink (see module docstring). With
    ``processing_time=None`` the query drains available files and
    stops (``availableNow``) — the test/backfill mode."""
    return _start_file_ingest(
        files_stream,
        lambda batch: corpus_documents(
            batch, rules, agent=agent, enrich=enrich
        ),
        table_path,
        quarantine_path,
        checkpoint_path,
        processing_time,
        coalesce_output,
        query_name,
    )


def start_corpus_neardup_stream(
    files_stream: DataFrame,
    rules: DataFrame,
    table_path: str,
    quarantine_path: str,
    store_path: str,
    checkpoint_path: str,
    agent: str = "*",
    processing_time: str | None = None,
    coalesce_output: int | None = None,
    query_name: str = "corpus_neardup",
    enrich: bool = False,
    n: int = 3,
    num_hashes: int = 64,
    bands: int = 32,
    threshold: float = 0.5,
    in_batch: bool = False,
) -> StreamingQuery:
    """The corpus chain with CONTINUOUS near-dedup: each micro-batch
    runs WARC -> canon -> robots -> charset -> extract, then
    ``minhash_incremental`` against the hash-only store accumulated by
    every PRIOR batch; only near-dup-free survivors land in
    ``table_path``, and the survivors' own band-bucket / shingle-digest
    rows append to ``store_path`` (``buckets/`` + ``digests/`` halves,
    each row stamped with its batch id).

    Exactly-once across replays: a replayed batch re-reads the store
    filtered to ``batch < batch_id`` — its own half-written rows from a
    crashed attempt are invisible to the probe AND overwritten by the
    promote (deterministic batch-tagged names), so the batch can never
    near-dup against itself. With ``in_batch=True`` the batch is first
    deduped against ITSELF (``minhash_lsh_dedup`` pair graph ->
    ``dedup_by_pairs`` keep-lowest-record-id) before the store probe —
    the full daily-crawl contract; deterministic, so replays still
    converge. Off by default: intra-batch near-dup is often already
    handled upstream, and the in-batch pair join is the one
    batch-quadratic-ish stage of the chain.

    Scale shape: the store probe is one equi-join on band hashes
    (shuffle ∝ batch, not store) + the candidate-bounded digest verify
    — the store is parquet the probe filters by the ``batch`` column,
    never fully aggregated; store growth is hash-only (no bodies).

    Paths must be LOCAL-filesystem (like every sink built on
    ``_promote_staged``'s ``os.replace`` renames): a remote URI would
    silently defeat the first-batch store check, so it is rejected up
    front instead.
    """
    import os
    from urllib.parse import urlparse

    from pyspark.errors import AnalysisException

    for label, pth in (
        ("table_path", table_path),
        ("quarantine_path", quarantine_path),
        ("store_path", store_path),
    ):
        if urlparse(pth).scheme not in ("", "file"):
            raise ValueError(
                f"{label}={pth!r}: the staged-promote sink and the "
                "store's first-batch check are local-filesystem only "
                "(os.replace / os.path.isdir) — mount the store "
                "locally or extend _promote_staged for remote FS"
            )

    from ..operators.dedup import (
        dedup_by_pairs,
        lsh_store,
        lsh_store_buckets,
        lsh_store_digests,
        minhash_incremental,
        minhash_lsh_dedup,
    )

    bpath = os.path.join(store_path, "buckets")
    dpath = os.path.join(store_path, "digests")

    def _prior(spark, path: str, schema_df: DataFrame, batch_id: int):
        # ONLY "no committed data yet" means first batch: a missing dir,
        # or a dir holding nothing but hidden entries (a crashed first
        # attempt leaves a .staging-* dir the promote never moved —
        # Spark ignores dot-files, so reading would raise
        # UNABLE_TO_INFER_SCHEMA and wedge every replay). Any OTHER
        # read failure (corrupt footer, transient FS error) must raise —
        # an empty-store fallback there would silently commit near-dups.
        if not os.path.isdir(path) or not any(
            not e.startswith((".", "_")) for e in os.listdir(path)
        ):
            return schema_df
        try:
            return (
                spark.read.parquet(path)
                .where(F.col("batch") < batch_id)
                .drop("batch")
            )
        except AnalysisException as e:
            if "PATH_NOT_FOUND" in str(e):
                return schema_df
            raise

    def process(batch_df: DataFrame, batch_id: int) -> None:
        spark = batch_df.sparkSession
        caches: list[DataFrame] = []
        try:
            _process_inner(spark, batch_df, batch_id, caches)
        finally:
            # release every cache the batch registered no matter where
            # it failed — a retried batch re-registers a fresh set, and
            # without this the CacheManager accrues dead entries
            for frame in caches:
                frame.unpersist()

    def _process_inner(spark, batch_df, batch_id, caches):
        docs, quar = corpus_documents(
            batch_df, rules, agent=agent, enrich=enrich
        )
        kw = dict(n=n, num_hashes=num_hashes, bands=bands)
        if in_batch:
            pairs = minhash_lsh_dedup(
                docs,
                id_col="record_id",
                text_col="text",
                threshold=threshold,
                caches=caches,
                **kw,
            )
            docs = dedup_by_pairs(docs, pairs, id_col="record_id")
        empty = docs.limit(0)
        prior_b = _prior(
            spark,
            bpath,
            lsh_store_buckets(empty, "record_id", "text", **kw),
            batch_id,
        )
        prior_d = _prior(
            spark,
            dpath,
            lsh_store_digests(empty, "record_id", "text", n=n),
            batch_id,
        )
        surv = minhash_incremental(
            docs,
            prior_b,
            prior_d,
            id_col="record_id",
            text_col="text",
            threshold=threshold,
            caches=caches,
            **kw,
        )
        from pyspark import StorageLevel

        surv = surv.persist(StorageLevel.MEMORY_AND_DISK)
        caches.append(surv)
        # ONE shared shingle pass for both store halves (lsh_store)
        new_b, new_d = lsh_store(
            surv, "record_id", "text", caches=caches, **kw
        )
        tag = F.lit(batch_id).cast("long").alias("batch")
        new_b = new_b.select("*", tag)
        new_d = new_d.select("*", tag)
        out_docs = surv
        if coalesce_output:
            out_docs = surv.coalesce(coalesce_output)
            quar = quar.coalesce(1)
            new_b = new_b.coalesce(1)
            new_d = new_d.coalesce(1)
        _stage_outputs(
            (
                (out_docs, table_path),
                (quar, quarantine_path),
                (new_b, bpath),
                (new_d, dpath),
            ),
            batch_id,
            query_name,
        )

    return _start_foreach(
        files_stream, process, checkpoint_path, processing_time, query_name
    )
