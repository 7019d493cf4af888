"""Streaming corpus ingestion (streaming/corpus.py — VERDICT r11
item 5): batch/stream equivalence on the shared transform, checkpoint
exactly-once, and micro-batch replay idempotency."""

import shutil

import pytest
from pyspark.sql import functions as F

from neo4j_to_clickhouse_spark.sources.robots import robots_rules_df
from neo4j_to_clickhouse_spark.sources.warc import encode_warc
from neo4j_to_clickhouse_spark.streaming.corpus import (
    corpus_documents,
    read_warc_file_stream,
    start_corpus_stream,
)
from neo4j_to_clickhouse_spark.streaming.pipeline import drain

ROBOTS = "User-agent: *\nDisallow: /blocked\n"


def _warc_files(tmp_path, n_files=3):
    """Drop dir with one .warc.gz per call: per file — 2 good docs
    (one utf-8, one gbk-by-header), 1 latin-1 meta-sniffed doc, 1
    robots-blocked, 1 http-404, 1 broken-byte (quarantine)."""
    drop = tmp_path / "drop"
    drop.mkdir(exist_ok=True)
    for i in range(n_files):
        recs = [
            {
                "uri": f"http://h{i}.com/ok{i}#frag",
                "body": f"<p>doc {i} alpha</p>".encode(),
                "status": 200,
                "content_type": "text/html; charset=utf-8",
            },
            {
                "uri": f"http://h{i}.com/gbk{i}",
                "body": f"<p>doc {i} 汉字</p>".encode("gbk"),
                "status": 200,
                "content_type": "text/html; charset=gbk",
            },
            {
                "uri": f"http://h{i}.com/latin{i}",
                "body": (
                    f'<meta charset="ISO-8859-1"><p>caf\xe9 {i}</p>'
                ).encode("iso-8859-1"),
                "status": 200,
                "content_type": "text/html",
            },
            {
                "uri": f"http://h{i}.com/blocked/x{i}",
                "body": b"<p>hidden</p>",
                "status": 200,
                "content_type": "text/html",
            },
            {
                "uri": f"http://h{i}.com/gone{i}",
                "body": b"<p>404 page</p>",
                "status": 404,
                "content_type": "text/html",
            },
            {
                "uri": f"http://h{i}.com/broken{i}",
                "body": b"<p>pre</p>\xff\xfe",
                "status": 200,
                "content_type": "text/html",
            },
        ]
        (drop / f"f{i}.warc.gz").write_bytes(
            encode_warc(recs, gzip_per_record=True)
        )
    return drop


def _rules(spark, n_files=3):
    return robots_rules_df(
        spark, [(f"h{i}.com", ROBOTS) for i in range(n_files)]
    )


def test_batch_transform_lanes(spark, tmp_path):
    drop = _warc_files(tmp_path)
    files = (
        spark.read.format("binaryFile")
        .option("pathGlobFilter", "*.warc*")
        .load(str(drop))
    )
    docs, quar = corpus_documents(files, _rules(spark))
    d = docs.collect()
    # 3 good docs per file (utf-8 + gbk + latin-1); blocked/404 dropped
    assert len(d) == 9
    texts = {r.text for r in d}
    assert "doc 0 alpha" in texts
    assert "doc 1 汉字" in texts
    assert "café 2" in texts
    assert {r.charset for r in d} == {"utf-8", "gbk", "iso-8859-1"}
    # fragment dropped by canonicalization
    assert all("#" not in r.canonical for r in d)
    q = quar.collect()
    assert len(q) == 3
    assert all(r.reason == "undecodable:utf-8" for r in q)


def test_stream_equals_batch_and_checkpoint_exactly_once(spark, tmp_path):
    drop = _warc_files(tmp_path)
    rules = _rules(spark)
    table = str(tmp_path / "docs")
    quar = str(tmp_path / "quar")
    ckpt = str(tmp_path / "ckpt")

    files_b = (
        spark.read.format("binaryFile")
        .option("pathGlobFilter", "*.warc*")
        .load(str(drop))
    )
    want_docs, want_quar = corpus_documents(files_b, rules)
    want = sorted(
        (r.canonical, r.charset, r.text, r.n_chars)
        for r in want_docs.collect()
    )
    want_q = sorted(
        (r.canonical, r.reason) for r in want_quar.collect()
    )

    drain(
        start_corpus_stream(
            read_warc_file_stream(spark, str(drop)),
            rules, table, quar, ckpt, coalesce_output=1,
        )
    )
    got = sorted(
        (r.canonical, r.charset, r.text, r.n_chars)
        for r in spark.read.parquet(table).collect()
    )
    assert got == want
    got_q = sorted(
        (r.canonical, r.reason)
        for r in spark.read.parquet(quar).collect()
    )
    assert got_q == want_q

    # restart against the same checkpoint: drained files are NOT
    # re-ingested (file-source offset log = exactly-once) ...
    drain(
        start_corpus_stream(
            read_warc_file_stream(spark, str(drop)),
            rules, table, quar, ckpt, coalesce_output=1,
        )
    )
    assert spark.read.parquet(table).count() == len(want)

    # ... while a NEW drop is picked up incrementally
    recs = [{
        "uri": "http://h0.com/late",
        "body": b"<p>late doc</p>",
        "status": 200,
        "content_type": "text/html; charset=utf-8",
    }]
    (drop / "late.warc.gz").write_bytes(
        encode_warc(recs, gzip_per_record=True)
    )
    drain(
        start_corpus_stream(
            read_warc_file_stream(spark, str(drop)),
            rules, table, quar, ckpt, coalesce_output=1,
        )
    )
    after = spark.read.parquet(table)
    assert after.count() == len(want) + 1
    assert after.where(F.col("text") == "late doc").count() == 1


def test_wet_stream_equals_batch(spark, tmp_path):
    from neo4j_to_clickhouse_spark.sources.warc import (
        encode_wet,
        wet_documents,
    )
    from neo4j_to_clickhouse_spark.streaming.corpus import (
        read_wet_file_stream,
        start_wet_stream,
    )

    drop = tmp_path / "wetdrop"
    drop.mkdir()
    for i in range(2):
        recs = [
            {"uri": f"http://w{i}.com/a", "body": f"text {i} alpha".encode()},
            {"uri": f"http://w{i}.com/b", "body": b"bad \xff"},
        ]
        (drop / f"f{i}.warc.wet.gz").write_bytes(
            encode_wet(recs, gzip_per_record=True)
        )
    files_b = (
        spark.read.format("binaryFile")
        .option("pathGlobFilter", "*.wet*")
        .load(str(drop))
    )
    want_docs, want_quar = wet_documents(files_b)
    want = sorted((r.target_uri, r.text) for r in want_docs.collect())
    table = str(tmp_path / "wdocs")
    quar = str(tmp_path / "wquar")
    drain(
        start_wet_stream(
            read_wet_file_stream(spark, str(drop)),
            table, quar, str(tmp_path / "wckpt"), coalesce_output=1,
        )
    )
    got = sorted(
        (r.target_uri, r.text)
        for r in spark.read.parquet(table).collect()
    )
    assert got == want
    assert (
        spark.read.parquet(quar).count() == want_quar.count() == 2
    )


def test_microbatch_replay_is_idempotent(spark, tmp_path):
    """A re-run of the same batch_id (crash between data write and
    checkpoint commit) replaces its own output — no duplicates."""
    import glob
    import os

    from neo4j_to_clickhouse_spark.streaming.pipeline import (
        _promote_staged,
    )

    drop = _warc_files(tmp_path, n_files=1)
    rules = _rules(spark, n_files=1)
    table = str(tmp_path / "docs")
    files = (
        spark.read.format("binaryFile")
        .option("pathGlobFilter", "*.warc*")
        .load(str(drop))
    )

    def write_once(batch_id):
        docs, _ = corpus_documents(files, rules)
        staging = os.path.join(table, f".staging-corpus_ingest~{batch_id}")
        docs.coalesce(1).write.mode("overwrite").parquet(staging)
        _promote_staged(staging, table, batch_id, "corpus_ingest")

    write_once(3)
    n1 = spark.read.parquet(table).count()
    # plant a stale partial file from a "crashed" earlier attempt
    part = glob.glob(os.path.join(table, "batch-*.parquet"))[0]
    shutil.copy(part, os.path.join(table, "batch-corpus_ingest~000000003-99999.parquet"))
    write_once(3)  # full replay
    assert spark.read.parquet(table).count() == n1
    write_once(4)  # new batch appends
    assert spark.read.parquet(table).count() == 2 * n1


def test_enriched_documents_carry_quality_columns(spark, tmp_path):
    drop = _warc_files(tmp_path, n_files=1)
    files = (
        spark.read.format("binaryFile")
        .option("pathGlobFilter", "*.warc*")
        .load(str(drop))
    )
    docs, _ = corpus_documents(files, _rules(spark, 1), enrich=True)
    rows = docs.collect()
    assert {"lang", "quality_score", "n_tokens"} <= set(docs.columns)
    en = [r for r in rows if r.text == "doc 0 alpha"][0]
    assert en.n_tokens == 3
    assert 0.0 <= en.quality_score <= 1.0
    # enrichment stays codegen: the enriched plan has exactly as many
    # Python stages as the plain one (decode + extract), none added.
    # Fresh (unexecuted) frames both sides: a collected AQE plan's
    # toString carries Final+Initial sections and double-counts nodes.
    docs, _ = corpus_documents(files, _rules(spark, 1), enrich=True)
    plain, _ = corpus_documents(files, _rules(spark, 1))

    def py_ops(df):
        plan = df._jdf.queryExecution().executedPlan().toString()
        assert "BatchEvalPython" not in plan
        return (
            plan.count("ArrowEvalPython") + plan.count("MapInPandas")
        )

    assert py_ops(docs) == py_ops(plain)


def test_streamed_corpus_feeds_incremental_dedup(spark, tmp_path):
    """End-to-end composition: enriched streamed documents table ->
    incremental exact dedup against a hash store (the daily-ingest
    loop closing over a crawl drop)."""
    from neo4j_to_clickhouse_spark.operators.dedup import (
        dedup_incremental,
    )
    from neo4j_to_clickhouse_spark.streaming.corpus import (
        read_warc_file_stream,
        start_corpus_stream,
    )

    drop = _warc_files(tmp_path, n_files=2)
    table = str(tmp_path / "docs")
    drain(
        start_corpus_stream(
            read_warc_file_stream(spark, str(drop)),
            _rules(spark, 2),
            table,
            str(tmp_path / "quar"),
            str(tmp_path / "ckpt"),
            coalesce_output=1,
            enrich=True,
        )
    )
    docs = spark.read.parquet(table)
    assert {"lang", "quality_score", "n_tokens"} <= set(docs.columns)
    # seed the store with file-0's doc hashes; the "next day" batch is
    # the whole table — only file-1's three docs survive
    from neo4j_to_clickhouse_spark.operators.dedup import content_hash

    seen = (
        docs.where(F.col("canonical").contains("h0.com"))
        .select(content_hash("text").alias("content_hash"))
    )
    survivors = dedup_incremental(
        docs, seen, id_col="record_id", text_col="text"
    )
    got = {r.canonical for r in survivors.collect()}
    assert len(got) == 3
    assert all("h1.com" in c for c in got)


# --- continuous near-dedup (start_corpus_neardup_stream) ---------------------

_ND_BODY = (
    "one two three four five six seven eight nine ten eleven twelve "
    "thirteen fourteen fifteen sixteen seventeen eighteen nineteen twenty"
)


def _neardup_drop(tmp_path):
    drop = tmp_path / "drop"
    drop.mkdir(exist_ok=True)
    recs = [
        {
            "uri": "http://h0.com/a",
            "body": f"<p>{_ND_BODY}</p>".encode(),
            "status": 200,
            "content_type": "text/html; charset=utf-8",
        },
        {
            "uri": "http://h0.com/b",
            "body": b"<p>completely different historical content here</p>",
            "status": 200,
            "content_type": "text/html; charset=utf-8",
        },
    ]
    (drop / "f0.warc.gz").write_bytes(
        encode_warc(recs, gzip_per_record=True)
    )
    return drop


def _neardup_phase2(drop):
    # a near-clone of /a (one word changed: J = 15/21 > 0.5) + a novel doc
    recs = [
        {
            "uri": "http://h0.com/c",
            "body": f"<p>{_ND_BODY.replace('eleven', 'ELEVEN')}</p>".encode(),
            "status": 200,
            "content_type": "text/html; charset=utf-8",
        },
        {
            "uri": "http://h0.com/d",
            "body": b"<p>unrelated fresh page with entirely novel words</p>",
            "status": 200,
            "content_type": "text/html; charset=utf-8",
        },
    ]
    (drop / "f1.warc.gz").write_bytes(
        encode_warc(recs, gzip_per_record=True)
    )


def test_stream_scores_documents_with_trained_classifier(spark, tmp_path):
    """classifier_weights threads a trained model into the ingest
    stream: every stored document carries classifier_score, equal to
    batch score_documents on the same ClassifierModel — the artifact
    carries its own (hasher, seed, bigrams), so no call-site hasher."""
    from neo4j_to_clickhouse_spark.operators.classifier import (
        ClassifierModel,
        score_documents,
        weight_table,
    )
    from neo4j_to_clickhouse_spark.streaming.corpus import (
        start_corpus_stream,
    )

    drop = _warc_files(tmp_path, 2)
    rules = _rules(spark, 2)
    model = ClassifierModel(
        weights=tuple(weight_table(64)), hasher="xxhash64"
    )
    drain(
        start_corpus_stream(
            read_warc_file_stream(spark, str(drop)),
            rules,
            table_path=str(tmp_path / "docs"),
            quarantine_path=str(tmp_path / "quar"),
            checkpoint_path=str(tmp_path / "ckpt"),
            coalesce_output=1,
            classifier_weights=model,
        )
    )
    got = spark.read.parquet(str(tmp_path / "docs"))
    assert "classifier_score" in got.columns
    want = {
        r["canonical"]: r["classifier_score"]
        for r in score_documents(
            got.drop("classifier_score"),
            "text",
            model,
            out_col="classifier_score",
        ).collect()
    }
    for r in got.collect():
        assert r["classifier_score"] == want[r["canonical"]]
    assert any(v != 0.0 for v in want.values())


def test_classifier_bucket_space_is_explicit(spark, tmp_path):
    """The train->score hash-space boundary fails loudly instead of
    silently mis-scoring (ADVICE r13): a bare weight list demands an
    explicit classifier_hasher, and a ClassifierModel rejects a
    conflicting one."""
    import pytest

    from neo4j_to_clickhouse_spark.operators.classifier import (
        ClassifierModel,
        weight_table,
    )
    from neo4j_to_clickhouse_spark.streaming.corpus import (
        corpus_documents,
    )

    drop = _warc_files(tmp_path, 1)
    rules = _rules(spark, 1)
    files = spark.read.format("binaryFile").load(str(drop))
    w = weight_table(16)
    with pytest.raises(ValueError, match="explicit\\s+classifier_hasher"):
        corpus_documents(files, rules, classifier_weights=w)
    model = ClassifierModel(weights=tuple(w), hasher="md5")
    with pytest.raises(ValueError, match="conflicts"):
        corpus_documents(
            files,
            rules,
            classifier_weights=model,
            classifier_hasher="xxhash64",
        )
    # matching explicit hasher is accepted (harmless redundancy)
    docs, _ = corpus_documents(
        files, rules, classifier_weights=model, classifier_hasher="md5"
    )
    assert "classifier_score" in docs.columns


def test_neardup_stream_drops_cross_batch_clones(spark, tmp_path):
    from neo4j_to_clickhouse_spark.streaming.corpus import (
        start_corpus_neardup_stream,
    )

    drop = _neardup_drop(tmp_path)
    rules = _rules(spark, 1)
    paths = dict(
        table_path=str(tmp_path / "docs"),
        quarantine_path=str(tmp_path / "quar"),
        store_path=str(tmp_path / "store"),
        checkpoint_path=str(tmp_path / "ckpt"),
    )

    def run():
        drain(
            start_corpus_neardup_stream(
                read_warc_file_stream(spark, str(drop)),
                rules,
                coalesce_output=1,
                **paths,
            )
        )

    run()
    docs = spark.read.parquet(paths["table_path"])
    assert docs.count() == 2  # both batch-0 docs survive

    _neardup_phase2(drop)
    run()
    docs = spark.read.parquet(paths["table_path"])
    canon = {r.canonical for r in docs.collect()}
    assert canon == {
        "http://h0.com/a",
        "http://h0.com/b",
        "http://h0.com/d",  # novel survives; /c near-dup dropped
    }
    # store halves carry per-batch stamps; only survivors' rows append
    b = spark.read.parquet(paths["store_path"] + "/buckets")
    d = spark.read.parquet(paths["store_path"] + "/digests")
    assert {r.batch for r in b.select("batch").distinct().collect()} == {0, 1}
    batch1_ids = {
        r.id for r in b.where("batch = 1").select("id").distinct().collect()
    }
    assert len(batch1_ids) == 1  # only /d (the survivor) was appended
    assert d.where("batch = 1").select("id").distinct().count() == 1


def test_neardup_stream_replay_ignores_own_crashed_store_rows(
    spark, tmp_path
):
    """Crash between the store write and the checkpoint commit: when
    batch 1 replays (same id, same files), the probe must not see the
    crashed attempt's OWN store rows — otherwise every replayed doc
    near-dups against itself and is wrongly dropped. Forge the crash by
    planting batch-1 store rows through the module's own staging
    machinery BEFORE the stream ever runs batch 1."""
    from neo4j_to_clickhouse_spark.operators.dedup import (
        lsh_store_buckets,
        lsh_store_digests,
    )
    from neo4j_to_clickhouse_spark.streaming.corpus import (
        _stage_outputs,
        corpus_documents,
        start_corpus_neardup_stream,
    )

    drop = _neardup_drop(tmp_path)
    rules = _rules(spark, 1)
    paths = dict(
        table_path=str(tmp_path / "docs"),
        quarantine_path=str(tmp_path / "quar"),
        store_path=str(tmp_path / "store"),
        checkpoint_path=str(tmp_path / "ckpt"),
    )

    def run():
        drain(
            start_corpus_neardup_stream(
                read_warc_file_stream(spark, str(drop)),
                rules,
                coalesce_output=1,
                **paths,
            )
        )

    run()  # batch 0 committed
    _neardup_phase2(drop)

    # the "crashed first attempt" of batch 1: its store rows landed,
    # the checkpoint never committed — plant them with batch stamp 1
    # through the real staging/promote path (same tags the replay uses)
    f1 = (
        spark.read.format("binaryFile")
        .option("pathGlobFilter", "f1.warc.gz")
        .load(str(drop))
    )
    d1, _ = corpus_documents(f1, rules)
    tag = F.lit(1).cast("long").alias("batch")
    _stage_outputs(
        (
            (
                lsh_store_buckets(d1, "record_id", "text").select("*", tag),
                paths["store_path"] + "/buckets",
            ),
            (
                lsh_store_digests(d1, "record_id", "text").select("*", tag),
                paths["store_path"] + "/digests",
            ),
        ),
        1,
        "corpus_neardup",
    )

    run()  # the REAL batch 1 replays over the crashed attempt
    canon = {
        r.canonical
        for r in spark.read.parquet(paths["table_path"]).collect()
    }
    # /d survives DESPITE its own crashed rows sitting at batch=1 (the
    # probe filters batch < batch_id); /c still near-dups vs batch 0
    assert canon == {
        "http://h0.com/a",
        "http://h0.com/b",
        "http://h0.com/d",
    }
    # and the promote replaced the crashed attempt's rows: only the
    # SURVIVOR's store rows remain at batch 1
    b = spark.read.parquet(paths["store_path"] + "/buckets")
    assert b.where("batch = 1").select("id").distinct().count() == 1


def test_neardup_stream_in_batch_dedup(spark, tmp_path):
    """in_batch=True: intra-batch near-clones collapse to the lowest
    record id BEFORE the store probe, so one survivor lands and only
    its rows seed the store."""
    from neo4j_to_clickhouse_spark.streaming.corpus import (
        read_warc_file_stream,
        start_corpus_neardup_stream,
    )

    drop = tmp_path / "drop"
    drop.mkdir()
    recs = [
        {
            "uri": "http://h0.com/a",
            "body": f"<p>{_ND_BODY}</p>".encode(),
            "status": 200,
            "content_type": "text/html; charset=utf-8",
        },
        {
            # intra-batch near-clone of /a
            "uri": "http://h0.com/a2",
            "body": f"<p>{_ND_BODY.replace('three', 'THREE')}</p>".encode(),
            "status": 200,
            "content_type": "text/html; charset=utf-8",
        },
        {
            "uri": "http://h0.com/b",
            "body": b"<p>completely different historical content here</p>",
            "status": 200,
            "content_type": "text/html; charset=utf-8",
        },
    ]
    (drop / "f0.warc.gz").write_bytes(
        encode_warc(recs, gzip_per_record=True)
    )
    drain(
        start_corpus_neardup_stream(
            read_warc_file_stream(spark, str(drop)),
            _rules(spark, 1),
            str(tmp_path / "docs"),
            str(tmp_path / "quar"),
            str(tmp_path / "store"),
            str(tmp_path / "ckpt"),
            coalesce_output=1,
            in_batch=True,
        )
    )
    docs = spark.read.parquet(str(tmp_path / "docs"))
    canon = {r.canonical for r in docs.collect()}
    # exactly one of /a,/a2 survives (lowest record id), /b untouched
    assert "http://h0.com/b" in canon and len(canon) == 2
    assert len({"http://h0.com/a", "http://h0.com/a2"} & canon) == 1
    b = spark.read.parquet(str(tmp_path / "store") + "/buckets")
    assert b.select("id").distinct().count() == 2  # survivors only


def test_neardup_stream_releases_batch_caches(spark, tmp_path):
    """A long-running stream must not accrue CacheManager entries: every
    persist the batch registers is unpersisted after its writes.
    in_batch=False keeps the count deterministic — the in-batch path's
    localCheckpoint storage is ContextCleaner-freed on GC timing, which
    getRDDStorageInfo would race against."""
    from neo4j_to_clickhouse_spark.streaming.corpus import (
        start_corpus_neardup_stream,
    )

    drop = _neardup_drop(tmp_path)
    sc = spark.sparkContext
    before = len(sc._jsc.sc().getRDDStorageInfo())
    drain(
        start_corpus_neardup_stream(
            read_warc_file_stream(spark, str(drop)),
            _rules(spark, 1),
            str(tmp_path / "docs"),
            str(tmp_path / "quar"),
            str(tmp_path / "store"),
            str(tmp_path / "ckpt"),
            coalesce_output=1,
        )
    )
    after = len(sc._jsc.sc().getRDDStorageInfo())
    assert after <= before


def test_neardup_stream_corrupt_store_raises(spark, tmp_path):
    """A store path that EXISTS but cannot be read must fail the batch
    loudly — the silent empty-store fallback would commit near-dups
    (review finding); only a missing path means 'first batch'."""
    import os

    from neo4j_to_clickhouse_spark.streaming.corpus import (
        start_corpus_neardup_stream,
    )

    drop = _neardup_drop(tmp_path)
    store = tmp_path / "store"
    (store / "buckets").mkdir(parents=True)
    # a present-but-garbage parquet file: read must raise, not fall back
    (store / "buckets" / "part-00000.parquet").write_bytes(b"not parquet")
    with pytest.raises(Exception) as ei:
        drain(
            start_corpus_neardup_stream(
                read_warc_file_stream(spark, str(drop)),
                _rules(spark, 1),
                str(tmp_path / "docs"),
                str(tmp_path / "quar"),
                str(store),
                str(tmp_path / "ckpt"),
                coalesce_output=1,
            )
        )
    assert "parquet" in str(ei.value).lower() or "Stream" in str(ei.value)


def test_neardup_stream_recovers_from_staging_only_store(spark, tmp_path):
    """A crashed first attempt can leave a store half holding ONLY the
    hidden .staging dir (written but never promoted). Replay must treat
    that as 'no committed data yet' and proceed — not wedge on
    UNABLE_TO_INFER_SCHEMA forever (review finding)."""
    from neo4j_to_clickhouse_spark.streaming.corpus import (
        start_corpus_neardup_stream,
    )

    drop = _neardup_drop(tmp_path)
    store = tmp_path / "store"
    staging = store / "buckets" / ".staging-corpus_neardup~0"
    staging.mkdir(parents=True)
    (staging / "part-00000.parquet").write_bytes(b"half-written junk")
    drain(
        start_corpus_neardup_stream(
            read_warc_file_stream(spark, str(drop)),
            _rules(spark, 1),
            str(tmp_path / "docs"),
            str(tmp_path / "quar"),
            str(store),
            str(tmp_path / "ckpt"),
            coalesce_output=1,
        )
    )
    assert spark.read.parquet(str(tmp_path / "docs")).count() == 2
    # and the batch committed real store rows alongside the leftovers
    b = spark.read.parquet(str(store / "buckets"))
    assert b.where("batch = 0").count() > 0


def test_neardup_stream_rejects_remote_store_uri(spark, tmp_path):
    from neo4j_to_clickhouse_spark.streaming.corpus import (
        start_corpus_neardup_stream,
    )

    with pytest.raises(ValueError, match="local-filesystem only"):
        start_corpus_neardup_stream(
            read_warc_file_stream(spark, str(tmp_path)),
            _rules(spark, 1),
            str(tmp_path / "docs"),
            str(tmp_path / "quar"),
            "s3a://bucket/store",
            str(tmp_path / "ckpt"),
        )


def test_stream_threshold_gate_matches_batch_selection(spark, tmp_path):
    """VERDICT r13 item 6: calibrate the score threshold on a batch
    sample, pass the literal to the ingest stream — the stream keeps
    exactly the documents the batch-side `score >= t` filter keeps,
    including after a checkpointed replay (restart drains nothing new,
    table unchanged)."""
    from neo4j_to_clickhouse_spark.operators.classifier import (
        ClassifierModel,
        calibrate_threshold,
        score_documents,
        weight_table,
    )
    from neo4j_to_clickhouse_spark.streaming.corpus import (
        corpus_documents,
        start_corpus_stream,
    )

    drop = _warc_files(tmp_path, 3)
    rules = _rules(spark, 3)
    model = ClassifierModel(weights=tuple(weight_table(64)), hasher="md5")

    # calibrate on the same fixture read as a BATCH (the production
    # pattern: a historical sample)
    files = spark.read.format("binaryFile").load(str(drop))
    batch_docs, _ = corpus_documents(files, rules, classifier_weights=model)
    t = calibrate_threshold(batch_docs, "classifier_score", 0.5)
    assert t is not None
    want = {
        r["canonical"]
        for r in batch_docs.filter(
            F.col("classifier_score") >= F.lit(t)
        ).collect()
    }
    assert want  # the gate keeps something
    assert len(want) < batch_docs.count()  # ... and drops something

    kw = dict(
        table_path=str(tmp_path / "docs"),
        quarantine_path=str(tmp_path / "quar"),
        checkpoint_path=str(tmp_path / "ckpt"),
        coalesce_output=1,
        classifier_weights=model,
        score_threshold=t,
    )
    drain(
        start_corpus_stream(
            read_warc_file_stream(spark, str(drop)), rules, **kw
        )
    )
    got = {
        r["canonical"]
        for r in spark.read.parquet(str(tmp_path / "docs")).collect()
    }
    assert got == want
    # replay: restart against the same checkpoint — nothing new drains,
    # the kept set is unchanged (exactly-once)
    drain(
        start_corpus_stream(
            read_warc_file_stream(spark, str(drop)), rules, **kw
        )
    )
    got2 = {
        r["canonical"]
        for r in spark.read.parquet(str(tmp_path / "docs")).collect()
    }
    assert got2 == want
    # threshold without weights fails loudly
    import pytest

    with pytest.raises(ValueError, match="score_threshold requires"):
        corpus_documents(files, rules, score_threshold=0.1)


def test_stream_tokenizes_documents_in_scan(spark, tmp_path):
    """bpe_merges/bpe_vocab thread byte-level tokenization into the
    ingest stream: every stored document carries token_ids and
    n_bpe_tokens equal to batch bpe_encode on the same artifacts, and
    the full online funnel (score -> gate -> tokenize) composes in one
    scan."""
    from neo4j_to_clickhouse_spark.operators.bpe import (
        bpe_encode,
        byte_vocab,
    )
    from neo4j_to_clickhouse_spark.streaming.corpus import (
        start_corpus_stream,
    )

    drop = _warc_files(tmp_path, 2)
    rules = _rules(spark, 2)
    merges = [("d", "o"), ("do", "c")]
    vocab = byte_vocab(merges)
    drain(
        start_corpus_stream(
            read_warc_file_stream(spark, str(drop)),
            rules,
            table_path=str(tmp_path / "docs"),
            quarantine_path=str(tmp_path / "quar"),
            checkpoint_path=str(tmp_path / "ckpt"),
            coalesce_output=1,
            bpe_merges=merges,
            bpe_vocab=vocab,
        )
    )
    got = spark.read.parquet(str(tmp_path / "docs"))
    assert {"token_ids", "n_bpe_tokens"} <= set(got.columns)
    want = {
        r["canonical"]: r["token_ids"]
        for r in bpe_encode(
            got.drop("token_ids", "n_bpe_tokens"),
            "text",
            merges,
            vocab,
            pretokenize="gpt2",
        ).collect()
    }
    for r in got.collect():
        assert r["token_ids"] == want[r["canonical"]]
        assert r["n_bpe_tokens"] == len(r["token_ids"])
    # the 'doc' merge chain fired (every doc's text starts 'doc N' or
    # 'café N' — at least the former fully merges)
    assert any(
        vocab["doc"] in ids for ids in want.values()
    )
    # merges without vocab fails loudly
    import pytest

    files = spark.read.format("binaryFile").load(str(drop))
    with pytest.raises(ValueError, match="travel together"):
        corpus_documents(files, rules, bpe_merges=merges)


def test_wet_stream_runs_the_shared_funnel(spark, tmp_path):
    """WET ingest gets the same in-scan curation stages as WARC
    (shared enrich_documents): scored, gated, and tokenized documents
    land in the table, equal to the batch composition."""
    from neo4j_to_clickhouse_spark.operators.bpe import (
        bpe_encode,
        byte_vocab,
    )
    from neo4j_to_clickhouse_spark.operators.classifier import (
        ClassifierModel,
        weight_table,
    )
    from neo4j_to_clickhouse_spark.sources.warc import (
        encode_wet,
        wet_documents,
    )
    from neo4j_to_clickhouse_spark.streaming.corpus import (
        enrich_documents,
        read_wet_file_stream,
        start_wet_stream,
    )

    drop = tmp_path / "wetdrop"
    drop.mkdir()
    for i in range(2):
        recs = [
            {
                "uri": f"http://w{i}.com/a",
                "body": f"plain text doc {i} alpha beta".encode(),
            },
            {
                "uri": f"http://w{i}.com/b",
                "body": f"zz {i} qq".encode(),
            },
        ]
        (drop / f"f{i}.warc.wet.gz").write_bytes(
            encode_wet(recs, gzip_per_record=True)
        )
    model = ClassifierModel(weights=tuple(weight_table(64)), hasher="md5")
    merges = [("d", "o"), ("do", "c")]
    vocab = byte_vocab(merges)
    kw = dict(
        enrich=True,
        classifier_weights=model,
        bpe_merges=merges,
        bpe_vocab=vocab,
    )
    drain(
        start_wet_stream(
            read_wet_file_stream(spark, str(drop)),
            str(tmp_path / "docs"),
            str(tmp_path / "quar"),
            str(tmp_path / "ckpt"),
            coalesce_output=1,
            **kw,
        )
    )
    got = spark.read.parquet(str(tmp_path / "docs"))
    assert {
        "lang", "quality_score", "n_tokens", "classifier_score",
        "token_ids", "n_bpe_tokens",
    } <= set(got.columns)
    # batch equivalence through the same shared function
    files_b = (
        spark.read.format("binaryFile")
        .option("pathGlobFilter", "*.wet*")
        .load(str(drop))
    )
    bdocs, _ = wet_documents(files_b)
    want = {
        (r["target_uri"], r["classifier_score"], tuple(r["token_ids"]))
        for r in enrich_documents(bdocs, **kw).collect()
    }
    have = {
        (r["target_uri"], r["classifier_score"], tuple(r["token_ids"]))
        for r in got.collect()
    }
    assert have == want and len(have) == 4


def test_start_entry_points_validate_args_eagerly(spark, tmp_path):
    """A misconfigured stream must fail at start_* — BEFORE the query
    starts and checkpoints — not inside foreachBatch at batch 0
    (ADVICE r14). Each pairing violation raises with zero streaming
    queries left running and no checkpoint directory created."""
    from neo4j_to_clickhouse_spark.streaming.corpus import (
        read_wet_file_stream,
        start_corpus_neardup_stream,
        start_wet_stream,
    )

    drop = _warc_files(tmp_path, 1)
    rules = _rules(spark, 1)
    files = read_warc_file_stream(spark, str(drop))
    ckpt = tmp_path / "ckpt_eager"
    common = dict(
        table_path=str(tmp_path / "docs"),
        quarantine_path=str(tmp_path / "quar"),
        checkpoint_path=str(ckpt),
    )
    n_active = len(spark.streams.active)
    # threshold without weights
    with pytest.raises(ValueError, match="score_threshold requires"):
        start_corpus_stream(files, rules, score_threshold=0.1, **common)
    # merges without vocab
    with pytest.raises(ValueError, match="travel together"):
        start_wet_stream(
            read_wet_file_stream(spark, str(drop)),
            bpe_merges=[("a", "b")],
            **common,
        )
    # bare weights without a hasher
    with pytest.raises(ValueError, match="bare classifier_weights"):
        start_corpus_neardup_stream(
            files,
            rules,
            store_path=str(tmp_path / "store"),
            classifier_weights=[0] * 16,
            **common,
        )
    # model + conflicting hasher
    from neo4j_to_clickhouse_spark.operators.classifier import (
        ClassifierModel,
        weight_table,
    )

    model = ClassifierModel(weights=tuple(weight_table(16)), hasher="md5")
    with pytest.raises(ValueError, match="conflicts"):
        start_corpus_stream(
            files,
            rules,
            classifier_weights=model,
            classifier_hasher="xxhash64",
            **common,
        )
    # nothing started, nothing checkpointed
    assert len(spark.streams.active) == n_active
    assert not ckpt.exists()


def test_stream_tags_topics_in_scan(spark, tmp_path):
    """topic_weights threads one-vs-all taxonomy tagging into the
    ingest stream: stored documents carry topic_score_<class> columns
    and the argmax topic label, equal to the batch composition through
    the same shared enrich_documents."""
    from neo4j_to_clickhouse_spark.operators.classifier import (
        weight_table,
    )
    from neo4j_to_clickhouse_spark.sources.warc import (
        encode_wet,
        wet_documents,
    )
    from neo4j_to_clickhouse_spark.streaming.corpus import (
        enrich_documents,
        read_wet_file_stream,
        start_wet_stream,
    )

    drop = tmp_path / "drop"
    drop.mkdir()
    texts = [
        "alpha beta gamma delta",
        "epsilon zeta eta",
        "theta iota kappa lambda mu",
        "nu xi omicron",
    ]
    recs = [
        {"uri": f"http://t.com/d{i}", "body": t.encode()}
        for i, t in enumerate(texts)
    ]
    (drop / "f0.warc.wet.gz").write_bytes(
        encode_wet(recs, gzip_per_record=True)
    )
    tw = {
        "code": weight_table(64, 8),
        "news": weight_table(64, 9),
        "web": weight_table(64, 10),
    }
    drain(
        start_wet_stream(
            read_wet_file_stream(spark, str(drop)),
            str(tmp_path / "docs"),
            str(tmp_path / "quar"),
            str(tmp_path / "ckpt"),
            coalesce_output=1,
            topic_weights=tw,
        )
    )
    got = spark.read.parquet(str(tmp_path / "docs"))
    assert {
        "topic",
        "topic_score_code",
        "topic_score_news",
        "topic_score_web",
    } <= set(got.columns)
    files_b = (
        spark.read.format("binaryFile")
        .option("pathGlobFilter", "*.wet*")
        .load(str(drop))
    )
    bdocs, _ = wet_documents(files_b)
    want = {
        (r["target_uri"], r["topic"], r["topic_score_code"])
        for r in enrich_documents(bdocs, topic_weights=tw).collect()
    }
    have = {
        (r["target_uri"], r["topic"], r["topic_score_code"])
        for r in got.collect()
    }
    assert have == want and len(have) == 4
    # labels are non-degenerate on this fixture
    assert len({t for _, t, _ in have}) > 1
