"""The full training-data funnel composed end to end, one test:

  crawl drop (WARC) -> streaming ingest with continuous near-dedup AND
  in-stream classifier scoring -> top-fraction quality selection ->
  learned-BPE tokenization -> packed-sequence materialization ->
  sharded JSONL export with manifest -> reload and verify integrity.

Every stage is individually certified elsewhere; this test proves the
COMPOSITION a real pipeline runs — outputs of each stage are exactly
the inputs the next stage consumes, nothing falls through a column
rename or a contract mismatch.
"""

from __future__ import annotations

import hashlib

from pyspark.sql import functions as F

from neo4j_to_clickhouse_spark.operators.bpe import (
    bpe_encode,
    bpe_encode_word,
    bpe_merge_ranks,
    char_vocab,
    learn_bpe,
)
from neo4j_to_clickhouse_spark.operators.classifier import (
    fit_classifier_model,
    select_top_fraction,
)
from neo4j_to_clickhouse_spark.operators.text import pack_token_sequences
from neo4j_to_clickhouse_spark.sources.export import (
    read_jsonl_shards,
    write_jsonl_shards,
)
from neo4j_to_clickhouse_spark.sources.robots import robots_rules_df
from neo4j_to_clickhouse_spark.sources.warc import encode_warc
from neo4j_to_clickhouse_spark.streaming.corpus import (
    read_warc_file_stream,
    start_corpus_neardup_stream,
)
from neo4j_to_clickhouse_spark.streaming.pipeline import drain

GOOD = (
    "excellent prose one two three four five six seven eight nine ten "
    "eleven twelve thirteen fourteen fifteen sixteen seventeen eighteen"
)
JUNK = (
    "zzz spam qqq spam zzz qqq spam zzz qqq spam zzz qqq spam zzz qqq "
    "spam zzz qqq spam zzz"
)


def _warc(drop, name, pages):
    recs = [
        {
            "uri": uri,
            "record_id": f"<urn:uuid:{hashlib.md5(uri.encode()).hexdigest()}>",
            "body": f"<p>{body}</p>".encode(),
            "status": 200,
            "content_type": "text/html; charset=utf-8",
        }
        for uri, body in pages
    ]
    (drop / name).write_bytes(encode_warc(recs, gzip_per_record=True))


def test_crawl_to_training_shards(spark, tmp_path):
    # --- 0. train the quality classifier on a tiny labeled corpus ----
    labeled = spark.createDataFrame(
        [(GOOD, 1), (JUNK, 0)] * 10, "text string, y int"
    )
    weights = fit_classifier_model(
        labeled, "text", "y", n_buckets=64, iters=12, lr=4.0,
        hasher="xxhash64",
    )

    # --- 1. crawl drops: 2 micro-batches; batch 1 carries a near-dup
    drop = tmp_path / "drop"
    drop.mkdir()
    rules = robots_rules_df(spark, [("h0.com", "User-agent: *\n")])
    _warc(
        drop,
        "f0.warc.gz",
        [
            ("http://h0.com/good1", GOOD),
            ("http://h0.com/junk1", JUNK),
        ],
    )
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
                enrich=True,
                classifier_weights=weights,
                compact_every=1,
                **paths,
            )
        )

    run()
    _warc(
        drop,
        "f1.warc.gz",
        [
            # near-clone of good1: must drop at the store probe
            ("http://h0.com/clone", GOOD.replace("twelve", "TWELVE")),
            # genuinely different page that still reads "quality" to
            # the classifier (shares the positive marker words only)
            (
                "http://h0.com/good2",
                "excellent prose twenty thirty forty fifty sixty "
                "seventy eighty ninety hundred thousand million "
                "billion gorgeous narrative unfolds calmly here",
            ),
            ("http://h0.com/junk2", JUNK.replace("spam", "scam")),
        ],
    )
    run()

    docs = spark.read.parquet(paths["table_path"])
    canon = {r.canonical for r in docs.select("canonical").collect()}
    assert canon == {
        "http://h0.com/good1",
        "http://h0.com/junk1",
        "http://h0.com/good2",
        "http://h0.com/junk2",
    }
    # enrich + classifier columns landed in-stream
    for col in ("lang", "quality_score", "n_tokens", "classifier_score"):
        assert col in docs.columns, col

    # --- 2. quality selection: top half by the in-stream score -------
    kept = select_top_fraction(
        docs, "classifier_score", "record_id", 0.5
    )
    kept_urls = {r.canonical for r in kept.select("canonical").collect()}
    assert kept_urls == {"http://h0.com/good1", "http://h0.com/good2"}

    # --- 3. tokenize with merges LEARNED from the kept corpus --------
    merges = learn_bpe(kept, "text", num_merges=12)
    assert merges  # the corpus repeats words; something merges
    vocab = char_vocab(merges, "abcdefghijklmnopqrstuvwxyz")
    enc = bpe_encode(kept, "text", merges, vocab).withColumn(
        "shard", F.lit("train")
    )

    # --- 4. pack into fixed 16-token training windows ----------------
    packed = pack_token_sequences(
        enc, "token_ids", "shard", "canonical", budget=16
    )
    rows = packed.collect()
    assert all(len(r["token_ids"]) <= 16 for r in rows)
    ranks = bpe_merge_ranks(merges)
    kept_texts = [
        r.text
        for r in kept.orderBy("canonical").select("text").collect()
    ]
    want_flat = [
        vocab.get(p, -1)
        for t in kept_texts
        for w in t.split()
        for p in bpe_encode_word(w, ranks)
    ]
    got_flat = [
        i
        for r in sorted(rows, key=lambda r: r["pack_id"])
        for i in r["token_ids"]
    ]
    assert got_flat == want_flat
    assert all(
        len(r["token_ids"]) == 16
        for r in rows
        if r["pack_id"] < max(x["pack_id"] for x in rows)
    )

    # --- 5. export sharded JSONL + manifest, reload, verify ----------
    out = str(tmp_path / "shards")
    man = write_jsonl_shards(
        packed.select("shard", "pack_id", "token_ids"), out,
        max_records_per_file=2,
    )
    assert man["n_rows"] == len(rows)
    assert man["columns"] == ["shard", "pack_id", "token_ids"]
    back = read_jsonl_shards(spark, out)
    reread = {
        r["pack_id"]: r["token_ids"] for r in back.collect()
    }
    assert reread == {r["pack_id"]: r["token_ids"] for r in rows}


def test_online_funnel_gates_and_tokenizes_in_stream(spark, tmp_path):
    """The r14 fully-ONLINE form of the funnel: train the classifier
    artifact, calibrate the selection threshold on a batch sample, then
    run ONE stream that scores, GATES (score >= t), near-dedups against
    the store, tokenizes byte-level, and compacts every lane per batch.
    The stored table IS the training corpus: gated documents only, real
    token_ids, bounded file counts — no downstream re-read of text."""
    from neo4j_to_clickhouse_spark.operators.bpe import byte_vocab
    from neo4j_to_clickhouse_spark.operators.classifier import (
        calibrate_threshold,
    )
    from neo4j_to_clickhouse_spark.streaming.corpus import (
        corpus_documents,
    )

    labeled = spark.createDataFrame(
        [(GOOD, 1), (JUNK, 0)] * 10, "text string, y int"
    )
    model = fit_classifier_model(
        labeled, "text", "y", n_buckets=64, iters=12, lr=4.0,
        hasher="xxhash64",
    )

    drop = tmp_path / "drop"
    drop.mkdir()
    rules = robots_rules_df(spark, [("h0.com", "User-agent: *\n")])
    pages0 = [
        ("http://h0.com/good1", GOOD),
        ("http://h0.com/junk1", JUNK),
    ]
    _warc(drop, "f0.warc.gz", pages0)

    # calibrate on the first drop read as a BATCH (the sample): keep
    # the top half by in-stream score
    files0 = (
        spark.read.format("binaryFile")
        .option("pathGlobFilter", "f0.warc.gz")
        .load(str(drop))
    )
    sample, _ = corpus_documents(files0, rules, classifier_weights=model)
    t = calibrate_threshold(sample, "classifier_score", 0.5)
    assert t is not None

    merges = [("o", "n"), ("Ġ", "s"), ("Ġs", "p")]
    vocab = byte_vocab(merges)
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
                classifier_weights=model,
                score_threshold=t,
                bpe_merges=merges,
                bpe_vocab=vocab,
                compact_every=1,
                **paths,
            )
        )

    run()  # batch 0: good1 kept, junk1 gated out
    _warc(
        drop,
        "f1.warc.gz",
        [
            # near-clone of good1: passes the gate, drops at the probe
            ("http://h0.com/clone", GOOD.replace("twelve", "TWELVE")),
            ("http://h0.com/good2", GOOD.replace("prose", "writing")),
            ("http://h0.com/junk2", JUNK.replace("spam", "scam")),
        ],
    )
    run()  # batch 1

    docs = spark.read.parquet(paths["table_path"])
    canon = {r.canonical for r in docs.select("canonical").collect()}
    # batch/stream equivalence defines the expectation: whatever the
    # batch-side gate keeps, minus the near-clone (good1 is the
    # threshold doc itself, so it always passes and shadows the clone)
    all_files = (
        spark.read.format("binaryFile")
        .option("pathGlobFilter", "*.warc.gz")
        .load(str(drop))
    )
    gated, _ = corpus_documents(
        all_files, rules, classifier_weights=model, score_threshold=t
    )
    expected = {
        r.canonical for r in gated.select("canonical").collect()
    } - {"http://h0.com/clone"}
    assert canon == expected
    # the gate kept the threshold doc and dropped every junk page
    assert "http://h0.com/good1" in canon
    assert not any("junk" in c for c in canon)
    # tokenization landed in-stream, equal to batch bpe_encode
    want = {
        r["canonical"]: r["token_ids"]
        for r in bpe_encode(
            docs.drop("token_ids", "n_bpe_tokens"),
            "text",
            merges,
            vocab,
            pretokenize="gpt2",
        ).collect()
    }
    for r in docs.collect():
        assert r["token_ids"] == want[r["canonical"]]
        assert r["n_bpe_tokens"] == len(r["token_ids"])
        assert r["classifier_score"] >= t
    # every ' s...' pre-token merged its space prefix somewhere
    assert any(vocab["Ġs"] in ids for ids in want.values())
    # compact_every=1 bounded every lane's files
    import os

    n_table = sum(
        1 for n in os.listdir(paths["table_path"]) if n.endswith(".parquet")
    )
    assert n_table <= 2
    for half in ("buckets", "digests"):
        n_half = sum(
            1
            for n in os.listdir(os.path.join(paths["store_path"], half))
            if n.endswith(".parquet")
        )
        assert n_half <= 2, half
