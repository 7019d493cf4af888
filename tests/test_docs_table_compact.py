"""Documents/quarantine-table compaction for the streaming corpus
sinks (VERDICT r13 item 4): the ingest lanes accrete one parquet file
per micro-batch exactly like the LSH store halves did — these tests pin
compact_documents_table on the same guarantees the r13 store suite pins
for compact_lsh_store: byte-identical table reads pre/post, bounded
file counts, crash-straddling replay exactly-once, per-query-tag newest
protection, retention via drop_ids, and the in-stream compact_every
hook. The marker/aside swap protocol itself is the SHARED
_compact_batch_dir / _recover_lsh_half code path the r13 suite
crash-injects at every filesystem-op boundary
(tests/test_lsh_store_compact.py::test_crash_injection_at_every_fs_boundary).
"""

import os

import pytest
from pyspark.sql import functions as F

from neo4j_to_clickhouse_spark.sources.robots import robots_rules_df
from neo4j_to_clickhouse_spark.sources.warc import encode_warc
from neo4j_to_clickhouse_spark.streaming.corpus import (
    compact_documents_table,
    corpus_documents,
    read_warc_file_stream,
    recover_documents_table,
    start_corpus_stream,
)
from neo4j_to_clickhouse_spark.streaming.pipeline import drain

ROBOTS = "User-agent: *\n"


def _warc(drop, name, pages):
    import hashlib

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


def _setup(spark, tmp_path, **stream_kw):
    drop = tmp_path / "drop"
    drop.mkdir(exist_ok=True)
    rules = robots_rules_df(spark, [("h0.com", ROBOTS)])
    paths = dict(
        table_path=str(tmp_path / "docs"),
        quarantine_path=str(tmp_path / "quar"),
        checkpoint_path=str(tmp_path / "ckpt"),
    )

    def run():
        drain(
            start_corpus_stream(
                read_warc_file_stream(spark, str(drop)),
                rules,
                coalesce_output=1,
                **paths,
                **stream_kw,
            )
        )

    return drop, rules, paths, run


def _rows(spark, path):
    return sorted(
        tuple(r) for r in spark.read.parquet(path).collect()
    )


def _files(path):
    return sorted(n for n in os.listdir(path) if n.endswith(".parquet"))


def test_compact_preserves_table_and_shrinks_files(spark, tmp_path):
    drop, rules, paths, run = _setup(spark, tmp_path)
    _warc(drop, "f0.warc.gz", [("http://h0.com/a", "alpha beta gamma")])
    run()  # batch 0
    _warc(drop, "f1.warc.gz", [("http://h0.com/b", "delta epsilon zeta")])
    run()  # batch 1
    _warc(drop, "f2.warc.gz", [("http://h0.com/c", "eta theta iota")])
    run()  # batch 2

    table = paths["table_path"]
    before = _rows(spark, table)
    assert len(before) == 3
    assert len(_files(table)) == 3

    stats = compact_documents_table(spark, table)
    # default bound: batches 0+1 folded, newest (2) kept for replay
    assert stats["folded"] == 2
    assert _files(table) == [
        "batch-corpus_ingest~000000002-00000.parquet",
        "compacted-000000002-00000.parquet",
    ]
    # byte-identical table read: not one row changed
    assert _rows(spark, table) == before
    # idempotent: nothing new to fold -> no-op
    assert compact_documents_table(spark, table)["folded"] == 0
    assert _rows(spark, table) == before


def test_replay_straddling_docs_compaction_stays_exactly_once(
    spark, tmp_path
):
    """Batch 1's docs land but the checkpoint commit crashes; a
    compaction runs during the outage (default bound folds batch 0
    only — batch 1 is the newest present, never folded); the restart
    replays batch 1, whose promote must replace its own files by name
    instead of duplicating rows into the compacted history."""
    from neo4j_to_clickhouse_spark.streaming.corpus import _stage_outputs

    drop, rules, paths, run = _setup(spark, tmp_path)
    _warc(drop, "f0.warc.gz", [("http://h0.com/a", "alpha beta gamma")])
    run()  # batch 0 committed
    # crashed attempt of batch 1: table files landed under the batch-1
    # names, checkpoint did NOT commit
    _warc(drop, "f1.warc.gz", [("http://h0.com/b", "delta epsilon zeta")])
    f1 = (
        spark.read.format("binaryFile")
        .option("pathGlobFilter", "f1.warc.gz")
        .load(str(drop))
    )
    d1, q1 = corpus_documents(f1, rules)
    _stage_outputs(
        (
            (d1.coalesce(1), paths["table_path"]),
            (q1.coalesce(1), paths["quarantine_path"]),
        ),
        1,
        "corpus_ingest",
    )
    assert len(_files(paths["table_path"])) == 2
    # maintenance runs during the outage
    compact_documents_table(spark, paths["table_path"])
    # batch 1 is the newest present -> still unfolded, batch 0 is alone
    # (single file, fresh<2) so nothing folded at all
    files_mid = _files(paths["table_path"])
    assert "batch-corpus_ingest~000000001-00000.parquet" in files_mid
    # restart: the checkpoint replays batch 1
    run()
    got = _rows(spark, paths["table_path"])
    assert len(got) == 2  # exactly-once: /a and /b, no duplicate /b
    canons = sorted(r[2] for r in spark.read.parquet(paths["table_path"]).select("file", "record_id", "canonical").collect())
    assert canons == ["http://h0.com/a", "http://h0.com/b"]


def test_partitioned_table_rejected(spark, tmp_path):
    root = tmp_path / "events"
    (root / "event_month=202601").mkdir(parents=True)
    with pytest.raises(ValueError, match="hive-partitioned"):
        compact_documents_table(spark, str(root))


def test_per_tag_newest_protection(spark, tmp_path):
    """Two queries sharing one destination (WARC + WET streams into the
    same documents table): folding protects EACH tag's newest batch,
    not just the globally newest id — a replay of either query must
    still find its own files."""
    df = spark.createDataFrame(
        [(i, f"doc {i}") for i in range(8)], "record_id long, text string"
    )
    root = str(tmp_path / "shared")
    os.makedirs(root)
    for tag, bids in (("warc", [0, 1, 2]), ("wet", [0, 1])):
        for b in bids:
            part = df.where(F.col("record_id") == b).coalesce(1)
            staging = os.path.join(root, ".stage")
            part.write.mode("overwrite").parquet(staging)
            src = [
                n
                for n in os.listdir(staging)
                if n.startswith("part-")
            ][0]
            os.replace(
                os.path.join(staging, src),
                os.path.join(
                    root, f"batch-{tag}~{b:09d}-00000.parquet"
                ),
            )
    before = _rows(spark, root)
    stats = compact_documents_table(spark, root)
    files = _files(root)
    # each tag's newest batch survives unfolded
    assert "batch-warc~000000002-00000.parquet" in files
    assert "batch-wet~000000001-00000.parquet" in files
    assert stats["folded"] == 3
    assert sum(1 for n in files if n.startswith("compacted-")) == 1
    assert _rows(spark, root) == before


def test_retired_tags_fold_their_newest_batch(spark, tmp_path):
    """A query tag that stops writing to a shared destination strands
    its newest batch forever under the default bound (ADVICE r14);
    retired_tags declares the tag cleanly stopped so its final batch
    folds too — while live tags keep their replay protection."""
    df = spark.createDataFrame(
        [(i, f"doc {i}") for i in range(8)], "record_id long, text string"
    )
    root = str(tmp_path / "shared")
    os.makedirs(root)
    for tag, bids in (("warc", [0, 1, 2]), ("wet", [0, 1])):
        for b in bids:
            part = df.where(F.col("record_id") == b).coalesce(1)
            staging = os.path.join(root, ".stage")
            part.write.mode("overwrite").parquet(staging)
            src = [
                n for n in os.listdir(staging) if n.startswith("part-")
            ][0]
            os.replace(
                os.path.join(staging, src),
                os.path.join(root, f"batch-{tag}~{b:09d}-00000.parquet"),
            )
    before = _rows(spark, root)
    stats = compact_documents_table(
        spark, root, retired_tags={"wet"}
    )
    files = _files(root)
    # the live tag keeps its newest batch; the retired tag folds whole
    assert "batch-warc~000000002-00000.parquet" in files
    assert not any(n.startswith("batch-wet~") for n in files)
    assert stats["folded"] == 4
    assert _rows(spark, root) == before
    # a later compaction with the retired tag again is a clean no-op
    assert (
        compact_documents_table(spark, root, retired_tags={"wet"})[
            "folded"
        ]
        == 0
    )
    assert _rows(spark, root) == before


def test_drop_ids_retires_documents(spark, tmp_path):
    drop, rules, paths, run = _setup(spark, tmp_path)
    _warc(drop, "f0.warc.gz", [("http://h0.com/a", "alpha beta gamma")])
    run()
    _warc(drop, "f1.warc.gz", [("http://h0.com/b", "delta epsilon zeta")])
    run()
    _warc(drop, "f2.warc.gz", [("http://h0.com/c", "eta theta iota")])
    run()
    table = paths["table_path"]
    doomed = (
        spark.read.parquet(table)
        .where(F.col("canonical") == "http://h0.com/a")
        .select("record_id")
    )
    compact_documents_table(spark, table, drop_ids=doomed)
    canons = sorted(
        r["canonical"] for r in spark.read.parquet(table).collect()
    )
    assert canons == ["http://h0.com/b", "http://h0.com/c"]
    # malformed drop frame fails loudly
    with pytest.raises(ValueError, match="single-column"):
        compact_documents_table(
            spark, table, drop_ids=spark.read.parquet(table)
        )


def test_compact_every_bounds_docs_files_in_stream(spark, tmp_path):
    """compact_every=1 on the plain corpus stream folds both lanes
    inside the foreachBatch body: after N batches the table holds ~2
    files instead of N, with identical content to an uncompacted run."""
    drop, rules, paths, run = _setup(spark, tmp_path, compact_every=1)
    pages = [
        ("http://h0.com/p0", "alpha beta gamma"),
        ("http://h0.com/p1", "delta epsilon zeta"),
        ("http://h0.com/p2", "eta theta iota"),
        ("http://h0.com/p3", "kappa lambda mu"),
    ]
    for i, page in enumerate(pages):
        _warc(drop, f"f{i}.warc.gz", [page])
        run()
    table = paths["table_path"]
    files = _files(table)
    # newest batch + one compacted generation (quarantine lane: empty
    # batches still write a file each; same bound applies)
    assert len(files) == 2, files
    assert len(_files(paths["quarantine_path"])) == 2
    canons = sorted(
        r["canonical"] for r in spark.read.parquet(table).collect()
    )
    assert canons == [p for p, _ in pages]


def test_recover_documents_table_finishes_interrupted_swap(spark, tmp_path):
    """A compactor crash mid-swap on the DOCS table recovers through
    the same routine as the store halves (shared protocol)."""
    import json
    import shutil

    from neo4j_to_clickhouse_spark.streaming.corpus import (
        _COMPACT_ASIDE,
        _COMPACT_MARKER,
        _COMPACT_STAGING,
    )

    drop, rules, paths, run = _setup(spark, tmp_path)
    for i, page in enumerate(
        [
            ("http://h0.com/a", "alpha beta gamma"),
            ("http://h0.com/b", "delta epsilon zeta"),
            ("http://h0.com/c", "eta theta iota"),
        ]
    ):
        _warc(drop, f"f{i}.warc.gz", [page])
        run()
    table = paths["table_path"]
    before = _rows(spark, table)
    fold = _files(table)[:2]
    staging = os.path.join(table, _COMPACT_STAGING)
    os.makedirs(staging)
    for i, n in enumerate(fold):
        shutil.copy(
            os.path.join(table, n),
            os.path.join(staging, f"part-{i}.parquet"),
        )
    adds = {
        "part-0.parquet": "compacted-000000009-00000.parquet",
        "part-1.parquet": "compacted-000000009-00001.parquet",
    }
    with open(os.path.join(table, _COMPACT_MARKER), "w") as fh:
        json.dump({"remove": fold, "adds": adds, "gen": 9}, fh)
    aside = os.path.join(table, _COMPACT_ASIDE)
    os.makedirs(aside)
    for n in fold:
        os.replace(os.path.join(table, n), os.path.join(aside, n))
    # first promote happened, then crash
    os.replace(
        os.path.join(staging, "part-0.parquet"),
        os.path.join(table, "compacted-000000009-00000.parquet"),
    )
    assert recover_documents_table(table) is True
    assert _rows(spark, table) == before
    assert not os.path.exists(aside)


def test_stream_heals_crashed_docs_compactor_on_next_batch(spark, tmp_path):
    """A compactor crash mid-swap on the DOCS table (fold files set
    aside, no compacted file landed yet) heals on the NEXT micro-batch
    via _stage_outputs' per-root recovery — not only at the next
    compact_every tick."""
    import json
    import shutil

    from neo4j_to_clickhouse_spark.streaming.corpus import (
        _COMPACT_ASIDE,
        _COMPACT_MARKER,
        _COMPACT_STAGING,
    )

    drop, rules, paths, run = _setup(spark, tmp_path)
    for i, page in enumerate(
        [
            ("http://h0.com/a", "alpha beta gamma"),
            ("http://h0.com/b", "delta epsilon zeta"),
            ("http://h0.com/c", "eta theta iota"),
        ]
    ):
        _warc(drop, f"f{i}.warc.gz", [page])
        run()
    table = paths["table_path"]
    before = {r["canonical"] for r in spark.read.parquet(table).collect()}
    # forge a pre-promote crash: folded files aside, marker present,
    # staging full, NO compacted file landed -> rollback territory
    fold = _files(table)[:2]
    staging = os.path.join(table, _COMPACT_STAGING)
    os.makedirs(staging)
    for i, n in enumerate(fold):
        shutil.copy(
            os.path.join(table, n),
            os.path.join(staging, f"part-{i}.parquet"),
        )
    with open(os.path.join(table, _COMPACT_MARKER), "w") as fh:
        json.dump(
            {
                "remove": fold,
                "adds": {
                    f"part-{i}.parquet": f"compacted-{9:09d}-{i:05d}.parquet"
                    for i in range(len(fold))
                },
                "gen": 9,
            },
            fh,
        )
    aside = os.path.join(table, _COMPACT_ASIDE)
    os.makedirs(aside)
    for n in fold:
        os.replace(os.path.join(table, n), os.path.join(aside, n))
    # the table now silently MISSES two batches' rows
    assert {
        r["canonical"] for r in spark.read.parquet(table).collect()
    } != before
    # next micro-batch (no compact_every configured at all): the sink
    # heals the lane before writing
    _warc(drop, "f3.warc.gz", [("http://h0.com/d", "kappa lambda mu")])
    run()
    got = {r["canonical"] for r in spark.read.parquet(table).collect()}
    assert got == before | {"http://h0.com/d"}
    assert not os.path.exists(aside)
