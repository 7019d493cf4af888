"""Rolling gate recalibration for long-running ingest streams (VERDICT
r14 item 4): calibrate_threshold is calibrate-once, so on a drifting
corpus a static gate silently changes its effective keep-rate. The
stream variant persists one bounded score histogram per micro-batch,
recalibrates every k batches from the trailing window (INCLUDING the
current batch), and gates each batch with the newest COMMITTED
threshold — all batch-stamped and deterministic from committed state,
so replays of a crashed batch re-gate and re-calibrate identically.
The batch restatement of the same loop is the driver-certified
``rolling_threshold_trajectory`` registry query."""

import os

import pytest
from pyspark.sql import functions as F

from neo4j_to_clickhouse_spark.operators.classifier import (
    ClassifierModel,
    calibrate_threshold_from_histogram,
    score_documents,
    weight_table,
)
from neo4j_to_clickhouse_spark.sources.warc import encode_wet
from neo4j_to_clickhouse_spark.streaming.corpus import (
    read_wet_file_stream,
    start_wet_stream,
)
from neo4j_to_clickhouse_spark.streaming.pipeline import drain

MODEL = ClassifierModel(weights=tuple(weight_table(64)), hasher="md5")

# four micro-batches with drifting content: later batches re-use the
# early vocabulary shifted, so the score distribution moves and the
# calibrated threshold must move with it
WORDS = [
    "alpha beta gamma delta epsilon zeta eta theta",
    "iota kappa lambda mu nu xi omicron pi",
    "rho sigma tau upsilon phi chi psi omega",
    "aleph bet gimel dalet he vav zayin het",
]


def _batch_texts(b: int) -> list[str]:
    pool = WORDS[b].split()
    return [
        " ".join(pool[(i + j) % len(pool)] for j in range(3 + i % 4))
        for i in range(10)
    ]


def _drop_file(drop, b: int) -> None:
    recs = [
        {"uri": f"http://b{b}.com/d{i}", "body": t.encode()}
        for i, t in enumerate(_batch_texts(b))
    ]
    (drop / f"f{b}.warc.wet.gz").write_bytes(
        encode_wet(recs, gzip_per_record=True)
    )


def _expected(spark, fraction=0.5, window=2, every=2, initial=None):
    """Pure-batch replica of the rolling loop: per-batch scores via the
    certified scorer, thresholds via the certified histogram
    calibrator, gate = newest committed threshold (batch < b)."""
    scores = {}
    for b in range(4):
        df = spark.createDataFrame(
            [(f"http://b{b}.com/d{i}", t) for i, t in enumerate(_batch_texts(b))],
            "target_uri string, text string",
        )
        scores[b] = {
            r["target_uri"]: r["score"]
            for r in score_documents(df, "text", MODEL).collect()
        }

    def thr_at(b):
        rows = [
            (s, 1)
            for bb in range(max(0, b - window + 1), b + 1)
            for s in scores[bb].values()
        ]
        hist = spark.createDataFrame(rows, "score double, n long")
        return calibrate_threshold_from_histogram(hist, fraction)

    thresholds = {b: thr_at(b) for b in range(0, 4, every)}
    gates, kept = {}, {}
    for b in range(4):
        committed = [cb for cb in thresholds if cb < b]
        gates[b] = (
            thresholds[max(committed)] if committed else initial
        )
        kept[b] = {
            u
            for u, s in scores[b].items()
            if gates[b] is None or s >= gates[b]
        }
    return thresholds, gates, kept


def _stream_kw(tmp_path, **extra):
    kw = dict(
        table_path=str(tmp_path / "docs"),
        quarantine_path=str(tmp_path / "quar"),
        checkpoint_path=str(tmp_path / "ckpt"),
        coalesce_output=1,
        classifier_weights=MODEL,
        recalibrate_every=2,
        calibration_fraction=0.5,
        calibration_window=2,
        calibration_path=str(tmp_path / "calib"),
    )
    kw.update(extra)
    return kw


def test_rolling_recalibration_tracks_drift(spark, tmp_path):
    drop = tmp_path / "drop"
    drop.mkdir()
    kw = _stream_kw(tmp_path)
    for b in range(4):
        _drop_file(drop, b)
        drain(
            start_wet_stream(
                read_wet_file_stream(spark, str(drop)), **kw
            )
        )
    thresholds, gates, kept = _expected(spark)
    # the drifting fixture actually moves the threshold
    assert thresholds[0] != thresholds[2]
    # threshold trajectory: one batch-stamped row per calibration tick
    got_t = {
        r["batch"]: r["threshold"]
        for r in spark.read.parquet(str(tmp_path / "calib" / "thresholds")).collect()
    }
    assert got_t == {0: thresholds[0], 2: thresholds[2]}
    # per-batch histograms landed (one fold per batch, score-bounded)
    hist = spark.read.parquet(str(tmp_path / "calib" / "hist"))
    assert set(
        r["batch"] for r in hist.select("batch").distinct().collect()
    ) == {0, 1, 2, 3}
    # the gate applied to each batch is the newest COMMITTED threshold:
    # batch 0 keep-all (no initial), 1-2 gated by t0, 3 by t2
    got_docs = {
        r["target_uri"]
        for r in spark.read.parquet(str(tmp_path / "docs")).collect()
    }
    want = set().union(*kept.values())
    assert got_docs == want
    # and the gate genuinely dropped something
    assert len(want) < 40


def test_rolling_replay_is_exactly_once(spark, tmp_path):
    """A crashed attempt of a batch (files promoted, checkpoint not
    committed — including a WRONG forged threshold row for that batch)
    must be fully replaced on replay: the gate reads only committed
    (batch < b) thresholds, and the promote replaces same-batch files
    by name."""
    drop = tmp_path / "drop"
    drop.mkdir()
    kw = _stream_kw(tmp_path)
    for b in range(2):
        _drop_file(drop, b)
        drain(
            start_wet_stream(
                read_wet_file_stream(spark, str(drop)), **kw
            )
        )
    # forge batch 2's crashed attempt: bogus rows under the exact
    # deterministic names the real batch 2 will promote to
    def forge(root, df):
        os.makedirs(root, exist_ok=True)
        staging = os.path.join(root, ".forge")
        df.coalesce(1).write.mode("overwrite").parquet(staging)
        src = [
            n for n in os.listdir(staging) if n.startswith("part-")
        ][0]
        os.replace(
            os.path.join(staging, src),
            os.path.join(
                root, "batch-wet_ingest~000000002-00000.parquet"
            ),
        )

    forge(
        str(tmp_path / "calib" / "thresholds"),
        spark.createDataFrame(
            [(99.9, 2)], "threshold double, batch long"
        ),
    )
    forge(
        str(tmp_path / "calib" / "hist"),
        spark.createDataFrame(
            [(99.9, 1, 2)], "score double, n long, batch long"
        ),
    )
    # the real batch 2 arrives and replays over the forged attempt
    _drop_file(drop, 2)
    drain(
        start_wet_stream(read_wet_file_stream(spark, str(drop)), **kw)
    )
    _drop_file(drop, 3)
    drain(
        start_wet_stream(read_wet_file_stream(spark, str(drop)), **kw)
    )
    thresholds, gates, kept = _expected(spark)
    got_t = {
        r["batch"]: r["threshold"]
        for r in spark.read.parquet(
            str(tmp_path / "calib" / "thresholds")
        ).collect()
    }
    # the forged 99.9 row is gone — replaced by the real calibration
    assert got_t == {0: thresholds[0], 2: thresholds[2]}
    got_docs = {
        r["target_uri"]
        for r in spark.read.parquet(str(tmp_path / "docs")).collect()
    }
    assert got_docs == set().union(*kept.values())
    # re-drain with nothing new: state unchanged (exactly-once)
    drain(
        start_wet_stream(read_wet_file_stream(spark, str(drop)), **kw)
    )
    assert {
        r["target_uri"]
        for r in spark.read.parquet(str(tmp_path / "docs")).collect()
    } == got_docs


def test_rolling_initial_threshold_gates_batch_zero(spark, tmp_path):
    drop = tmp_path / "drop"
    drop.mkdir()
    _drop_file(drop, 0)
    thresholds, _, _ = _expected(spark)
    t0 = thresholds[0]
    kw = _stream_kw(tmp_path, score_threshold=t0)
    drain(
        start_wet_stream(read_wet_file_stream(spark, str(drop)), **kw)
    )
    got = spark.read.parquet(str(tmp_path / "docs"))
    # batch 0 is gated by the INITIAL static threshold (score >= t0)
    assert got.count() > 0
    assert got.where(F.col("classifier_score") < t0).count() == 0


def test_rolling_args_validated_eagerly(spark, tmp_path):
    files = read_wet_file_stream(spark, str(tmp_path))
    common = dict(
        table_path=str(tmp_path / "d"),
        quarantine_path=str(tmp_path / "q"),
        checkpoint_path=str(tmp_path / "c"),
    )
    with pytest.raises(ValueError, match="requires classifier_weights"):
        start_wet_stream(
            files,
            recalibrate_every=2,
            calibration_fraction=0.5,
            calibration_path=str(tmp_path / "t"),
            **common,
        )
    with pytest.raises(ValueError, match="calibration_path"):
        start_wet_stream(
            files,
            classifier_weights=MODEL,
            recalibrate_every=2,
            calibration_fraction=0.5,
            **common,
        )
    with pytest.raises(ValueError, match="calibration_fraction"):
        start_wet_stream(
            files,
            classifier_weights=MODEL,
            recalibrate_every=2,
            calibration_path=str(tmp_path / "t"),
            **common,
        )
    with pytest.raises(ValueError, match="only apply with"):
        start_wet_stream(
            files,
            classifier_weights=MODEL,
            calibration_fraction=0.5,
            **common,
        )
    # a remote calibration_path would silently disable recalibration
    # (local-only renames/isdir) — rejected eagerly instead
    with pytest.raises(ValueError, match="local-filesystem"):
        start_wet_stream(
            files,
            classifier_weights=MODEL,
            recalibrate_every=2,
            calibration_fraction=0.5,
            calibration_path="s3://bucket/calib",
            **common,
        )
    assert len(spark.streams.active) == 0


def test_neardup_stream_rolling_gate(spark, tmp_path):
    """The full online funnel in ONE stream: classify -> rolling gate
    -> continuous near-dedup -> store append. The gate applies BEFORE
    the dedup probe; a later-batch exact clone of a batch-0 survivor
    passes the gate but must be dropped by the store probe, and the
    threshold trajectory lands batch-stamped like every other lane."""
    import hashlib

    from neo4j_to_clickhouse_spark.sources.robots import robots_rules_df
    from neo4j_to_clickhouse_spark.sources.warc import encode_warc
    from neo4j_to_clickhouse_spark.streaming.corpus import (
        corpus_documents,
        read_warc_file_stream,
        start_corpus_neardup_stream,
    )

    drop = tmp_path / "drop"
    drop.mkdir()
    rules = robots_rules_df(spark, [("h0.com", "User-agent: *\n")])
    # globally word-disjoint sentences: no two share ANY 3-shingle, so
    # the only near-dup pair in the fixture is the planted exact clone
    pool = [
        " ".join(f"tok{m}{chr(97 + j)}" for j in range(5))
        for m in range(16)
    ]
    batches = {
        0: [(f"http://h0.com/b0-{i}", pool[i]) for i in range(6)],
        # b1 carries an EXACT clone of b0's doc 0 under a new URL
        1: [("http://h0.com/clone", pool[0])]
        + [(f"http://h0.com/b1-{i}", pool[6 + i]) for i in range(4)],
        2: [(f"http://h0.com/b2-{i}", pool[10 + i]) for i in range(4)],
    }

    def warc_for(b):
        return encode_warc(
            [
                {
                    "uri": uri,
                    "record_id": "<urn:uuid:"
                    + hashlib.md5(uri.encode()).hexdigest()
                    + ">",
                    "body": f"<p>{t}</p>".encode(),
                    "status": 200,
                    "content_type": "text/html; charset=utf-8",
                }
                for uri, t in batches[b]
            ],
            gzip_per_record=True,
        )

    kw = dict(
        table_path=str(tmp_path / "docs"),
        quarantine_path=str(tmp_path / "quar"),
        store_path=str(tmp_path / "store"),
        checkpoint_path=str(tmp_path / "ckpt"),
        coalesce_output=1,
        classifier_weights=MODEL,
        recalibrate_every=1,
        calibration_fraction=0.5,
        calibration_window=2,
        calibration_path=str(tmp_path / "calib"),
    )
    for b in range(3):
        (drop / f"f{b}.warc.gz").write_bytes(warc_for(b))
        drain(
            start_corpus_neardup_stream(
                read_warc_file_stream(spark, str(drop)), rules, **kw
            )
        )
    # expected: per-batch PRE-gate scores via the shared batch chain
    scores = {}
    for b in range(3):
        fb = (
            spark.read.format("binaryFile")
            .option("pathGlobFilter", f"f{b}.warc.gz")
            .load(str(drop))
        )
        d, _ = corpus_documents(fb, rules, classifier_weights=MODEL)
        scores[b] = {
            r["canonical"]: r["classifier_score"] for r in d.collect()
        }

    def thr_at(b):
        rows = [
            (s, 1)
            for bb in range(max(0, b - 1), b + 1)
            for s in scores[bb].values()
        ]
        return calibrate_threshold_from_histogram(
            spark.createDataFrame(rows, "score double, n long"), 0.5
        )

    gates = {0: None, 1: thr_at(0), 2: thr_at(1)}
    want = set()
    for b in range(3):
        for u, s in scores[b].items():
            if (gates[b] is None or s >= gates[b]) and u != "http://h0.com/clone":
                want.add(u)
    got = {
        r["canonical"]
        for r in spark.read.parquet(str(tmp_path / "docs")).collect()
    }
    # the clone passed or failed the GATE on its score, but can never
    # survive the store probe (identical text, Jaccard 1 vs batch 0)
    assert "http://h0.com/clone" not in got
    assert got == want
    got_t = {
        r["batch"]: r["threshold"]
        for r in spark.read.parquet(
            str(tmp_path / "calib" / "thresholds")
        ).collect()
    }
    assert got_t == {0: thr_at(0), 1: thr_at(1), 2: thr_at(2)}
