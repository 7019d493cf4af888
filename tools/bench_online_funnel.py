"""Throughput cost of the fully-online ingest funnel (r14; round-stamped output since r15).

Measures start_corpus_stream draining the same synthetic WARC drop in
two configurations:

  plain   — WARC parse -> robots -> charset -> extract (the r12 chain)
  funnel  — plain + enrich signals + classifier scoring + threshold
            gate + byte-level GPT-2 tokenization + per-batch lane
            compaction (everything the stored corpus needs so that
            downstream training prep never re-reads text)

and reports docs/s plus the funnel's relative overhead. All stages are
scan-side (plan-literal weights, broadcast merges), so the expected
overhead is the per-row compute of scoring + encoding only — this
probe turns that expectation into a number.

Usage: python tools/bench_online_funnel.py [n_files] [docs_per_file]
Writes docs/evidence/FUNNEL_THROUGHPUT_r{round}.json.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

WORDS = (
    "the quick brown fox jumps over a lazy dog while excellent prose "
    "unfolds across twelve distinct paragraphs of plain english text "
    "covering science history numbers 1234 and punctuation, marks. "
).split()


def _round() -> int:
    from neo4j_to_clickhouse_spark.plans.queries import _WINDOW_ROUND

    return _WINDOW_ROUND


def _make_drop(root: str, n_files: int, docs_per_file: int) -> None:
    from neo4j_to_clickhouse_spark.sources.warc import encode_warc

    os.makedirs(root, exist_ok=True)
    for f in range(n_files):
        recs = []
        for d in range(n_files * docs_per_file // n_files):
            i = f * docs_per_file + d
            # ~1.5 KB of deterministic text, varied per doc
            body = " ".join(
                WORDS[(i + j) % len(WORDS)] for j in range(220)
            )
            recs.append(
                {
                    "uri": f"http://h{f % 7}.com/p{i}",
                    "record_id": f"<urn:uuid:{i:032x}>",
                    "body": f"<p>{body}</p>".encode(),
                    "status": 200,
                    "content_type": "text/html; charset=utf-8",
                }
            )
        with open(os.path.join(root, f"f{f:04d}.warc.gz"), "wb") as fh:
            fh.write(encode_warc(recs, gzip_per_record=True))


def _drain(spark, drop: str, out: str, **kw) -> tuple[float, int]:
    from neo4j_to_clickhouse_spark.sources.robots import robots_rules_df
    from neo4j_to_clickhouse_spark.streaming.corpus import (
        read_warc_file_stream,
        start_corpus_stream,
    )
    from neo4j_to_clickhouse_spark.streaming.pipeline import drain

    rules = robots_rules_df(
        spark, [(f"h{i}.com", "User-agent: *\n") for i in range(7)]
    )
    if "recalibrate_every" in kw:
        kw = dict(kw, calibration_path=f"{out}/calib")
    t0 = time.perf_counter()
    drain(
        start_corpus_stream(
            read_warc_file_stream(spark, drop),
            rules,
            table_path=f"{out}/docs",
            quarantine_path=f"{out}/quar",
            checkpoint_path=f"{out}/ckpt",
            **kw,
        )
    )
    wall = time.perf_counter() - t0
    n = spark.read.parquet(f"{out}/docs").count()
    return wall, n


def main() -> None:
    n_files = int(sys.argv[1]) if len(sys.argv) > 1 else 32
    docs_per_file = int(sys.argv[2]) if len(sys.argv) > 2 else 64

    from neo4j_to_clickhouse_spark.operators.bpe import byte_vocab, learn_bpe
    from neo4j_to_clickhouse_spark.operators.classifier import (
        ClassifierModel,
        weight_table,
    )
    from neo4j_to_clickhouse_spark.session import get_spark

    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    spark = get_spark(
        "funnel-bench",
        master=f"local[{cpus}]",
        shuffle_partitions=int(cpus),
    )
    work = tempfile.mkdtemp(prefix="funnel_bench_")
    drop = os.path.join(work, "drop")
    _make_drop(drop, n_files, docs_per_file)

    model = ClassifierModel(
        weights=tuple(weight_table(256)), hasher="xxhash64"
    )
    # a realistic merge table: learned from a sample of the drop text
    sample = spark.read.format("binaryFile").load(drop).limit(4)
    from neo4j_to_clickhouse_spark.sources.robots import robots_rules_df
    from neo4j_to_clickhouse_spark.streaming.corpus import corpus_documents

    rules = robots_rules_df(
        spark, [(f"h{i}.com", "User-agent: *\n") for i in range(7)]
    )
    sdocs, _ = corpus_documents(sample, rules)
    merges = learn_bpe(sdocs, "text", num_merges=512, pretokenize="gpt2")
    vocab = byte_vocab(merges)

    results: dict = {}
    configs = {
        "plain": {},
        "scored": dict(
            enrich=True,
            classifier_weights=model,
            score_threshold=-1.0,
        ),
        "funnel": dict(
            enrich=True,
            classifier_weights=model,
            score_threshold=-1.0,  # keep-everything gate: same row count
            bpe_merges=merges,
            bpe_vocab=vocab,
            compact_every=4,
        ),
        # EVERYTHING at once (r15): rolling recalibration (fraction
        # 1.0 -> the calibrated gate keeps all rows, so doc counts stay
        # comparable while the histogram/threshold machinery runs) +
        # one-vs-all topic tagging on top of the full funnel
        "funnel_max": dict(
            enrich=True,
            classifier_weights=model,
            bpe_merges=merges,
            bpe_vocab=vocab,
            compact_every=4,
            recalibrate_every=4,
            calibration_fraction=1.0,
            calibration_window=8,
            topic_weights={
                "code": weight_table(256, 8),
                "news": weight_table(256, 9),
                "web": weight_table(256, 10),
            },
        ),
    }
    def _steal() -> int:
        try:
            with open("/proc/stat") as fh:
                return int(fh.readline().split()[8])
        except (OSError, IndexError, ValueError):
            return 0

    for name, kw in configs.items():
        walls, steals = [], []
        n = 0
        # up to 8 reps until 3 CLEAN ones land (r15: the r14 record's
        # 'scored' config was steal-polluted — a storm can span all 3
        # fixed reps, so retry instead of reporting polluted numbers;
        # a brief settle-wait lets a storm pass between reps)
        rep = 0
        while rep < 8 and sum(1 for st in steals if st <= 50) < 3:
            out = os.path.join(work, f"{name}{rep}")
            s0 = _steal()
            wall, n = _drain(spark, drop, out, **kw)
            walls.append(round(wall, 2))
            steals.append(_steal() - s0)
            rep += 1
            if steals[-1] > 50:
                time.sleep(10)
        clean = [w for w, st in zip(walls, steals) if st <= 50]
        polluted = not clean
        clean = clean or walls
        results[name] = {
            "walls": walls,
            "steal_cs": steals,
            "wall": min(clean),
            "docs": n,
            "docs_per_s": round(n / min(clean), 1),
            "steal_polluted": polluted,
        }
    overhead = round(
        results["funnel"]["wall"] / results["plain"]["wall"], 3
    )
    report = {
        "metric": "online_funnel_throughput",
        "n_files": n_files,
        "docs_per_file": docs_per_file,
        "plain": results["plain"],
        "scored": results["scored"],
        "funnel": results["funnel"],
        "funnel_max": results["funnel_max"],
        "funnel_over_plain": overhead,
        "funnel_max_over_plain": round(
            results["funnel_max"]["wall"] / results["plain"]["wall"], 3
        ),
        "scored_over_plain": round(
            results["scored"]["wall"] / results["plain"]["wall"], 3
        ),
        "funnel_stages": (
            "enrich + classifier(xxhash64, 256 buckets) + threshold "
            "gate + byte-level GPT-2 BPE (512 learned merges) + "
            "compact_every=4; funnel_max adds rolling recalibration "
            "(every=4, window=8, fraction=1.0) + 3-class topic tagging"
        ),
    }
    path = os.path.join(
        REPO,
        "docs",
        "evidence",
        f"FUNNEL_THROUGHPUT_r{_round()}.json"
    )
    with open(path, "w") as fh:
        json.dump(report, fh, indent=1)
    print(json.dumps(report))
    shutil.rmtree(work, ignore_errors=True)


if __name__ == "__main__":
    main()
