"""Microbench for the transaction-log store's metadata path: commit
latency under single-writer and contended (8-thread) load, and snapshot
resolution versus log length with and without embedded checkpoints.

Pure filesystem — no Spark. The numbers certify the two design claims
in operators/txn_store.py: commits are O(files-touched) metadata, and
checkpointed resolution replays a bounded log suffix instead of the
whole history.

Usage: python tools/bench_txn_log.py [workdir]
Prints one JSON line.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time
from concurrent.futures import ThreadPoolExecutor
from pathlib import Path

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from neo4j_to_clickhouse_spark.operators.txn_store import (  # noqa: E402
    TxnLogPartitionStore,
    ensure_log,
    snapshot,
)


def make_table(root: Path, months: int, files_per_month: int) -> None:
    for m in range(months):
        d = root / f"event_month=2026{m + 1:02d}"
        d.mkdir(parents=True)
        for i in range(files_per_month):
            (d / f"part-{i:05d}.parquet").write_bytes(b"x")


def bench_commits(root: Path, n: int) -> float:
    """Median wall time of n sequential single-file stream_batch commits."""
    store = TxnLogPartitionStore()
    times = []
    for b in range(n):
        rel = f"event_month=202601/bench-{b:05d}.parquet"
        (root / rel).write_bytes(b"y")
        t0 = time.perf_counter()
        store.commit_batch(str(root), [rel], f"bench-{b:05d}-")
        times.append(time.perf_counter() - t0)
    times.sort()
    return times[len(times) // 2]


def bench_contended(root: Path, writers: int, commits_each: int) -> float:
    """Total wall time for `writers` threads each landing `commits_each`
    disjoint-month commits concurrently (every loser retries through the
    rebase path)."""

    def worker(w: int) -> None:
        store = TxnLogPartitionStore()
        month = f"event_month=2026{w + 1:02d}"
        for b in range(commits_each):
            rel = f"{month}/w{w}-{b:05d}.parquet"
            (root / rel).write_bytes(b"y")
            store.commit_batch(str(root), [rel], f"w{w}-{b:05d}-")

    t0 = time.perf_counter()
    with ThreadPoolExecutor(writers) as ex:
        list(ex.map(worker, range(writers)))
    return time.perf_counter() - t0


def bench_resolution(root: Path) -> dict[str, float]:
    """Snapshot resolution time at the head, then again after disabling
    every checkpoint (forcing a full-history replay)."""
    reps = 20
    t0 = time.perf_counter()
    for _ in range(reps):
        snapshot(str(root))
    with_cp = (time.perf_counter() - t0) / reps

    # strip the checkpoints (v0's is kept: resolution needs SOME base)
    log = root / "_txn_log"
    for p in sorted(log.glob("*.json"))[1:]:
        rec = json.loads(p.read_text())
        if "checkpoint" in rec:
            del rec["checkpoint"]
            p.write_text(json.dumps(rec))
    t0 = time.perf_counter()
    for _ in range(reps):
        snapshot(str(root))
    without_cp = (time.perf_counter() - t0) / reps
    return {"resolve_checkpointed_s": with_cp, "resolve_full_replay_s": without_cp}


def main() -> None:
    base = Path(sys.argv[1]) if len(sys.argv) > 1 else Path(tempfile.mkdtemp())
    root = base / "txn_bench"
    if root.exists():
        shutil.rmtree(root)
    make_table(root, months=8, files_per_month=125)  # 1 000 live files
    ensure_log(str(root))

    commit_median = bench_commits(root, 200)
    n_commits_before = snapshot(str(root))[0]
    contended_total = bench_contended(root, writers=8, commits_each=25)
    head, files = snapshot(str(root))
    res = bench_resolution(root)

    out = {
        "live_files": len(files),
        "commits_total": head,
        "commit_median_ms": round(commit_median * 1e3, 3),
        "contended_8w_200_commits_s": round(contended_total, 3),
        "contended_commits_per_s": round(
            (head - n_commits_before) / contended_total, 1
        ),
        **{k: round(v * 1e3, 3) for k, v in
           (("resolve_checkpointed_ms", res["resolve_checkpointed_s"]),
            ("resolve_full_replay_ms", res["resolve_full_replay_s"]))},
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
