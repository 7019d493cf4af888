"""The bench's CPU-inflation guard (VERDICT r13 item 1).

The r13 driver refresh measured quality_classifier_xxhash at 11.4 s
wall / 10.3 s task-CPU — identical code the committed record and a
fresh-session A/B both put at ~2 s wall / 1.7 s CPU. Steal was zero and
wall tracked CPU, so both existing dirty guards stayed silent: task-CPU
inflation on an unchanged plan is the late-session JIT/code-cache
failure class, detectable only against a committed reference. These
tests pin the guard's decision function and the baseline loading; the
fresh-JVM re-measure path is exercised by the guard firing in a real
bench run (bench.py _measure/retry loop).
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bench import BENCH_QUERIES, _load_cpu_baseline, cpu_inflated


def test_cpu_inflated_flags_the_r13_anomaly():
    # the actual numbers from the contested record: committed 1.687 s,
    # driver refresh 10.3 s — must flag
    assert cpu_inflated(10.3, 1.687)


def test_cpu_inflated_tolerates_normal_jitter():
    # 2x on a heavyweight row is within warm-up/noise envelope
    assert not cpu_inflated(4.0, 2.029)
    # small-CPU rows jitter multiplicatively: 0.04 -> 0.9 s is 22x but
    # under the 1 s absolute floor — not a code-cache event
    assert not cpu_inflated(0.9, 0.04)
    # ... but a small row burning seconds of CPU is flagged
    assert cpu_inflated(2.5, 0.04)
    # boundary: exactly 3x + 1 s is clean, just above is dirty
    assert not cpu_inflated(3.0 * 1.0 + 1.0, 1.0)
    assert cpu_inflated(3.0 * 1.0 + 1.001, 1.0)


def test_cpu_baseline_loads_for_matching_sf_only(tmp_path):
    repo = str(tmp_path)
    os.makedirs(f"{repo}/docs/evidence")
    with open(f"{repo}/docs/evidence/BENCH_CPU_BASELINE.json", "w") as fh:
        json.dump({"sf": 0.1, "cpu_s": {"q1": 1.5}}, fh)
    assert _load_cpu_baseline(repo, "0.1") == {"q1": 1.5}
    # other scale factors (smoke runs at sf0.001) disable the guard
    # instead of comparing apples to oranges
    assert _load_cpu_baseline(repo, "0.001") == {}
    # absent file disables the guard
    assert _load_cpu_baseline(str(tmp_path / "nowhere"), "0.1") == {}


def test_committed_baseline_covers_the_headline_set():
    """The committed reference must cover every bench row (a new row
    without a baseline silently runs unguarded — this fails until the
    round that adds the row also lands its first quiet-host CPU
    number)."""
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    base = _load_cpu_baseline(repo, "0.1")
    extra_jobs = {
        "maintenance_compact",
        "bm25_indexed_query",
        "minhash_incremental_probe",
        "quality_classifier_xxhash",
    }
    missing = (set(BENCH_QUERIES) | extra_jobs) - set(base)
    assert not missing, f"bench rows without a CPU baseline: {missing}"


def test_clean_flags_survive_a_cpu_spike_run():
    """The ratio baseline is the lowest-WALL run's ratio (r14 fix):
    these are the live minhash_incremental_probe numbers where a
    35 s-CPU accounting spike run used to set the best-ratio baseline
    and disqualify the two genuinely clean 2.2 s runs — falsely
    triggering the fresh-JVM retry."""
    from bench import clean_run_flags

    runs = [4.632, 2.234, 2.245, 7.278]
    cpus = [35.936, 2.502, 2.479, 39.158]
    steals = [0, 0, 0, 0]
    flags = clean_run_flags(runs, cpus, steals, 50, 1.6)
    # the warm runs are clean; min-of-clean is the honest 2.234
    assert flags[1] and flags[2]
    assert min(w for w, ok in zip(runs, flags) if ok) == 2.234


def test_clean_flags_still_catch_host_noise():
    """Host noise inflates wall at unchanged CPU: the noisy run's
    ratio sits far above the best-wall run's and stays flagged."""
    from bench import clean_run_flags

    runs = [2.0, 9.5]
    cpus = [1.8, 1.9]  # same compute, 4.75x the wall
    flags = clean_run_flags(runs, cpus, [0, 0], 50, 1.6)
    assert flags == [True, False]
    # steal over budget is dirty regardless of ratio
    assert clean_run_flags([2.0], [1.8], [500], 50, 1.6) == [False]
