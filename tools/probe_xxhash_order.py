"""First-vs-last A/B for the quality_classifier_xxhash bench anomaly
(VERDICT r13 item 1, 'what's wrong' 1).

The r13 driver refresh measured the xxhash production-scoring row at
11.4 s wall / 10.3 s task-CPU as the LAST job of a ~35-query session;
the committed record and a fresh-session A/B both measure ~2 s. The
hypothesis: late-session JIT/code-cache degradation — CPU inflates on
an identical plan, so the steal and wall/CPU-ratio guards stay silent.

This probe runs the row (a) FIRST in a fresh session, then (b) LAST
after replaying the full headline registry set once (the r13 session
shape), recording wall, task-CPU, and the HotSpot CodeHeap + codegen
counters at both points. A large (b)/(a) CPU ratio with a near-full
'non-profiled nmethods' pool confirms the code-cache hypothesis; a
~1x ratio shows the anomaly needs session state this probe does not
reproduce (and the bench's cpu_inflated + fresh-JVM retry guard still
catches either).

Usage: python tools/probe_xxhash_order.py [sf_dir]
Writes docs/evidence/XXHASH_ORDER_AB_r14.json.
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def _xxhash_run(spark, sf_dir):
    import bench

    jobs = bench._classifier_prod_jobs(spark, sf_dir)
    (_, prepare, run_once) = jobs[0]
    prepare()
    return run_once


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    import bench
    from neo4j_to_clickhouse_spark.plans import QUERIES
    from neo4j_to_clickhouse_spark.session import get_spark

    cpus_env = os.environ.get("SPARK_GRAFT_CPUS", "32")
    spark = get_spark(
        "xxhash-ab",
        master=f"local[{cpus_env}]",
        shuffle_partitions=int(cpus_env),
    )
    bench._pin_caches(spark, sf_dir, cpus_env)
    run_once = _xxhash_run(spark, sf_dir)

    def timed_pair():
        out = []
        for _ in range(2):
            c0 = _task_cpu()
            t0 = time.perf_counter()
            run_once(spark)
            out.append(
                (
                    round(time.perf_counter() - t0, 3),
                    round(_task_cpu() - c0, 3),
                )
            )
        return out

    def _task_cpu() -> float:
        jsc = spark.sparkContext
        store = jsc._jsc.sc().statusStore()
        jvm, gw = jsc._jvm, jsc._gateway
        total = 0
        it = store.stageList(
            jvm.java.util.ArrayList(),
            False,
            False,
            gw.new_array(jvm.double, 0),
            jvm.java.util.ArrayList(),
        ).iterator()
        while it.hasNext():
            total += it.next().executorCpuTime()
        return total / 1e9

    first = timed_pair()
    jit_first = bench._codegen_snapshot(spark)

    # replay the r13 session shape: every headline registry query once
    for name in bench.BENCH_QUERIES:
        QUERIES[name].spark(spark, sf_dir).collect()
    last = timed_pair()
    jit_last = bench._codegen_snapshot(spark)

    out = {
        "metric": "xxhash_first_vs_last",
        "sf_dir": sf_dir,
        "first": [{"wall": w, "cpu_s": c} for w, c in first],
        "last": [{"wall": w, "cpu_s": c} for w, c in last],
        "cpu_ratio_last_over_first": round(
            min(c for _, c in last) / max(1e-3, min(c for _, c in first)),
            2,
        ),
        "codegen_after_first": jit_first,
        "codegen_after_last": jit_last,
    }
    path = os.path.join(
        REPO, "docs", "evidence", "XXHASH_ORDER_AB_r14.json"
    )
    with open(path, "w") as fh:
        json.dump(out, fh, indent=1)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
