"""Scale-curve probe: the same query at sf0.001 / sf0.01 / sf0.1 and the
implied scaling exponent — empirical backing for docs/SCALING.md's
"would this survive 100x?" claims.

For each probed query, wall time is min-of-2 warm runs per SF in ONE
Spark session (cold JVM start excluded by a throwaway warmup query).
The exponent alpha fits t ~ c * data^alpha on the sf0.01 -> sf0.1 pair
(10x data; the 0.001 point is overhead-dominated and reported but not
fitted). Readings on local[32]:

- alpha ~ 1.0  linear — scan/shuffle bound, the expected steady state;
- alpha << 1   fixed-overhead dominated at these sizes (small-output
  aggregates) — the true slope appears only at larger data;
- alpha >> 1   superlinear — a genuine scale hazard (quadratic fan-out,
  skew collapse) that 100x will amplify; none should appear here.

Usage: python tools/bench_scale_curve.py [query ...]
Prints one JSON line: {"curves": {q: {sf: sec}}, "alpha": {q: x}}.
"""

from __future__ import annotations

import json
import math
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from neo4j_to_clickhouse_spark.plans import QUERIES
from neo4j_to_clickhouse_spark.session import get_spark

# one representative per physical shape (see bench.py for the full set)
DEFAULT_QUERIES = [
    "pricing_summary",          # fact scan + grouped decimal agg
    "top_revenue_orders",       # broadcast join chain + top-k heap
    "latest_state_per_entity",  # window dedup (1 key shuffle)
    "dedup_exact_docs",         # hash-digest group-by
    "dedup_minhash_lsh",        # signature agg + banded bucket join
    "embedding_knn",            # Arrow GEMM corpus stream
    "text_stats_by_source",     # pure codegen text scan
    "token_zipf_coverage",      # explode + map-combined agg + TakeOrdered
    "repeated_span_stats",      # span-digest shuffle (heaviest text shape)
]

SFS = ["0.001", "0.01", "0.1"]
ROOT = os.environ.get("SPARK_GRAFT_TESTDATA", "/root/testdata")


def main() -> None:
    names = sys.argv[1:] or DEFAULT_QUERIES
    spark = get_spark(
        "bench-scale-curve",
        master=f"local[{os.environ.get('SPARK_GRAFT_CPUS', '32')}]",
        shuffle_partitions=32,
    )
    # JVM/codegen warmup outside any measurement
    QUERIES["count_by_event_type"].spark(
        spark, f"{ROOT}/sf0.001"
    ).collect()

    curves: dict[str, dict[str, float]] = {}
    for name in names:
        spec = QUERIES[name]
        curves[name] = {}
        for sf in SFS:
            sf_dir = f"{ROOT}/sf{sf}"
            runs = []
            for _ in range(2):
                t0 = time.monotonic()
                spec.spark(spark, sf_dir).collect()
                runs.append(time.monotonic() - t0)
            curves[name][sf] = round(min(runs), 3)
            spark.catalog.clearCache()

    alpha = {
        name: round(
            math.log(c["0.1"] / c["0.01"]) / math.log(10.0), 2
        )
        for name, c in curves.items()
    }
    print(json.dumps({"curves": curves, "alpha": alpha}))


if __name__ == "__main__":
    main()
