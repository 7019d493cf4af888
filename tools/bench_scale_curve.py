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
    "bm25_multi_query_topk",    # pruned explode + broadcast vocab + window k-cut
]

SFS = ["0.001", "0.01", "0.1"]
ROOT = os.environ.get("SPARK_GRAFT_TESTDATA", "/root/testdata")


def main() -> None:
    args = sys.argv[1:]
    extra: list[tuple[str, str]] = []  # (label, dir) beyond the fixtures
    while "--extra" in args:
        i = args.index("--extra")
        label, _, path = args[i + 1].partition("=")
        extra.append((label, path))
        del args[i : i + 2]
    names = args or DEFAULT_QUERIES
    spark = get_spark(
        "bench-scale-curve",
        master=f"local[{os.environ.get('SPARK_GRAFT_CPUS', '32')}]",
        shuffle_partitions=32,
    )
    # JVM/codegen warmup outside any measurement
    QUERIES["count_by_event_type"].spark(
        spark, f"{ROOT}/sf0.001"
    ).collect()

    points = [(sf, f"{ROOT}/sf{sf}") for sf in SFS] + extra
    curves: dict[str, dict[str, float]] = {}
    for name in names:
        spec = QUERIES[name]
        curves[name] = {}
        for label, sf_dir in points:
            print(f"# {name} @ {label} ...", file=sys.stderr, flush=True)
            runs = []
            for _ in range(2):
                t0 = time.monotonic()
                spec.spark(spark, sf_dir).collect()
                runs.append(time.monotonic() - t0)
            curves[name][label] = round(min(runs), 3)
            print(
                f"# {name} @ {label}: {min(runs):.3f}s",
                file=sys.stderr,
                flush=True,
            )
            spark.catalog.clearCache()

    alpha = {
        name: round(
            math.log(c["0.1"] / c["0.01"]) / math.log(10.0), 2
        )
        for name, c in curves.items()
    }
    out = {"curves": curves, "alpha": alpha}
    if extra:
        # Two extra exponents once a synthetic point extends the span
        # (labels encode the sf multiple, e.g. "1.0" = 10x sf0.1):
        #   alpha_wide — fit over the full sf0.01 -> last-point span;
        #     startup overhead amortizes across decades, so this skews low.
        #   alpha_last — fit over the LAST span only (the two largest
        #     points); the honest asymptotic estimate, since fixed costs
        #     are already amortized there. Target: <= 1.0 (linear) for
        #     scan shapes, << 1 for heap/pre-aggregate shapes.
        last_label = extra[-1][0]
        prev_label = extra[-2][0] if len(extra) > 1 else "0.1"
        wide_span = math.log(float(last_label) / 0.01)
        last_span = math.log(float(last_label) / float(prev_label))
        out["alpha_wide"] = {
            name: round(math.log(c[last_label] / c["0.01"]) / wide_span, 2)
            for name, c in curves.items()
        }
        out["alpha_last"] = {
            name: round(math.log(c[last_label] / c[prev_label]) / last_span, 2)
            for name, c in curves.items()
        }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
