"""Dump .explain("formatted") for every bench query to plans/r<round>/.

Usage: python tools/dump_plans.py <suffix> [query ...]
  suffix: "before" or "after" — file name becomes
          plans/r<_WINDOW_ROUND>/<query>_<suffix>.txt
  query:  optional subset; default = all BENCH_QUERIES + the extra bench jobs'
          underlying registry shapes that have a registry entry.

Plans are captured at sf0.1 (the driver's bench scale) on a small local
session — plan shape does not depend on core count, and this keeps the
dump cheap enough to run alongside other jobs.
"""

from __future__ import annotations

import io
import os
import sys
from contextlib import redirect_stdout

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bench import BENCH_QUERIES  # noqa: E402
from neo4j_to_clickhouse_spark.plans import QUERIES  # noqa: E402
from neo4j_to_clickhouse_spark.session import get_spark  # noqa: E402


def main() -> None:
    suffix = sys.argv[1] if len(sys.argv) > 1 else "before"
    names = sys.argv[2:] or list(BENCH_QUERIES)
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    from neo4j_to_clickhouse_spark.plans.queries import _WINDOW_ROUND

    out_dir = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "plans",
        f"r{_WINDOW_ROUND}",
    )
    os.makedirs(out_dir, exist_ok=True)
    spark = get_spark("plans", master="local[4]", shuffle_partitions=4)
    for name in names:
        spec = QUERIES[name]
        df = spec.spark(spark, sf_dir)
        buf = io.StringIO()
        with redirect_stdout(buf):
            df.explain("formatted")
        path = os.path.join(out_dir, f"{name}_{suffix}.txt")
        with open(path, "w") as fh:
            fh.write(buf.getvalue())
        print(f"wrote {path}")


if __name__ == "__main__":
    main()
