"""Local stand-in for the driver's DuckDB-oracle correctness gate.

Runs every QuerySpec's Spark program and oracle SQL side-by-side on the same
parquet tables, then compares row count, column names, and order-insensitive
values. Usage:

    python tools/check_correctness.py [sf_dir] [query ...]
"""

from __future__ import annotations

import math
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb

from neo4j_to_clickhouse_spark.plans import QUERIES
from neo4j_to_clickhouse_spark.schemas import TESTDATA_TABLES
from neo4j_to_clickhouse_spark.session import get_spark


def norm_cell(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "nan"
        return f"{v:.9g}"
    if isinstance(v, (list, tuple)):
        return "[" + ",".join(norm_cell(x) for x in v) + "]"
    return str(v)


def norm_rows(cols, rows):
    idx = sorted(range(len(cols)), key=lambda i: cols[i])
    return sorted(
        tuple(norm_cell(r[i]) for i in idx) for r in rows
    )


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    only = set(sys.argv[2:])
    spark = get_spark("correctness", master="local[8]", shuffle_partitions=8)
    con = duckdb.connect()
    for t in TESTDATA_TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'"
        )
    failures = 0
    for name, spec in QUERIES.items():
        if only and name not in only:
            continue
        try:
            sdf = spec.spark(spark, sf_dir)
            srows = sdf.collect()
            scols = sdf.columns
        except Exception as e:
            print(f"FAIL  {name}: spark error: {e}")
            failures += 1
            continue
        if spec.oracle is None:
            print(f"rows  {name}: {len(srows)} rows (no oracle — rows-only)")
            continue
        try:
            res = con.execute(spec.oracle)
            ocols = [d[0] for d in res.description]
            orows = res.fetchall()
        except Exception as e:
            print(f"FAIL  {name}: oracle error: {e}")
            failures += 1
            continue
        if sorted(scols) != sorted(ocols):
            print(f"FAIL  {name}: schema mismatch spark={scols} oracle={ocols}")
            failures += 1
            continue
        if len(srows) != len(orows):
            print(f"FAIL  {name}: rowcount spark={len(srows)} oracle={len(orows)}")
            failures += 1
            continue
        s_n = norm_rows(scols, [[r[c] for c in scols] for r in srows])
        o_n = norm_rows(ocols, orows)
        if s_n != o_n:
            diff = [i for i, (a, b) in enumerate(zip(s_n, o_n)) if a != b][:3]
            print(f"FAIL  {name}: value mismatch at sorted rows {diff}")
            for i in diff[:2]:
                print(f"      spark : {s_n[i]}")
                print(f"      oracle: {o_n[i]}")
            failures += 1
            continue
        print(f"ok    {name}: {len(srows)} rows")
    print(f"\n{'ALL OK' if failures == 0 else f'{failures} FAILURES'}")
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
