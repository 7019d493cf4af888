"""Local stand-in for the driver's DuckDB-oracle correctness gate.

Runs every QuerySpec's Spark program and oracle SQL side-by-side on the same
parquet tables, then compares column names in DECLARED order and exact
type-tagged cell values (rows order-insensitive). Usage:

    python tools/check_correctness.py [sf_dir] [query ...]

Driver fidelity (VERDICT r06 item 2): the previous gate sorted columns,
``str()``-ed every cell, and collapsed floats to 9 significant digits —
which passed ``sequence_packing_stats`` while the driver failed it.  The
driver materializes the oracle through Arrow, where a bare DuckDB
``sum(bigint)`` or ``//`` quotient is HUGEINT → ``decimal128(38,0)`` →
``Decimal``, hashed differently from Spark's LongType ``int`` even when
numerically equal.  This gate therefore (a) fetches the oracle via
``fetch_arrow_table()`` so those types survive, and (b) tags every cell
with its Python type class, so an int/Decimal/float divergence is fatal
here exactly as it is in the driver's value hash.
"""

from __future__ import annotations

import datetime as dt
import math
import os
import sys
from decimal import Decimal

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb

from neo4j_to_clickhouse_spark.plans import QUERIES
from neo4j_to_clickhouse_spark.schemas import TESTDATA_TABLES
from neo4j_to_clickhouse_spark.session import get_spark


def norm_cell(v):
    """Exact, type-tagged canonical repr of one result cell.

    No precision collapse: ``repr(float)`` is the shortest round-trip
    form, so two floats normalize equal iff they are bit-equal (modulo
    NaN).  The tag prefix makes cross-type numeric equality (int 3 vs
    Decimal('3') vs 3.0) a mismatch, matching the driver's hash.
    """
    if v is None:
        return "null"
    if isinstance(v, bool):
        return "b:1" if v else "b:0"
    if isinstance(v, int):
        return f"i:{v}"
    if isinstance(v, float):
        return "f:nan" if math.isnan(v) else f"f:{v!r}"
    if isinstance(v, Decimal):
        return f"dec:{v}"
    if isinstance(v, dt.datetime):  # before date: datetime is a date
        if v.tzinfo is not None:
            v = v.astimezone(dt.timezone.utc).replace(tzinfo=None)
        return f"ts:{v.isoformat()}"
    if isinstance(v, dt.date):
        return f"d:{v.isoformat()}"
    if isinstance(v, (bytes, bytearray)):
        return "x:" + bytes(v).hex()
    if isinstance(v, dict):  # arrow struct/map
        return (
            "{"
            + ",".join(f"{k}={norm_cell(x)}" for k, x in sorted(v.items()))
            + "}"
        )
    if isinstance(v, (list, tuple)):  # incl. pyspark Row (tuple subclass)
        return "[" + ",".join(norm_cell(x) for x in v) + "]"
    return f"s:{v}"


def norm_rows(rows):
    """Rows (iterables in declared column order) -> sorted tag tuples.

    Row order stays insensitive — ORDER BY ties are legitimately
    engine-ambiguous — but column order does NOT: it must already be
    declared-identical before this is called.
    """
    return sorted(tuple(norm_cell(v) for v in r) for r in rows)


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    only = set(sys.argv[2:])
    # a typo'd (or flag-style) name silently filters NOTHING and prints a
    # vacuous ALL OK — fail fast instead
    unknown = only - set(QUERIES)
    if unknown:
        print(f"unknown query names: {sorted(unknown)}", file=sys.stderr)
        return 2
    spark = get_spark("correctness", master="local[8]", shuffle_partitions=8)
    con = duckdb.connect()
    # A runaway all-pairs oracle at a generated large SF can OOM-kill
    # the whole host (observed: 105 GB anon RSS at sf3). With a cap the
    # offending query FAILs and the sweep continues.
    mem = os.environ.get("SPARK_GRAFT_DUCKDB_MEM")
    if mem:
        con.execute(f"SET memory_limit='{mem}'")
        # no spill-to-disk either: an all-pairs oracle at a large SF
        # can write tens of GB to .tmp before failing — fail fast
        con.execute("SET temp_directory=''")
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
            tbl = con.execute(spec.oracle).fetch_arrow_table()
            ocols = tbl.column_names
            orows = [
                [row[c] for c in ocols] for row in tbl.to_pylist()
            ]
        except Exception as e:
            print(f"FAIL  {name}: oracle error: {e}")
            failures += 1
            continue
        if scols != ocols:
            print(
                f"FAIL  {name}: column mismatch (declared order) "
                f"spark={scols} oracle={ocols}"
            )
            failures += 1
            continue
        if len(srows) != len(orows):
            print(f"FAIL  {name}: rowcount spark={len(srows)} oracle={len(orows)}")
            failures += 1
            continue
        s_n = norm_rows(srows)
        o_n = norm_rows(orows)
        if s_n != o_n:
            diff = [i for i, (a, b) in enumerate(zip(s_n, o_n)) if a != b][:3]
            print(f"FAIL  {name}: value mismatch at sorted rows {diff}")
            for i in diff[:2]:
                srow, orow = s_n[i], o_n[i]
                cells = [
                    f"{scols[j]}: {a} != {b}"
                    for j, (a, b) in enumerate(zip(srow, orow))
                    if a != b
                ]
                print(f"      row {i}: " + "; ".join(cells[:4]))
            failures += 1
            continue
        print(f"ok    {name}: {len(srows)} rows")
    print(f"\n{'ALL OK' if failures == 0 else f'{failures} FAILURES'}")
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
