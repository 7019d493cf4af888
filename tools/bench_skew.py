"""Planted-hot-key benchmark: plain vs salted aggregation shapes.

The salted operators (`operators/skew.py`) exist for hot-key
wall-time, which the correctness gate cannot see — this measures it
(VERDICT r05 item 7). A deterministic synthetic frame plants one key
holding ~30% of all rows (the mass-duplicated-boilerplate shape of a
real pre-training corpus); everything derives from ``spark.range`` so
runs are reproducible and no testdata is mutated.

Shapes compared, same logical answer each pair:
- exact count-distinct:   groupBy(key).count_distinct(v)   vs salted_count_distinct
- exact argmin row:       rank-window first-row-per-key    vs salted_min_by
- as-of join:             asof_join (one window task/key)  vs asof_join_bucketed

Usage: python tools/bench_skew.py [rows] [hot_pct]
Prints one JSON line.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import Window
from pyspark.sql import functions as F

from neo4j_to_clickhouse_spark.operators.skew import (
    salted_count_distinct,
    salted_min_by,
)
from neo4j_to_clickhouse_spark.session import get_spark


def build(spark, rows: int, hot_pct: int):
    """~hot_pct% of rows on key 'HOT', rest uniform over 100k keys; the
    value column repeats every 1M so distinct counts exercise the
    two-stage merge for real."""
    return (
        spark.range(rows)
        .select(
            F.when(F.col("id") % 100 < hot_pct, F.lit("HOT"))
            .otherwise(F.concat(F.lit("k"), F.col("id") % 100_000))
            .alias("key"),
            (F.col("id") % 1_000_000).alias("v"),
            (F.xxhash64("id") % 1_000_000_000).alias("ord"),
        )
    )


def timed(label, thunk, runs=2):
    best = float("inf")
    for _ in range(runs):
        t0 = time.perf_counter()
        thunk()
        best = min(best, time.perf_counter() - t0)
    print(f"# {label}: {best:.3f}s", file=sys.stderr)
    return round(best, 3)


def main() -> None:
    rows = int(sys.argv[1]) if len(sys.argv) > 1 else 20_000_000
    hot_pct = int(sys.argv[2]) if len(sys.argv) > 2 else 30
    spark = get_spark("bench-skew", master="local[32]", shuffle_partitions=32)
    # AQE's skew handling covers joins, not aggregations — leave it on
    # (prod config) to show the salted form wins anyway.
    df = build(spark, rows, hot_pct).localCheckpoint()  # materialize input

    # every thunk CONSUMES the computed values (hash-sum collect), never
    # bare .count(): row counts are invariant under windows and unused
    # aggregates, so Catalyst prunes the very operator being measured
    # (observed: the as-of window eliminated entirely under .count()).
    def consume(sdf, *cols):
        sdf.select(
            F.sum(
                F.xxhash64(*[F.col(c) for c in cols]).cast("decimal(38,0)")
            ).alias("h")
        ).collect()

    res = {}
    res["count_distinct_plain"] = timed(
        "count_distinct plain",
        lambda: consume(
            df.groupBy("key").agg(F.count_distinct("v").alias("d")),
            "key", "d",
        ),
    )
    res["count_distinct_salted"] = timed(
        "count_distinct salted",
        lambda: consume(
            salted_count_distinct(df, ["key"], "v"), "key", "n_distinct"
        ),
    )
    w = Window.partitionBy("key").orderBy("ord", "v")
    res["argmin_window_plain"] = timed(
        "argmin window plain",
        lambda: consume(
            df.withColumn("__r", F.row_number().over(w))
            .filter(F.col("__r") == 1)
            .drop("__r"),
            "key", "v", "ord",
        ),
    )
    res["argmin_salted"] = timed(
        "argmin salted",
        lambda: consume(salted_min_by(df, ["key"], "ord"), "key", "v", "ord"),
    )

    # as-of join under the same planted hot key (VERDICT r07 item 6):
    # the plain carry-forward window serializes the hot key's whole
    # event+probe history into ONE task; the bucketed variant spreads it
    # over (timespan / bucket_seconds) tasks.  Timestamps span ~1 year,
    # one-week buckets -> the hot key becomes ~52 window units.
    from neo4j_to_clickhouse_spark.operators.asof import (
        asof_join,
        asof_join_bucketed,
    )

    year = 365 * 86_400

    def keyed(n, seed):
        return spark.range(n).select(
            F.when(F.col("id") % 100 < hot_pct, F.lit("HOT"))
            .otherwise(F.concat(F.lit("k"), F.col("id") % 100_000))
            .alias("key"),
            F.timestamp_seconds(
                1_600_000_000 + F.pmod(F.xxhash64("id", F.lit(seed)), year)
            ).alias("ts"),
            F.col("id").alias("eid"),
            (F.col("id") % 1_000_000).alias("state"),
        )

    ev = keyed(rows, 1).localCheckpoint()
    pr = keyed(rows // 10, 2).select(
        "key", F.col("ts").alias("pt")
    ).localCheckpoint()
    res["asof_window_plain"] = timed(
        "asof plain window",
        lambda: consume(
            asof_join(ev, pr, "key", "ts", "pt", ["eid", "state"], "eid"),
            "key", "eid", "state",
        ),
    )
    res["asof_bucketed"] = timed(
        "asof bucketed",
        lambda: consume(
            asof_join_bucketed(
                ev, pr, "key", "ts", "pt", ["eid", "state"], "eid"
            ),
            "key", "eid", "state",
        ),
    )
    print(
        json.dumps(
            {
                "metric": "planted_hot_key_skew",
                "rows": rows,
                "hot_pct": hot_pct,
                "unit": "sec",
                "times": res,
            }
        )
    )


if __name__ == "__main__":
    main()
