"""Hot-key JSON promotion experiment (SURVEY §7 hard part c).

Measures the same predicate+aggregate (`$.k > 50` over events.props) at
$SPARK_GRAFT_SF_DIR through the three storage strategies a CDC property
bag can use, and prints one JSON line:

1. string-json   — props stays a string; `get_json_object` per row
   (the engine's default, matching the reference's String properties
   column, SURVEY §1.2).
2. variant       — `parse_json` once into Spark 4 VariantType, then
   typed `variant_get` navigation.
3. promoted      — the hot key is extracted to a typed top-level column
   at INGEST time (one-time cost, measured separately as `promote_once`)
   and the query filters the column directly, with predicate pushdown.

Run-shape notes: each strategy is timed twice on its own materialized
input (so variant measures variant_get, not parse_json; promoted
measures the column filter, not the extraction) and the min is taken —
same min-of-2 JIT discipline as bench.py.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from neo4j_to_clickhouse_spark.functions import variant as VR
from neo4j_to_clickhouse_spark.plans.queries import _t
from neo4j_to_clickhouse_spark.session import get_spark


def timed(fn, n=2):
    runs = []
    for _ in range(n):
        t0 = time.perf_counter()
        fn()
        runs.append(round(time.perf_counter() - t0, 3))
    return runs


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    spark = get_spark(
        "json-promotion", master=f"local[{cpus}]",
        shuffle_partitions=int(cpus),
    )
    work = tempfile.mkdtemp(prefix="json_promo_")
    out: dict = {"sf_dir": sf_dir, "cpus": int(cpus)}
    try:
        events = _t(spark, sf_dir, "events")
        events.count()  # warm footers/JIT baseline

        def agg(df, pred):
            # collect the aggregate rows — .count() would let Catalyst
            # prune the count(*) column (round-8 bench-honesty sweep);
            # the filter predicate under test survives either way, but
            # consume what a client would
            return (
                df.filter(pred)
                .groupBy("event_type")
                .agg(F.count("*").alias("cnt"))
                .collect()
            )

        # 1. string JSON (default)
        out["string_json"] = timed(
            lambda: agg(events, F.get_json_object("props", "$.k").cast("int") > 50)
        )

        # 2. variant: parse cost isolated from navigation cost by
        # materializing the parsed table first
        vpath = f"{work}/variant"
        t0 = time.perf_counter()
        VR.with_variant_properties(events, cols=("props",)).write.parquet(vpath)
        out["variant_parse_once"] = round(time.perf_counter() - t0, 3)
        vevents = spark.read.parquet(vpath)
        out["variant"] = timed(
            lambda: agg(vevents, VR.vget("props_v", "$.k", "int") > 50)
        )

        # 3. promoted typed column at ingest
        ppath = f"{work}/promoted"
        t0 = time.perf_counter()
        events.withColumn(
            "props_k", F.get_json_object("props", "$.k").cast("int")
        ).write.parquet(ppath)
        out["promote_once"] = round(time.perf_counter() - t0, 3)
        pevents = spark.read.parquet(ppath)
        out["promoted"] = timed(lambda: agg(pevents, F.col("props_k") > 50))
        plan = (
            pevents.filter(F.col("props_k") > 50)
            ._jdf.queryExecution().executedPlan().toString()
        )
        out["promoted_pushdown"] = "GreaterThan(props_k,50)" in plan
    finally:
        shutil.rmtree(work, ignore_errors=True)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
