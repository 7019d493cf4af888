"""Ingest throughput benchmark vs the reference's 10K+ ops/sec claim
(`docs/QUICKSTART.md:176`; BASELINE.md).

Generates N synthetic CDC envelopes entirely Spark-side (spark.range ->
to_json(struct(...)), no driver loop), writes them as NDJSON, then measures:

1. batch ingest   — read.text -> envelope parse -> projection -> partitioned
                    parquet write (the snapshot-catchup path);
2. streaming drain — the same files through the Structured Streaming
                    pipeline with availableNow (the continuous path).

Prints one JSON line: {"events": N, "batch_eps": ..., "stream_eps": ...}.

Usage: python tools/bench_ingest.py [n_events]
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

from neo4j_to_clickhouse_spark.operators.ingest import node_events_from_raw
from neo4j_to_clickhouse_spark.session import get_spark
from neo4j_to_clickhouse_spark.sources.envelopes import read_envelope_file
from neo4j_to_clickhouse_spark.streaming import (
    StreamConfig,
    drain,
    start_node_stream,
)


def generate_envelopes(spark, n: int, path: str) -> None:
    """N node-CDC envelopes over n/10 entities, INSERT/UPDATE/DELETE mix,
    spread over three months — built with native expressions only."""
    ts = F.timestamp_millis(
        F.lit(1767225600000) + (F.col("id") % 90) * 86400000 + F.col("id") % 1000
    )
    envelope = F.to_json(
        F.struct(
            F.concat(F.lit("ev-"), F.col("id")).alias("id"),
            F.struct(
                F.struct(
                    F.date_format(ts, "yyyy-MM-dd'T'HH:mm:ss.SSSXXX").alias("TZDT")
                ).alias("txStartTime")
            ).alias("metadata"),
            F.struct(
                F.element_at(
                    F.array(F.lit("CREATE"), F.lit("UPDATE"), F.lit("UPDATE"), F.lit("DELETE")),
                    (F.col("id") % 4 + 1).cast("int"),
                ).alias("operation"),
                F.lit("NODE_EVENT").alias("eventType"),
                F.concat(F.lit("4:bench:"), F.col("id") % (n // 10 or 1)).alias(
                    "elementId"
                ),
                F.array(F.lit("Bench"), F.lit("Node")).alias("labels"),
                F.struct(
                    F.struct(F.lit(None).cast("string").alias("properties")).alias(
                        "before"
                    ),
                    F.struct(
                        F.concat(
                            F.lit('{"name": "node-'),
                            F.col("id"),
                            F.lit('", "score": '),
                            (F.col("id") % 100),
                            F.lit("}"),
                        ).alias("properties")
                    ).alias("after"),
                ).alias("state"),
            ).alias("event"),
        )
    )
    spark.range(n).select(envelope.alias("value")).repartition(32).write.mode(
        "overwrite"
    ).text(path)


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 500_000
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    spark = get_spark(
        "bench_ingest", master=f"local[{cpus}]", shuffle_partitions=int(cpus)
    )
    root = tempfile.mkdtemp(prefix="bench_ingest_")
    src = f"{root}/envelopes"
    try:
        generate_envelopes(spark, n, src)

        # two timed runs per path, min reported: the first execution of a
        # plan pays one-time JIT of its generated code (observed 3K->26K
        # eps swings on identical plans); steady-state is the comparable
        # number. Fresh output/checkpoint dirs per run so the streaming
        # checkpoint can't mark files already-processed.
        batch_s, stream_s = [], []
        for i in range(2):
            t0 = time.perf_counter()
            res = node_events_from_raw(read_envelope_file(spark, src))
            (
                res.events.write.mode("overwrite")
                .partitionBy("event_month")
                .parquet(f"{root}/batch_out_{i}")
            )
            batch_s.append(time.perf_counter() - t0)
            batch_rows = spark.read.parquet(f"{root}/batch_out_{i}").count()
            assert batch_rows == n, f"batch lost rows: {batch_rows}/{n}"

        for i in range(2):
            config = StreamConfig(
                table_path=f"{root}/stream_out_{i}",
                quarantine_path=f"{root}/quarantine_{i}",
                checkpoint_path=f"{root}/ckpt_{i}",
                processing_time=None,
            )
            t0 = time.perf_counter()
            drain(
                start_node_stream(
                    read_envelope_file(spark, src, streaming=True), config
                ),
                timeout_s=600,
            )
            stream_s.append(time.perf_counter() - t0)
            stream_rows = spark.read.parquet(f"{root}/stream_out_{i}").count()
            assert stream_rows == n, f"stream lost rows: {stream_rows}/{n}"

        batch_s, stream_s = min(batch_s), min(stream_s)
        print(
            json.dumps(
                {
                    "events": n,
                    "batch_s": round(batch_s, 2),
                    "batch_eps": round(n / batch_s),
                    "stream_s": round(stream_s, 2),
                    "stream_eps": round(n / stream_s),
                }
            )
        )
    finally:
        shutil.rmtree(root, ignore_errors=True)


if __name__ == "__main__":
    main()
