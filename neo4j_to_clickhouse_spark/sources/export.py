"""Training-corpus export: sharded JSONL(.gz) — the delivery format
LLM training stacks actually consume (one JSON object per line,
size-bounded shards, a manifest for the loader).

100 TB design: the write IS the Spark job — ``maxRecordsPerFile``
bounds shard size without an extra repartition shuffle (each task
rolls files as it passes the bound), gzip per shard keeps shards
independently decompressible, and the manifest derives from a
line-count pass with the TEXT reader (decompress only — no JSON parse,
no schema application). The manifest itself is written through the
Hadoop FileSystem API, so it lands next to the shards on whatever
filesystem the shards went to (local, HDFS, s3a, ...), not on the
driver's local disk.
"""

from __future__ import annotations

import json
import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def _write_text_file(spark: SparkSession, path: str, data: str) -> None:
    """Small sidecar file via the Hadoop FileSystem of ``path`` — the
    same filesystem resolution the DataFrame writers use, so a
    non-local export URI gets its sidecar in the right place."""
    jvm = spark._jvm
    conf = spark._jsc.hadoopConfiguration()
    p = jvm.org.apache.hadoop.fs.Path(path)
    fs = p.getFileSystem(conf)
    out = fs.create(p, True)
    try:
        out.write(bytearray(data.encode("utf-8")))
    finally:
        out.close()


def write_jsonl_shards(
    docs: DataFrame,
    path: str,
    max_records_per_file: int = 100_000,
    compress: bool = True,
    manifest: bool = True,
) -> dict:
    """Write ``docs`` as sharded JSONL under ``path`` and (optionally)
    a ``MANIFEST.json`` next to the shards: shard file names, per-shard
    row counts, total rows, and the column list — what a training
    loader needs to plan epochs without opening every shard. Returns
    the manifest dict."""
    writer = (
        docs.write.mode("overwrite")
        .option("maxRecordsPerFile", max_records_per_file)
    )
    if compress:
        writer = writer.option("compression", "gzip")
    writer.json(path)
    if not manifest:
        return {}
    spark = docs.sparkSession
    # rows per shard = line count: the text reader decompresses but
    # never JSON-parses, so this pass is IO-bound, not CPU-bound
    rows = (
        spark.read.text(os.path.join(path, "part-*"))
        .groupBy(F.input_file_name().alias("file"))
        .agg(F.count("*").alias("n_rows"))
        .collect()
    )  # one row per shard file — bounded by shard count
    shards = sorted(
        (
            {"file": os.path.basename(r.file), "n_rows": int(r.n_rows)}
            for r in rows
        ),
        key=lambda s: s["file"],
    )
    man = {
        "format": "jsonl.gz" if compress else "jsonl",
        "n_rows": int(sum(s["n_rows"] for s in shards)),
        "n_shards": len(shards),
        "max_records_per_file": max_records_per_file,
        "columns": docs.columns,
        "shards": shards,
    }
    _write_text_file(
        spark,
        os.path.join(path, "MANIFEST.json"),
        json.dumps(man, indent=1),
    )
    return man


def read_jsonl_shards(
    spark: SparkSession, path: str, schema=None
) -> DataFrame:
    """Read shards back (schema recommended — inference scans data).
    The manifest is ignored here; it exists for non-Spark loaders."""
    reader = spark.read
    if schema is not None:
        reader = reader.schema(schema)
    return reader.option(
        "pathGlobFilter", "part-*"
    ).json(path)
