"""Training-corpus export: sharded JSONL(.gz) — the delivery format
LLM training stacks actually consume (one JSON object per line,
size-bounded shards, a manifest for the loader).

100 TB design: the write IS the Spark job — ``maxRecordsPerFile``
bounds shard size without an extra repartition shuffle (each task
rolls files as it passes the bound), gzip per shard keeps shards
independently decompressible, and the manifest derives from one
metadata-cheap read-back aggregation (rows per file), not from
driver-side listing of contents.
"""

from __future__ import annotations

import json
import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def write_jsonl_shards(
    docs: DataFrame,
    path: str,
    max_records_per_file: int = 100_000,
    compress: bool = True,
    manifest: bool = True,
) -> dict:
    """Write ``docs`` as sharded JSONL under ``path`` and (optionally)
    a ``MANIFEST.json`` next to the shards: shard file names, per-shard
    row counts, total rows, and the column schema — what a training
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
    rows = (
        spark.read.schema(docs.schema)
        .json(path)
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
    with open(os.path.join(path, "MANIFEST.json"), "w") as fh:
        json.dump(man, fh, indent=1)
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
