"""CDX(J) crawl-index source — plan WARC byte-range fetches from the index.

Common Crawl publishes a per-crawl URL index (the CC-INDEX / CDXJ
artifact): one line per capture, ``<urlkey> <timestamp14> <json>``, where
the JSON block carries the capture's location inside the WARC corpus
(``filename``, ``offset``, ``length`` — numbers serialized as JSON
strings) plus ``url``, ``mime``, ``status``, ``digest``. Real pipelines
read the index FIRST and fetch only the byte ranges they need — at 100 TB
the difference between "scan every WARC" and "range-read 2% of them".

This module completes the engine's corpus-ingestion family
(``sources/warc.py`` parses the WARCs themselves; SURVEY.md §2 S-family
extension): parse the index, select captures, and emit a per-file fetch
plan.

Scale shape: parsing is pure codegen (two regexp_extracts + JSON path
extraction) inside the text scan — zero Python, zero shuffle; the fetch
plan is one groupBy on ``filename`` whose output is proportional to the
number of WARC FILES, not captures. ``latest_captures`` is the standard
per-urlkey window (WindowGroupLimit k-cut, same shape as
``operators/latest_state.py``).

Cross-engine determinism: splitting is anchored regex on the two
space-delimited prefix fields; field extraction is JSON-path — both
exactly reproducible in the DuckDB oracle (``cdx_fetch_plan_stats``).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

#: one capture line: urlkey, 14-digit timestamp, JSON block
_CDXJ_RE = r"^(\S+) (\d{14}) (\{.*\})$"


def parse_cdxj(df: DataFrame, line_col: str = "line") -> DataFrame:
    """Parse CDXJ lines into typed capture rows.

    Output columns: ``urlkey``, ``capture_ts`` (the raw 14-digit string —
    lexicographic order == chronological order, so no timestamp parse is
    needed for windows), ``url``, ``mime``, ``status`` (int), ``digest``,
    ``warc_filename``, ``warc_offset`` (long), ``warc_length`` (long),
    and ``valid`` (false for lines that don't match the CDXJ shape —
    quarantine lane per the M5 dead-letter pattern; their typed fields
    are NULL). Input columns are passed through.
    """
    line = F.col(line_col)
    j = F.regexp_extract(line, _CDXJ_RE, 3)
    valid = j != ""

    def s(path: str) -> Column:
        return F.when(valid, F.get_json_object(j, f"$.{path}"))

    return df.select(
        "*",
        valid.alias("valid"),
        F.when(valid, F.regexp_extract(line, _CDXJ_RE, 1)).alias(
            "urlkey"
        ),
        F.when(valid, F.regexp_extract(line, _CDXJ_RE, 2)).alias(
            "capture_ts"
        ),
        s("url").alias("url"),
        s("mime").alias("mime"),
        s("status").cast("int").alias("status"),
        s("digest").alias("digest"),
        s("filename").alias("warc_filename"),
        s("offset").cast("long").alias("warc_offset"),
        s("length").cast("long").alias("warc_length"),
    )


def read_cdxj(spark, path: str) -> DataFrame:
    """Read CDXJ files (``spark.read.text`` handles ``.gz`` members
    transparently) and parse. File-granular parallelism, codegen parse."""
    return parse_cdxj(spark.read.text(path), line_col="value")


def latest_captures(
    parsed: DataFrame, id_cols: tuple[str, ...] = ("urlkey",)
) -> DataFrame:
    """Newest capture per urlkey (ties broken by WARC position so the
    survivor is deterministic) — the standard "current snapshot of the
    crawl" view. WindowGroupLimit shape: per-key heaps, no full sort."""
    w = Window.partitionBy(*[F.col(c) for c in id_cols]).orderBy(
        F.col("capture_ts").desc(),
        F.col("warc_filename"),
        F.col("warc_offset"),
    )
    return (
        parsed.filter(F.col("valid"))
        .withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__rn")
    )


def cdx_fetch_plan(
    parsed: DataFrame,
    statuses: tuple[int, ...] = (200,),
    mime_prefixes: tuple[str, ...] = ("text/html",),
) -> DataFrame:
    """Per-WARC-file fetch plan for the selected captures: how many
    records to range-read from each file, total bytes, and the offset
    span (a fetcher coalesces nearby ranges within the span).

    Output: ``warc_filename, n_records, bytes_total, offset_min,
    offset_max`` — rows ∝ WARC files, so the plan itself broadcasts.
    """
    keep = (
        F.col("valid")
        & F.col("status").isin(*statuses)
        & F.col("warc_filename").isNotNull()
    )
    if mime_prefixes:
        m = F.col("mime").startswith(mime_prefixes[0])
        for p in mime_prefixes[1:]:
            m = m | F.col("mime").startswith(p)
        keep = keep & m
    return (
        parsed.filter(keep)
        .groupBy("warc_filename")
        .agg(
            F.count("*").alias("n_records"),
            F.sum("warc_length").alias("bytes_total"),
            F.min("warc_offset").alias("offset_min"),
            F.max("warc_offset").alias("offset_max"),
        )
    )
