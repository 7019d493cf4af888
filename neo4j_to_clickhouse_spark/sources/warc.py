"""WARC (Web ARChive, ISO 28500) record source — Common Crawl ingestion.

Training-data pipelines start from WARC: crawls ship as `.warc.gz`
files whose records are independently-gzipped members (the format's
design for parallel splitting). The reference ingests only CDC
envelopes and CSV snapshots (`SURVEY.md §2` S1–S9); web-scale corpus
ingestion is the missing source a 100 TB text pipeline needs first.

Layout parsed here (public spec, ISO 28500 / WARC 1.0-1.1):

    WARC/1.0\\r\\n
    <warc-headers: Name: value, \\r\\n-terminated>\\r\\n
    \\r\\n
    <Content-Length bytes of block>
    \\r\\n\\r\\n                       (record boundary)

For ``response`` records the block is an HTTP/1.x message; the HTTP
status line, headers and body are split so callers get clean payload
bytes plus typed metadata.

100 TB design: files arrive via Spark's ``binaryFile`` source (one row
per file, splittable at the distribution layer by file granularity —
crawls ship millions of ~1 GB files, so file-level parallelism
saturates any cluster); records parse executor-side in Arrow batches
(`warc_records`), and everything downstream is ordinary columnar data.
Per-record gzip members decompress with stdlib zlib — no external
binaries.
"""

from __future__ import annotations

import zlib
from collections.abc import Iterator

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

WARC_RECORD_SCHEMA = T.StructType(
    [
        T.StructField("file", T.StringType()),
        T.StructField("record_id", T.StringType()),
        T.StructField("warc_type", T.StringType()),
        T.StructField("target_uri", T.StringType()),
        T.StructField("warc_date", T.StringType()),
        T.StructField("http_status", T.IntegerType()),
        T.StructField("content_type", T.StringType()),
        T.StructField("body", T.BinaryType()),
        T.StructField("n_bytes", T.LongType()),
    ]
)


def _gunzip_members(payload: bytes) -> bytes:
    """Concatenate every gzip member in `payload` (the .warc.gz layout:
    one member per record). Plain (non-gzip) payloads pass through."""
    if payload[:2] != b"\x1f\x8b":
        return payload
    out = bytearray()
    pos = 0
    while pos < len(payload) and payload[pos : pos + 2] == b"\x1f\x8b":
        d = zlib.decompressobj(wbits=31)
        out += d.decompress(payload[pos:])
        consumed = len(payload) - pos - len(d.unused_data)
        if consumed <= 0:
            break
        pos += consumed
    return bytes(out)


def _parse_headers(block: bytes) -> tuple[dict, int]:
    """Parse \\r\\n-terminated headers; returns ({lower-name: value},
    offset past the blank line)."""
    headers: dict[str, str] = {}
    pos = 0
    while True:
        eol = block.find(b"\r\n", pos)
        if eol < 0:
            return headers, len(block)
        line = block[pos:eol]
        pos = eol + 2
        if not line:
            return headers, pos
        name, _, value = line.partition(b":")
        if _:
            headers[name.strip().lower().decode("latin-1")] = (
                value.strip().decode("latin-1", "replace")
            )


def parse_warc(payload: bytes) -> list[dict]:
    """Split a (possibly per-record-gzipped) WARC payload into records:
    ``{record_id, warc_type, target_uri, warc_date, http_status,
    content_type, body, n_bytes}``. For ``response`` records the HTTP
    message is split; other types return the raw block as body with
    the WARC Content-Type. Truncated trailing records are dropped, not
    raised — crawl files end mid-record routinely."""
    data = _gunzip_members(payload)
    out: list[dict] = []
    pos = 0
    while True:
        at = data.find(b"WARC/", pos)
        if at < 0:
            break
        hdrs, body_at = _parse_headers(data[at:])
        try:
            length = int(hdrs.get("content-length", ""))
        except ValueError:
            break
        block = data[at + body_at : at + body_at + length]
        if len(block) < length:
            break  # truncated final record
        pos = at + body_at + length
        rec = {
            "record_id": hdrs.get("warc-record-id"),
            "warc_type": hdrs.get("warc-type"),
            "target_uri": hdrs.get("warc-target-uri"),
            "warc_date": hdrs.get("warc-date"),
            "http_status": None,
            "content_type": hdrs.get("content-type"),
            "body": block,
        }
        if rec["warc_type"] == "response" and block[:5] == b"HTTP/":
            http_hdrs, http_body_at = _parse_headers(block)
            status_line = block[: block.find(b"\r\n")]
            parts = status_line.split(b" ", 2)
            try:
                rec["http_status"] = int(parts[1])
            except (IndexError, ValueError):
                rec["http_status"] = None
            rec["content_type"] = http_hdrs.get(
                "content-type", rec["content_type"]
            )
            rec["body"] = block[http_body_at:]
        rec["n_bytes"] = len(rec["body"])
        out.append(rec)
    return out


def warc_records(files: DataFrame) -> DataFrame:
    """Explode a ``binaryFile``-shaped DataFrame (``path``, ``content``)
    into one row per WARC record (:data:`WARC_RECORD_SCHEMA`). Arrow-
    batched; the gzip-member decompress and record split run executor-
    side, one file per input row."""

    def run(batches: Iterator) -> Iterator:
        import pandas as pd  # noqa: PLC0415 — executor-side

        for pdf in batches:
            rows = []
            for path, content in zip(pdf["path"], pdf["content"]):
                for r in parse_warc(bytes(content)):
                    rows.append(
                        (
                            path,
                            r["record_id"],
                            r["warc_type"],
                            r["target_uri"],
                            r["warc_date"],
                            r["http_status"],
                            r["content_type"],
                            r["body"],
                            r["n_bytes"],
                        )
                    )
            yield pd.DataFrame(
                rows, columns=[f.name for f in WARC_RECORD_SCHEMA]
            )

    return files.select("path", "content").mapInPandas(
        run, WARC_RECORD_SCHEMA
    )


def read_warc(spark: SparkSession, path_glob: str) -> DataFrame:
    """Read `.warc` / `.warc.gz` files under ``path_glob`` into records
    via Spark's binaryFile source (file-granular parallelism)."""
    files = (
        spark.read.format("binaryFile")
        .option("pathGlobFilter", "*.warc*")
        .load(path_glob)
    )
    return warc_records(files)


# ---------------------------------------------------------------------------
# Fixture encoder (closed-form oracle side)
# ---------------------------------------------------------------------------


def encode_warc(
    records: list[dict],
    gzip_per_record: bool = False,
) -> bytes:
    """Build a spec-exact WARC payload. Each record dict:
    ``{uri, date, body: bytes, status: int, content_type: str}`` —
    emitted as a ``response`` record wrapping an HTTP/1.1 message.
    With ``gzip_per_record``, each record becomes its own gzip member
    (the .warc.gz layout)."""
    out = bytearray()
    for i, r in enumerate(records):
        http = (
            f"HTTP/1.1 {r.get('status', 200)} OK\r\n"
            f"Content-Type: {r.get('content_type', 'text/plain')}\r\n"
            f"Content-Length: {len(r['body'])}\r\n\r\n"
        ).encode() + r["body"]
        hdr = (
            "WARC/1.0\r\n"
            "WARC-Type: response\r\n"
            f"WARC-Record-ID: <urn:uuid:{i:032x}>\r\n"
            f"WARC-Target-URI: {r.get('uri', 'http://example.com/')}\r\n"
            f"WARC-Date: {r.get('date', '2026-01-01T00:00:00Z')}\r\n"
            "Content-Type: application/http; msgtype=response\r\n"
            f"Content-Length: {len(http)}\r\n\r\n"
        ).encode()
        rec = hdr + http + b"\r\n\r\n"
        if gzip_per_record:
            c = zlib.compressobj(wbits=31)
            rec = c.compress(rec) + c.flush()
        out += rec
    return bytes(out)
