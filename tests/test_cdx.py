"""CDX(J) crawl-index source (sources/cdx.py).

Covers: typed parse of well-formed lines, the malformed-line quarantine
lane, latest-capture-per-urlkey selection, fetch-plan filtering
(status/mime, multi-prefix), and a gzip file round trip through
read_cdxj.
"""

from __future__ import annotations

import gzip
import os

from neo4j_to_clickhouse_spark.sources.cdx import (
    cdx_fetch_plan,
    latest_captures,
    parse_cdxj,
    read_cdxj,
)


def _line(
    urlkey="com,example)/a",
    ts="20240101000000",
    url="http://example.com/a",
    mime="text/html",
    status="200",
    digest="AAA",
    length="1000",
    offset="0",
    filename="f0.warc.gz",
):
    return (
        f"{urlkey} {ts} "
        f'{{"url":"{url}","mime":"{mime}","status":"{status}",'
        f'"digest":"{digest}","length":"{length}","offset":"{offset}",'
        f'"filename":"{filename}"}}'
    )


def test_parse_typed_fields(spark):
    df = spark.createDataFrame([(_line(),)], "line string")
    row = parse_cdxj(df).first()
    assert row["valid"]
    assert row["urlkey"] == "com,example)/a"
    assert row["capture_ts"] == "20240101000000"
    assert row["url"] == "http://example.com/a"
    assert row["mime"] == "text/html"
    assert row["status"] == 200
    assert row["digest"] == "AAA"
    assert row["warc_filename"] == "f0.warc.gz"
    assert row["warc_offset"] == 0 and row["warc_length"] == 1000


def test_parse_malformed_quarantines(spark):
    df = spark.createDataFrame(
        [
            (_line(),),
            ("garbage",),
            ("key 2024 {short-ts}",),  # timestamp not 14 digits
            ("key 20240101000000 not-json",),
        ],
        "line string",
    )
    rows = parse_cdxj(df).collect()
    ok = [r for r in rows if r["valid"]]
    bad = [r for r in rows if not r["valid"]]
    assert len(ok) == 1 and len(bad) == 3
    assert all(r["urlkey"] is None and r["status"] is None for r in bad)
    # the raw line survives for the dead-letter lane
    assert all(r["line"] is not None for r in bad)


def test_latest_captures_picks_newest_then_position(spark):
    df = spark.createDataFrame(
        [
            (_line(ts="20240101000000", offset="0"),),
            (_line(ts="20240301000000", offset="700", digest="NEW"),),
            # tie on ts -> lowest (filename, offset) wins
            (_line(urlkey="com,example)/b", ts="20240201000000",
                   filename="f1.warc.gz", offset="50", digest="B1"),),
            (_line(urlkey="com,example)/b", ts="20240201000000",
                   filename="f1.warc.gz", offset="20", digest="B2"),),
            ("garbage",),
        ],
        "line string",
    )
    got = {
        r["urlkey"]: r["digest"]
        for r in latest_captures(parse_cdxj(df)).collect()
    }
    assert got == {"com,example)/a": "NEW", "com,example)/b": "B2"}


def test_fetch_plan_filters_and_aggregates(spark):
    df = spark.createDataFrame(
        [
            (_line(offset="100", length="10"),),
            (_line(urlkey="k2", offset="900", length="20"),),
            (_line(urlkey="k3", status="404"),),  # dropped: status
            (_line(urlkey="k4", mime="image/png"),),  # dropped: mime
            (_line(urlkey="k5", filename="f1.warc.gz", offset="5",
                   length="7"),),
            ("garbage",),  # dropped: invalid
        ],
        "line string",
    )
    plan = {
        r["warc_filename"]: r
        for r in cdx_fetch_plan(parse_cdxj(df)).collect()
    }
    assert plan["f0.warc.gz"]["n_records"] == 2
    assert plan["f0.warc.gz"]["bytes_total"] == 30
    assert plan["f0.warc.gz"]["offset_min"] == 100
    assert plan["f0.warc.gz"]["offset_max"] == 900
    assert plan["f1.warc.gz"]["n_records"] == 1


def test_fetch_plan_multi_mime_and_status(spark):
    df = spark.createDataFrame(
        [
            (_line(mime="text/plain"),),
            (_line(urlkey="k2", mime="application/pdf", status="301",
                   offset="10"),),
        ],
        "line string",
    )
    plan = cdx_fetch_plan(
        parse_cdxj(df),
        statuses=(200, 301),
        mime_prefixes=("text/", "application/pdf"),
    ).collect()
    assert plan[0]["n_records"] == 2


def test_read_cdxj_gzip_roundtrip(spark, tmp_path):
    p = os.path.join(str(tmp_path), "index.cdxj.gz")
    with gzip.open(p, "wt") as fh:
        fh.write(_line() + "\n")
        fh.write(_line(urlkey="k2", offset="77") + "\n")
        fh.write("bad line\n")
    parsed = read_cdxj(spark, p)
    assert parsed.filter("valid").count() == 2
    assert parsed.filter("NOT valid").count() == 1
