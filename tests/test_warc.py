"""WARC source (sources/warc.py): spec framing, per-record gzip
members, HTTP response splitting, truncation tolerance, and the Spark
binaryFile -> records path."""

import zlib

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from neo4j_to_clickhouse_spark.sources.warc import (
    WARC_RECORD_SCHEMA,
    encode_warc,
    iter_warc,
    parse_warc,
    read_warc,
    warc_records,
)


def _recs(n=3, status=200):
    return [
        {
            "uri": f"http://example.com/{i}",
            "body": f"doc body {i}".encode() * (i + 1),
            "status": status,
            "content_type": "text/plain",
        }
        for i in range(n)
    ]


def test_roundtrip_plain():
    out = parse_warc(encode_warc(_recs(3)))
    assert len(out) == 3
    for i, r in enumerate(out):
        assert r["warc_type"] == "response"
        assert r["target_uri"] == f"http://example.com/{i}"
        assert r["http_status"] == 200
        assert r["content_type"] == "text/plain"
        assert r["body"] == f"doc body {i}".encode() * (i + 1)
        assert r["n_bytes"] == len(r["body"])


def test_roundtrip_gzip_members():
    plain = parse_warc(encode_warc(_recs(4)))
    gz = parse_warc(encode_warc(_recs(4), gzip_per_record=True))
    assert gz == plain


def test_http_status_variants():
    recs = [{"uri": "u", "body": b"x", "status": s} for s in (200, 301, 404, 500)]
    assert [r["http_status"] for r in parse_warc(encode_warc(recs))] == [
        200, 301, 404, 500,
    ]


def test_truncated_final_record_dropped():
    payload = encode_warc(_recs(3))
    out = parse_warc(payload[:-20])  # cuts into record 3's body
    assert len(out) == 2


def test_non_response_record_passthrough():
    body = b"software: test-crawler\r\n"
    raw = (
        b"WARC/1.0\r\n"
        b"WARC-Type: warcinfo\r\n"
        b"WARC-Record-ID: <urn:uuid:0>\r\n"
        b"Content-Type: application/warc-fields\r\n"
        + f"Content-Length: {len(body)}\r\n\r\n".encode()
        + body
        + b"\r\n\r\n"
    )
    out = parse_warc(raw)
    assert len(out) == 1
    assert out[0]["warc_type"] == "warcinfo"
    assert out[0]["http_status"] is None
    assert out[0]["body"] == body
    assert out[0]["content_type"] == "application/warc-fields"


def test_garbage_and_empty():
    assert parse_warc(b"") == []
    assert parse_warc(b"\x00" * 100) == []
    assert parse_warc(b"WARC/1.0\r\nContent-Length: oops\r\n\r\n") == []


def test_binary_body_with_embedded_warc_marker():
    # Content-Length framing must win over a "WARC/" string in a body
    body = b"fake WARC/1.0\r\nContent-Length: 99999\r\n\r\n" + b"\x01" * 10
    out = parse_warc(encode_warc([{"uri": "u", "body": body}]))
    assert len(out) == 1
    assert out[0]["body"] == body


def test_truncation_sweep_never_raises():
    p = encode_warc(_recs(2), gzip_per_record=True)
    for cut in range(len(p)):
        parse_warc(p[:cut])


@settings(max_examples=30, deadline=None)
@given(
    bodies=st.lists(st.binary(min_size=0, max_size=300), min_size=1, max_size=6),
    gz=st.booleans(),
)
def test_roundtrip_property(bodies, gz):
    recs = [{"uri": f"u{i}", "body": b} for i, b in enumerate(bodies)]
    out = parse_warc(encode_warc(recs, gzip_per_record=gz))
    assert [r["body"] for r in out] == bodies


@pytest.mark.parametrize("chunk", [7, 64, 1024])
def test_chunked_inflate_equivalence(chunk):
    # The incremental parse must be bit-identical no matter where the
    # inflate steps land (headers, bodies, and the "WARC/" magic all
    # get split across chunk boundaries at chunk=7).
    payload = encode_warc(_recs(6), gzip_per_record=True)
    assert list(iter_warc(payload, chunk_size=chunk)) == parse_warc(payload)
    mixed = encode_warc(_recs(4))  # plain passes through whole
    assert list(iter_warc(mixed, chunk_size=chunk)) == parse_warc(mixed)


def test_chunked_truncation_sweep_never_raises():
    p = encode_warc(_recs(2), gzip_per_record=True)
    for cut in range(0, len(p), 3):
        list(iter_warc(p[:cut], chunk_size=11))


def test_streaming_peak_memory_is_record_bounded():
    # VERDICT r11 item 3: peak memory must be O(largest record + one
    # inflate step), not O(file). 300 records x ~8 KB decompress to
    # ~2.4 MB; consuming the iterator lazily with a 64 KiB feed must
    # peak far below the decompressed total.
    import tracemalloc

    recs = [
        {"uri": f"u{i}", "body": bytes((i + j) % 251 for j in range(8192))}
        for i in range(300)
    ]
    payload = encode_warc(recs, gzip_per_record=True)
    total = sum(len(r["body"]) for r in recs)
    assert total > 2_000_000
    tracemalloc.start()
    n = 0
    for r in iter_warc(payload, chunk_size=65536):
        n += 1  # consume without retaining
    _, peak = tracemalloc.get_traced_memory()
    tracemalloc.stop()
    assert n == 300
    assert peak < total / 3, f"peak {peak} vs decompressed total {total}"


def test_spark_read_warc(spark, tmp_path):
    (tmp_path / "a.warc").write_bytes(encode_warc(_recs(3)))
    (tmp_path / "b.warc.gz").write_bytes(
        encode_warc(_recs(2, status=404), gzip_per_record=True)
    )
    (tmp_path / "ignored.txt").write_bytes(b"not a warc")
    df = read_warc(spark, str(tmp_path))
    assert df.schema == WARC_RECORD_SCHEMA
    rows = df.collect()
    assert len(rows) == 5
    assert sum(1 for r in rows if r.http_status == 404) == 2
    # body bytes survive the Arrow round trip
    assert {bytes(r.body) for r in rows} >= {b"doc body 0"}


def test_wet_roundtrip_and_quarantine(spark, tmp_path):
    from neo4j_to_clickhouse_spark.sources.warc import (
        encode_wet,
        read_wet,
    )

    recs = [
        {"uri": "http://a.com/1", "body": "extracted text one".encode()},
        {"uri": "http://a.com/2", "body": "zwei ümläute".encode()},
        {"uri": "http://a.com/3", "body": b"broken \xff"},
    ]
    (tmp_path / "crawl.warc.wet.gz").write_bytes(
        encode_wet(recs, gzip_per_record=True)
    )
    docs, quar = read_wet(spark, str(tmp_path))
    d = {r.target_uri: (r.text, r.n_chars) for r in docs.collect()}
    # warcinfo dropped; both clean conversions decoded exactly
    assert d == {
        "http://a.com/1": ("extracted text one", 18),
        "http://a.com/2": ("zwei ümläute", 12),
    }
    q = quar.collect()
    assert len(q) == 1
    assert q[0].target_uri == "http://a.com/3"
    assert q[0].reason == "undecodable:utf-8"
    assert bytes(q[0].body) == b"broken \xff"


def test_wet_plain_and_no_warcinfo():
    from neo4j_to_clickhouse_spark.sources.warc import (
        encode_wet,
        parse_warc,
    )

    payload = encode_wet(
        [{"uri": "u", "body": b"t"}], with_warcinfo=False
    )
    out = parse_warc(payload)
    assert [r["warc_type"] for r in out] == ["conversion"]
    assert out[0]["body"] == b"t"
    assert out[0]["content_type"] == "text/plain"


def test_warc_records_empty_partitioning(spark):
    # empty input partitions yield clean empty frames, not schema errors
    files = spark.createDataFrame(
        [], "path string, content binary"
    ).repartition(4)
    assert warc_records(files).count() == 0
