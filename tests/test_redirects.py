"""Redirect-chain resolution (operators/redirects.py): pointer
doubling, cycle/self-loop detection, Location-header edge extraction."""

from pyspark.sql import functions as F

from neo4j_to_clickhouse_spark.operators.redirects import (
    redirect_edges,
    resolve_redirects,
)


def _resolve(spark, pairs, **kw):
    df = spark.createDataFrame(pairs, "src string, dst string")
    return {
        r.src: (r.final, r.hops, r.resolved)
        for r in resolve_redirects(df, **kw).collect()
    }


def test_chains_resolve_with_hop_counts(spark):
    got = _resolve(
        spark,
        [("a", "b"), ("b", "c"), ("c", "d"), ("e", "f")],
    )
    assert got == {
        "a": ("d", 3, True),
        "b": ("d", 2, True),
        "c": ("d", 1, True),
        "e": ("f", 1, True),
    }


def test_cycles_and_self_loops_unresolved(spark):
    got = _resolve(
        spark,
        [("x", "y"), ("y", "x"), ("s", "s"), ("a", "b")],
    )
    assert got["x"] == (None, None, False)
    assert got["y"] == (None, None, False)
    assert got["s"] == (None, None, False)
    assert got["a"] == ("b", 1, True)


def test_long_chain_within_cap_resolves(spark):
    # 10 hops < the 16-hop cap: must resolve despite only 4 rounds
    n = 10
    pairs = [(f"n{i}", f"n{i+1}") for i in range(n)]
    got = _resolve(spark, pairs)
    assert got["n0"] == (f"n{n}", n, True)


def test_over_cap_chain_flagged(spark):
    n = 20  # > 16-hop cap with default 4 doubling rounds
    pairs = [(f"n{i}", f"n{i+1}") for i in range(n)]
    got = _resolve(spark, pairs)
    assert got["n0"][2] is False  # honestly unresolved, not wrong
    assert got[f"n{n-1}"] == (f"n{n}", 1, True)


def test_non_power_of_two_cap_is_exact(spark):
    # doubling rounds reach 2^ceil(log2(cap)) hops; the explicit hop
    # check must still enforce the DOCUMENTED cap for e.g. cap=10
    pairs = [(f"m{i}", f"m{i+1}") for i in range(12)]
    got = _resolve(spark, pairs, max_hops=10)
    assert got["m0"] == (None, None, False)   # 12 hops > cap 10
    assert got["m2"] == ("m12", 10, True)     # exactly at the cap
    assert got["m3"] == ("m12", 9, True)


def test_redirect_edges_from_warc_records(spark, tmp_path):
    from neo4j_to_clickhouse_spark.sources.warc import (
        encode_warc,
        read_warc,
    )

    recs = [
        {
            "uri": "http://a.com/old",
            "body": b"",
            "status": 301,
            "location": "http://a.com/new",
        },
        {"uri": "http://a.com/new", "body": b"<p>x</p>", "status": 200},
        {"uri": "http://a.com/nolocation", "body": b"", "status": 302},
    ]
    (tmp_path / "r.warc.gz").write_bytes(
        encode_warc(recs, gzip_per_record=True)
    )
    edges = redirect_edges(read_warc(spark, str(tmp_path))).collect()
    assert [(e.src, e.dst) for e in edges] == [
        ("http://a.com/old", "http://a.com/new")
    ]


def test_duplicate_edges_dedup_at_entry(spark):
    # refetched identical edges must not multiply output rows
    got = resolve_redirects(
        spark.createDataFrame(
            [("a", "b"), ("a", "b"), ("b", "c"), ("b", "c")],
            "src string, dst string",
        )
    ).collect()
    assert sorted((r.src, r.final, r.hops) for r in got) == [
        ("a", "c", 2), ("b", "c", 1),
    ]
