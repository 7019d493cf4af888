"""URL canonicalization (functions/url.py): rule-by-rule cases through
the real Catalyst expressions (collected via a tiny DataFrame)."""

import pytest
from pyspark.sql import functions as F

from neo4j_to_clickhouse_spark.functions.url import (
    canonicalize_url,
    url_host,
    url_path,
)

CASES = [
    # fragment drops
    ("http://a.com/x#frag", "http://a.com/x"),
    # tracking params drop; real params survive
    ("http://a.com/x?utm_source=tw&id=3", "http://a.com/x?id=3"),
    ("http://a.com/x?id=3&utm_campaign=c", "http://a.com/x?id=3"),
    ("http://a.com/x?gclid=g", "http://a.com/x"),
    ("http://a.com/x?fbclid=f&ref=r", "http://a.com/x"),
    # scheme+host lowercase; path case preserved
    ("HTTP://WWW.A.COM/Path", "http://www.a.com/Path"),
    # default ports drop; explicit ports survive
    ("http://a.com:80/x", "http://a.com/x"),
    ("https://a.com:443/x", "https://a.com/x"),
    ("http://a.com:8080/x", "http://a.com:8080/x"),
    ("https://a.com:80/x", "https://a.com:80/x"),  # 80 is not https default
    # trailing slash drops on non-root
    ("http://a.com/x/", "http://a.com/x"),
    ("http://a.com/", "http://a.com/"),
    # combinations
    (
        "HTTPS://B.org:443/Y/?utm_medium=m#top",
        "https://b.org/Y",
    ),
    # no-op on already-canonical
    ("https://a.com/x?id=3", "https://a.com/x?id=3"),
    # percent-encoding (RFC 3986 §6.2.2): hex case normalizes,
    # unreserved octets decode, reserved stay, malformed untouched
    ("http://a.com/a%2fb", "http://a.com/a%2Fb"),
    ("http://a.com/a%2Fb", "http://a.com/a%2Fb"),
    ("http://a.com/%7Euser", "http://a.com/~user"),
    ("http://a.com/%7euser", "http://a.com/~user"),
    ("http://a.com/pa%67e9", "http://a.com/page9"),
    ("http://a.com/x%G1y", "http://a.com/x%G1y"),
    ("http://a.com/100%", "http://a.com/100%"),
    ("http://a.com/%41%42?q=%5a", "http://a.com/AB?q=Z"),
]


@pytest.fixture(scope="module")
def canon(spark):
    def run(urls):
        df = spark.createDataFrame([(u,) for u in urls], "url string")
        return [
            r.c
            for r in df.select(
                canonicalize_url("url").alias("c")
            ).collect()
        ]

    return run


def test_canonicalization_rules(canon):
    got = canon([u for u, _ in CASES])
    for (src, want), g in zip(CASES, got):
        assert g == want, f"{src!r}: {g!r} != {want!r}"


def test_idempotent(canon):
    once = canon([u for u, _ in CASES])
    twice = canon(once)
    assert twice == once


def test_host_and_path(spark):
    df = spark.createDataFrame(
        [("HTTP://X.COM:8080/a/b?q=1",), ("https://y.org",)],
        "url string",
    )
    rows = df.select(
        url_host("url").alias("h"), url_path("url").alias("p")
    ).collect()
    assert (rows[0].h, rows[0].p) == ("x.com", "/a/b")
    assert rows[1].h == "y.org"


def test_normalize_pct_str_mirrors_spark(spark):
    # the Python mirror (used on broadcast-side robots rule prefixes)
    # must agree byte-for-byte with the Spark expression
    from neo4j_to_clickhouse_spark.functions.url import (
        _normalize_pct,
        normalize_pct_str,
    )

    samples = [
        "/a%2fb", "/a%2Fb", "/%7Euser", "/%7euser", "/pa%67e9",
        "/x%G1y", "/100%", "/%41%42?q=%5a", "/plain", "%", "%2",
        "/%2f%2F%2e%2E./", "/a%00b",
    ]
    df = spark.createDataFrame([(s,) for s in samples], "s string")
    got = [r.c for r in df.select(_normalize_pct(F.col("s")).alias("c")).collect()]
    assert got == [normalize_pct_str(s) for s in samples]


def test_codegen_only(spark):
    df = spark.createDataFrame([("http://a.com/x",)], "url string")
    plan = (
        df.select(canonicalize_url("url"))
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    for marker in ("BatchEvalPython", "ArrowEvalPython", "MapInPandas"):
        assert marker not in plan


def test_sitemap_urls_extraction(spark):
    from neo4j_to_clickhouse_spark.functions.url import sitemap_urls

    xml = (
        '<?xml version="1.0"?><urlset>'
        "<url><loc>http://a.com/1</loc>"
        "<lastmod>2026-01-01</lastmod></url>"
        "<url><loc>  http://a.com/2  </loc></url>"
        "<sitemap><loc>http://a.com/more.xml</loc></sitemap>"
        "</urlset>"
    )
    df = spark.createDataFrame([(xml,), ("<urlset></urlset>",), (None,)], "x string")
    got = [r.u for r in df.select(sitemap_urls("x").alias("u")).collect()]
    assert got[0] == [
        "http://a.com/1", "http://a.com/2", "http://a.com/more.xml",
    ]
    assert got[1] == []
    assert got[2] is None


def test_anchor_hrefs_and_resolution(spark):
    from neo4j_to_clickhouse_spark.functions.url import extract_links

    html = (
        'pre <a href="http://ext.test/abs">a</a>'
        "<A HREF='/rooted'>b</A>"
        '<a class="x" href="sub/rel.html">c</a>'
        '<a href="//cdn.test/pr">d</a>'
        '<a href="mailto:x@y">e</a>'
        '<a href="javascript:void(0)">f</a>'
        '<a href="#frag">g</a>'
        '<a href="">h</a> post'
    )
    df = spark.createDataFrame(
        [(html, "https://www.site.test/dir/page.html")],
        "html string, base string",
    )
    got = df.select(
        extract_links("html", "base").alias("links")
    ).first()["links"]
    # double-quoted hrefs extract first, then single-quoted (two
    # regexp passes, one per quote style)
    assert got == [
        "http://ext.test/abs",
        "https://www.site.test/dir/sub/rel.html",
        "https://cdn.test/pr",
        "https://www.site.test/rooted",
    ]


def test_anchor_attribute_boundary_and_quote_nesting(spark):
    from neo4j_to_clickhouse_spark.functions.url import extract_links

    html = (
        # data-href is NOT an href (attribute merely ends in 'href')
        '<a data-href="http://wrong.test/x">a</a>'
        # href first attribute after the tag name
        '<a href="http://ok.test/1">b</a>'
        # double-quoted value containing a single quote survives whole
        "<a href=\"http://ok.test/it's\">c</a>"
        # single-quoted value containing a double quote survives whole
        "<a href='http://ok.test/q%22x'>d</a>"
        # data-href on an <a> that ALSO has a real href: real one wins
        '<a data-href="http://wrong.test/y" href="http://ok.test/2">e</a>'
    )
    df = spark.createDataFrame(
        [(html, "http://base.test/")], "html string, base string"
    )
    got = df.select(extract_links("html", "base").alias("l")).first()["l"]
    assert got == [
        "http://ok.test/1",
        "http://ok.test/it's",
        "http://ok.test/2",
        'http://ok.test/q%22x',
    ]


def test_query_only_reference_keeps_base_path(spark):
    from neo4j_to_clickhouse_spark.functions.url import extract_links

    # RFC 3986 §5.3 empty-path reference: base FULL path + new query
    # (the base's own query is replaced, fragment dropped)
    df = spark.createDataFrame(
        [
            (
                '<a href="?page=2">n</a>',
                "http://h.test/dir/list.html?page=1#top",
            )
        ],
        "html string, base string",
    )
    got = df.select(extract_links("html", "base").alias("l")).first()["l"]
    assert got == ["http://h.test/dir/list.html?page=2"]


def test_resolve_relative_against_slashless_base(spark):
    from neo4j_to_clickhouse_spark.functions.url import extract_links

    # base path has no directory: relative joins origin + '/'
    df = spark.createDataFrame(
        [('<a href="page2">x</a>', "http://h.test")],
        "html string, base string",
    )
    got = df.select(
        extract_links("html", "base").alias("links")
    ).first()["links"]
    assert got == ["http://h.test/page2"]


def test_extract_links_no_anchors(spark):
    from neo4j_to_clickhouse_spark.functions.url import extract_links

    df = spark.createDataFrame(
        [("plain text, no markup", "http://h.test/")],
        "html string, base string",
    )
    assert df.select(
        extract_links("html", "base").alias("l")
    ).first()["l"] == []


def test_non_http_schemes_with_slashes_drop(spark):
    from neo4j_to_clickhouse_spark.functions.url import extract_links

    html = (
        '<a href="ftp://mirror.test/f.iso">a</a>'
        '<a href="ws://live.test/sock">b</a>'
        '<a href="android-app://com.foo/x">c</a>'
        '<a href="HTTPS://UPPER.test/ok">d</a>'
    )
    df = spark.createDataFrame(
        [(html, "http://base.test/")], "html string, base string"
    )
    got = df.select(extract_links("html", "base").alias("l")).first()["l"]
    assert got == ["HTTPS://UPPER.test/ok"]
