"""robots.txt parsing + declarative crawl filter (sources/robots.py)."""

from neo4j_to_clickhouse_spark.sources.robots import (
    apply_robots,
    parse_robots,
    robots_rules_df,
)

BODY = """# comment line
User-agent: *
Disallow: /private
Allow: /private/ok
Disallow:

User-agent: badbot
User-agent: otherbot
Disallow: /

User-agent: wildbot
Disallow: /tmp/*
"""


def test_parse_groups_and_comments():
    rules = parse_robots("a.com", BODY)
    star = [r for r in rules if r[1] == "*"]
    assert ("a.com", "*", False, "/private", False) in star
    assert ("a.com", "*", True, "/private/ok", False) in star
    assert len(star) == 2  # the empty Disallow emits nothing
    # consecutive user-agent lines share the group's rules
    assert ("a.com", "badbot", False, "/", False) in rules
    assert ("a.com", "otherbot", False, "/", False) in rules
    # wildcard rules surface flagged (and are matched downstream)
    wild = [r for r in rules if r[1] == "wildbot"]
    assert wild == [("a.com", "wildbot", False, "/tmp/*", True)]


def test_parse_empty_and_garbage():
    assert parse_robots("a.com", "") == []
    assert parse_robots("a.com", None) == []
    assert parse_robots("a.com", "no colons here\n###\n") == []


def test_apply_longest_match_and_defaults(spark):
    rules = robots_rules_df(
        spark, [("a.com", BODY), ("b.com", "User-agent: *\nDisallow: /x\n")]
    )
    urls = spark.createDataFrame(
        [
            ("a.com", "/public/page"),      # no rule -> allowed
            ("a.com", "/private/page"),     # Disallow /private
            ("a.com", "/private/ok/page"),  # Allow /private/ok (longer)
            ("b.com", "/x/anything"),       # Disallow /x
            ("b.com", "/y"),                # allowed
            ("c.com", "/whatever"),         # host without robots -> allowed
        ],
        "host string, path string",
    )
    got = {
        (r.host, r.path): r.crawl_allowed
        for r in apply_robots(urls, rules).collect()
    }
    assert got == {
        ("a.com", "/public/page"): True,
        ("a.com", "/private/page"): False,
        ("a.com", "/private/ok/page"): True,
        ("b.com", "/x/anything"): False,
        ("b.com", "/y"): True,
        ("c.com", "/whatever"): True,
    }


def test_allow_beats_disallow_on_equal_length(spark):
    body = "User-agent: *\nDisallow: /p\nAllow: /q\n"
    rules = robots_rules_df(spark, [("a.com", body)])
    urls = spark.createDataFrame(
        [("a.com", "/p1"), ("a.com", "/q1")], "host string, path string"
    )
    got = {
        r.path: r.crawl_allowed
        for r in apply_robots(urls, rules).collect()
    }
    assert got == {"/p1": False, "/q1": True}


def test_agent_specific_rules(spark):
    rules = robots_rules_df(spark, [("a.com", BODY)])
    urls = spark.createDataFrame(
        [("a.com", "/anything")], "host string, path string"
    )
    star = apply_robots(urls, rules, agent="*").collect()[0]
    bad = apply_robots(urls, rules, agent="badbot").collect()[0]
    assert star.crawl_allowed is True
    assert bad.crawl_allowed is False


def test_wildcard_rules_match(spark):
    # RFC 9309 §2.2.3: '*' matches any char sequence, trailing '$'
    # anchors the end. Mid-star, tail-star, and $-anchor cases.
    body = (
        "User-agent: *\n"
        "Disallow: /a*7$\n"    # ends with 7 under /a -> blocked
        "Allow: /a/x*7$\n"     # ...unless under /a/x (more octets)
        "Disallow: /img*\n"    # tail star == prefix /img
        "Disallow: /exact$\n"  # only the exact path /exact
    )
    rules = robots_rules_df(spark, [("a.com", body)])
    urls = spark.createDataFrame(
        [
            ("a.com", "/a/page7"),    # mid-star + $: blocked
            ("a.com", "/a/page70"),   # doesn't END in 7: allowed
            ("a.com", "/a/x/page7"),  # allow override (weight 5 > 3)
            ("a.com", "/img/logo"),   # tail star: blocked
            ("a.com", "/exact"),      # $ exact: blocked
            ("a.com", "/exact/sub"),  # not exact: allowed
        ],
        "host string, path string",
    )
    got = {
        r.path: r.crawl_allowed
        for r in apply_robots(urls, rules).collect()
    }
    assert got == {
        "/a/page7": False,
        "/a/page70": True,
        "/a/x/page7": True,
        "/img/logo": False,
        "/exact": False,
        "/exact/sub": True,
    }


def test_wildcard_regex_metachars_literal(spark):
    # Regex metacharacters in the rule are literal octets per the RFC.
    body = "User-agent: *\nDisallow: /q?a=(1)*$\n"
    rules = robots_rules_df(spark, [("a.com", body)])
    urls = spark.createDataFrame(
        [("a.com", "/q?a=(1)&b=2"), ("a.com", "/qXa=1")],
        "host string, path string",
    )
    got = {
        r.path: r.crawl_allowed
        for r in apply_robots(urls, rules).collect()
    }
    assert got == {"/q?a=(1)&b=2": False, "/qXa=1": True}


def test_precedence_tie_wildcard_vs_prefix(spark):
    # '/page$' (anchored, weight 5) ties '/page' (prefix, weight 5)
    # on the exact path '/page': Allow wins the tie. On '/page2' only
    # the prefix rule matches.
    body = "User-agent: *\nDisallow: /page\nAllow: /page$\n"
    rules = robots_rules_df(spark, [("a.com", body)])
    urls = spark.createDataFrame(
        [("a.com", "/page"), ("a.com", "/page2")],
        "host string, path string",
    )
    got = {
        r.path: r.crawl_allowed
        for r in apply_robots(urls, rules).collect()
    }
    assert got == {"/page": True, "/page2": False}


def test_pct_encoded_rule_matches_canonicalized_path(spark):
    # RFC 9309 §2.2.2: rule and URL paths compare octet-wise after
    # percent-normalization; rule prefixes normalize with the same
    # RFC 3986 rules canonicalize_url applies to the URL side.
    body = (
        "User-agent: *\n"
        "Disallow: /%7Euser\n"      # == /~user after normalization
        "Disallow: /q%2fraw\n"      # reserved: stays %2F (case-normed)
    )
    rules = robots_rules_df(spark, [("a.com", body)])
    urls = spark.createDataFrame(
        [
            ("a.com", "/~user/page"),   # canonical form of /%7Euser/...
            ("a.com", "/q%2Fraw/x"),    # canonical form of /q%2fraw/...
            ("a.com", "/other"),
        ],
        "host string, path string",
    )
    got = {
        r.path: r.crawl_allowed
        for r in apply_robots(urls, rules).collect()
    }
    assert got == {
        "/~user/page": False,
        "/q%2Fraw/x": False,
        "/other": True,
    }


def test_star_group_fallback_for_named_agent(spark):
    # RFC 9309 §2.2.1: a host publishing only 'User-agent: *' rules
    # still binds a named crawler; a host with an agent-specific
    # group uses ONLY that group (star rules ignored there).
    star_only = "User-agent: *\nDisallow: /blocked\n"
    both = (
        "User-agent: *\nDisallow: /star\n"
        "User-agent: mybot\nDisallow: /mine\n"
    )
    rules = robots_rules_df(
        spark, [("s.com", star_only), ("b.com", both)]
    )
    urls = spark.createDataFrame(
        [
            ("s.com", "/blocked/x"),  # star fallback applies
            ("s.com", "/open"),
            ("b.com", "/star/x"),     # star group ignored: specific exists
            ("b.com", "/mine/x"),     # specific group applies
        ],
        "host string, path string",
    )
    got = {
        (r.host, r.path): r.crawl_allowed
        for r in apply_robots(urls, rules, agent="MyBot").collect()
    }
    assert got == {
        ("s.com", "/blocked/x"): False,
        ("s.com", "/open"): True,
        ("b.com", "/star/x"): True,
        ("b.com", "/mine/x"): False,
    }


def test_zero_shuffle_plan(spark):
    rules = robots_rules_df(
        spark,
        [("a.com", "User-agent: *\nDisallow: /x\nDisallow: /y*z$\n")],
    )
    urls = spark.createDataFrame(
        [("a.com", "/x")], "host string, path string"
    )
    plan = (
        apply_robots(urls, rules)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    # the URL side never shuffles: broadcast join + codegen aggregate
    assert "BroadcastHashJoin" in plan
    for marker in ("SortMergeJoin", "Window", "BatchEvalPython",
                   "ArrowEvalPython", "MapInPandas"):
        assert marker not in plan, marker


def test_parse_directives_sitemaps_and_crawl_delay():
    from neo4j_to_clickhouse_spark.sources.robots import (
        parse_robots_directives,
    )

    body = (
        "User-agent: *\n"
        "Crawl-delay: 2.5\n"
        "Disallow: /x\n"
        "Sitemap: https://a.com/sitemap.xml\n"
        "\n"
        "User-agent: fastbot\n"
        "Crawl-delay: 0.5\n"
        "Crawl-delay: oops\n"
        "Sitemap: https://a.com/news.xml\n"
    )
    d = parse_robots_directives("a.com", body)
    assert d["sitemaps"] == [
        "https://a.com/sitemap.xml",
        "https://a.com/news.xml",
    ]
    assert d["crawl_delay"] == {"*": 2.5, "fastbot": 0.5}
    empty = parse_robots_directives("b.com", "")
    assert empty["sitemaps"] == [] and empty["crawl_delay"] == {}


def test_rules_from_records_distributed(spark, tmp_path):
    # the executor-side rules builder must agree with the driver-side
    # one and feed the same apply_robots plan (incl. non-broadcast)
    from neo4j_to_clickhouse_spark.sources.robots import (
        robots_rules_from_records,
    )
    from neo4j_to_clickhouse_spark.sources.warc import (
        encode_warc,
        read_warc,
    )

    robots_body = (
        "User-agent: *\nDisallow: /page*7$\nDisallow: /%7Epriv\n"
    )
    recs = [
        {
            "uri": "http://a.com/robots.txt",
            "body": robots_body.encode(),
            "status": 200,
            "content_type": "text/plain",
        },
        {  # 404 robots must be ignored
            "uri": "http://b.com/robots.txt",
            "body": b"User-agent: *\nDisallow: /\n",
            "status": 404,
        },
        {"uri": "http://a.com/page1", "body": b"x", "status": 200},
    ]
    (tmp_path / "c.warc.gz").write_bytes(
        encode_warc(recs, gzip_per_record=True)
    )
    rules = robots_rules_from_records(read_warc(spark, str(tmp_path)))
    got = {
        (r.host, r.prefix): (r.allow, r.has_wildcard, r.weight)
        for r in rules.collect()
    }
    assert got == {
        ("a.com", "/page*7$"): (False, True, 6),
        ("a.com", "/~priv"): (False, False, 6),  # pct-normalized
    }
    urls = spark.createDataFrame(
        [
            ("a.com", "/page17"),
            ("a.com", "/~priv/x"),
            ("a.com", "/open"),
            ("b.com", "/anything"),  # 404 robots -> no rules -> allowed
        ],
        "host string, path string",
    )
    for bc in (True, False):
        got_u = {
            r.path: r.crawl_allowed
            for r in apply_robots(
                urls, rules, broadcast_rules=bc
            ).collect()
        }
        assert got_u == {
            "/page17": False,
            "/~priv/x": False,
            "/open": True,
            "/anything": True,
        }, f"broadcast_rules={bc}"
