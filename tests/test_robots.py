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
    # wildcard rules surface flagged, not silently matched
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


def test_zero_shuffle_plan(spark):
    rules = robots_rules_df(
        spark, [("a.com", "User-agent: *\nDisallow: /x\n")]
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
