"""robots.txt (RFC 9309) parsing + distributed crawl filtering.

Training pipelines re-check robots rules when re-processing crawl
snapshots (takedown / opt-out compliance): given the robots.txt bodies
(they arrive as WARC records) and the candidate URL set, drop the URLs
a rule group disallows. This completes the corpus-ingestion chain
(WARC -> robots -> URL canonicalization -> HTML extraction).

Parsing (`parse_robots`) is a pure function over the robots body:
groups of ``User-agent:`` lines followed by ``Allow:`` / ``Disallow:``
rules; comments and blank lines per RFC 9309 §2.2. The match side is
fully declarative (`apply_robots`): rules are a tiny table (a few per
host) that broadcasts; URLs join on host, PREFIX rules match with
``startswith``, and the RFC's longest-match-wins (Allow beats Disallow
on ties) resolves with one rank window over the rules-sized join
output. Wildcard patterns (`*`, `$`) are intentionally out of scope —
they are rare in the wild and would force per-row regex; `parse_robots`
surfaces them with ``has_wildcard=True`` so callers can route those
few hosts to a stricter policy.

100 TB design: rules-per-host is bounded, so they pre-aggregate into a
per-host rule ARRAY (a tiny broadcast table); each URL broadcast-joins
its host's array and resolves longest-match with a codegen
``aggregate`` over that array — ZERO shuffle of the URL set, no window,
no Python. Unmatched URLs (or hosts with no robots) default to allowed
inside the same expression.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

ROBOTS_RULE_SCHEMA = "host string, agent string, allow boolean, prefix string, has_wildcard boolean"


def parse_robots(host: str, body: str) -> list[tuple]:
    """Parse one robots.txt body into rule tuples
    ``(host, agent, allow, prefix, has_wildcard)``. Group semantics per
    RFC 9309: consecutive User-agent lines share the following rules;
    an empty Disallow means "allow all" and emits no rule."""
    rules: list[tuple] = []
    agents: list[str] = []
    in_group_rules = False
    for raw in (body or "").splitlines():
        line = raw.split("#", 1)[0].strip()
        if not line or ":" not in line:
            continue
        field, _, value = line.partition(":")
        field = field.strip().lower()
        value = value.strip()
        if field == "user-agent":
            if in_group_rules:
                agents = []
                in_group_rules = False
            agents.append(value.lower())
        elif field in ("allow", "disallow"):
            in_group_rules = True
            if not value:
                continue  # "Disallow:" (empty) = allow all
            wild = "*" in value or value.endswith("$")
            for a in agents or ["*"]:
                rules.append(
                    (host, a, field == "allow", value, wild)
                )
    return rules


def robots_rules_df(spark, bodies: list[tuple[str, str]]) -> DataFrame:
    """(host, robots_body) pairs -> the broadcastable rules table."""
    rows = []
    for host, body in bodies:
        rows.extend(parse_robots(host, body))
    return spark.createDataFrame(rows, ROBOTS_RULE_SCHEMA)


def apply_robots(
    urls: DataFrame,
    rules: DataFrame,
    agent: str = "*",
    host_col: str = "host",
    path_col: str = "path",
) -> DataFrame:
    """Adds ``crawl_allowed``: RFC 9309 longest-match decision for
    ``agent`` (prefix rules only; see module docstring). URLs with no
    matching rule — or no rules for their host at all — are allowed."""
    per_host = (
        rules.filter(
            (F.col("agent") == agent.lower()) & ~F.col("has_wildcard")
        )
        .groupBy(F.col("host").alias("__rhost"))
        .agg(
            F.collect_list(
                F.struct(
                    F.col("prefix").alias("prefix"),
                    F.col("allow").alias("allow"),
                )
            ).alias("__rules")
        )
    )
    joined = urls.join(
        F.broadcast(per_host),
        F.col(host_col) == F.col("__rhost"),
        "left",
    )
    # longest matching prefix wins; Allow beats Disallow on equal
    # length; no match (or no rules for the host) -> allowed. One
    # codegen aggregate over the per-host rule array, zero shuffle.
    path = F.col(path_col)
    decision = F.aggregate(
        F.coalesce(
            F.col("__rules"),
            F.array().cast(
                "array<struct<prefix:string,allow:boolean>>"
            ),
        ),
        F.struct(
            F.lit(-1).alias("len"), F.lit(True).alias("allow")
        ),
        lambda acc, r: F.when(
            path.startswith(r["prefix"])
            & (
                (F.length(r["prefix"]) > acc["len"])
                | (
                    (F.length(r["prefix"]) == acc["len"])
                    & r["allow"]
                    & ~acc["allow"]
                )
            ),
            F.struct(
                F.length(r["prefix"]).alias("len"),
                r["allow"].alias("allow"),
            ),
        ).otherwise(acc),
        lambda acc: acc["allow"],
    )
    return joined.withColumn("crawl_allowed", decision).drop(
        "__rhost", "__rules"
    )
