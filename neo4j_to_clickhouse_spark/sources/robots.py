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
host) that broadcasts; URLs join on host, plain rules match with
``startswith`` and wildcard rules (RFC 9309 §2.2.3: ``*`` matches any
character sequence, a trailing ``$`` anchors the end of the path) match
with a JVM-side ``regexp_like`` against a regex compiled at parse time
(``*`` -> ``.*``, trailing ``$`` -> end anchor, everything else
escaped — the Java/RE2/Python-common regex subset, same discipline as
`redact.py`). The RFC's most-specific-match-wins resolves on the rule's
octet count excluding the ``*``/``$`` metacharacters, Allow beating
Disallow on ties, with one rank fold over the rules-sized join output.

Group selection per RFC 9309 §2.2.1: for each host the agent-specific
group is used when one exists (matched as a lowercased exact product
token), otherwise the ``*`` group — a host that only publishes
``User-agent: *`` rules still constrains every crawler. Groups sharing
a user-agent merge, as the RFC requires.

100 TB design: rules-per-host is bounded, so they pre-aggregate into a
per-host rule ARRAY (a tiny broadcast table); each URL broadcast-joins
its host's array and resolves longest-match with a codegen
``aggregate`` over that array — ZERO shuffle of the URL set, no window,
no Python. The wildcard regex is pre-compiled into the broadcast rule
row, so the URL side stays pure codegen (``StartsWith`` for plain
prefixes, ``RLike`` only for the rare wildcard rules). Unmatched URLs
(or hosts with no robots) default to allowed inside the same
expression.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

ROBOTS_RULE_SCHEMA = (
    "host string, agent string, allow boolean, prefix string, "
    "has_wildcard boolean, pattern string, weight int"
)

_RULE_STRUCT = "struct<prefix:string,pattern:string,weight:int,allow:boolean>"

# Regex metacharacters escaped in the Java/RE2/Python common subset.
_RX_META = set("\\.[]{}()^$|?+*")


def _rule_regex(value: str) -> str:
    """RFC 9309 match pattern -> anchored regex (``*`` -> ``.*``,
    trailing ``$`` -> end anchor, all other octets literal)."""
    anchored = value.endswith("$")
    core = value[:-1] if anchored else value
    out = ["^"]
    for ch in core:
        if ch == "*":
            out.append(".*")
        elif ch in _RX_META:
            out.append("\\" + ch)
        else:
            out.append(ch)
    if anchored:
        out.append("$")
    return "".join(out)


def _rule_weight(value: str) -> int:
    """Specificity per RFC 9309 §2.2.2 (most octets wins): the pattern
    length excluding ``*`` wildcards and the trailing ``$`` anchor."""
    core = value[:-1] if value.endswith("$") else value
    return len(core.replace("*", ""))


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


def parse_robots_directives(host: str, body: str) -> dict:
    """Non-rule directives from one robots.txt: ``sitemaps`` (the
    RFC 9309 §2.2.4-style extension lines, group-independent) and
    ``crawl_delay`` per lowercased agent (de-facto standard; seconds
    as float). Malformed delays are ignored."""
    sitemaps: list[str] = []
    crawl_delay: dict[str, float] = {}
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
        elif field == "sitemap" and value:
            sitemaps.append(value)
        elif field == "crawl-delay":
            in_group_rules = True
            try:
                delay = float(value)
            except ValueError:
                continue
            for a in agents or ["*"]:
                crawl_delay[a] = delay
    return {
        "host": host,
        "sitemaps": sitemaps,
        "crawl_delay": crawl_delay,
    }


def robots_rules_df(spark, bodies: list[tuple[str, str]]) -> DataFrame:
    """(host, robots_body) pairs -> the broadcastable rules table.

    The match machinery is pre-compiled here, driver-side, into the
    tiny rule rows: ``pattern`` (the anchored regex; NULL for plain
    prefix rules, which take the faster ``startswith`` path) and
    ``weight`` (RFC specificity = octets sans wildcards). Rule paths
    are percent-normalized with the SAME RFC 3986 §6.2.2 rules the URL
    canonicalizer applies (`functions/url.normalize_pct_str`), so a
    rule like ``Disallow: /%7Euser`` matches a canonicalized
    ``/~user`` octet-wise as RFC 9309 §2.2.2 expects."""
    from ..functions.url import normalize_pct_str

    rows = []
    for host, body in bodies:
        for host_, agent, allow, raw_prefix, wild in parse_robots(
            host, body
        ):
            prefix = normalize_pct_str(raw_prefix)
            rows.append(
                (
                    host_,
                    agent,
                    allow,
                    prefix,
                    wild,
                    _rule_regex(prefix) if wild else None,
                    _rule_weight(prefix),
                )
            )
    return spark.createDataFrame(rows, ROBOTS_RULE_SCHEMA)


def robots_rules_from_records(records: DataFrame) -> DataFrame:
    """Distributed rules builder: WARC ``response`` records of
    robots.txt fetches -> the rules table, parsed EXECUTOR-side in
    Arrow batches (`robots_rules_df` takes a driver-side list — fine
    for test fixtures and per-job host sets, wrong for a full-web
    crawl's millions of robots bodies). Hosts derive from the target
    URI; bodies decode as UTF-8-with-replacement (robots files are
    ASCII-per-RFC; a mangled byte can only mangle its own rule)."""
    from collections.abc import Iterator

    from ..functions.url import url_host

    robots = records.where(
        F.lower(F.col("target_uri")).endswith("/robots.txt")
        & (F.col("http_status") == 200)
    ).select(
        url_host(F.col("target_uri")).alias("host"), F.col("body")
    )

    def run(batches: Iterator) -> Iterator:
        import pandas as pd  # noqa: PLC0415 — executor-side

        from ..functions.url import normalize_pct_str

        cols = [
            "host", "agent", "allow", "prefix",
            "has_wildcard", "pattern", "weight",
        ]
        for pdf in batches:
            rows = []
            for host, body in zip(pdf["host"], pdf["body"]):
                text = bytes(body).decode("utf-8", "replace")
                for h, agent, allow, raw, wild in parse_robots(
                    host, text
                ):
                    prefix = normalize_pct_str(raw)
                    rows.append(
                        (
                            h, agent, allow, prefix, wild,
                            _rule_regex(prefix) if wild else None,
                            _rule_weight(prefix),
                        )
                    )
            yield pd.DataFrame(rows, columns=cols)

    return robots.mapInPandas(
        run,
        "host string, agent string, allow boolean, prefix string, "
        "has_wildcard boolean, pattern string, weight int",
    )


def apply_robots(
    urls: DataFrame,
    rules: DataFrame,
    agent: str = "*",
    host_col: str = "host",
    path_col: str = "path",
    broadcast_rules: bool = True,
) -> DataFrame:
    """Adds ``crawl_allowed``: RFC 9309 most-specific-match decision
    for ``agent``, wildcard rules included. Per host the
    agent-specific group applies if one exists, else the ``*`` group
    (RFC 9309 §2.2.1). URLs with no matching rule — or no rules for
    their host at all — are allowed.

    ``broadcast_rules=True`` (default) pins the zero-shuffle plan for
    per-job host sets; pass ``False`` for a full-web rules table
    (millions of hosts) — the decision becomes one shuffle join keyed
    by host, with the SAME per-host array-aggregate on the join
    output."""
    agent = agent.lower()
    # Per host: collect the candidate rules once, then keep the
    # agent-specific group when the host has one, else the '*' group.
    # All of this happens on the tiny rules side, before broadcast.
    per_host = (
        rules.filter(
            (F.col("agent") == agent) | (F.col("agent") == "*")
        )
        .groupBy(F.col("host").alias("__rhost"))
        .agg(
            F.collect_list(
                F.struct(
                    (F.col("agent") == F.lit(agent)).alias("spec"),
                    F.col("prefix").alias("prefix"),
                    F.col("pattern").alias("pattern"),
                    F.col("weight").alias("weight"),
                    F.col("allow").alias("allow"),
                )
            ).alias("__all")
        )
    )
    has_spec = F.exists(F.col("__all"), lambda r: r["spec"])
    per_host = per_host.select(
        "__rhost",
        F.transform(
            F.filter(
                F.col("__all"),
                lambda r: F.when(has_spec, r["spec"]).otherwise(
                    F.lit(True)
                ),
            ),
            lambda r: F.struct(
                r["prefix"].alias("prefix"),
                r["pattern"].alias("pattern"),
                r["weight"].alias("weight"),
                r["allow"].alias("allow"),
            ),
        ).alias("__rules"),
    )
    rhs = F.broadcast(per_host) if broadcast_rules else per_host
    joined = urls.join(
        rhs,
        F.col(host_col) == F.col("__rhost"),
        "left",
    )
    # Most specific (highest weight) matching rule wins; Allow beats
    # Disallow on equal weight; no match (or no rules for the host)
    # -> allowed. One codegen aggregate over the per-host rule array,
    # zero shuffle of the URL set. Plain prefixes match with
    # StartsWith; wildcard rules with RLike on the precompiled regex.
    path = F.col(path_col)
    decision = F.aggregate(
        F.coalesce(
            F.col("__rules"),
            F.array().cast(f"array<{_RULE_STRUCT}>"),
        ),
        F.struct(
            F.lit(-1).alias("len"), F.lit(True).alias("allow")
        ),
        lambda acc, r: F.when(
            F.when(
                r["pattern"].isNotNull(),
                F.regexp_like(path, r["pattern"]),
            ).otherwise(path.startswith(r["prefix"]))
            & (
                (r["weight"] > acc["len"])
                | (
                    (r["weight"] == acc["len"])
                    & r["allow"]
                    & ~acc["allow"]
                )
            ),
            F.struct(
                r["weight"].alias("len"),
                r["allow"].alias("allow"),
            ),
        ).otherwise(acc),
        lambda acc: acc["allow"],
    )
    return joined.withColumn("crawl_allowed", decision).drop(
        "__rhost", "__rules"
    )
