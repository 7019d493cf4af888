"""PII redaction operator semantics (operators/redact.py).

The oracle certifies the per-source rollup; these pin the per-row
contract: class independence, replacement order, idempotence, and the
pattern subset's cross-engine portability (every pattern must compile
in RE2 — checked via DuckDB — since the same constants feed the oracle).
"""

from __future__ import annotations

import duckdb
import pytest

from neo4j_to_clickhouse_spark.operators.redact import (
    PII_PATTERNS,
    redact_pii,
)


@pytest.fixture(scope="module")
def redacted(spark):
    rows = [
        (1, "mail me at jane.doe+spam@corp.example.org today"),
        (2, "call 555-123-4567 or 555.987.6543"),
        (3, "server at 192.168.0.1 and 10.0.0.255"),
        (4, "combo a@b.co 111-222-3333 8.8.8.8"),
        (5, "clean text with no pii at all"),
        (6, ""),
        (7, "already <EMAIL> redacted"),
        # phone-vs-ip non-overlap: dotted phone is a phone, not an IP,
        # and a 4-octet IP must never be half-eaten by the phone pattern
        (8, "dotted 555.123.4567 vs ip 172.16.254.3"),
    ]
    df = spark.createDataFrame(rows, ["id", "text"])
    out = {r["id"]: r for r in redact_pii(df, "text").collect()}
    return out


def test_counts_per_class(redacted):
    assert (redacted[1]["n_email"], redacted[1]["n_phone"], redacted[1]["n_ip"]) == (1, 0, 0)
    assert (redacted[2]["n_email"], redacted[2]["n_phone"], redacted[2]["n_ip"]) == (0, 2, 0)
    assert (redacted[3]["n_email"], redacted[3]["n_phone"], redacted[3]["n_ip"]) == (0, 0, 2)
    assert (redacted[4]["n_email"], redacted[4]["n_phone"], redacted[4]["n_ip"]) == (1, 1, 1)
    assert (redacted[5]["n_email"], redacted[5]["n_phone"], redacted[5]["n_ip"]) == (0, 0, 0)
    assert (redacted[6]["n_email"], redacted[6]["n_phone"], redacted[6]["n_ip"]) == (0, 0, 0)


def test_replacement_tokens(redacted):
    assert redacted[1]["text_redacted"] == "mail me at <EMAIL> today"
    assert redacted[2]["text_redacted"] == "call <PHONE> or <PHONE>"
    assert redacted[3]["text_redacted"] == "server at <IP> and <IP>"
    assert redacted[4]["text_redacted"] == "combo <EMAIL> <PHONE> <IP>"
    assert redacted[5]["text_redacted"] == redacted[5]["text"]
    assert redacted[6]["text_redacted"] == ""


def test_phone_ip_disambiguation(redacted):
    # dotted phone (3-3-4 digits) redacts as phone; a real IP as IP
    assert redacted[8]["text_redacted"] == "dotted <PHONE> vs ip <IP>"


def test_idempotent_on_redacted_text(redacted):
    # placeholder tokens contain no pattern-matchable substrings
    assert redacted[7]["text_redacted"] == "already <EMAIL> redacted"
    assert redacted[7]["n_email"] == 0


def test_patterns_compile_in_re2():
    """Every pattern must be valid RE2 with the same match set — the
    oracle interpolates the identical constants into DuckDB SQL."""
    con = duckdb.connect()
    probes = {
        "email": ("x user@site.io y", 1),
        "phone": ("x 555-123-4567 y", 1),
        "ip": ("x 1.2.3.4 y", 1),
    }
    for name, pattern, _ in PII_PATTERNS:
        text, expect = probes[name]
        n = con.execute(
            "SELECT len(regexp_extract_all(?, ?))", [text, pattern]
        ).fetchone()[0]
        assert n == expect, f"pattern {name} does not match in RE2"
