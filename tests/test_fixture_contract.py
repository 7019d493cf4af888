"""Fixture-cleanliness contract the oracle SQL depends on.

A dozen oracles tokenize with DuckDB ``string_split(text, ' ')`` while
the Spark side uses ``tokens()`` (strip + split ``\\s+``, empty-safe —
``operators/dedup.py:75``).  The two agree iff every tokenized fixture
column is non-empty, single-spaced, and free of tabs/newlines/leading/
trailing whitespace.  VERDICT r06 item 4 (latent tokenizer divergence)
sanctioned pinning this contract instead of rewriting every oracle: if a
regenerated fixture ever violates it, this test fails BEFORE the driver
records a silent bin-boundary divergence.

VERDICT r07 item 5: the (table, column) list is no longer hard-coded —
it is DERIVED from the registry by scanning every oracle for
``string_split(expr, ' ')`` call sites and attributing each tokenized
expression to the fixture tables that carry that column, so a newly
registered tokenized query cannot reintroduce the divergence silently.

Checked with DuckDB (not Spark) so the asserts run in milliseconds and
exercise the same reader the oracles use.
"""

from __future__ import annotations

import os
import re

import duckdb
import pytest

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR_TEST", "/root/testdata/sf0.001")

TESTDATA_TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]

_SPLIT_CALL = re.compile(r"string_split\(\s*([A-Za-z_][\w.()]*?)\s*,\s*' '")
_STRIP_FN = re.compile(r"^(?:lower|upper|trim)\((.*)\)$")


def _table_columns():
    con = duckdb.connect()
    cols = {}
    for t in TESTDATA_TABLES:
        path = os.path.join(SF_DIR, f"{t}.parquet")
        if not os.path.exists(path):
            continue
        cols[t] = {
            r[0] for r in con.execute(f"DESCRIBE SELECT * FROM '{path}'").fetchall()
        }
    return cols


def tokenized_columns():
    """Every (table, column) pair some oracle passes to
    ``string_split(col, ' ')``, resolved mechanically from the registry.

    Resolution: unwrap case-insensitive scalar wrappers (lower/upper/
    trim), strip table-alias prefixes, and when the identifier is an
    oracle-local alias (``text AS word_src``) follow the alias one level
    to its source column.  An identifier that cannot be attributed to
    any fixture table fails the test loudly instead of silently passing.
    """
    from neo4j_to_clickhouse_spark.plans.queries import QUERIES

    cols_by_table = _table_columns()
    pairs: set[tuple[str, str]] = set()
    unresolved: list[tuple[str, str]] = []
    for name, spec in QUERIES.items():
        sql = spec.oracle
        if not sql:
            continue
        for expr in _SPLIT_CALL.findall(sql):
            ident = expr
            while (m := _STRIP_FN.match(ident)) is not None:
                ident = m.group(1).strip()
            ident = ident.rsplit(".", 1)[-1]
            # follow one level of oracle-local aliasing: `src AS ident`
            if not any(ident in cs for cs in cols_by_table.values()):
                m = re.search(rf"([A-Za-z_]\w*)\s+AS\s+{re.escape(ident)}\b", sql)
                if m:
                    ident = m.group(1)
            hits = [t for t, cs in cols_by_table.items() if ident in cs]
            if not hits:
                unresolved.append((name, expr))
            pairs.update((t, ident) for t in hits)
    assert not unresolved, (
        f"string_split call sites whose column could not be attributed "
        f"to a fixture table: {unresolved} — extend the resolver or the "
        "oracle so the single-spaced contract stays enforceable"
    )
    return sorted(pairs)


def test_registry_tokenized_columns_discovered():
    """The mechanical scan must at minimum find the two pairs the
    hand-audited r06 contract pinned; an empty result would mean the
    scanner regressed, not that the oracles stopped tokenizing."""
    pairs = tokenized_columns()
    assert ("documents", "text") in pairs
    assert ("part", "p_name") in pairs


@pytest.mark.parametrize("table,col", tokenized_columns())
def test_tokenized_columns_are_single_spaced(table, col):
    path = os.path.join(SF_DIR, f"{table}.parquet")
    if not os.path.exists(path):
        pytest.skip(f"fixture table {table} absent at {SF_DIR}")
    con = duckdb.connect()
    dirty = con.execute(
        f"""SELECT count(*) FROM '{path}'
            WHERE {col} IS NULL OR {col} = ''
               OR regexp_matches({col}, '(\t|\n|\r|  |^ | $)')"""
    ).fetchone()[0]
    assert dirty == 0, (
        f"{table}.{col}: {dirty} rows violate the single-spaced contract "
        "— string_split(text, ' ') oracles no longer match tokens(); "
        "either clean the fixture or convert the oracles to "
        "regexp_split_to_array with an empty guard"
    )


def test_documents_text_is_printable_ascii():
    """The byte-level BPE oracle (bpe_byte_level_stats) states its
    closed form over PRINTABLE-ASCII, single-space text: every byte id
    is ascii(c)-33 except space=220, UTF-8 length == char length, and
    the lookahead-free RE2 pre-tokenizer split equals the engine's.
    A regenerated fixture that breaks any of this must fail HERE, not
    as a mysterious value-hash mismatch in the driver."""
    path = os.path.join(SF_DIR, "documents.parquet")
    if not os.path.exists(path):
        pytest.skip(f"fixture table documents absent at {SF_DIR}")
    con = duckdb.connect()
    bad = con.execute(
        f"""SELECT count(*) FROM '{path}'
            WHERE regexp_matches(text, '[^\\x20-\\x7E]')
               OR regexp_matches(text, '''')"""
    ).fetchone()[0]
    assert bad == 0, (
        f"documents.text: {bad} rows carry non-printable-ASCII or "
        "apostrophes — the bpe_byte_level_stats closed-form oracle's "
        "assumptions no longer hold; extend the oracle (contraction "
        "lanes, per-byte ids) before trusting the driver row"
    )
