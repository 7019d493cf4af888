"""Fixture-cleanliness contract the oracle SQL depends on.

A dozen oracles tokenize with DuckDB ``string_split(text, ' ')`` while
the Spark side uses ``tokens()`` (strip + split ``\\s+``, empty-safe —
``operators/dedup.py:75``).  The two agree iff every tokenized fixture
column is non-empty, single-spaced, and free of tabs/newlines/leading/
trailing whitespace.  VERDICT r06 item 4 (latent tokenizer divergence)
sanctioned pinning this contract instead of rewriting every oracle: if a
regenerated fixture ever violates it, this test fails BEFORE the driver
records a silent bin-boundary divergence.

Checked with DuckDB (not Spark) so the assert runs in milliseconds and
exercises the same reader the oracles use.
"""

from __future__ import annotations

import os

import duckdb
import pytest

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR_TEST", "/root/testdata/sf0.001")

# every (table, column) pair an oracle passes to string_split(col, ' ')
TOKENIZED_COLUMNS = [
    ("documents", "text"),
    ("part", "p_name"),
]


@pytest.mark.parametrize("table,col", TOKENIZED_COLUMNS)
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
