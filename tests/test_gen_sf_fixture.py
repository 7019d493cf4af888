"""Contract tests for tools/gen_sf_fixture.py (VERDICT r10 item 8):
the from-scratch generator must produce byte-compatible schemas with the
driver fixture (so every registry query and oracle runs unmodified) and
preserve the planted structures the dedup operators detect.
"""

import os
import sys

import pyarrow.parquet as pq
import pytest

sys.path.insert(
    0,
    os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tools"),
)

TABLES = (
    "region nation customer supplier part orders lineitem events "
    "documents embeddings"
).split()

DRIVER_SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def generated(tmp_path_factory):
    import gen_sf_fixture

    out = str(tmp_path_factory.mktemp("gen_sf"))
    argv = sys.argv
    sys.argv = ["gen_sf_fixture.py", "0.004", out, "7"]
    try:
        gen_sf_fixture.main()
    finally:
        sys.argv = argv
    return out


def test_schemas_match_driver_fixture(generated):
    for t in TABLES:
        want = pq.read_schema(os.path.join(DRIVER_SF, f"{t}.parquet"))
        got = pq.read_schema(os.path.join(generated, f"{t}.parquet"))
        for field in want:
            g = got.field(field.name)
            assert g.type == field.type, (t, field.name, g.type, field.type)
        assert [f.name for f in got] == [f.name for f in want], t


def test_planted_document_structure(generated):
    import duckdb

    con = duckdb.connect()
    docs = f"{generated}/documents.parquet"
    n = con.execute(f"SELECT count(*) FROM '{docs}'").fetchone()[0]
    assert n == 200  # 500 * 0.004/0.01
    # n_chars is exactly length(text)
    bad = con.execute(
        f"SELECT count(*) FROM '{docs}' WHERE n_chars <> length(text)"
    ).fetchone()[0]
    assert bad == 0
    # planted near-dups exist: docs ending in the ' dup' marker that
    # share their prefix with an earlier doc
    dup = con.execute(
        f"""SELECT count(*) FROM '{docs}' a JOIN '{docs}' b
            ON a.text = b.text || ' dup' AND a.doc_id > b.doc_id"""
    ).fetchone()[0]
    assert dup >= 2  # ~4.3% of 200 in expectation, seed-pinned


def test_value_domains(generated):
    import duckdb

    con = duckdb.connect()
    g = generated
    assert con.execute(
        f"SELECT count(DISTINCT event_type) FROM '{g}/events.parquet'"
    ).fetchone()[0] == 5
    assert con.execute(
        f"SELECT max(len(embedding)), min(len(embedding)) "
        f"FROM '{g}/embeddings.parquet'"
    ).fetchone() == (64, 64)
    lo, hi = con.execute(
        f"SELECT min(ts), max(ts) FROM '{g}/events.parquet'"
    ).fetchone()
    assert str(lo).startswith("2024-01") and str(hi).startswith("2024-01")
    # unit-norm embeddings
    off = con.execute(
        f"""SELECT count(*) FROM '{g}/embeddings.parquet'
            WHERE abs(sqrt(list_sum(list_transform(embedding,
                x -> CAST(x AS DOUBLE) * x))) - 1.0) > 1e-3"""
    ).fetchone()[0]
    assert off == 0


def test_lineitem_joins_and_dates(generated):
    import duckdb

    con = duckdb.connect()
    g = generated
    # every lineitem joins an order; shipdate strictly after orderdate
    orphans = con.execute(
        f"""SELECT count(*) FROM '{g}/lineitem.parquet' l
            LEFT JOIN '{g}/orders.parquet' o
            ON l.l_orderkey = o.o_orderkey
            WHERE o.o_orderkey IS NULL"""
    ).fetchone()[0]
    assert orphans == 0
    bad = con.execute(
        f"""SELECT count(*) FROM '{g}/lineitem.parquet' l
            JOIN '{g}/orders.parquet' o ON l.l_orderkey = o.o_orderkey
            WHERE l.l_shipdate <= o.o_orderdate"""
    ).fetchone()[0]
    assert bad == 0
