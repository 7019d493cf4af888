"""Generate a REAL sf-scale test fixture from scratch (VERDICT r10 item 8).

The driver fixtures stop at sf0.1 and `tools/gen_scale_data.py`'s
replicas are timing-only (key-remapped clones of sf0.1's distributions).
This generator draws every table fresh — new keys, new values, new text
— at any scale factor, so the full-registry oracle gate
(`tools/check_correctness.py`) can certify Spark-vs-DuckDB agreement on
a decade the driver never reaches. The gate is self-consistent (both
engines read the same parquet), so agreement here is real correctness
evidence, not replica-of-known-green.

Schemas, value domains and the planted structures match the driver
fixture exactly (inspected from /root/testdata/sf0.01, see each
builder's comment): same column names/types, same categorical domains,
the same ~4.5% planted near-duplicate documents (an earlier doc with a
' dup' token appended — what the dedup operators detect), unit-norm
64-dim embeddings, uniform user traffic over 15000*sf users in the
2024-01 window. Row counts are sf0.01's counts x (sf/0.01).

Usage: python tools/gen_sf_fixture.py [sf] [out_dir] [seed]
Defaults: sf=1.0, out=/tmp/spark_graft_sf<sf>, seed=42.
"""

from __future__ import annotations

import json
import os
import sys

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

REGIONS = ["AFRICA", "AMERICA", "ASIA", "EUROPE", "MIDDLE EAST"]
SEGMENTS = ["AUTOMOBILE", "BUILDING", "FURNITURE", "HOUSEHOLD", "MACHINERY"]
PRIORITIES = ["1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW"]
STATUSES = ["F", "O", "P"]
RETURNFLAGS = ["A", "N", "R"]
LINESTATUSES = ["F", "O"]
EVENT_TYPES = ["click", "error", "purchase", "signup", "view"]
LANGS = ["en", "de", "es", "fr", "zh"]
LANG_W = [0.44, 0.14, 0.14, 0.14, 0.14]
P_ADJ = ["small", "old", "new", "blue", "cold", "hot", "red", "large"]
P_NOUN = ["bolt", "widget", "rod", "anvil", "ring", "plate", "gear", "gizmo"]
P_TYPES = ["ECONOMY", "LARGE", "MEDIUM", "PROMO", "SMALL", "STANDARD"]
VOCAB = [
    "a", "agg", "batch", "big", "column", "customer", "data", "dup",
    "fast", "filter", "group", "hash", "join", "key", "line", "merge",
    "order", "part", "query", "row", "scan", "slow", "small", "sort",
    "spark", "stream", "table", "the", "value", "vector", "window",
]

_DAY_US = 86_400_000_000


def _ts_us(iso: str) -> int:
    return np.datetime64(iso, "us").astype(np.int64)


def _write(out: str, name: str, table: pa.Table) -> None:
    path = os.path.join(out, f"{name}.parquet")
    pq.write_table(table, path)
    print(f"  {name}: {table.num_rows} rows -> {path}", file=sys.stderr)


def gen_dimensions(out: str) -> None:
    _write(out, "region", pa.table({
        "r_regionkey": pa.array(range(5), pa.int32()),
        "r_name": REGIONS,
    }))
    _write(out, "nation", pa.table({
        "n_nationkey": pa.array(range(25), pa.int32()),
        "n_name": [f"NATION_{i}" for i in range(25)],
        "n_regionkey": pa.array([i % 5 for i in range(25)], pa.int32()),
    }))


def gen_customer(rng, out: str, n: int) -> None:
    _write(out, "customer", pa.table({
        "c_custkey": pa.array(range(n), pa.int64()),
        "c_name": [f"Customer#{i:09d}" for i in range(n)],
        "c_nationkey": pa.array(rng.integers(0, 25, n), pa.int32()),
        "c_acctbal": np.round(rng.uniform(-999.99, 9999.99, n), 2),
        "c_mktsegment": np.array(SEGMENTS)[rng.integers(0, 5, n)],
    }))


def gen_supplier(rng, out: str, n: int) -> None:
    _write(out, "supplier", pa.table({
        "s_suppkey": pa.array(range(n), pa.int64()),
        "s_name": [f"Supplier#{i:09d}" for i in range(n)],
        "s_nationkey": pa.array(rng.integers(0, 25, n), pa.int32()),
        "s_acctbal": np.round(rng.uniform(-999.99, 9999.99, n), 2),
    }))


def gen_part(rng, out: str, n: int) -> None:
    adj = np.array(P_ADJ)[rng.integers(0, len(P_ADJ), n)]
    noun = np.array(P_NOUN)[rng.integers(0, len(P_NOUN), n)]
    _write(out, "part", pa.table({
        "p_partkey": pa.array(range(n), pa.int64()),
        "p_name": [f"{a} {b}" for a, b in zip(adj, noun)],
        "p_brand": [f"Brand#{i}" for i in rng.integers(1, 26, n)],
        "p_type": np.array(P_TYPES)[rng.integers(0, len(P_TYPES), n)],
        "p_size": pa.array(rng.integers(1, 51, n), pa.int32()),
        "p_retailprice": np.round(rng.uniform(900.0, 1000.0, n), 2),
    }))


def gen_orders_lineitem(
    rng, out: str, n_orders: int, n_cust: int, n_part: int, n_supp: int
) -> None:
    """Orders + their lineitems, streamed in chunks so sf10 fits in RAM.
    Lines per order: 1 + min(12, Poisson(3)) — avg ~4 lines (fixture:
    60000/15000), max 13 as observed. Dates day-granular: orderdate
    uniform 1995-01-01..2001-08-01, shipdate = orderdate + 1..95 d."""
    d0 = _ts_us("1995-01-01")
    d1 = _ts_us("2001-08-01")
    days = (d1 - d0) // _DAY_US

    o_schema = pa.schema([
        ("o_orderkey", pa.int64()), ("o_custkey", pa.int64()),
        ("o_orderstatus", pa.string()), ("o_totalprice", pa.float64()),
        ("o_orderdate", pa.timestamp("us")),
        ("o_orderpriority", pa.string()),
    ])
    l_schema = pa.schema([
        ("l_orderkey", pa.int64()), ("l_partkey", pa.int64()),
        ("l_suppkey", pa.int64()), ("l_linenumber", pa.int32()),
        ("l_quantity", pa.float64()), ("l_extendedprice", pa.float64()),
        ("l_discount", pa.float64()), ("l_tax", pa.float64()),
        ("l_returnflag", pa.string()), ("l_linestatus", pa.string()),
        ("l_shipdate", pa.timestamp("us")),
    ])
    chunk = 200_000
    total_lines = 0
    with pq.ParquetWriter(
        os.path.join(out, "orders.parquet"), o_schema
    ) as ow, pq.ParquetWriter(
        os.path.join(out, "lineitem.parquet"), l_schema
    ) as lw:
        for lo in range(0, n_orders, chunk):
            hi = min(lo + chunk, n_orders)
            m = hi - lo
            keys = np.arange(lo, hi, dtype=np.int64)
            odate = d0 + rng.integers(0, days + 1, m) * _DAY_US
            ow.write_table(pa.table({
                "o_orderkey": keys,
                "o_custkey": rng.integers(0, n_cust, m),
                "o_orderstatus": np.array(STATUSES)[rng.integers(0, 3, m)],
                "o_totalprice": np.round(
                    rng.uniform(1000.0, 500000.0, m), 2
                ),
                "o_orderdate": odate.astype("datetime64[us]"),
                "o_orderpriority": np.array(PRIORITIES)[
                    rng.integers(0, 5, m)
                ],
            }, schema=o_schema))

            nlines = 1 + np.minimum(rng.poisson(3.0, m), 12)
            k = int(nlines.sum())
            total_lines += k
            okeys = np.repeat(keys, nlines)
            odates = np.repeat(odate, nlines)
            linenum = (
                np.arange(k) - np.repeat(np.cumsum(nlines) - nlines, nlines)
                + 1
            )
            qty = rng.integers(1, 51, k).astype(np.float64)
            lw.write_table(pa.table({
                "l_orderkey": okeys,
                "l_partkey": rng.integers(0, n_part, k),
                "l_suppkey": rng.integers(0, n_supp, k),
                "l_linenumber": linenum.astype(np.int32),
                "l_quantity": qty,
                "l_extendedprice": np.round(
                    qty * rng.uniform(900.0, 2100.0, k), 2
                ),
                "l_discount": np.round(rng.integers(0, 11, k) / 100.0, 2),
                "l_tax": np.round(rng.integers(0, 9, k) / 100.0, 2),
                "l_returnflag": np.array(RETURNFLAGS)[
                    rng.integers(0, 3, k)
                ],
                "l_linestatus": np.array(LINESTATUSES)[
                    rng.integers(0, 2, k)
                ],
                "l_shipdate": (
                    odates + rng.integers(1, 96, k) * _DAY_US
                ).astype("datetime64[us]"),
            }, schema=l_schema))
    print(f"  orders: {n_orders} rows, lineitem: {total_lines} rows",
          file=sys.stderr)


def gen_events(rng, out: str, n: int, n_users: int) -> None:
    t0 = _ts_us("2024-01-01")
    t1 = _ts_us("2024-01-31")
    _write(out, "events", pa.table({
        "event_id": pa.array(range(n), pa.int64()),
        "ts": rng.integers(t0, t1, n).astype("datetime64[us]"),
        "user_id": rng.integers(0, n_users, n),
        "event_type": np.array(EVENT_TYPES)[rng.integers(0, 5, n)],
        "value": np.round(rng.uniform(0.01, 500.0, n), 2),
        "props": [f'{{"k": {k}}}' for k in rng.integers(0, 100, n)],
    }))


def gen_documents(rng, out: str, n: int) -> None:
    """~4.5% of docs are planted near-duplicates: a copy of an earlier
    doc with the token ' dup' appended (the fixture's construction —
    diffed at sf0.01: identical prefix, one-token tail). A further
    ~0.2% are EXACT duplicates. n_chars = length(text) always."""
    vocab = np.array(VOCAB)
    texts: list[str] = []
    for i in range(n):
        r = rng.random()
        if i > 10 and r < 0.002:
            texts.append(texts[int(rng.integers(0, i))])
        elif i > 10 and r < 0.045:
            texts.append(
                texts[int(rng.integers(0, i))] + " dup"
            )
        else:
            k = int(rng.integers(8, 101))
            texts.append(" ".join(vocab[rng.integers(0, len(vocab), k)]))
    _write(out, "documents", pa.table({
        "doc_id": pa.array(range(n), pa.int64()),
        "text": texts,
        "lang": np.array(LANGS)[
            rng.choice(5, n, p=LANG_W)
        ],
        "source": [f"src{i}" for i in rng.integers(0, 20, n)],
        "n_chars": pa.array([len(t) for t in texts], pa.int64()),
    }))


def gen_embeddings(rng, out: str, n: int, dim: int = 64) -> None:
    e = rng.standard_normal((n, dim)).astype(np.float32)
    e /= np.linalg.norm(e, axis=1, keepdims=True)
    _write(out, "embeddings", pa.table({
        "vec_id": pa.array(range(n), pa.int64()),
        "embedding": pa.array(list(e), pa.list_(pa.float32())),
        "label": pa.array(rng.integers(0, 10, n), pa.int32()),
    }))


def main() -> None:
    sf = float(sys.argv[1]) if len(sys.argv) > 1 else 1.0
    out = (
        sys.argv[2]
        if len(sys.argv) > 2
        else f"/tmp/spark_graft_sf{sf:g}"
    )
    seed = int(sys.argv[3]) if len(sys.argv) > 3 else 42
    os.makedirs(out, exist_ok=True)
    rng = np.random.default_rng(seed)
    mult = sf / 0.01  # row counts are sf0.01's counts x this

    n_cust = int(1500 * mult)
    n_supp = int(100 * mult)
    n_part = int(2000 * mult)
    print(f"generating sf={sf} fixture at {out} (seed {seed})",
          file=sys.stderr)
    gen_dimensions(out)
    gen_customer(rng, out, n_cust)
    gen_supplier(rng, out, n_supp)
    gen_part(rng, out, n_part)
    gen_orders_lineitem(
        rng, out, int(15000 * mult), n_cust, n_part, n_supp
    )
    gen_events(rng, out, int(10000 * mult), int(150 * mult))
    gen_documents(rng, out, int(500 * mult))
    gen_embeddings(rng, out, int(500 * mult))
    print(json.dumps({"sf": sf, "out": out, "seed": seed}))


if __name__ == "__main__":
    main()
