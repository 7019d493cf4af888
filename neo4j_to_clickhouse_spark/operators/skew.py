"""Explicit two-stage (salted) aggregation variants.

Spark's hash aggregation is already two-phase (map-side partial
combine), so plain ``count``/``sum``/``min`` skew is a non-issue: each
reduce key receives at most one partial row per map task. The textbook
hot-key hazards these operators were written for turn out to be
defused by Spark 4's physical planner as well — verified by plan
inspection and honest wall-time measurement (``tools/bench_skew.py``,
round 8; earlier rounds' measurements consumed results with
``.count()``, which let Catalyst prune the aggregates under test, and
overstated the salted forms):

- **exact count-distinct** — the planner expands ``count(DISTINCT v)``
  through a first exchange partitioned on ``(key, v)``, so a hot key
  already spreads by its values; the final per-key merge receives
  bounded partial counts, not raw pairs.
- **argmin/argmax per key** — a ``row_number() = 1`` filter plans as
  ``WindowGroupLimit Partial``: a map-side top-1 heap per key BEFORE
  the shuffle, so one row per (map task, key) moves regardless of heat.

Measured at 20M rows, local[32], planted hot key (min-of-2, quiet
host): the salted forms are within noise of plain at 30% heat and
LOSE at 1% (count-distinct 3.1 s plain vs 4.1 s salted; argmin 1.1 s
plain vs 5.3 s salted) — see ``docs/SCALING.md`` for the full table.

The operators stay for two reasons: they are the explicit algebra of
the two-stage trick (the shape to reach for on an engine or aggregate
the planner does NOT rewrite — e.g. a window function WindowGroupLimit
cannot recognize), and their oracle-certified queries
(``count_distinct_salted``, ``first_event_salted``) pin the
equivalence of the rewritten shuffle shape against the plain
formulations. They are NOT the recommended default on Spark 4: use the
plain forms and let the planner work.

Reference parity: the reference leans on ClickHouse's shard-local
pre-aggregation for the same hot-key pattern
(`clickhouse/init/04-optimize-tables.sql` materialized rollups); this is
the explicit Spark equivalent.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _bucket(value: Column | str, buckets: int) -> Column:
    c = F.col(value) if isinstance(value, str) else value
    return F.pmod(F.xxhash64(c), F.lit(buckets))


def salted_count_distinct(
    df: DataFrame,
    keys: list[str],
    value_col: str,
    buckets: int = 64,
    out_col: str = "n_distinct",
) -> DataFrame:
    """Exact distinct count per key, skew-safe.

    Stage 1 groups by (keys, hash(value) % buckets) and counts distinct
    values inside each bucket — exact, because a value always lands in
    the same bucket so no value is counted twice across buckets. Stage 2
    sums the per-bucket counts; its input is at most ``buckets`` rows per
    key, however hot the key. Two shuffles total, both map-side combined.
    """
    if buckets < 1:
        raise ValueError(f"buckets must be >= 1, got {buckets}")
    stage1 = (
        df.groupBy(*keys, _bucket(value_col, buckets).alias("__b"))
        .agg(F.count_distinct(F.col(value_col)).alias("__d"))
    )
    return stage1.groupBy(*keys).agg(F.sum("__d").alias(out_col))


def salted_min_by(
    df: DataFrame,
    keys: list[str],
    order_col: str,
    buckets: int = 64,
) -> DataFrame:
    """Exact per-key row with the minimum ``order_col``, skew-safe.

    Two-stage argmin: stage 1 takes the min row per (keys, bucket) via
    ``min_by``-style struct ordering, stage 2 reduces the <= ``buckets``
    candidates per key. Ties on ``order_col`` resolve to the smallest
    full struct (deterministic total order over the remaining columns).

    This is the survivor-choice shape of :func:`.dedup.dedup_exact` for
    corpora where one content hash holds a double-digit percentage of all
    rows (mass-duplicated boilerplate) — there the rank-window
    formulation funnels that hash's whole row set through one task, while
    this never moves more than ``buckets`` rows per key into stage 2.
    """
    if buckets < 1:
        raise ValueError(f"buckets must be >= 1, got {buckets}")
    payload = [c for c in df.columns if c != order_col]
    packed = F.struct(F.col(order_col), *[F.col(c) for c in payload])
    stage1 = (
        df.groupBy(*keys, _bucket(order_col, buckets).alias("__b"))
        .agg(F.min(packed).alias("__m"))
    )
    best = stage1.groupBy(*keys).agg(F.min("__m").alias("__m"))
    return best.select(
        *keys,
        F.col(f"__m.{order_col}").alias(order_col),
        *[F.col(f"__m.{c}").alias(c) for c in payload if c not in keys],
    )
