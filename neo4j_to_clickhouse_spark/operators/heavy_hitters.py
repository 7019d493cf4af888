"""Approximate heavy hitters — ClickHouse ``topK(k)(col)`` /
``anyHeavy`` parity (reference family: ClickHouse aggregate functions the
engine's users reach for when exact ``GROUP BY item`` cardinality
explodes; the reference's own monitor queries use exact counts,
`README.md:436-447`, which this degrades from gracefully).

Spark has no native frequent-items aggregate (only
``approx_count_distinct`` / ``approx_percentile``), so this implements
the standard two-level mergeable-summary scheme:

1. **Batch summaries** (``mapInPandas``): per Arrow batch, per group,
   count items exactly (bounded by the batch's distinct count), keep the
   ``capacity`` largest, and record the largest dropped count as that
   summary's error threshold. A truncated exact count map IS a
   Misra-Gries-style summary: an item's true batch count is between its
   kept count (0 if dropped) and kept count + threshold.
2. **Merge** (``groupBy(group).applyInPandas``): sum kept counts per
   item; an item absent from a summary may have had up to that summary's
   threshold occurrences there, so ``err_bound`` accumulates exactly the
   thresholds of the summaries that missed it. Emit the top ``k`` by
   estimated (lower-bound) count with a deterministic
   (count desc, item asc) tie-break.

Guarantees: ``est_count <= true count <= est_count + err_bound``; with
``capacity`` >= per-batch distinct items the result is EXACT and every
``err_bound`` is 0 — which is what the DuckDB oracle gate pins (same
by-construction trick as the IVF full-probe gate), while the
approximation path is property-tested with planted heavy hitters.

Scale shape: the item column never shuffles at full cardinality — the
shuffle carries at most ``capacity`` rows per (batch, group), and merge
state is ``capacity x n_summaries`` per group. The exact alternative,
``groupBy(group, item).count()`` + rank, shuffles the full distinct item
set, which is what dies at 100 TB item cardinality.
"""

from __future__ import annotations

import uuid

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def approx_top_k(
    df: DataFrame,
    group_cols: list[str],
    item_col: str,
    k: int = 10,
    capacity: int = 1000,
) -> DataFrame:
    """Top-``k`` most frequent ``item_col`` values per group, approximate
    with certified error: (group_cols..., item, est_count, err_bound).

    ``capacity`` trades memory for accuracy: each summary ships at most
    ``capacity`` (item, count) rows per group, and any item whose true
    count exceeds the accumulated thresholds is guaranteed present.
    Requires ``capacity >= k``; ``capacity >= 4k`` is a sane floor for
    skewed data. Group/item values are compared as strings (ClickHouse's
    ``topK`` similarly returns the value domain it was fed).
    """
    if capacity < k:
        raise ValueError(f"capacity ({capacity}) must be >= k ({k})")
    gcols = list(group_cols)

    summary_schema = ", ".join(
        [f"`{c}` string" for c in gcols]
        + ["item string", "cnt long", "threshold long", "`__sid` string"]
    )

    def summarize(batches):
        for pdf in batches:
            outs = []
            for keys, grp in pdf.groupby(gcols, dropna=False, sort=False):
                if not isinstance(keys, tuple):
                    keys = (keys,)
                counts = grp["__item"].value_counts()
                kept = counts.iloc[:capacity]
                threshold = (
                    int(counts.iloc[capacity:].max())
                    if len(counts) > capacity
                    else 0
                )
                out = pd.DataFrame(
                    {
                        "item": kept.index.to_numpy(object),
                        "cnt": kept.to_numpy("int64"),
                        "threshold": threshold,
                        # one id PER (batch, group) summary: Arrow may cut
                        # a partition into several batches, and each
                        # truncation is its own summary for the error math
                        "__sid": uuid.uuid4().hex,
                    }
                )
                for c, v in zip(gcols, keys):
                    out[c] = v
                outs.append(
                    out[gcols + ["item", "cnt", "threshold", "__sid"]]
                )
            if outs:
                yield pd.concat(outs, ignore_index=True)

    out_schema = ", ".join(
        [f"`{c}` string" for c in gcols]
        + ["item string", "est_count long", "err_bound long"]
    )

    def merge(keys: tuple, pdf: pd.DataFrame) -> pd.DataFrame:
        per_item = pdf.groupby("item")["cnt"].sum()
        total_threshold = int(pdf.groupby("__sid")["threshold"].first().sum())
        seen_threshold = pdf.groupby("item")["threshold"].sum()
        est = per_item.sort_values(ascending=False)
        out = pd.DataFrame(
            {
                "item": est.index.to_numpy(object),
                "est_count": est.to_numpy("int64"),
                "err_bound": (
                    total_threshold - seen_threshold.reindex(est.index)
                ).to_numpy("int64"),
            }
        )
        out = out.sort_values(
            ["est_count", "item"], ascending=[False, True], kind="mergesort"
        ).head(k)
        for c, v in zip(gcols, keys):
            out[c] = v
        return out[gcols + ["item", "est_count", "err_bound"]]

    summaries = df.select(
        *[F.col(c).cast("string").alias(c) for c in gcols],
        F.col(item_col).cast("string").alias("__item"),
    ).mapInPandas(summarize, summary_schema)
    return summaries.groupBy(*gcols).applyInPandas(merge, out_schema)
