"""Curation-funnel composition: staged corpus filtering with exact
per-stage retention accounting (north star).

Production pre-training pipelines (C4, Gopher, Dolma) are ordered stage
chains — language ID, length bounds, repetition filters, dedup — and the
number the pipeline owner actually watches is the FUNNEL REPORT: how
many documents (and tokens) survive each stage cumulatively.  Reference
scope: the CDC pipeline has no curation surface; this composes the
engine's certified text/dedup primitives into the pipeline shape.

Scale design: all scan-stage predicates are flat codegen booleans
evaluated in ONE pass over the corpus (no per-stage materialization, no
joins); the optional exact-dedup stage adds exactly one hash shuffle on
the fingerprint (identical shape to ``dedup.exact_duplicates``); the
report itself aggregates to a single row of counters map-side and
explodes to one row per stage with ``stack`` — so a 100 TB corpus pays
one scan + one shuffle for the complete funnel, versus the naive
k-passes-for-k-stages formulation.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def curation_funnel(
    df: DataFrame,
    predicates: list[tuple[str, Column]],
    token_count: Column,
    dedup_stage: tuple[str, Column] | None = None,
    dedup_order: str = "doc_id",
) -> DataFrame:
    """Cumulative stage-survival report.

    ``predicates``: ordered (stage_name, boolean Column) scan stages; a
    document survives stage k iff it passes predicates 1..k.
    ``dedup_stage``: optional final (stage_name, fingerprint Column) —
    among the survivors of the last scan stage, keeps the row with the
    smallest ``dedup_order`` per fingerprint (deterministic survivor,
    partition-layout independent).

    Returns one row per stage — (stage_idx, stage, n_docs, n_tokens) —
    with stage 0 = 'input'.
    """
    cums: list[tuple[str, Column]] = []
    acc = F.lit(True)
    for name, pred in predicates:
        acc = acc & pred
        cums.append((name, acc))

    work = df.select(
        "*",
        token_count.alias("__n_tok"),
        *[c.alias(f"__cum{i}") for i, (_, c) in enumerate(cums, 1)],
    )
    if dedup_stage is not None:
        name, fp = dedup_stage
        last = F.col(f"__cum{len(cums)}") if cums else F.lit(True)
        # min-order survivor among prior-stage survivors only: the
        # conditional min ignores already-dropped rows, so a dropped
        # earlier duplicate can never shadow a surviving one
        min_order = F.min(
            F.when(last, F.col(dedup_order))
        ).over(Window.partitionBy(fp))
        work = work.withColumn(
            f"__cum{len(cums) + 1}", last & (F.col(dedup_order) == min_order)
        )
        cums.append((name, F.col(f"__cum{len(cums) + 1}")))

    aggs = [
        F.count("*").alias("n0"),
        F.sum("__n_tok").cast("long").alias("t0"),
    ]
    for i in range(1, len(cums) + 1):
        c = F.col(f"__cum{i}")
        aggs.append(F.count_if(c).alias(f"n{i}"))
        aggs.append(
            F.coalesce(F.sum(F.when(c, F.col("__n_tok"))), F.lit(0))
            .cast("long")
            .alias(f"t{i}")
        )
    one = work.agg(*aggs)

    # 1-row input -> k+1 report rows: stack is a codegen generator, no
    # shuffle, and keeps the whole report a single job
    parts = ["0, 'input', n0, t0"]
    for i, (name, _) in enumerate(cums, 1):
        parts.append(f"{i}, '{name}', n{i}, t{i}")
    return one.select(
        F.expr(
            f"stack({len(cums) + 1}, {', '.join(parts)}) "
            "as (stage_idx, stage, n_docs, n_tokens)"
        )
    ).orderBy("stage_idx")
