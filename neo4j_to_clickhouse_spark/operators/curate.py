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


# ---------------------------------------------------------------------
# Lexicon flags + domain blocklist (the C4/FineWeb exclusion stages)
# ---------------------------------------------------------------------

def lexicon_hits(text: Column | str, lexicon: tuple[str, ...]) -> Column:
    """Occurrences of any lexicon word among lowercased whitespace
    tokens — the C4 "bad words" / FineWeb adult-content signal, as flat
    per-word codegen counts (``text._marker_hits``; no interpreted
    lambdas). Lexicon words must be distinct and lowercase."""
    from neo4j_to_clickhouse_spark.operators.text import (
        _marker_hits,
        tokens,
    )

    c = F.col(text) if isinstance(text, str) else text
    return _marker_hits(tokens(F.lower(c)), lexicon)


def lexicon_ratio(
    text: Column | str,
    lexicon: tuple[str, ...],
    hits: Column | None = None,
) -> Column:
    """Fraction of tokens that are lexicon words (0 for empty text).
    Pass a precomputed :func:`lexicon_hits` column via ``hits`` to share
    the marker-expression tree with other uses of the count."""
    from neo4j_to_clickhouse_spark.operators.text import tokens

    c = F.col(text) if isinstance(text, str) else text
    if hits is None:
        hits = lexicon_hits(c, lexicon)
    return hits / F.greatest(F.size(tokens(c)), F.lit(1))


def flag_lexicon(
    df: DataFrame,
    text_col: str,
    lexicon: tuple[str, ...],
    max_ratio: float = 0.0,
    flag_col: str = "lexicon_flagged",
) -> DataFrame:
    """Flag documents whose lexicon-word token ratio EXCEEDS
    ``max_ratio`` (default 0: any hit flags — the C4 rule). Adds
    ``flag_col`` (bool) and ``lexicon_hits`` (long); pure scan-side
    expressions, zero shuffle at any corpus size."""
    hits = lexicon_hits(text_col, lexicon)
    ratio = lexicon_ratio(text_col, lexicon, hits=hits)
    return df.withColumn("lexicon_hits", hits).withColumn(
        flag_col, ratio > F.lit(float(max_ratio))
    )


def _suffix_probes(c: Column, max_levels: int) -> list[Column]:
    """Full host + its last 1..max_levels dot-suffixes, as flat
    ``substring_index`` expressions (no lambdas) — the probe set both
    :func:`domain_suffixes` and :func:`flag_blocked_domains` share."""
    return [c] + [
        F.substring_index(c, ".", -i) for i in range(1, max_levels + 1)
    ]


def domain_suffixes(host: Column | str, max_levels: int = 6) -> Column:
    """The dot-suffix chain of a host as an array —
    ``a.b.example.com -> [com, example.com, b.example.com,
    a.b.example.com]`` (deduped; hosts deeper than ``max_levels``
    match on their last ``max_levels`` labels plus the full host)."""
    c = F.col(host) if isinstance(host, str) else host
    return F.array_distinct(F.array(*_suffix_probes(c, max_levels)))


def flag_blocked_domains(
    df: DataFrame,
    host_col: str,
    blocklist: DataFrame,
    max_levels: int = 6,
    flag_col: str = "domain_blocked",
) -> DataFrame:
    """Flag rows whose host matches a blocklist entry exactly OR as a
    parent domain (``ads.example.com`` is blocked by an ``example.com``
    entry) — the URL-exclusion stage every web pipeline runs first
    (adult/spam domain lists are ~10^5-10^6 entries).

    Scale shape: one broadcast LEFT JOIN per suffix level (default 6)
    against the one-column ``blocklist`` (col: ``domain``) — the corpus
    side never shuffles and never explodes, so cost is K hash probes
    per row; the blocklist broadcasts once per join. No literal-array
    plan bloat: the list stays a DataFrame, so a million-entry list is
    a normal broadcast, not a 10 MB plan constant.
    """
    c = F.col(host_col)
    out = df
    flags = []
    # one canonical broadcast frame joined per level (the per-level
    # rename happens AFTER the join, keeping every build side the same
    # subtree — AQE's broadcast-stage cache can then reuse the built
    # list across levels at runtime)
    bl = F.broadcast(
        blocklist.select(
            F.col(blocklist.columns[0]).alias("__bl")
        ).distinct()
    )
    probes = _suffix_probes(c, max_levels)
    for i, suf in enumerate(probes):
        out = out.join(bl, suf == bl["__bl"], "left").withColumnRenamed(
            "__bl", f"__m{i}"
        )
        flags.append(F.col(f"__m{i}").isNotNull())
    blocked = flags[0]
    for f in flags[1:]:
        blocked = blocked | f
    return out.withColumn(flag_col, blocked).drop(
        *[f"__m{i}" for i in range(len(probes))]
    )
