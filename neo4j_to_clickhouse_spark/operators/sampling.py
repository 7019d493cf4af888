"""Deterministic sampling operators for training-data curation (north star).

Corpus assembly needs *reproducible* samples — a rerun must pick the same
documents, across engines, across partitionings, across cluster sizes.
Spark's ``df.sample`` is seeded per-partition, so its output changes with
the physical split layout; these operators instead derive every keep/drop
decision from a content-stable hash of the row's key (md5 — the one hash
both Spark and any ANSI oracle compute identically), making the sample a
pure function of the data.

Scale shapes:
- :func:`hash_sample` is a stateless filter — pushes into the scan, zero
  shuffle, embarrassingly parallel at any corpus size.
- :func:`stratified_sample` is one hash shuffle on the stratum key + a
  rank window whose ``rn <= n`` filter Spark pushes into the shuffle read
  as WindowGroupLimit — per-stratum top-n never materializes whole strata.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def _hash_key(key: Column | str) -> Column:
    c = F.col(key) if isinstance(key, str) else key
    return F.md5(c.cast("string"))


def md5_u32(c: Column) -> Column:
    """First 8 hex chars of md5 as a 32-bit unsigned value (long) — THE
    cross-engine deterministic hash number (DuckDB mirror:
    ``('0x' || substr(md5(x), 1, 8))::BIGINT``). Shared by the sampling
    thresholds here, the classifier's feature hashing, and oracle-paired
    queries — one definition so the idiom cannot drift."""
    return F.conv(F.substring(F.md5(c), 1, 8), 16, 10).cast("long")


def hash_sample(
    df: DataFrame, key_col: str, fraction: float
) -> DataFrame:
    """Deterministic Bernoulli sample: keep a row iff the first 8 hex chars
    of ``md5(key)`` fall below ``fraction`` of the 32-bit hex space.

    The comparison is *lexicographic on lowercase hex strings*, which
    orders identically to the numeric value — so any engine that can md5 a
    string reproduces the exact member set. Expected (not exact) sample
    size = fraction * n; the deviation is O(sqrt(n)) as for any Bernoulli
    design.
    """
    if not 0.0 <= fraction <= 1.0:
        raise ValueError(f"fraction must be in [0, 1], got {fraction}")
    t = int(round(fraction * 16**8))
    if t >= 16**8:
        # fraction ~1.0: the threshold would be the 9-char string
        # '100000000', and '08x' hex strings compare lexicographically
        # AGAINST it char-by-char — 'f…' > '1…' would silently drop ~15/16
        # of rows. Keep-everything is what fraction=1 means.
        return df
    threshold = format(t, "08x")
    return df.filter(F.substring(_hash_key(key_col), 1, 8) < F.lit(threshold))


def stratified_sample(
    df: DataFrame, strata_col: str, key_col: str, n_per_stratum: int
) -> DataFrame:
    """Exactly ``n_per_stratum`` rows per stratum (fewer if the stratum is
    smaller), chosen as the lowest md5(key) values — a deterministic
    uniform draw with a closed-form member set any engine reproduces.

    The rank window's ``<= n`` filter becomes WindowGroupLimit: each
    shuffle-read task keeps a per-stratum heap of n rows, so giant strata
    are never fully sorted or materialized.
    """
    if n_per_stratum < 1:
        raise ValueError(
            f"n_per_stratum must be >= 1, got {n_per_stratum}"
        )
    w = Window.partitionBy(strata_col).orderBy(
        _hash_key(key_col), F.col(key_col)
    )
    return (
        df.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") <= n_per_stratum)
        .drop("__rn")
    )


def hash_split(
    df: DataFrame,
    key_col: str,
    fractions: dict[str, float],
    label_col: str = "split",
) -> DataFrame:
    """Deterministic dataset split (train/val/test): label each row by
    which md5(key) range its hash falls into — disjoint, exhaustive, and
    a pure function of the data, so the same row lands in the same split
    on any engine, any partitioning, any rerun (the property
    ``df.randomSplit`` lacks: its per-partition seeding reshuffles
    membership whenever the physical layout changes).

    ``fractions`` maps label -> fraction; must sum to 1 (±1e-9). Ranges
    are allocated in the given insertion order over the first 8 hex chars
    of the hash. Stateless filter, zero shuffle, scan-bound.
    """
    total = sum(fractions.values())
    if abs(total - 1.0) > 1e-9:
        raise ValueError(f"fractions must sum to 1, got {total}")
    if any(f < 0 for f in fractions.values()):
        raise ValueError("fractions must be non-negative")
    bounds, acc = [], 0.0
    for label, frac in fractions.items():
        acc += frac
        # None = "rest of the hash space": a cumulative bound at/above
        # 16^8 cannot be compared lexicographically against the 8-char
        # hash (the 9-char literal breaks char-by-char ordering — same
        # pitfall hash_sample documents for fraction=1)
        t = int(round(acc * 16**8))
        bounds.append((label, format(t, "08x") if t < 16**8 else None))
    h = F.substring(_hash_key(key_col), 1, 8)
    # when-chain from the FIRST range up: each row takes the first bound
    # its hash falls under. The first label whose cumulative bound
    # saturates the space absorbs everything remaining (later labels are
    # empty by construction), and any float-rounding sliver at the very
    # top of the space folds into the terminal label too.
    expr = None
    terminal = bounds[-1][0]
    for label, upper in bounds:
        if upper is None:
            terminal = label
            break
        cond = h < F.lit(upper)
        expr = F.when(cond, label) if expr is None else expr.when(cond, label)
    return df.withColumn(
        label_col,
        F.lit(terminal) if expr is None else expr.otherwise(terminal),
    )


def temperature_sample(
    df: DataFrame,
    strata_col: str,
    key_col: str,
    target_rows: int,
    alpha: float = 0.5,
) -> DataFrame:
    """Temperature-weighted stratified sample: per-stratum quota
    proportional to ``n_s^alpha``, normalized to ~``target_rows`` total —
    the source-mixing rule public LLM pipelines use to upweight small,
    high-quality sources against giant crawls. ``alpha=1`` reduces to
    proportional sampling, ``alpha=0`` to equal-per-source; quotas are
    ``max(1, floor(target * n_s^alpha / sum n^alpha))`` so no stratum is
    ever silenced entirely.

    Deterministic like its siblings: within each stratum the quota is
    filled by ascending ``md5(key)`` — a pure function of the data. Scale
    shape: one tiny count aggregate (rows = #strata) rejoined hint-free
    (AQE broadcasts it), then the same single rank-window shuffle as
    :func:`stratified_sample`; the quota filter is per-row against the
    joined column, so no full stratum ever materializes downstream.
    """
    if target_rows < 1:
        raise ValueError(f"target_rows must be >= 1, got {target_rows}")
    if alpha < 0:
        raise ValueError(f"alpha must be >= 0, got {alpha}")
    counts = df.groupBy(strata_col).agg(F.count("*").alias("__n"))
    z = counts.agg(F.sum(F.pow("__n", F.lit(alpha))).alias("__z"))
    quotas = counts.crossJoin(z).select(
        strata_col,
        F.greatest(
            F.lit(1),
            F.floor(
                F.lit(target_rows) * F.pow("__n", F.lit(alpha)) / F.col("__z")
            ),
        ).alias("__quota"),
    )
    w = Window.partitionBy(strata_col).orderBy(
        _hash_key(key_col), F.col(key_col)
    )
    return (
        df.withColumn("__rn", F.row_number().over(w))
        .join(quotas, strata_col)
        .filter(F.col("__rn") <= F.col("__quota"))
        .drop("__rn", "__quota")
    )


def priority_sample(
    df: DataFrame, key_col: str, weight_col: str, k: int
) -> DataFrame:
    """Weighted sampling without replacement by PRIORITY SAMPLING
    (Duffield-Lund-Thorup): each row gets priority ``q = w / u`` with a
    deterministic hash uniform ``u ∈ (0, 1]``, and the k highest
    priorities win — heavy rows are proportionally likelier, every run
    and every engine draws the SAME sample (u comes from md5(key), not
    an RNG), and the scheme supports unbiased subset-sum estimation.

    All arithmetic is cross-engine exact: the first 8 md5 hex chars
    parse to one 32-bit integer, and ``(hx + 1) / 2^32`` and ``w / u``
    are single correctly-rounded IEEE divisions.

    Scale shape: priorities are scan-side expressions; the top-k is
    TakeOrderedAndProject (per-partition heaps, k rows to the driver
    merge) — no sort, no shuffle of the corpus.

    Returns the winning rows plus ``priority``.
    """
    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")
    hx = md5_u32(F.col(key_col).cast("string")).cast("double")
    u = (hx + F.lit(1.0)) / F.lit(float(16**8))
    q = F.col(weight_col).cast("double") / u
    return (
        df.withColumn("priority", q)
        .orderBy(F.col("priority").desc(), F.col(key_col))
        .limit(k)
    )


def mixture_rates(
    df: DataFrame,
    group_col: str,
    weight: Column | dict[str, float],
    token_budget: int,
    token_col: Column | str,
) -> DataFrame:
    """Per-group keep-rates that hit a target token mixture: group ``g``
    should contribute ``token_budget * w_g`` tokens, so its Bernoulli
    keep-rate is ``min(1, (budget * w_g) / tokens_g)`` — the Pile/Dolma
    mixture-planning step, computed distributed (one tiny aggregate, no
    driver round-trip).

    ``weight`` is either a dict ``{group value -> weight}`` (groups
    absent from the dict get weight 0 = dropped) or a Column expression
    over ``group_col`` for formula-derived weights. Output:
    ``(group_col, mixture_rate)`` — rows ∝ groups, always broadcastable.

    Determinism: the rate is two correctly-rounded double ops
    (multiply, divide) on exact integer token sums, so any engine
    reproduces it bit-for-bit (the certified oracle recomputes it).
    """
    if isinstance(weight, dict):
        w: Column = F.lit(0.0)
        for k, v in weight.items():
            w = F.when(F.col(group_col) == k, F.lit(float(v))).otherwise(w)
    else:
        w = weight
    t = F.col(token_col) if isinstance(token_col, str) else token_col
    tok = df.groupBy(group_col).agg(
        F.sum(t).cast("long").alias("__tok")
    )
    # a zero-token group needs the division guarded: weight 0 there
    # computes 0.0/0.0 = NaN, and least(1.0, NaN) is 1.0 in Spark's
    # ordering — the group would be KEPT in full instead of dropped as
    # the dict contract ("weight 0 = dropped") states. Zero tokens with
    # a POSITIVE weight keeps the group in full (rate 1.0): its rows
    # cost nothing against the token budget.
    return tok.select(
        group_col,
        F.when(
            F.col("__tok") > 0,
            F.least(
                F.lit(1.0),
                (F.lit(float(token_budget)) * w)
                / F.col("__tok").cast("double"),
            ),
        )
        .otherwise(
            F.when(w > F.lit(0.0), F.lit(1.0)).otherwise(F.lit(0.0))
        )
        .alias("mixture_rate"),
    )


def budget_mixture(
    df: DataFrame,
    group_col: str,
    key_col: str,
    weight: Column | dict[str, float],
    token_budget: int,
    token_col: Column | str,
) -> DataFrame:
    """Deterministic token-budget mixture sample: compute
    :func:`mixture_rates`, broadcast them back, and keep a row iff its
    32-bit md5 hash value falls under ``floor(rate * 2^32)`` — the
    numeric-threshold form of :func:`hash_sample` (needed here because
    the rate is a *column*, not a literal). The kept rows carry their
    group's ``mixture_rate``.

    Scale shape: one partial-aggregated token count per group + one
    broadcast join; the keep decision is a scan-side filter — the
    corpus never shuffles, and reruns pick the same documents on any
    partitioning (hash of the key, not of the split).
    """
    rates = mixture_rates(df, group_col, weight, token_budget, token_col)
    hash_num = md5_u32(F.col(key_col).cast("string"))
    thresh = F.floor(
        F.col("mixture_rate") * F.lit(4294967296.0)
    ).cast("long")
    return df.join(F.broadcast(rates), group_col).filter(
        hash_num < thresh
    )
