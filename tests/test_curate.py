"""curation_funnel semantics (operators/curate.py).

The oracle certifies the registered funnel on the fixture; these pin the
operator contract on adversarial micro-corpora: cumulative (not
independent) stage semantics, deterministic min-order dedup survivors,
dedup scoped to prior-stage survivors, and the degenerate
no-scan-stages form.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from neo4j_to_clickhouse_spark.operators.curate import curation_funnel


def _rows(df):
    return {r["stage"]: (r["n_docs"], r["n_tokens"]) for r in df.collect()}


def test_stages_are_cumulative(spark):
    df = spark.createDataFrame(
        [(1, "a b", 1), (2, "a b", 0), (3, "x y", 1), (4, "x y", 0)],
        ["doc_id", "text", "flag"],
    )
    out = _rows(
        curation_funnel(
            df,
            predicates=[
                ("has_a", F.col("text").startswith("a")),
                ("flagged", F.col("flag") == 1),
            ],
            token_count=F.lit(2),
        )
    )
    assert out["input"] == (4, 8)
    assert out["has_a"] == (2, 4)
    # doc 3 is flagged but failed has_a: cumulative semantics keep only doc 1
    assert out["flagged"] == (1, 2)


def test_dedup_keeps_min_order_among_survivors(spark):
    # docs 1,2,3 share a fingerprint; doc 1 fails the scan stage, so the
    # survivor must be doc 2 (min order among stage survivors), never the
    # already-dropped doc 1 shadowing it
    df = spark.createDataFrame(
        [(1, "dup", False), (2, "dup", True), (3, "dup", True),
         (4, "uniq", True)],
        ["doc_id", "text", "keep"],
    )
    out = curation_funnel(
        df,
        predicates=[("keep", F.col("keep"))],
        token_count=F.lit(1),
        dedup_stage=("uniq", F.col("text")),
    )
    by_stage = _rows(out)
    assert by_stage["keep"] == (3, 3)
    assert by_stage["uniq"] == (2, 2)  # doc 2 survives for "dup", doc 4 for "uniq"


def test_zero_survivor_stage_reports_zero_tokens(spark):
    df = spark.createDataFrame([(1, "x")], ["doc_id", "text"])
    out = _rows(
        curation_funnel(
            df,
            predicates=[("none", F.lit(False))],
            token_count=F.lit(7),
        )
    )
    assert out["input"] == (1, 7)
    assert out["none"] == (0, 0)


def test_dedup_only_funnel(spark):
    df = spark.createDataFrame(
        [(2, "same"), (1, "same"), (3, "other")], ["doc_id", "text"]
    )
    out = _rows(
        curation_funnel(
            df,
            predicates=[],
            token_count=F.lit(1),
            dedup_stage=("uniq", F.col("text")),
        )
    )
    assert out["input"] == (3, 3)
    assert out["uniq"] == (2, 2)


def test_report_row_order_and_schema(spark):
    df = spark.createDataFrame([(1, "x")], ["doc_id", "text"])
    out = curation_funnel(
        df, predicates=[("p", F.lit(True))], token_count=F.lit(1)
    )
    assert out.columns == ["stage_idx", "stage", "n_docs", "n_tokens"]
    assert [r["stage_idx"] for r in out.collect()] == [0, 1]


# --- lexicon flag + domain blocklist ------------------------------------------


def test_lexicon_hits_and_ratio(spark):
    from neo4j_to_clickhouse_spark.operators.curate import flag_lexicon

    df = spark.createDataFrame(
        [
            (1, "clean words only here"),
            (2, "some BadWordX in CAPS and badwordx again"),
            (3, ""),
        ],
        "id long, text string",
    )
    out = {
        r["id"]: (r["lexicon_hits"], r["lexicon_flagged"])
        for r in flag_lexicon(
            df, "text", ("badwordx", "badwordy")
        ).collect()
    }
    assert out[1] == (0, False)
    assert out[2] == (2, True)  # case-insensitive, repeats counted
    assert out[3] == (0, False)


def test_lexicon_ratio_threshold(spark):
    from neo4j_to_clickhouse_spark.operators.curate import flag_lexicon

    # 1 hit over 10 tokens = 0.1: flagged at max_ratio 0.05, not at 0.2
    df = spark.createDataFrame(
        [(1, "badwordx " + " ".join(f"w{i}" for i in range(9)))],
        "id long, text string",
    )
    hi = flag_lexicon(df, "text", ("badwordx",), max_ratio=0.2)
    lo = flag_lexicon(df, "text", ("badwordx",), max_ratio=0.05)
    assert hi.first()["lexicon_flagged"] is False
    assert lo.first()["lexicon_flagged"] is True


def test_domain_suffixes_chain(spark):
    from neo4j_to_clickhouse_spark.operators.curate import domain_suffixes

    df = spark.createDataFrame(
        [("a.b.example.com",), ("example.com",), ("localhost",)],
        "h string",
    )
    got = [
        sorted(r["s"])
        for r in df.select(domain_suffixes("h").alias("s")).collect()
    ]
    assert got[0] == sorted(
        ["com", "example.com", "b.example.com", "a.b.example.com"]
    )
    assert got[1] == sorted(["com", "example.com"])
    assert got[2] == ["localhost"]


def test_flag_blocked_domains_parent_and_exact(spark):
    from neo4j_to_clickhouse_spark.operators.curate import (
        flag_blocked_domains,
    )

    df = spark.createDataFrame(
        [
            (1, "ads.example.com"),    # parent match on example.com
            (2, "example.com"),        # exact match
            (3, "goodsite.org"),       # no match
            (4, "example.com.evil.io"),  # example.com NOT a suffix
            (5, "deep.a.b.c.d.e.tracker.net"),  # deeper than 6 labels
        ],
        "id long, host string",
    )
    bl = spark.createDataFrame(
        [("example.com",), ("tracker.net",)], "domain string"
    )
    got = {
        r["id"]: r["domain_blocked"]
        for r in flag_blocked_domains(df, "host", bl).collect()
    }
    assert got == {1: True, 2: True, 3: False, 4: False, 5: True}


def test_flag_blocked_domains_plan_is_broadcast(spark):
    from neo4j_to_clickhouse_spark.operators.curate import (
        flag_blocked_domains,
    )

    df = spark.range(100).select(
        F.concat(F.lit("h"), F.col("id").cast("string"), F.lit(".x.test"))
        .alias("host")
    )
    bl = spark.createDataFrame([("x.test",)], "domain string")
    plan = (
        flag_blocked_domains(df, "host", bl)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan


def test_flag_blocked_domains_full_host_beyond_max_levels(spark):
    from neo4j_to_clickhouse_spark.operators.curate import (
        flag_blocked_domains,
    )

    # 8-label host, its EXACT name blocklisted, no shorter entry:
    # level-0 (full host) probe must match (regression)
    host = "a.b.c.d.e.f.example.com"
    df = spark.createDataFrame([(1, host)], "id long, host string")
    bl = spark.createDataFrame([(host,)], "domain string")
    assert flag_blocked_domains(df, "host", bl).first()["domain_blocked"]
