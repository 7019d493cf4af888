"""Physical-plan guards: the scan-efficiency properties the engine's 100 TB
story depends on, asserted so a refactor can never silently lose them.

(The reference gets these from ClickHouse implicitly; here Catalyst provides
them ONLY while the plans stay declarative — a stray UDF or early collect
would break pushdown without failing any result-correctness test.)
"""

from __future__ import annotations

import pytest

from neo4j_to_clickhouse_spark.plans import QUERIES

SF = "/root/testdata/sf0.001"


def _plan(spark, name):
    df = QUERIES[name].spark(spark, SF)
    return df._jdf.queryExecution().executedPlan().toString()


def test_predicate_pushdown_reaches_scan(spark):
    plan = _plan(spark, "filter_event_type")
    assert "PushedFilters: [" in plan
    assert "EqualTo(event_type" in plan


def test_column_pruning_on_fact_scan(spark):
    """pricing_summary touches 5 of lineitem's columns; the scan schema
    must not include the rest (a full-width scan at 100 TB reads ~3x the
    bytes for nothing)."""
    plan = _plan(spark, "pricing_summary")
    read = plan.split("ReadSchema:", 1)[1].splitlines()[0]
    for col in ("l_quantity", "l_extendedprice", "l_returnflag"):
        assert col in read
    for col in ("l_orderkey", "l_partkey", "l_shipdate", "l_comment"):
        assert col not in read


def test_dimension_joins_broadcast(spark):
    """revenue_by_nation: the fact table streams, every dimension hop is a
    broadcast — no shuffle exchange on the fact side before the join."""
    plan = _plan(spark, "revenue_by_nation")
    assert plan.count("BroadcastHashJoin") >= 3
    assert "SortMergeJoin" not in plan


def test_topk_plans_as_take_ordered(spark):
    """Top-k must be TakeOrderedAndProject (per-partition heap), never a
    global Sort feeding a Limit."""
    plan = _plan(spark, "orders_per_customer_topk")
    assert "TakeOrderedAndProject" in plan


@pytest.mark.parametrize("name", ["latest_state_per_entity"])
def test_window_rank_limit_pushdown(spark, name):
    """The latest-state window must get the WindowGroupLimit optimization
    (per-partition rank pruning before the full window sort)."""
    plan = _plan(spark, name)
    assert "WindowGroupLimit" in plan


def test_stratified_sample_uses_window_group_limit(spark):
    """Per-stratum top-n must heap-prune in the shuffle read — a giant
    stratum is never fully sorted/materialized."""
    plan = _plan(spark, "sample_stratified_per_source")
    assert "WindowGroupLimit" in plan


def test_window_funnel_has_no_forced_broadcast(spark):
    """The funnel's inter-step join must not carry a broadcast HINT: with
    autoBroadcastJoinThreshold disabled a hint would still plan a
    BroadcastExchange (hints override the threshold), which at 10^8+ keys
    is a driver OOM. Hint-free, the disabled threshold must yield zero
    broadcast exchanges — proving broadcast is AQE's size-based choice,
    not forced."""
    conf = spark.conf
    keys = (
        "spark.sql.autoBroadcastJoinThreshold",
        "spark.sql.adaptive.autoBroadcastJoinThreshold",
    )
    saved = {k: conf.get(k, None) for k in keys}
    try:
        for k in keys:
            conf.set(k, "-1")
        plan = _plan(spark, "window_funnel_steps")
        assert "BroadcastExchange" not in plan
    finally:
        for k, v in saved.items():
            if v is None:
                conf.unset(k)
            else:
                conf.set(k, v)


def test_sequence_count_filter_pushes_to_scan(spark):
    """sequence_count must filter on the raw step predicates so the scan
    prunes non-step events (a case-when letter filter would not push)."""
    plan = _plan(spark, "sequence_count_histogram")
    assert "Or(EqualTo(event_type,signup),EqualTo(event_type,purchase))" in plan


def test_hash_sample_is_scan_side_filter(spark):
    """The Bernoulli hash filter must stay a stateless Filter over the
    scan: no shuffle exchange anywhere in the plan."""
    plan = _plan(spark, "sample_hash_fraction")
    before_sort = plan.split("Sort", 1)[0]  # output orderBy is test-only
    assert "Exchange hashpartitioning" not in before_sort


def test_triangle_count_known_graphs(spark):
    """K4 has 4 triangles; adding direction-duplicates/self-loops must not
    change the count; a hub star has none."""
    from neo4j_to_clickhouse_spark.operators.graph import triangle_count

    k4 = [(a, b) for a in range(4) for b in range(4) if a < b]
    noisy = k4 + [(b, a) for a, b in k4] + [(2, 2), (0, 1), (1, 0)]
    df = spark.createDataFrame(noisy, ["src", "dst"])
    assert triangle_count(df).collect()[0].n_triangles == 4
    star = spark.createDataFrame([(0, i) for i in range(1, 30)], ["src", "dst"])
    assert triangle_count(star).collect()[0].n_triangles == 0
    # two triangles sharing an edge
    bowtie = spark.createDataFrame(
        [(1, 2), (2, 3), (1, 3), (3, 4), (2, 4)], ["src", "dst"]
    )
    assert triangle_count(bowtie).collect()[0].n_triangles == 2


def test_pagerank_analytic_graphs(spark):
    """Two-node cycle -> equal ranks 0.5; directed star center receives
    all mass; ranks sum to ~1 with dangling handling."""
    from neo4j_to_clickhouse_spark.operators.graph import pagerank

    cycle = spark.createDataFrame([(1, 2), (2, 1)], ["src", "dst"])
    r = {x.node: x.rank for x in pagerank(cycle, iterations=20).collect()}
    assert abs(r[1] - 0.5) < 1e-9 and abs(r[2] - 0.5) < 1e-9
    # star: 1..4 all point at 0; 0 is dangling (its mass spreads evenly)
    star = spark.createDataFrame([(i, 0) for i in range(1, 5)], ["src", "dst"])
    rs = {x.node: x.rank for x in pagerank(star, iterations=30).collect()}
    assert abs(sum(rs.values()) - 1.0) < 1e-6
    assert rs[0] > rs[1]
    assert all(abs(rs[i] - rs[1]) < 1e-9 for i in (2, 3, 4))
    # python power-iteration reference on the star, 30 iters, d=0.85
    import numpy as np

    n, d = 5, 0.85
    M = np.zeros((n, n))
    for i in range(1, 5):
        M[0, i] = 1.0  # i -> 0 with outdeg 1
    v = np.full(n, 1 / n)
    for _ in range(30):
        dangling = v[0]  # node 0 has no out-edges
        v = (1 - d) / n + d * (M @ v + dangling / n)
    assert abs(rs[0] - v[0]) < 1e-9


def test_pii_redaction_is_scan_bound(spark):
    """The redaction rollup must be regexp expressions over the scan plus
    ONE aggregate exchange — no Python evaluator, no extra shuffle, and
    only the columns it needs read from parquet."""
    plan = _plan(spark, "pii_redaction_stats")
    for marker in ("BatchEvalPython", "ArrowEvalPython", "MapInPandas"):
        assert marker not in plan, f"Python in the redaction hot path: {marker}"
    assert plan.count("Exchange") <= 2, (
        "redaction rollup should shuffle once for the groupBy "
        "(+ optional final sort), found more exchanges"
    )
    read = plan.split("ReadSchema:", 1)[1].splitlines()[0]
    assert "text" in read and "lang" not in read and "n_chars" not in read


def test_chunk_documents_is_shuffle_free(spark):
    """The chunking operator is a pure scan-side posexplode — any
    Exchange in its plan means a refactor added a shuffle to what must
    stay an embarrassingly-parallel map at 100 TB."""
    from neo4j_to_clickhouse_spark.operators.text import chunk_documents

    docs = spark.read.parquet(f"{SF}/documents.parquet")
    plan = (
        chunk_documents(docs, "doc_id", "text", window=32, stride=24)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Exchange" not in plan


def test_state_intervals_single_key_shuffle(spark):
    """SCD2 interval build: both windows and the run-aggregate must ride
    ONE hashpartitioning(user_id) exchange — a second key shuffle means
    the window/group partitioning stopped lining up."""
    plan = _plan(spark, "state_interval_stats")
    key_shuffles = [
        ln
        for ln in plan.splitlines()
        if "Exchange hashpartitioning(user_id" in ln
    ]
    assert len(key_shuffles) == 1, plan


def test_quantization_shuffles_only_dim_rows(spark):
    """SQ8: the corpus-sized explode must never hit a shuffle — only the
    dims-sized range table exchanges (hash on dim + one broadcast back)."""
    plan = _plan(spark, "embedding_quantization_report")
    assert "BroadcastExchange" in plan
    for ln in plan.splitlines():
        if "Exchange hashpartitioning" in ln:
            assert "dim" in ln.split("Exchange hashpartitioning", 1)[1].split(",")[0], ln


def test_exists_shapes_compile_to_semi_and_anti_joins(spark):
    """EXISTS/NOT EXISTS must plan as single semi/anti hash joins with
    the predicate pushed to the orders scan — never a correlated
    re-scan or a distinct + inner join."""
    anti = _plan(spark, "customers_inactive_since")
    assert "LeftAnti" in anti
    semi = _plan(spark, "urgent_customers_by_segment")
    assert "LeftSemi" in semi
    assert "EqualTo(o_orderpriority,1-URGENT)" in semi  # pushed filter


def test_shipping_priority_pushes_segment_filter(spark):
    plan = _plan(spark, "shipping_priority")
    assert "EqualTo(c_mktsegment,BUILDING)" in plan


def test_revenue_forecast_pushes_all_predicates(spark):
    """Q6 shape: all four range predicates must reach the parquet scan
    (PushedFilters), and the scan schema must carry only the 4 touched
    columns — this is the query whose 100 TB cost is pure scan bytes.

    Uses formatted explain: executedPlan().toString() truncates long
    PushedFilters lists, hiding exactly the filters under test."""
    df = QUERIES["revenue_forecast"].spark(spark, SF)
    jvm = spark._jvm
    plan = df._jdf.queryExecution().explainString(
        jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
            "formatted"
        )
    )
    pushed = plan.split("PushedFilters:", 1)[1].splitlines()[0]
    for frag in (
        "GreaterThanOrEqual(l_shipdate",
        "LessThan(l_shipdate",
        "GreaterThanOrEqual(l_discount,0.05)",
        "LessThanOrEqual(l_discount,0.07)",
        "LessThan(l_quantity,24.0)",
    ):
        assert frag in pushed, plan
    read = plan.split("ReadSchema:", 1)[1].splitlines()[0]
    for col in ("l_orderkey", "l_returnflag", "l_tax"):
        assert col not in read


def test_token_zipf_top20_is_take_ordered(spark):
    """The Zipf head must come out of TakeOrderedAndProject (partial
    top-k per partition); the rank/cumsum window then runs over 20 rows
    only — a full corpus sort here would be a 100 TB string sort."""
    plan = _plan(spark, "token_zipf_coverage")
    assert "TakeOrderedAndProject" in plan


def test_column_profile_is_single_scan(spark):
    """The ANALYZE-style profiler must read the events parquet ONCE —
    36 aggregates in one pass, unpivoted via stack(), never one scan
    per column."""
    plan = _plan(spark, "column_profile_events")
    assert plan.count("Scan parquet") == 1, plan


def test_returned_item_revenue_prunes_and_heaps(spark):
    """Q10 shape: the returnflag filter must reach the fact scan and the
    top-20 must be a TakeOrderedAndProject heap, not a global sort."""
    plan = _plan(spark, "returned_item_revenue")
    assert "TakeOrderedAndProject" in plan
    assert "EqualTo(l_returnflag,R)" in plan


def test_large_order_customers_aggregates_before_join(spark):
    """Q18 shape: the quantity HAVING must run on the per-order
    pre-aggregate BEFORE any dim join — the join inputs are then
    survivor-sized. Guard: no SortMergeJoin (survivors broadcast under
    AQE at this SF) and the qty filter sits above a HashAggregate,
    not above a join."""
    plan = _plan(spark, "large_order_customers")
    assert "SortMergeJoin" not in plan


def test_top_brands_per_nation_prunes_per_group(spark):
    """Grouped top-k: the rank filter must reach WindowGroupLimit so a
    giant nation group heap-prunes in the shuffle read; all three dims
    broadcast (no SortMergeJoin on the fact path)."""
    plan = _plan(spark, "top_brands_per_nation")
    assert "WindowGroupLimit" in plan
    assert "SortMergeJoin" not in plan


def test_event_transition_single_user_shuffle(spark):
    """The Markov transition matrix must shuffle the log ONCE on
    user_id (lag window); the type-pair rollup is map-side combined on
    top of the windowed stream plus its own small exchange."""
    plan = _plan(spark, "event_transition_matrix")
    user_shuffles = [
        ln
        for ln in plan.splitlines()
        if "Exchange hashpartitioning(user_id" in ln
    ]
    assert len(user_shuffles) == 1, plan


def test_topk_words_per_source_window_group_limit(spark):
    """Grouped top-k over the exploded token stream must heap-prune per
    source (WindowGroupLimit) — a giant source never fully sorts."""
    plan = _plan(spark, "topk_words_per_source")
    assert "WindowGroupLimit" in plan


def test_registry_wide_plan_lint(spark):
    """Every registered query's physical plan, linted in one sweep:

    - NO CartesianProduct anywhere (the 1-row scalar crossJoins plan as
      broadcast nested-loop over a single row, never a cartesian of
      data-sized inputs);
    - Python evaluators (Arrow/pandas exchanges) appear ONLY in the
      documented vectorized-math operators — a stray per-row UDF in any
      other query is a 10-100x scale regression that no result-
      correctness test would catch.
    """
    allowed_python = {
        # Arrow-batched GEMM / sketch operators (docs/SCALING.md)
        "embedding_knn",
        "embedding_near_duplicates",
        "embedding_lsh_near_dup",
        "embedding_ivf_topk",
        "embedding_ivf_full_probe",
        "embedding_ivf_recall",
        "semantic_dedup_survivors",
        "topk_words_approx",
        # ISOBMFF container build+parse per selected doc (binary-payload
        # work, inherently Arrow-batched like the multimodal operators)
        "mp4_keyframe_stats",
        "multimodal_probe_stats",
        # WARC record framing + HTML extraction (byte-level parsing,
        # Arrow-batched by design — sources/warc.py, operators/html.py)
        "warc_ingest_stats",
        "html_extract_stats",
        "corpus_ingest_pipeline_stats",
        # per-row-charset strict decode (operators/charset.py —
        # resolution is codegen, only the decode itself is Arrow)
        "charset_decode_stats",
        # WET conversion-record framing + strict UTF-8 decode
        "wet_ingest_stats",
        # NFC composition (unicodedata) — the strip stage is codegen
        "unicode_normalize_stats",
        # zlib compression-ratio signal (bytes-level, Arrow map)
        "compression_ratio_flags",
        # ftfy-style double-encoding repair (codec round-trip, Arrow)
        "mojibake_repair_stats",
        # merge-rank BPE encode: iterative data-dependent merge loop
        # has no codegen expression form — one Arrow map with
        # broadcast merges + per-batch word cache (operators/bpe.py)
        "bpe_token_count_stats",
        # r14: byte-level GPT-2 lane — same Arrow map, published
        # pre-tokenizer + bytes-to-unicode inside the batch
        "bpe_byte_level_stats",
        # r15: the non-ASCII byte-level lane (same Arrow encode map)
        "bpe_byte_level_utf8_stats",
        # r15: broadcast-gather classifier scoring — buckets hash
        # JVM-side, the weight gather is the ONE Arrow stage (the
        # documented >100k-bucket path, operators/classifier.py)
        "quality_classifier_broadcast_stats",
        # r15 optimization round: span digests generate in one Arrow
        # kernel (dedup.span_digest_rows — the JVM zip_with chain runs
        # interpreted and measured 2x slower; digests bit-identical)
        "repeated_span_stats",
        "span_dedup_rewrite_stats",
        "cross_source_span_overlap",
    }
    py_markers = (
        "BatchEvalPython",
        "ArrowEvalPython",
        "MapInPandas",
        "MapInArrow",
        "FlatMapGroupsInPandas",
    )
    for name, spec in QUERIES.items():
        plan = (
            spec.spark(spark, SF)
            ._jdf.queryExecution()
            .executedPlan()
            .toString()
        )
        assert "CartesianProduct" not in plan, name
        if name not in allowed_python:
            for m in py_markers:
                assert m not in plan, f"{name}: unexpected {m}"


def test_tokenize_evaluated_once_per_ngram_scan(spark):
    """Token arrays are materialized in their own projection before
    ngram_array: the zip_with chain references its input 2(n-1) times
    and Catalyst's subexpression elimination does not reach through
    higher-order lambdas, so an inlined tokens() re-runs the regex
    tokenize per reference (round-8 fix: 2.5x on span generation at
    sf0.1). Guard: the optimized plan mentions the tokenize regex a
    bounded number of times, not once per zip_with stage."""
    import io
    import contextlib

    from neo4j_to_clickhouse_spark.operators.dedup import (
        repeated_span_report,
        word_shingles,
    )

    df = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    for build in (word_shingles, repeated_span_report):
        buf = io.StringIO()
        with contextlib.redirect_stdout(buf):
            build(df).explain("formatted")
        n = buf.getvalue().count("regexp_replace")
        assert n <= 4, (
            f"{build.__name__}: tokenize regex appears {n} times in the "
            "optimized plan — the token array is being re-evaluated "
            "inside the n-gram expression again (keep the pre-projection)"
        )


@pytest.mark.parametrize(
    "name", ["priority_sample_by_length", "priority_sample_estimator"]
)
def test_priority_sampling_is_take_ordered(spark, name):
    """Priority sampling's documented shape: scan-side md5 priorities +
    a TakeOrderedAndProject heap for the top-(k+1) — never a corpus-wide
    Sort/Exchange to rank the whole table (SURVEY §8 r08 queue entry)."""
    plan = _plan(spark, name)
    assert "TakeOrderedAndProject" in plan, name
