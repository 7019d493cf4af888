"""Line-level corpus cleanup (operators/lines.py): C4 rules +
cross-document frequent-line removal."""

from pyspark.sql import functions as F

from neo4j_to_clickhouse_spark.operators.lines import (
    c4_doc_keep,
    c4_line_filter,
    c4_line_keep,
    line_dedup_rewrite,
)


def test_line_dedup_removes_boilerplate(spark):
    banner = "Accept cookies."
    docs = spark.createDataFrame(
        [
            (1, f"unique one.\n{banner}"),
            (2, f"{banner}\nunique two."),
            (3, f"unique three.\n{banner}\nmiddle line."),
            (4, banner),  # all lines frequent -> doc drops out
        ],
        "doc_id int, text string",
    )
    got = {
        r.doc_id: (r.text, r.n_lines)
        for r in line_dedup_rewrite(docs, min_count=3).collect()
    }
    assert got == {
        1: ("unique one.", 1),
        2: ("unique two.", 1),
        3: ("unique three.\nmiddle line.", 2),
    }


def test_line_dedup_preserves_order(spark):
    docs = spark.createDataFrame(
        [(1, "alpha first.\nbeta second.\ngamma third.")],
        "doc_id int, text string",
    )
    out = line_dedup_rewrite(docs, min_count=3).collect()[0]
    assert out.text == "alpha first.\nbeta second.\ngamma third."


def test_c4_line_rules(spark):
    df = spark.createDataFrame(
        [
            ("ends with period and words.",),
            ("short.",),                       # < 3 words
            ("no terminal punctuation",),      # no punct
            ("Enable JavaScript to proceed.",),  # javascript
            ('he said "stop right there!"',),  # quote terminal: keep
        ],
        "line string",
    )
    got = [
        r.k
        for r in df.select(c4_line_keep(F.col("line")).alias("k")).collect()
    ]
    assert got == [True, False, False, False, True]


def test_c4_doc_rules(spark):
    df = spark.createDataFrame(
        [("clean page.",), ("var x = { a: 1 };",), ("Lorem Ipsum dolor.",)],
        "text string",
    )
    got = [
        r.k
        for r in df.select(c4_doc_keep(F.col("text")).alias("k")).collect()
    ]
    assert got == [True, False, False]


def test_c4_filter_rebuild(spark):
    docs = spark.createDataFrame(
        [
            (1, "Good long sentence here.\nbad\nAnother keeper stays in."),
            (2, "only { braces } here."),  # doc-level drop
            (3, "nothing survives"),       # all lines fail -> drops out
        ],
        "doc_id int, text string",
    )
    got = {
        r.doc_id: r.text for r in c4_line_filter(docs).collect()
    }
    assert got == {
        1: "Good long sentence here.\nAnother keeper stays in."
    }


def test_codegen_only(spark):
    docs = spark.createDataFrame([(1, "a.\nb.")], "doc_id int, text string")
    for df in (line_dedup_rewrite(docs), c4_line_filter(docs)):
        plan = df._jdf.queryExecution().executedPlan().toString()
        for marker in ("BatchEvalPython", "ArrowEvalPython", "MapInPandas"):
            assert marker not in plan
