"""span_digest_rows (the r15 Arrow span kernel) must be bit-identical to
the JVM tokens -> ngram_array -> posexplode -> md5 pipeline it replaced —
including the whitespace-class edge cases the tokenizer contract pins
(ASCII \\s only, strip-before-split, empty/NULL text)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from neo4j_to_clickhouse_spark.operators import dedup as D

# edge-heavy corpus: tab/newline/vertical-tab whitespace, leading and
# trailing runs, exactly-w and shorter-than-w docs, NULL and empty text,
# non-ASCII whitespace (U+00A0 must NOT split — it is not ASCII \s)
CORPUS = [
    (1, "a b c d e f g h i j"),
    (2, "a\tb\nc\x0bd\fe\rf g  h   i j"),
    (3, "  lead and trail  \t"),
    (4, "one two three"),  # shorter than w=4? no: 3 tokens < 4
    (5, "exactly four token doc"),
    (6, ""),
    (7, None),
    (8, "nbsp stays one token plus more words here"),
    (9, "a b c d e f g h i j"),  # duplicate of 1
]


def jvm_spans(df, w):
    return (
        df.select(
            F.col("doc_id").alias("id"), D.tokens("text").alias("__tk")
        )
        .select(
            "id",
            F.posexplode(D.ngram_array(F.col("__tk"), w)).alias(
                "start", "span_text"
            ),
        )
        .filter(F.col("span_text").isNotNull())
        .select("id", "start", F.md5("span_text").alias("span"))
    )


@pytest.fixture(scope="module")
def docs(spark):
    return spark.createDataFrame(CORPUS, "doc_id long, text string")


@pytest.mark.parametrize("w", [2, 4, 8])
def test_span_digest_rows_matches_jvm(spark, docs, w):
    a = sorted(map(tuple, jvm_spans(docs, w).collect()))
    b = sorted(
        map(
            tuple,
            D.span_digest_rows(
                docs, "doc_id", "text", w, with_start=True
            ).collect(),
        )
    )
    assert a == b
    assert len(a) > 0


def test_span_digest_rows_extras_passthrough(spark, docs):
    with_src = docs.withColumn(
        "source", F.concat(F.lit("s"), (F.col("doc_id") % 2).cast("string"))
    )
    rows = D.span_digest_rows(
        with_src, "doc_id", "text", 4, extras=("source",)
    ).collect()
    assert set(r.source for r in rows) <= {"s0", "s1"}
    # extras ride the same take indices as the ids
    for r in rows:
        assert r.source == f"s{r.doc_id % 2}"


def test_span_digest_rows_sf0001_matches_jvm(spark):
    df = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    a = sorted(map(tuple, jvm_spans(df, 8).collect()))
    b = sorted(
        map(
            tuple,
            D.span_digest_rows(
                df, "doc_id", "text", 8, with_start=True
            ).collect(),
        )
    )
    assert a == b
