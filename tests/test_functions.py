"""Scalar / JSON function tests (SURVEY.md §2.8)."""

from __future__ import annotations

from pyspark.sql import functions as F

from neo4j_to_clickhouse_spark.functions import (
    human_readable_size,
    json_extract_array,
    json_extract_string,
    json_first_array_element,
    normalize_labels,
    operation_to_event_type,
    valid_json_or_empty,
)


def _one(spark, col, value=None):
    df = spark.createDataFrame([(value,)], ["v"]) if value is not None else spark.range(1)
    return df.select(col.alias("out")).first().out


def test_operation_mapping(spark):
    df = spark.createDataFrame(
        [("CREATE",), ("UPDATE",), ("DELETE",), ("MERGE",), (None,)], ["op"]
    )
    out = [r.out for r in df.select(operation_to_event_type("op").alias("out")).collect()]
    # multiIf default is INSERT (01-init-tables.sql:75-80)
    assert out == ["INSERT", "UPDATE", "DELETE", "INSERT", "INSERT"]


def test_normalize_labels_json_and_csv(spark):
    cases = {
        '["Device","Router"]': ["Device", "Router"],
        "Device, Router": ["Device", "Router"],
        "Device": ["Device"],
        "": [],
        "[not valid json": ["[not valid json"],  # '[' prefix but bad JSON -> empty
    }
    df = spark.createDataFrame([(k,) for k in cases], ["v"])
    got = {
        r.v: r.out
        for r in df.select("v", normalize_labels("v").alias("out")).collect()
    }
    assert got['["Device","Router"]'] == ["Device", "Router"]
    assert got["Device, Router"] == ["Device", "Router"]
    assert got["Device"] == ["Device"]
    assert got[""] == []
    assert got["[not valid json"] == []


def test_normalize_labels_drops_null_json_elements(spark):
    """'["a", null]' must not leak a NULL element into the label array —
    downstream explode/array_contains never expect NULL labels."""
    df = spark.createDataFrame(
        [('["a", null]',), ("[null]",), ('["a","b"]',)], ["v"]
    )
    got = [
        r.out
        for r in df.select(normalize_labels("v").alias("out")).collect()
    ]
    assert got == [["a"], [], ["a", "b"]]


def test_valid_json_or_empty(spark):
    df = spark.createDataFrame(
        [('{"a": 1}',), ("not json",), ("",), (None,)], ["v"]
    )
    out = [r.out for r in df.select(valid_json_or_empty("v").alias("out")).collect()]
    assert out == ['{"a": 1}', "{}", "{}", "{}"]


def test_json_extract(spark):
    v = '{"a": {"b": "x"}, "names": ["n1", "n2"]}'
    assert _one(spark, json_extract_string(F.col("v"), "a", "b"), v) == "x"
    assert _one(spark, json_extract_array(F.col("v"), "names"), v) == ["n1", "n2"]
    assert _one(spark, json_first_array_element(F.col("v"), "names"), v) == "n1"


def test_human_readable_size(spark):
    df = spark.createDataFrame([(512,), (2048,), (3 * 1024**2,)], ["v"])
    out = [r.out for r in df.select(human_readable_size("v").alias("out")).collect()]
    assert out == ["512 B", "2.0 KiB", "3.0 MiB"]


def test_cluster_conf_arithmetic():
    from neo4j_to_clickhouse_spark.session import cluster_conf

    c = cluster_conf(executors=1000, cores_per_executor=4, dataset_tb=100.0)
    # 100 TB full shuffle at ~1 GiB/partition needs >= 102400 partitions,
    # which dominates the 12000 core-waves floor
    assert int(c["spark.sql.shuffle.partitions"]) == 102400
    small = cluster_conf(executors=100, cores_per_executor=4, dataset_tb=1.0)
    # 1 TB: core-waves floor dominates (1200 > 1024)
    assert int(small["spark.sql.shuffle.partitions"]) == 1200
    assert c["spark.executor.instances"] == "1000"


def test_tfidf_by_group_exact_small_corpus(spark):
    """Hand-computed TF-IDF on a 3-doc corpus: rarer terms score higher,
    shared terms lower; smoothing keeps everything finite."""
    import math

    from neo4j_to_clickhouse_spark.operators.text import tfidf_by_group

    docs = spark.createDataFrame(
        [
            (1, "a a b", "s1"),
            (2, "a c", "s1"),
            (3, "a d", "s2"),
        ],
        ["doc_id", "text", "source"],
    )
    rows = {
        (r.source, r.term): r.tfidf
        for r in tfidf_by_group(docs, "doc_id", "text", "source").collect()
    }
    idf = lambda df: math.log(4 / (df + 1)) + 1  # N=3, smoothed  # noqa: E731
    # 'a' in all 3 docs: df=3; s1 docs: tf/len = 2/3 and 1/2
    exp_a_s1 = ((2 / 3) * idf(3) + (1 / 2) * idf(3)) / 2
    assert abs(rows[("s1", "a")] - exp_a_s1) < 1e-12
    # 'd' only in doc 3 (s2): df=1, tf/len = 1/2
    assert abs(rows[("s2", "d")] - (1 / 2) * idf(1)) < 1e-12
    # 'b' once in doc 1 (len 3): df=1, tf/len = 1/3
    assert abs(rows[("s1", "b")] - (1 / 3) * idf(1)) < 1e-12
    # the unique terms c and d carry identical profiles by symmetry
    assert abs(rows[("s1", "c")] - rows[("s2", "d")]) < 1e-12


def test_pack_sequences_concat_and_chunk(spark):
    """Hand-checked packing: docs of 3/4/2 tokens at budget 5 start at
    offsets 0/3/7 -> bins 0/0/1; shards pack independently."""
    from neo4j_to_clickhouse_spark.operators.text import pack_sequences

    df = spark.createDataFrame(
        [
            (1, "a b c", "s1"),        # start 0 -> bin 0, offset 0
            (2, "d e f g", "s1"),      # start 3 -> bin 0, offset 3
            (3, "h i", "s1"),          # start 7 -> bin 1, offset 2
            (10, "x y z w v", "s2"),   # start 0 -> bin 0, offset 0
            (11, "q", "s2"),           # start 5 -> bin 1, offset 0
        ],
        ["doc_id", "text", "source"],
    )
    rows = {
        r.doc_id: (r.pack_id, r.pack_offset)
        for r in pack_sequences(df, "source", "doc_id", "text", 5).collect()
    }
    assert rows == {1: (0, 0), 2: (0, 3), 3: (1, 2), 10: (0, 0), 11: (1, 0)}


def test_pack_token_sequences_materializes_windows(spark):
    """The emission sibling of pack_sequences: actual fixed-length id
    arrays, cross-doc boundaries split, trailing partial kept, shards
    independent, empty/NULL id arrays contribute nothing."""
    import pytest

    from neo4j_to_clickhouse_spark.operators.text import (
        pack_token_sequences,
    )

    df = spark.createDataFrame(
        [
            (1, "s1", [10, 11, 12]),
            (2, "s1", [13, 14, 15, 16]),
            (3, "s1", []),           # empty: no tokens, no shift
            (4, "s1", None),         # NULL: same
            (5, "s1", [17, 18]),
            (10, "s2", [90, 91, 92, 93, 94, 95]),
        ],
        "doc_id long, source string, token_ids array<long>",
    )
    got = {
        (r["source"], r["pack_id"]): r["token_ids"]
        for r in pack_token_sequences(
            df, "token_ids", "source", "doc_id", budget=5
        ).collect()
    }
    assert got == {
        ("s1", 0): [10, 11, 12, 13, 14],
        ("s1", 1): [15, 16, 17, 18],     # trailing partial kept
        ("s2", 0): [90, 91, 92, 93, 94],
        ("s2", 1): [95],
    }
    with pytest.raises(ValueError, match="budget"):
        pack_token_sequences(df, budget=0)


def test_pack_token_sequences_composes_with_bpe(spark):
    # text -> BPE ids -> packed training windows, end to end
    from neo4j_to_clickhouse_spark.operators.bpe import (
        bpe_encode,
        bpe_encode_word,
        bpe_merge_ranks,
        char_vocab,
    )
    from neo4j_to_clickhouse_spark.operators.text import (
        pack_token_sequences,
    )

    merges = [("t", "h"), ("th", "e")]
    vocab = char_vocab(merges, "abcdefghijklmnopqrstuvwxyz")
    ranks = bpe_merge_ranks(merges)
    texts = [(0, "g", "the cat"), (1, "g", "at the mat")]
    df = spark.createDataFrame(
        texts, "doc_id long, source string, text string"
    )
    enc = bpe_encode(df, "text", merges, vocab)
    packed = pack_token_sequences(
        enc, "token_ids", "source", "doc_id", budget=4
    ).collect()
    flat_got = [
        i
        for r in sorted(packed, key=lambda r: r["pack_id"])
        for i in r["token_ids"]
    ]
    flat_want = [
        vocab[p]
        for _, _, t in texts
        for w in t.split()
        for p in bpe_encode_word(w, ranks)
    ]
    assert flat_got == flat_want
    assert all(len(r["token_ids"]) <= 4 for r in packed)
