"""Unicode normalization (operators/textnorm.py): NFC composition +
control/format stripping, engine-shared regex constant."""

import unicodedata

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from neo4j_to_clickhouse_spark.operators.textnorm import (
    normalize_text_column,
    strip_ctrl_format,
)


def _norm(spark, texts, **kw):
    df = spark.createDataFrame([(t,) for t in texts], "t string")
    return [
        r.n
        for r in normalize_text_column(df, "t", out_col="n", **kw)
        .select("n")
        .collect()
    ]


def test_nfc_composes(spark):
    # NFD e + combining acute -> precomposed é; idempotent on NFC input
    assert _norm(spark, ["Café", "Café"]) == ["Café", "Café"]


def test_control_and_format_strip(spark):
    got = _norm(
        spark,
        [
            "a\x00b\x07c",            # C0 controls
            "keep\tthese\ntwo\rseps",  # \t\n\r survive
            "z​w‍j﻿",   # zero-width + BOM
            "dir‪marks‮",    # bidi embeds
            "tag\U000E0041chars",      # astral TAG block
            "soft­hyphen",
        ],
    )
    assert got == [
        "abc",
        "keep\tthese\ntwo\rseps",
        "zwj",
        "dirmarks",
        "tagchars",
        "softhyphen",
    ]


def test_collapse_ws(spark):
    assert _norm(spark, ["  a \t b\n\nc  "], collapse_ws=True) == [
        "a b c"
    ]


def test_strip_is_codegen_only(spark):
    df = spark.createDataFrame([("x",)], "t string")
    plan = (
        df.select(strip_ctrl_format("t"))
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    for marker in ("BatchEvalPython", "ArrowEvalPython", "MapInPandas"):
        assert marker not in plan


# characters drawn from the stripped ranges + ordinary text
_STRIPPED = [
    "\x01", "\x08", "\x0b", "\x1f", "\x7f", "\x9f", "­",
    "​", "‎", "‪", "⁠", "⁦", "﻿",
    "￹", "\U000110BD", "\U0001BCA0", "\U0001D173", "\U000E0020",
    "\U000E007F",
]


@settings(
    max_examples=25,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    st.lists(
        st.one_of(
            st.sampled_from(_STRIPPED),
            st.text(
                alphabet=st.characters(
                    blacklist_categories=("Cs",), max_codepoint=0x2FFF
                ),
                max_size=6,
            ),
        ),
        max_size=8,
    )
)
def test_strip_matches_category_reference(spark, parts):
    """The regex class must agree with the Unicode-category definition
    (Cc minus tab/newline/CR, plus Cf) on arbitrary inputs."""
    s = "".join(parts)

    def ref(t: str) -> str:
        return "".join(
            ch
            for ch in t
            if not (
                unicodedata.category(ch) in ("Cc", "Cf")
                and ch not in "\t\n\r"
            )
        )

    df = spark.createDataFrame([(s,)], "t string")
    got = df.select(strip_ctrl_format("t").alias("n")).collect()[0].n
    assert got == ref(s)


def test_compression_ratio_signal(spark):
    from neo4j_to_clickhouse_spark.operators.text import (
        compression_ratio_column,
    )

    df = spark.createDataFrame(
        [
            ("rep", "spam " * 50),
            ("prose", "The quick brown fox jumps over the lazy dog near the river bank."),
            ("hex", __import__("hashlib").md5(b"0").hexdigest().join(
                __import__("hashlib").md5(str(i).encode()).hexdigest()
                for i in range(8)
            )),
            ("empty", ""),
            ("null", None),
        ],
        "k string, t string",
    )
    got = {
        r.k: r.ratio
        for r in compression_ratio_column(df, "t", "ratio").collect()
    }
    assert got["rep"] < 0.2
    assert got["hex"] > 0.35
    assert 0.2 < got["prose"] < 1.2  # short prose barely compresses
    assert got["empty"] is None
    assert got["null"] is None


def test_fix_double_utf8(spark):
    from neo4j_to_clickhouse_spark.operators.textnorm import (
        fix_double_utf8,
    )

    cases = [
        ("ascii", "plain ascii text", "plain ascii text"),
        # utf-8('caf\u00e9') read as latin-1
        ("latin1-moji", "caf\u00c3\u00a9", "caf\u00e9"),
        # utf-8 smart quote read as cp1252
        ("cp1252-moji", "don\u00e2\u20ac\u2122t", "don\u2019t"),
        # GENUINE accents must survive untouched
        ("real-latin1", "caf\u00e9 r\u00e9sum\u00e9", "caf\u00e9 r\u00e9sum\u00e9"),
        # CJK (not latin-1 encodable) untouched
        ("cjk", "\u6c49\u5b57", "\u6c49\u5b57"),
    ]
    df = spark.createDataFrame(
        [(k, t) for k, t, _ in cases], "k string, t string"
    )
    got = {
        r.k: r.fixed
        for r in fix_double_utf8(df, "t", out_col="fixed").collect()
    }
    assert got == {k: want for k, _, want in cases}
