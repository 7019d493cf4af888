"""HTML -> text extractor (operators/html.py): contract cases the
closed-form oracle can't probe individually."""

from hypothesis import given, settings
from hypothesis import strategies as st

from neo4j_to_clickhouse_spark.operators.html import (
    extract_html_text,
    extract_text_column,
)


def test_basic_tags_strip():
    assert extract_html_text("<p>hello <b>world</b></p>") == "hello world"


def test_script_and_style_content_drops():
    h = (
        '<script>var x = "<p>decoy</p>";</script>'
        "<style>.a { content: 'text' }</style><p>real</p>"
    )
    assert extract_html_text(h) == "real"


def test_script_case_insensitive_and_attrs():
    h = '<SCRIPT type="module">alert(1)</SCRIPT>ok'
    assert extract_html_text(h) == "ok"


def test_comment_with_markup_drops():
    assert extract_html_text("a<!-- <div>x</div> -->b") == "a b"


def test_entities_decode():
    assert extract_html_text("a &amp; b &lt;tag&gt; &quot;q&quot;") == (
        'a & b <tag> "q"'
    )
    assert extract_html_text("&#65;&#x42;") == "AB"
    assert extract_html_text("x&nbsp;y") == "x y"


def test_whitespace_collapses():
    assert extract_html_text("<div>\n  a\t\tb  \n</div>") == "a b"


def test_none_and_plain_text():
    assert extract_html_text(None) is None
    assert extract_html_text("just words") == "just words"
    assert extract_html_text("") == ""


def test_unterminated_script_drops_to_end():
    # ADVICE r11: an unclosed <script>/<style> (truncated crawl HTML)
    # drops to end-of-input — raw script/CSS must not leak into text
    assert extract_html_text("<p>head</p><script>var x = 1; <p>tail") == "head"
    assert extract_html_text("<p>head</p><style>.a{color:red}") == "head"


def test_commented_out_opener_does_not_eat_tail():
    # a script opener inside a comment is gone with the comment; the
    # unclosed-drop must not trigger on it
    out = extract_html_text("<p>a</p><!-- <script> --><p>b</p>")
    assert out == "a b"


def test_script_token_inside_attribute_value_does_not_eat_doc():
    # '<script' inside another tag's attribute value is literal text to
    # an HTML tokenizer — the unclosed-drop must not trigger on it
    out = extract_html_text('<img alt="<script>"><p>rest of doc</p>')
    assert "rest of doc" in out
    out2 = extract_html_text("<a onclick='x(\"<script>\")'>link</a><p>tail</p>")
    assert "tail" in out2


def test_closed_script_then_unclosed_style():
    out = extract_html_text(
        "<script>x</script><p>mid</p><style>.q{} trailing css"
    )
    assert out == "mid"


def test_invalid_numeric_ref_drops():
    assert extract_html_text("a&#0;b&#x110000;c") == "abc"


@settings(max_examples=50, deadline=None)
@given(
    words=st.lists(
        st.text(
            alphabet="abcdefghijklmnopqrstuvwxyz", min_size=1, max_size=8
        ),
        min_size=1,
        max_size=20,
    )
)
def test_wrapped_text_roundtrip(words):
    text = " ".join(words)
    html = (
        "<html><head><script>decoy()</script></head><body><p>"
        + text.replace(" ", "</p> <p>")
        + "</p></body></html>"
    )
    assert extract_html_text(html) == text


def test_spark_column_path(spark):
    df = spark.createDataFrame(
        [(1, "<p>a b</p>"), (2, None), (3, "plain")],
        "id long, html string",
    )
    got = {
        r.id: r.text
        for r in extract_text_column(df, "html", "text").collect()
    }
    assert got == {1: "a b", 2: None, 3: "plain"}
