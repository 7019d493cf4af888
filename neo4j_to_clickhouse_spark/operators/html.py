"""HTML → text extraction: the step between WARC response records and
the `documents` table.

Training pipelines extract body text from crawled HTML before any
quality/dedup stage (the reference has no text-extraction surface —
this extends the corpus-ingestion family alongside `sources/warc.py`).
No HTML library exists in this sandbox (no bs4/lxml/html5lib), and the
pipeline wants a deterministic, versionable transform anyway — so this
is a small state-machine extractor with explicit, documented behavior:

- ``<script>``/``<style>`` elements drop with their content; an
  UNCLOSED opener (truncated crawl HTML) drops to end-of-input;
  ``<!-- comments -->`` drop (including markup inside them);
- all other tags are boundary markers: block-level tags contribute a
  separating space, text between tags survives;
- the core named entities (&amp; &lt; &gt; &quot; &#39; &nbsp;) and
  numeric character references decode;
- whitespace collapses to single spaces, leading/trailing stripped.

Everything runs executor-side in Arrow batches via `extract_text_column`
— at 100 TB this is a pure map stage (zero shuffle) sized by input
bytes, exactly like the codec probes.
"""

import re

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_DROP_CONTENT = re.compile(
    r"<(script|style)\b[^>]*>.*?</\1\s*>",
    re.IGNORECASE | re.DOTALL,
)
# An opener with no closer (routine in truncated crawl HTML) drops to
# end-of-input — otherwise the generic tag pass would strip only the
# tags and leak raw script/CSS text into the document. Runs after the
# comment pass so a commented-out opener can't eat trailing text. The
# lookbehind skips '<script' sitting inside another tag's attribute
# value ('<img alt="<script>">', onclick handlers): an HTML tokenizer
# treats '<' as literal there, so a preceding quote or '=' means this
# is not an element opener.
_DROP_UNCLOSED = re.compile(
    r"""(?<!["'=])<(script|style)\b[^>]*>.*\Z""",
    re.IGNORECASE | re.DOTALL,
)
_COMMENT = re.compile(r"<!--.*?-->", re.DOTALL)
_TAG = re.compile(r"<[^>]+>")
_WS = re.compile(r"\s+")
_NUM_REF = re.compile(r"&#(x[0-9a-fA-F]+|[0-9]+);")
_NAMED = {
    "&amp;": "&",
    "&lt;": "<",
    "&gt;": ">",
    "&quot;": '"',
    "&#39;": "'",
    "&apos;": "'",
    "&nbsp;": " ",
}


def _decode_entities(s: str) -> str:
    def num(m: re.Match) -> str:
        v = m.group(1)
        code = int(v[1:], 16) if v[0] in "xX" else int(v)
        return chr(code) if 0 < code <= 0x10FFFF else ""

    s = _NUM_REF.sub(num, s)
    for k, v in _NAMED.items():
        s = s.replace(k, v)
    return s


def extract_html_text(html):
    """Extract visible text from an HTML string (see module docstring
    for the exact contract). None-safe; non-HTML text passes through
    with whitespace normalized."""
    if html is None:
        return None
    s = _DROP_CONTENT.sub(" ", html)
    s = _COMMENT.sub(" ", s)
    s = _DROP_UNCLOSED.sub(" ", s)
    s = _TAG.sub(" ", s)
    s = _decode_entities(s)
    return _WS.sub(" ", s).strip()


def extract_text_column(
    df: DataFrame, html_col: str, out_col: str = "text"
) -> DataFrame:
    """Arrow-batched map: adds ``out_col`` with the extracted text of
    ``html_col`` (string). Pure map stage — no shuffle."""
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("string")
    def _extract(col: pd.Series) -> pd.Series:
        return col.map(extract_html_text, na_action="ignore")

    return df.withColumn(out_col, _extract(F.col(html_col)))


def html_quality_columns(text_col: Column | str) -> list[Column]:
    """Codegen-side post-extraction quality signals (no Python): chars,
    tokens, and the link-ish residue ratio (extractions dominated by
    'http' fragments flag nav/boilerplate pages)."""
    c = F.col(text_col) if isinstance(text_col, str) else text_col
    n_chars = F.length(c).alias("n_chars")
    n_tokens = F.size(F.split(c, " ")).alias("n_tokens")
    url_hits = (
        F.size(F.split(c, r"http")) - F.lit(1)
    ).alias("url_fragments")
    return [n_chars, n_tokens, url_hits]
