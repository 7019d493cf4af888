"""Line-level corpus cleanup — the C4 recipe (Raffel et al. 2020,
"Exploring the Limits of Transfer Learning", §2.2) plus the
cross-document frequent-line removal RefinedWeb/CCNet apply: web text
is full of boilerplate LINES (cookie banners, nav crumbs, "enable
javascript") that repeat across millions of pages while the documents
around them are unique — document-level dedup never touches them.

Two operators, one shared explode/rebuild shape:

- :func:`line_dedup_rewrite` removes every line whose corpus-wide
  occurrence count reaches ``min_count``, then rebuilds documents.
- :func:`c4_line_filter` applies C4's per-line rules (terminal
  punctuation, minimum word count, no "javascript" line) and per-doc
  rules (drop pages containing "lorem ipsum" or "{"), then rebuilds.

100 TB design: lines shuffle as md5 DIGESTS for the frequency count
(the `span_dedup` discipline — body text never shuffles for counting);
the rebuild is the standard posexplode -> filter -> collect_list
(pos,line) -> array_sort -> concat_ws round trip, one shuffle keyed by
doc id. All expressions are codegen; no Python anywhere.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# C4 §2.2 line rules (parameterized; C4's own word minimum is 5 —
# callers pass what their recipe wants)
TERMINAL_PUNCT_RX = r'[.!?"”]$'


def explode_lines(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """(id, pos, line) — one row per newline-split line."""
    return docs.select(
        F.col(id_col),
        F.posexplode(F.split(F.col(text_col), "\n")).alias(
            "pos", "line"
        ),
    )


def _rebuild(kept: DataFrame, id_col: str) -> DataFrame:
    """(id, pos, line) survivors -> (id, text, n_lines)."""
    return kept.groupBy(id_col).agg(
        F.concat_ws(
            "\n",
            F.transform(
                F.array_sort(
                    F.collect_list(F.struct("pos", "line"))
                ),
                lambda s: s["line"],
            ),
        ).alias("text"),
        F.count("*").alias("n_lines"),
    )


def line_dedup_rewrite(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    min_count: int = 3,
) -> DataFrame:
    """Remove every line occurring >= ``min_count`` times corpus-wide;
    returns ``(id, text, n_lines)`` rebuilt. Documents whose lines all
    vanish drop out (join semantics — the C4 behavior). Frequency
    counts move md5 digests only."""
    lines = explode_lines(docs, id_col, text_col).withColumn(
        "__h", F.md5(F.col("line"))
    )
    frequent = (
        lines.groupBy("__h")
        .agg(F.count("*").alias("__n"))
        .where(F.col("__n") >= min_count)
        .select("__h")
    )
    kept = lines.join(frequent, "__h", "left_anti").drop("__h")
    return _rebuild(kept, id_col)


def c4_line_keep(line: Column, min_words: int = 3) -> Column:
    """C4's per-line predicate: ends in terminal punctuation, has at
    least ``min_words`` words, and does not mention javascript."""
    trimmed = F.trim(line)
    return (
        trimmed.rlike(TERMINAL_PUNCT_RX)
        & (F.size(F.split(trimmed, r"\s+")) >= min_words)
        & ~F.lower(trimmed).contains("javascript")
    )


def c4_doc_keep(text: Column) -> Column:
    """C4's page-level predicate: no code-brace, no lorem ipsum."""
    low = F.lower(text)
    return ~low.contains("lorem ipsum") & ~text.contains("{")


def c4_line_filter(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    min_words: int = 3,
) -> DataFrame:
    """C4 §2.2 cleanup: doc-level drop (brace / lorem ipsum), then
    per-line keep rules, then rebuild — ``(id, text, n_lines)``.
    Documents losing every line drop out."""
    alive = docs.where(c4_doc_keep(F.col(text_col)))
    lines = explode_lines(alive, id_col, text_col)
    kept = lines.where(c4_line_keep(F.col("line"), min_words))
    return _rebuild(kept, id_col)
