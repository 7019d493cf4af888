"""PII redaction for training-data curation (north star).

Pre-training corpora are scrubbed of personally identifiable information
before the tokenizer ever sees them; the standard first pass is
pattern-based (emails, phone numbers, IP addresses) with entity-class
placeholder tokens, exactly the shape of the C4/Dolma-style cleanup
steps.  Reference scope: the CDC pipeline ships raw property payloads
through unredacted (`initial-load/scripts/03-bulk-import.py:95-107`
validates JSON but never inspects values) — this module is the
curation-side extension the reference leaves to downstream consumers.

Scale design: redaction and per-class counting are pure per-row regexp
expressions (`regexp_replace` / `regexp_count`) — whole-stage codegen,
scan-bound, zero shuffle; the per-source rollup aggregates map-side
first.  At 100 TB this is I/O-bound, which is optimal for a full-corpus
rewrite.  No Python touches the hot path.

The patterns are deliberately restricted to syntax with IDENTICAL
semantics in Java regex (Spark) and RE2 (DuckDB) — character classes,
bounded repetition, non-capturing groups, word boundaries — so the same
constant interpolates into both the DataFrame program and the oracle
SQL and cannot drift.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# (name, pattern, replacement) — applied IN ORDER; email first so its
# local-part digits can never be half-consumed by the phone pattern.
# Java-regex/RE2 common subset only: no backrefs, no lookaround.
PII_PATTERNS: tuple[tuple[str, str, str], ...] = (
    ("email", r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "<EMAIL>"),
    ("phone", r"\b\d{3}[-.]\d{3}[-.]\d{4}\b", "<PHONE>"),
    ("ip", r"\b(?:\d{1,3}\.){3}\d{1,3}\b", "<IP>"),
)


def pii_counts(text: Column | str) -> list[Column]:
    """One ``regexp_count`` column per PII class, aliased ``n_{name}`` —
    counted on the ORIGINAL text so classes are independent of the
    replacement order."""
    c = F.col(text) if isinstance(text, str) else text
    return [
        F.regexp_count(c, F.lit(pattern)).alias(f"n_{name}")
        for name, pattern, _ in PII_PATTERNS
    ]


def redact_text(text: Column | str) -> Column:
    """The text with every PII class replaced by its placeholder token,
    applied in ``PII_PATTERNS`` order as a chain of flat
    ``regexp_replace`` expressions (one codegen span, no UDF)."""
    c = F.col(text) if isinstance(text, str) else text
    for _, pattern, repl in PII_PATTERNS:
        c = F.regexp_replace(c, pattern, repl)
    return c


def redact_pii(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Append per-class counts and a ``{text_col}_redacted`` column.

    Keeps the original column: curation pipelines write both so the
    redaction is auditable (and reversible by re-reading the source
    partition, never by un-masking).
    """
    return df.select(
        "*",
        *pii_counts(text_col),
        redact_text(text_col).alias(f"{text_col}_redacted"),
    )
