"""Unicode normalization — the first text-cleanup pass of every major
training pipeline (C4 / Gopher / FineWeb lineage): NFC-compose the
text, strip control and format characters (keeping ``\\t\\n\\r``), and
optionally collapse whitespace, BEFORE any dedup/quality stage — the
same page crawled twice can differ only by NFD-vs-NFC accents or
zero-width junk, and unstripped TAG characters (U+E0020..U+E007F) are
a known prompt-injection carrier.

Split by engine affinity:

- **NFC composition** needs the Unicode character database, so it is
  the one Arrow stage (`nfc_column` — Python ``unicodedata``, pure
  map, zero shuffle);
- **control/format stripping is pure codegen**: one
  ``regexp_replace`` with :data:`CTRL_FORMAT_CLASS`, a character
  class written in the ``\\x{…}`` escape syntax the Java regex engine
  and RE2 share, so the SAME constant interpolates into the DuckDB
  oracle (the `redact.py` one-constant discipline) and cannot drift
  between engines. NFC-then-strip equals strip-then-NFC here
  (canonical composition neither creates nor consumes Cc/Cf), but
  both engines run the same order anyway.

The class covers Unicode Cc minus ``\\t\\n\\r`` (C0, DEL, C1) and Cf —
soft hyphen, Arabic/Syriac/NKo format controls, Mongolian vowel
separator, zero-width/direction marks (U+200B..U+200F,
U+202A..U+202E, U+2060..U+2064, U+2066..U+206F), BOM/ZWNBSP,
interlinear annotation, and the astral Cf blocks (Brahmi/Kaithi
number joiners, Egyptian hieroglyph format controls, Duployan,
musical beam controls, language TAG characters).
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# Java-regex/RE2-common character class: Cc (minus \t\n\r) + Cf.
CTRL_FORMAT_CLASS = (
    "[\\x00-\\x08\\x0B\\x0C\\x0E-\\x1F\\x7F-\\x9F\\xAD"
    "\\x{0600}-\\x{0605}\\x{061C}\\x{06DD}\\x{070F}"
    "\\x{0890}\\x{0891}\\x{08E2}\\x{180E}"
    "\\x{200B}-\\x{200F}\\x{202A}-\\x{202E}"
    "\\x{2060}-\\x{2064}\\x{2066}-\\x{206F}\\x{FEFF}"
    "\\x{FFF9}-\\x{FFFB}"
    "\\x{110BD}\\x{110CD}\\x{13430}-\\x{1343F}"
    "\\x{1BCA0}-\\x{1BCA3}\\x{1D173}-\\x{1D17A}"
    "\\x{E0001}\\x{E0020}-\\x{E007F}]"
)


def strip_ctrl_format(text: Column | str) -> Column:
    """Codegen-only removal of control/format characters (keeps
    ``\\t\\n\\r``)."""
    c = F.col(text) if isinstance(text, str) else text
    return F.regexp_replace(c, CTRL_FORMAT_CLASS, "")


def nfc_column(df: DataFrame, text_col: str, out_col: str) -> DataFrame:
    """Arrow-batched NFC composition (``unicodedata.normalize``). The
    all-ASCII fast path (the overwhelming majority of English crawl
    text) skips the normalize call entirely."""
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("string")
    def _nfc(col: pd.Series) -> pd.Series:
        import unicodedata  # noqa: PLC0415 — executor-side

        def norm(s: str) -> str:
            if s.isascii():
                return s
            return unicodedata.normalize("NFC", s)

        return col.map(norm, na_action="ignore")

    return df.withColumn(out_col, _nfc(F.col(text_col)))


def fix_double_utf8(
    df: DataFrame, text_col: str, out_col: str | None = None
) -> DataFrame:
    """Repair the classic mojibake: UTF-8 bytes mis-decoded as
    latin-1 or cp1252 somewhere upstream ("café" -> "cafÃ©",
    "don't" -> "donâ€™t"), the core trick of ftfy. A string is
    repaired iff it byte-round-trips through one of those charsets AND
    the bytes strictly decode as UTF-8 (to something different) —
    genuine latin-1 text fails the strict re-decode and passes through
    untouched, pure ASCII short-circuits. One Arrow map; the cheap
    prefilter (any UTF-8-lead-byte char U+00C2..U+00F4) skips the
    try/except for the overwhelming clean majority."""
    from pyspark.sql.functions import pandas_udf

    out = out_col or text_col

    @pandas_udf("string")
    def _fix(col: pd.Series) -> pd.Series:
        def fix(s: str) -> str:
            if s.isascii() or not any(
                "Â" <= ch <= "ô" for ch in s
            ):
                return s
            for enc in ("latin-1", "cp1252"):
                try:
                    b = s.encode(enc)
                except UnicodeEncodeError:
                    continue
                try:
                    return b.decode("utf-8", "strict")
                except UnicodeDecodeError:
                    return s
            return s

        return col.map(fix, na_action="ignore")

    return df.withColumn(out, _fix(F.col(text_col)))


def normalize_text_column(
    df: DataFrame,
    text_col: str,
    out_col: str = "text_norm",
    collapse_ws: bool = False,
) -> DataFrame:
    """The full normalization: NFC (Arrow) -> control/format strip
    (codegen) -> optional whitespace collapse (codegen)."""
    d = nfc_column(df, text_col, out_col)
    c = strip_ctrl_format(F.col(out_col))
    if collapse_ws:
        c = F.trim(F.regexp_replace(c, r"\s+", " "))
    return d.withColumn(out_col, c)
