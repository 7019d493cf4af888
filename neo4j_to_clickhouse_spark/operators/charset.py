"""Charset resolution + strict decode for the corpus-ingestion chain.

Real crawls are ~10-15% non-UTF-8; a chain that hard-decodes UTF-8
either corrupts those documents silently (errors='replace') or dies.
This stage resolves each record's charset declaratively and decodes
STRICTLY, quarantining undecodable bodies with a reason — the same
dead-letter pattern as envelope ingest (`operators/ingest.py`,
SURVEY §2 M5) so compliance audits can account for every record.

Resolution precedence (WHATWG-encoding-style, the crawl convention):

1. the ``charset=`` parameter of the HTTP ``Content-Type`` header;
2. a ``<meta charset=…>`` / ``<meta http-equiv … charset=…>`` sniff of
   the body head (decoded latin-1 — a lossless byte<->char view — so
   the sniff itself can't fail);
3. the UTF-8 fallback.

Steps 1-3 are pure codegen (regexp over the header string and the
body's first 2 KiB) — free inside the ingest scan. The decode itself
must honor ARBITRARY charsets (gbk, shift_jis, latin-1 …) with strict
error detection; JVM-side ``decode`` supports neither per-row charsets
nor strict failure capture, so this is one Arrow-batched stage (the
documented escape hatch, same family as `operators/html.py`) — a pure
map, zero shuffle, bytes-proportional at 100 TB.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# charset token: letters/digits/._- (covers every IANA name/alias)
_HEADER_RX = r"(?i);\s*charset\s*=\s*[\"']?([A-Za-z0-9._-]+)"
_META_RX = r"(?i)<meta[^>]*charset\s*=\s*[\"']?([A-Za-z0-9._-]+)"


def charset_column(
    content_type: Column | str,
    body: Column | str,
    default: str = "utf-8",
    sniff_bytes: int = 2048,
) -> Column:
    """Resolved charset (lowercased) for each record — header param,
    else body-head ``<meta>`` sniff, else ``default``. Pure codegen."""
    ct = F.col(content_type) if isinstance(content_type, str) else content_type
    b = F.col(body) if isinstance(body, str) else body
    from_header = F.regexp_extract(ct, _HEADER_RX, 1)
    head = F.decode(F.substring(b, 1, sniff_bytes), "ISO-8859-1")
    from_meta = F.regexp_extract(head, _META_RX, 1)
    return F.lower(
        F.when(from_header != "", from_header)
        .when(from_meta != "", from_meta)
        .otherwise(F.lit(default))
    )


def decode_text_column(
    df: DataFrame,
    body_col: str = "body",
    charset_col: str = "charset",
    out_col: str = "text",
    err_col: str = "decode_error",
) -> DataFrame:
    """Adds ``out_col`` (the strictly-decoded text, NULL on failure)
    and ``err_col`` (NULL on success; ``undecodable:<cs>`` /
    ``unknown_charset:<cs>`` / ``null_body`` otherwise). Arrow-batched
    pure map — Python's codec registry handles the full alias table
    (gbk, latin-1, shift_jis, …) that JVM ``decode`` won't."""
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("struct<text:string, decode_error:string>")
    def _decode(body: pd.Series, charset: pd.Series) -> pd.DataFrame:
        texts: list[str | None] = []
        errs: list[str | None] = []
        for b, cs in zip(body, charset):
            if b is None:
                texts.append(None)
                errs.append("null_body")
                continue
            try:
                texts.append(bytes(b).decode(cs or "utf-8", "strict"))
                errs.append(None)
            except LookupError:
                texts.append(None)
                errs.append(f"unknown_charset:{cs}")
            except (UnicodeDecodeError, ValueError):
                texts.append(None)
                errs.append(f"undecodable:{cs}")
        return pd.DataFrame({"text": texts, "decode_error": errs})

    d = df.withColumn(
        "__dec", _decode(F.col(body_col), F.col(charset_col))
    )
    return d.withColumn(out_col, F.col("__dec.text")).withColumn(
        err_col, F.col("__dec.decode_error")
    ).drop("__dec")


def split_decoded(
    df: DataFrame, err_col: str = "decode_error"
) -> tuple[DataFrame, DataFrame]:
    """(good, quarantine): good rows decoded cleanly; quarantine keeps
    the raw body + ``reason`` — the M5 dead-letter contract, so the
    undecodable lane persists for re-processing with better codecs."""
    good = df.where(F.col(err_col).isNull()).drop(err_col)
    quarantine = df.where(F.col(err_col).isNotNull()).withColumnRenamed(
        err_col, "reason"
    )
    return good, quarantine
