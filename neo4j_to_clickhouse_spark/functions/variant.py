"""Variant-typed semi-structured properties (Spark 4 ``VariantType``).

The reference stores property payloads as JSON text and re-parses on every
access (``JSONExtractString`` per query, `clickhouse/init/01-init-tables.sql:
71-89`; its config even enables ClickHouse's experimental JSON type without
using it, `clickhouse/config/config.xml:18` — see SURVEY.md §1.2). Spark 4's
``VariantType`` is the engine-native answer: parse once at ingest into a
binary-encoded variant, then every ``variant_get`` is a typed navigation of
the encoded tree — no re-tokenizing, and the parquet writer stores variants
in a shreddable binary layout.

Both access paths stay supported: ``get_json_object`` over the stored JSON
strings (zero migration, what the oracle-checked queries use) and the
variant columns added here (the hot-path option when one payload feeds many
extractions). ``try_parse_json`` keeps quarantine semantics — garbage
parses to NULL instead of failing the job.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def with_variant_properties(
    df: DataFrame,
    cols: tuple[str, ...] = ("properties_before", "properties_after"),
    suffix: str = "_v",
) -> DataFrame:
    """Add a variant-typed companion column per JSON-text property column.

    Run at ingest (or as a one-off backfill): the parse cost is paid once
    per event instead of once per query x extraction.
    """
    out = df
    for c in cols:
        if c in df.columns:
            out = out.withColumn(f"{c}{suffix}", F.try_parse_json(F.col(c)))
    return out


def vget(col: Column | str, path: str, as_type: str = "string") -> Column:
    """``variant_get`` with ClickHouse-style defaults: ``path`` is a JSON
    path ('$.a.b' or '$.arr[0]'), ``as_type`` any Spark DDL type. NULL when
    the path is absent or the cast fails — same leniency as
    ``JSONExtractString`` returning '' on misses.
    """
    c = F.col(col) if isinstance(col, str) else col
    return F.variant_get(c, path, as_type)
