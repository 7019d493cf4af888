"""JSON extraction helpers — Spark equivalents of ClickHouse JSONExtract*.

The reference's whole semi-structured surface is four ClickHouse functions
used inside the materialized views and validation queries
(`clickhouse/init/01-init-tables.sql:73-89,99-117`,
`initial-load/scripts/04-optimize-tables.sql:208`, `README.md:362`). Each maps
to a native Catalyst expression, so extraction stays inside whole-stage
codegen — no UDFs.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql import types as T


def _path(*keys: str) -> str:
    return "$." + ".".join(keys) if keys else "$"


def json_extract_string(col: Column | str, *keys: str) -> Column:
    """``JSONExtractString(col, k1, k2, ...)`` — string at a nested path.

    Reference: `clickhouse/init/01-init-tables.sql:73,76-78,83,85`.
    """
    return F.get_json_object(col, _path(*keys))


def json_extract_raw(col: Column | str, *keys: str) -> Column:
    """``JSONExtractRaw`` — subtree as raw JSON text (keeps nested objects).

    ``get_json_object`` already returns the raw JSON text of non-leaf nodes,
    which is exactly JSONExtractRaw's contract
    (`clickhouse/init/01-init-tables.sql:87-88,115-116`).
    """
    return F.get_json_object(col, _path(*keys))


def json_extract_array(col: Column | str, *keys: str) -> Column:
    """``JSONExtract(col, ..., 'Array(String)')`` — typed string-array pull.

    Reference: `clickhouse/init/01-init-tables.sql:86` (labels extraction).
    """
    return F.from_json(
        F.get_json_object(col, _path(*keys)), T.ArrayType(T.StringType())
    )


def json_first_array_element(col: Column | str, *keys: str) -> Column:
    """``arrayElement(JSONExtractArrayRaw(col, k), 1)`` — first element of a
    JSON array field (`initial-load/scripts/04-optimize-tables.sql:208`).
    """
    return F.element_at(json_extract_array(col, *keys), 1)
