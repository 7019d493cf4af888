"""Scalar transforms used by ingest (SURVEY.md §2.8, §2.11) — all native
Catalyst expressions, no Python UDFs (the reference does these row-wise in
pandas, `initial-load/scripts/03-bulk-import.py:77-123`; at 100 TB they must
stay JVM-side).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql import types as T


def operation_to_event_type(op: Column | str) -> Column:
    """CDC operation -> event_type, INSERT default.

    The reference's ``multiIf(operation='CREATE','INSERT', ... ,'INSERT')``
    followed by an Enum8 cast (`clickhouse/init/01-init-tables.sql:75-81`).
    The exhaustive ``when`` chain with an INSERT ``otherwise`` closes the
    domain, which is all the Enum8 cast adds.
    """
    c = F.col(op) if isinstance(op, str) else op
    return (
        F.when(c == "CREATE", F.lit("INSERT"))
        .when(c == "UPDATE", F.lit("UPDATE"))
        .when(c == "DELETE", F.lit("DELETE"))
        .otherwise(F.lit("INSERT"))
    )


def lenient_timestamp(col: Column | str) -> Column:
    """``parseDateTimeBestEffort`` equivalent for the envelope's ISO-8601
    ``metadata.txStartTime.TZDT`` string
    (`clickhouse/init/01-init-tables.sql:82-84`). ``try_to_timestamp``
    yields NULL instead of failing on malformed input, which feeds the
    quarantine path (SURVEY.md §2.9 M5).

    The parse is bounded to the reference's ``DateTime64`` representable
    range [1900-01-01, 2299-12-31]: ClickHouse cannot store timestamps
    outside it, and a syntactically valid but wildly out-of-range time
    (year 1, year 9999 — corrupt upstream clocks) is poison the same way
    garbage text is. Unbounded, such a row would pass ingest and then
    crash Python/Arrow consumers downstream (datetime range error on
    collect) — exactly the class of stall quarantine exists to prevent.
    Out-of-range parses yield NULL -> quarantined as ``bad_timestamp``.
    """
    ts = F.try_to_timestamp(F.col(col) if isinstance(col, str) else col)
    return F.when(
        ts.between(
            F.lit("1900-01-01 00:00:00").cast("timestamp"),
            F.lit("2299-12-31 23:59:59.999999").cast("timestamp"),
        ),
        ts,
    )


def event_month(ts: Column | str) -> Column:
    """``toYYYYMM(event_timestamp)`` — the month partition key
    (`clickhouse/init/01-init-tables.sql:19,36`).
    """
    return F.date_format(ts, "yyyyMM")


def normalize_labels(col: Column | str) -> Column:
    """Labels text -> ARRAY<STRING>, accepting JSON-array text
    ('["Device","Router"]') or comma-separated ('Device, Router').

    Same dual-format tolerance as the batch loader
    (`initial-load/scripts/03-bulk-import.py:78-93`), as one expression:
    try JSON parse when it looks like an array, else split on commas;
    empty/null -> empty array.
    """
    c = F.col(col) if isinstance(col, str) else col
    trimmed = F.trim(c)
    # drop NULL elements a JSON '["a", null]' would otherwise leak into
    # the array — symmetric with the CSV branch's empty-token filter
    # (downstream explode/array_contains must never see a NULL label)
    as_json = F.filter(
        F.from_json(trimmed, T.ArrayType(T.StringType())),
        lambda x: x.isNotNull(),
    )
    as_csv = F.filter(
        F.transform(F.split(trimmed, ","), lambda x: F.trim(x)),
        lambda x: x != "",
    )
    return (
        F.when(trimmed.isNull() | (trimmed == ""), F.array().cast("array<string>"))
        .when(trimmed.startswith("["), F.coalesce(as_json, F.array().cast("array<string>")))
        .otherwise(as_csv)
    )


def valid_json_or_empty(col: Column | str) -> Column:
    """JSON object text validated, '{}' fallback — the loader's
    try-json.loads-else-'{}' (`initial-load/scripts/03-bulk-import.py:95-107`).

    A JSON text is "valid object" iff ``get_json_object(x, '$')`` parses it;
    otherwise fall back to the empty object.
    """
    c = F.col(col) if isinstance(col, str) else col
    parsed = F.get_json_object(c, "$")
    return F.when(
        c.isNull() | (F.trim(c) == "") | parsed.isNull(), F.lit("{}")
    ).otherwise(c)


def load_metadata(source: str) -> Column:
    """Assemble load metadata JSON (source, file, load timestamp) — the
    loader's ``json.dumps({...})`` (`initial-load/scripts/03-bulk-import.py:118-122`)
    as ``to_json(struct(...))``.
    """
    return F.to_json(
        F.struct(
            F.lit(source).alias("source"),
            F.input_file_name().alias("file"),
            F.date_format(
                F.current_timestamp(), "yyyy-MM-dd HH:mm:ss.SSS"
            ).alias("loaded_at"),
        )
    )


def human_readable_size(n: Column | str) -> Column:
    """``formatReadableSize`` (`initial-load/scripts/04-optimize-tables.sql:13`)
    — cosmetic reporting helper.
    """
    c = (F.col(n) if isinstance(n, str) else n).cast("double")
    kib, mib, gib = 1024.0, 1024.0**2, 1024.0**3
    return (
        F.when(c >= gib, F.concat(F.round(c / gib, 2).cast("string"), F.lit(" GiB")))
        .when(c >= mib, F.concat(F.round(c / mib, 2).cast("string"), F.lit(" MiB")))
        .when(c >= kib, F.concat(F.round(c / kib, 2).cast("string"), F.lit(" KiB")))
        .otherwise(F.concat(c.cast("long").cast("string"), F.lit(" B")))
    )
