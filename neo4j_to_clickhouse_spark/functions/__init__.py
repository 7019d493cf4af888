"""Scalar-function surface (SURVEY.md §2.8 F1-F19) as composable Columns."""

from neo4j_to_clickhouse_spark.functions.json import (  # noqa: F401
    json_extract_array,
    json_extract_raw,
    json_extract_string,
    json_first_array_element,
)
from neo4j_to_clickhouse_spark.functions.variant import (  # noqa: F401
    vget,
    with_variant_properties,
)
from neo4j_to_clickhouse_spark.functions.scalar import (  # noqa: F401
    event_month,
    human_readable_size,
    lenient_timestamp,
    load_metadata,
    normalize_labels,
    operation_to_event_type,
    valid_json_or_empty,
)
