"""Query plans: the engine's declared query inventory + oracle SQL."""

from neo4j_to_clickhouse_spark.plans.queries import QUERIES, QuerySpec  # noqa: F401
