# Developer conveniences (the reference drives everything through make too)

.PHONY: test correctness bench bench-ingest smoke gate

# The full pre-round-close gate: run this before finishing any round.
# Catches fixture regenerations (VERDICT r04), oracle drift, and bench
# crashes in one command.
gate: test correctness bench

test:
	python -m pytest tests/ -x -q

correctness:
	python tools/check_correctness.py /root/testdata/sf0.01

bench:
	python bench.py

bench-ingest:
	python tools/bench_ingest.py

smoke:
	python -c "from __spark_entry__ import entry, queries, oracle_sql; \
from neo4j_to_clickhouse_spark import get_spark; \
s = get_spark('smoke', master='local[4]', shuffle_partitions=4); \
print(entry(s).count(), 'rows |', len(queries()), 'queries |', len(oracle_sql()), 'oracles')"
