"""Ad-hoc single-query timing probe: python tools/perf_probe.py <query> [runs] [sf_dir]."""
import sys, time
sys.path.insert(0, "/root/repo")
from neo4j_to_clickhouse_spark import get_spark
from neo4j_to_clickhouse_spark.plans.queries import QUERIES

name = sys.argv[1]
runs = int(sys.argv[2]) if len(sys.argv) > 2 else 3
sf = sys.argv[3] if len(sys.argv) > 3 else "/root/testdata/sf0.1"
s = get_spark("perf", master="local[32]", shuffle_partitions=32)
for i in range(runs):
    t0 = time.time()
    n = len(QUERIES[name].spark(s, sf).collect())  # collect: .count() lets Catalyst prune the aggregates under test
    print(f"PROBE {name} run{i}: {time.time()-t0:.3f}s rows={n}", flush=True)
