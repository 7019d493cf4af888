"""A/B: JVM zip_with 8-gram span digests vs one Arrow batch kernel.

Equality contract: identical (id, start, span-digest) rows — the Python
kernel must reproduce tokens() (ASCII \\s+ split after strip) and
md5(space-joined 8-gram) exactly. The classifier v3 A/B already pinned
the tokenize+md5 replication on this fixture; this extends it to the
positional span table.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from neo4j_to_clickhouse_spark.operators.dedup import (  # noqa: E402
    ngram_array,
    spread,
    tokens,
)
from neo4j_to_clickhouse_spark.plans.queries import _t  # noqa: E402
from neo4j_to_clickhouse_spark.session import get_spark  # noqa: E402


def jvm_spans(df, w=8):
    return (
        spread(df)
        .select(F.col("doc_id").alias("id"), tokens("text").alias("__tk"))
        .select(
            "id",
            F.posexplode(ngram_array(F.col("__tk"), w)).alias(
                "start", "span_text"
            ),
        )
        .filter(F.col("span_text").isNotNull())
        .select("id", "start", F.md5("span_text").alias("span"))
    )


def arrow_spans(df, w=8):
    import pyarrow as pa

    def kern(batches):
        import hashlib
        import re

        ws = re.compile(r"\s+", re.ASCII)
        md5 = hashlib.md5
        schema = pa.schema(
            [
                ("id", pa.int64()),
                ("start", pa.int32()),
                ("span", pa.string()),
            ]
        )
        for batch in batches:
            ids_out, starts, digests = [], [], []
            ids = batch.column("doc_id").to_pylist()
            texts = batch.column("text").to_pylist()
            for i, t in zip(ids, texts):
                if t is None:
                    continue
                s = t.strip(" \t\n\r\f\x0b")
                toks = ws.split(s) if s else []
                for j in range(len(toks) - w + 1):
                    ids_out.append(i)
                    starts.append(j)
                    digests.append(
                        md5(" ".join(toks[j : j + w]).encode()).hexdigest()
                    )
            yield pa.RecordBatch.from_arrays(
                [
                    pa.array(ids_out, pa.int64()),
                    pa.array(starts, pa.int32()),
                    pa.array(digests, pa.string()),
                ],
                schema=schema,
            )

    return (
        spread(df)
        .select("doc_id", "text")
        .mapInArrow(kern, "id long, start int, span string")
    )


def main() -> None:
    sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    runs = int(sys.argv[2]) if len(sys.argv) > 2 else 4
    s = get_spark("ab-spd", master="local[32]", shuffle_partitions=32)
    s.read.parquet(f"{sf}/documents.parquet").count()
    # warm python workers
    s.range(128).repartition(32).mapInArrow(
        lambda it: it, "id long"
    ).count()
    docs = _t(s, sf, "documents")

    a = sorted(map(tuple, jvm_spans(docs).collect()))
    b = sorted(map(tuple, arrow_spans(docs).collect()))
    print("EQ spans:", a == b, len(a))
    if a != b:
        diffs = [(x, y) for x, y in zip(a, b) if x != y][:3]
        print("  diffs:", diffs, "len", len(a), len(b))

    def t(name, mk):
        ts = []
        for _ in range(runs):
            t0 = time.perf_counter()
            mk().write.format("noop").mode("overwrite").save()
            ts.append(round(time.perf_counter() - t0, 3))
        print(f"TIME {name}: {ts} min={min(ts)}", flush=True)

    t("jvm", lambda: jvm_spans(docs))
    t("arrow", lambda: arrow_spans(docs))


if __name__ == "__main__":
    main()
