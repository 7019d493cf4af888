"""A/B: (1) array-based remove_repeated_spans reformulation vs the
exploded-token anti-join/rebuild; (2) spread() on the single-row-group
fact-table scans (TPC-H family).

Equality contract for (1): identical (doc_id, text, n_tokens_before,
n_tokens_after) rows. For (2): identical collected results.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import Window  # noqa: E402
from pyspark.sql import functions as F  # noqa: E402

from neo4j_to_clickhouse_spark.operators.dedup import (  # noqa: E402
    ngram_array,
    remove_repeated_spans,
    spread,
    tokens,
)
from neo4j_to_clickhouse_spark.plans.queries import QUERIES, _t  # noqa: E402
from neo4j_to_clickhouse_spark.session import get_spark  # noqa: E402


def remove_repeated_spans_v2(df, id_col="doc_id", text_col="text", w=8):
    spans = (
        spread(df)
        .select(F.col(id_col).alias("id"), tokens(text_col).alias("__tk"))
        .select(
            "id",
            F.posexplode(ngram_array(F.col("__tk"), w)).alias(
                "start", "span_text"
            ),
        )
        .filter(F.col("span_text").isNotNull())
        .select("id", "start", F.md5("span_text").alias("span"))
    )
    w_span = Window.partitionBy("span").orderBy("id", "start")
    dup_occ = (
        spans.withColumn("__rn", F.row_number().over(w_span))
        .filter(F.col("__rn") > 1)
        .select("id", "start")
    )
    covpos = (
        dup_occ.select(
            "id",
            F.explode(
                F.sequence(F.col("start"), F.col("start") + (w - 1))
            ).alias("pos"),
        )
        .distinct()
        .groupBy("id")
        .agg(F.collect_list("pos").alias("__cov"))
    )
    base = df.select(
        F.col(id_col).alias("id"), tokens(text_col).alias("__tk")
    )
    n_tok = F.size("__tk")
    kept = F.when(
        F.col("__cov").isNull(),
        F.sequence(F.lit(0), n_tok - 1),
    ).otherwise(
        F.array_except(F.sequence(F.lit(0), n_tok - 1), F.col("__cov"))
    )
    joined = base.join(covpos, "id", "left").withColumn(
        "__kp", F.when(n_tok > 0, kept)
    )
    return joined.select(
        F.col("id").alias(id_col),
        F.when(
            n_tok > 0,
            F.array_join(
                F.transform(
                    F.col("__kp"), lambda p: F.element_at(F.col("__tk"), p + 1)
                ),
                " ",
            ),
        )
        .otherwise(F.lit(""))
        .alias(text_col),
        n_tok.cast("long").alias("n_tokens_before"),
        F.coalesce(F.size("__kp"), F.lit(0))
        .cast("long")
        .alias("n_tokens_after"),
    )


def main() -> None:
    sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    runs = int(sys.argv[2]) if len(sys.argv) > 2 else 3
    s = get_spark("ab-span", master="local[32]", shuffle_partitions=32)
    s.read.parquet(f"{sf}/documents.parquet").count()
    s.read.parquet(f"{sf}/lineitem.parquet").count()
    docs = _t(s, sf, "documents")

    a = sorted(
        map(tuple, remove_repeated_spans(docs, "doc_id", "text", 8).collect())
    )
    b = sorted(
        map(
            tuple,
            remove_repeated_spans_v2(docs, "doc_id", "text", 8).collect(),
        )
    )
    print("EQ span_rewrite:", a == b, len(a))
    if a != b:
        print("  first diff:", next((x, y) for x, y in zip(a, b) if x != y))

    def time_it(name, mk):
        ts = []
        for _ in range(runs):
            t0 = time.perf_counter()
            mk().collect()
            ts.append(round(time.perf_counter() - t0, 3))
        print(f"TIME {name}: {ts} min={min(ts)}", flush=True)

    time_it("span_v0", lambda: remove_repeated_spans(docs, "doc_id", "text", 8))
    time_it(
        "span_v2", lambda: remove_repeated_spans_v2(docs, "doc_id", "text", 8)
    )

    # --- fact-scan spread A/B --------------------------------------
    li = _t(s, sf, "lineitem")

    def pricing(src):
        return (
            src.groupBy("l_returnflag", "l_linestatus")
            .agg(
                F.sum(F.col("l_quantity").cast("decimal(18,2)"))
                .cast("double")
                .alias("sum_qty"),
                F.sum(F.col("l_extendedprice").cast("decimal(18,2)"))
                .cast("double")
                .alias("sum_base_price"),
                F.sum(
                    (
                        F.col("l_extendedprice") * (1 - F.col("l_discount"))
                    ).cast("decimal(18,4)")
                )
                .cast("double")
                .alias("sum_disc_price"),
                (
                    F.sum(F.col("l_quantity").cast("decimal(18,2)")).cast(
                        "double"
                    )
                    / F.count("*").cast("double")
                ).alias("avg_qty"),
                F.count("*").alias("count_order"),
            )
            .orderBy("l_returnflag", "l_linestatus")
        )

    ref = pricing(li).collect()
    got = pricing(li.repartition(32)).collect()
    print("EQ pricing spread:", ref == got)
    time_it("pricing_v0", lambda: pricing(li))
    time_it("pricing_rep32", lambda: pricing(li.repartition(32)))
    # keyless round-robin vs fewer partitions
    time_it("pricing_rep8", lambda: pricing(li.repartition(8)))
    # full bench-row formulations for reference
    time_it(
        "pricing_row", lambda: QUERIES["pricing_summary"].spark(s, sf)
    )


if __name__ == "__main__":
    main()
