"""Scale curve for byte-level GPT-2 encode at the PRODUCTION operating
point (VERDICT r14 item 1): a 50k-merge learned artifact — the
fixture's real word counts unioned over the deterministic synthetic
100k-word Zipf tail (`operators/bpe.synthetic_zipf_counts`) — broadcast
into the one Arrow encode map, timed at sf0.01 / sf0.1 / the synthetic
x10 input, with the implied exponent fitted like bench_scale_curve.

The artifact is learned ONCE (the corpus-sized work is one
word-frequency aggregate; the merge loop is vocab-bounded) and the SAME
merge table times every scale point: production encodes a fixed trained
tokenizer against growing corpora, so the curve must isolate the scan.
A 50-doc byte round-trip through the full 50k vocab is asserted before
timing.

Usage: python tools/bench_bpe_encode_50k.py
Writes docs/evidence/BPE_ENCODE_SCALE_r{round}.json and prints it.
"""

from __future__ import annotations

import json
import math
import os
import subprocess
import sys
import time

TOOLS = os.path.dirname(os.path.abspath(__file__))
REPO = os.path.dirname(TOOLS)
sys.path.insert(0, REPO)

from neo4j_to_clickhouse_spark.session import get_spark  # noqa: E402

X10_DIR = "/tmp/spark_graft_sf_x10"
ROOT = os.environ.get("SPARK_GRAFT_TESTDATA", "/root/testdata")


def main() -> None:
    from pyspark.sql import functions as F

    from neo4j_to_clickhouse_spark.operators.bpe import (
        assert_byte_roundtrip,
        bpe_encode,
        gpt2_operating_point_artifact,
    )
    from neo4j_to_clickhouse_spark.plans.queries import _WINDOW_ROUND

    if not os.path.isdir(X10_DIR):
        print("# generating synthetic sf1 input (first use)", file=sys.stderr)
        subprocess.check_call(
            [sys.executable, os.path.join(TOOLS, "gen_scale_data.py"), "10"]
        )
    spark = get_spark(
        "bench-bpe-50k",
        master=f"local[{os.environ.get('SPARK_GRAFT_CPUS', '32')}]",
        shuffle_partitions=32,
    )
    docs01 = spark.read.parquet(f"{ROOT}/sf0.1/documents.parquet")
    t0 = time.monotonic()
    merges, vocab = gpt2_operating_point_artifact(docs01)
    learn_s = round(time.monotonic() - t0, 2)

    # round-trip pin through the full 50k vocab before any timing
    assert_byte_roundtrip(docs01, "text", merges, vocab)

    points = [
        ("0.01", f"{ROOT}/sf0.01"),
        ("0.1", f"{ROOT}/sf0.1"),
        ("1.0", X10_DIR),
    ]
    curve: dict[str, float] = {}
    tokens: dict[str, int] = {}
    for label, d in points:
        df = spark.read.parquet(f"{d}/documents.parquet")
        df.count()  # warm footers
        runs = []
        for _ in range(2):
            t0 = time.monotonic()
            got = (
                bpe_encode(
                    df, "text", merges, vocab, pretokenize="gpt2"
                )
                .agg(F.sum(F.size("token_ids")).alias("t"))
                .collect()
            )
            runs.append(time.monotonic() - t0)
        curve[label] = round(min(runs), 3)
        tokens[label] = int(got[0]["t"])
        print(f"# sf{label}: {curve[label]}s {tokens[label]} tokens",
              file=sys.stderr)

    def alpha(a: str, b: str) -> float:
        return round(
            math.log(curve[b] / curve[a])
            / math.log(tokens[b] / tokens[a]),
            2,
        )

    report = {
        "metric": "bpe_encode_gpt2_50k_scale",
        "unit": "sec",
        "num_merges": len(merges),
        "vocab_size": len(vocab),
        "learn_wall_s": learn_s,
        "curve": curve,
        "tokens": tokens,
        "alpha_first": alpha("0.01", "0.1"),
        "alpha_last": alpha("0.1", "1.0"),
        "roundtrip_docs": 50,
        "note": (
            "one broadcast 50k-merge table + one Arrow encode map; "
            "alpha fitted on emitted-token counts (the honest size "
            "axis for a tokenizer)"
        ),
    }
    out = os.path.join(
        REPO, "docs", "evidence",
        f"BPE_ENCODE_SCALE_r{_WINDOW_ROUND}.json",
    )
    with open(out, "w") as fh:
        json.dump(report, fh, indent=1)
    print(json.dumps(report))


if __name__ == "__main__":
    main()
