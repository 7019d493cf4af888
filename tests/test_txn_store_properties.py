"""Property-based model check of the transaction-log protocol
(operators/txn_store.py): random interleavings of partition swaps,
retention drops, streaming-batch commits, and vacuums must keep the
resolved snapshot identical to a trivially-correct pure-Python model of
the live file set — and vacuum must leave the disk holding exactly the
retained snapshot (plus the log).

Pure filesystem: the protocol never reads data files, so parquet bytes
are faked and no SparkSession is needed — hypothesis can afford real
sequence depth.
"""

from __future__ import annotations

from pathlib import Path

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from neo4j_to_clickhouse_spark.operators.txn_store import (
    TxnLogPartitionStore,
    ensure_log,
    snapshot,
    stage_batch_files,
    vacuum,
)

MONTHS = ["202601", "202602", "202603", "202604"]

_op = st.one_of(
    st.tuples(
        st.just("replace"),
        st.lists(st.sampled_from(MONTHS), min_size=1, max_size=3, unique=True),
        st.integers(min_value=0, max_value=2),  # staged files per month
    ),
    st.tuples(st.just("drop"), st.sampled_from(MONTHS + ["202605"])),
    st.tuples(
        st.just("batch"),
        st.integers(min_value=0, max_value=3),  # batch id (repeats = replay)
        st.lists(st.sampled_from(MONTHS), min_size=1, max_size=2, unique=True),
    ),
    st.tuples(st.just("vacuum")),
)


@settings(
    max_examples=25,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(ops=st.lists(_op, min_size=1, max_size=12))
def test_random_op_sequences_match_model(ops, tmp_path_factory):
    root = Path(tmp_path_factory.mktemp("txn_model")) / "t"
    store = TxnLogPartitionStore()
    model: set[str] = set()
    # seed: one file per month
    for m in MONTHS:
        d = root / f"event_month={m}"
        d.mkdir(parents=True)
        (d / "part-0.parquet").write_bytes(b"seed")
        model.add(f"event_month={m}/part-0.parquet")
    ensure_log(str(root))

    stage_no = 0
    for op in ops:
        if op[0] == "replace":
            _, months, n_files = op
            stage_no += 1
            staging = root.parent / f"stage{stage_no}"
            for m in months:
                sd = staging / f"event_month={m}"
                sd.mkdir(parents=True)
                for i in range(n_files):
                    (sd / f"part-{i}.parquet").write_bytes(b"new")
            store.replace_months(str(root), str(staging), months)
            month_set = set(months)
            model = {
                f for f in model if f.split("=", 1)[1].split("/", 1)[0] not in month_set
            }
            _, live = snapshot(str(root))
            # the new generation's names are store-chosen: adopt them
            model |= {
                f
                for f in live
                if f.split("=", 1)[1].split("/", 1)[0] in month_set
            }
            # ...but the count must be exactly what was staged
            staged_count = n_files * len(months)
            assert (
                len([f for f in live if f.split("=", 1)[1].split("/", 1)[0] in month_set])
                == staged_count
            )
        elif op[0] == "drop":
            _, cutoff = op
            expected = sorted(
                {
                    f.split("=", 1)[1].split("/", 1)[0]
                    for f in model
                    if f.split("=", 1)[1].split("/", 1)[0] < cutoff
                }
            )
            dropped = store.drop_months(str(root), cutoff)
            assert dropped == expected
            model = {
                f for f in model if f.split("=", 1)[1].split("/", 1)[0] >= cutoff
            }
        elif op[0] == "batch":
            _, batch_id, months = op
            stage_no += 1
            staging = root.parent / f"stage{stage_no}"
            for m in months:
                sd = staging / f"event_month={m}"
                sd.mkdir(parents=True)
                (sd / "part-0.parquet").write_bytes(b"evt")
            adds, tag = stage_batch_files(str(root), str(staging), batch_id)
            store.commit_batch(str(root), adds, tag)
            model = {f for f in model if not f.rsplit("/", 1)[-1].startswith(tag)}
            model |= set(adds)
        else:  # vacuum
            vacuum(str(root), retain_versions=1, min_age_s=0)
            # model unchanged: vacuum must never touch live files

        _, live = snapshot(str(root))
        assert set(live) == model, f"after {op}"

    # final vacuum: disk == retained snapshot exactly (plus the log)
    vacuum(str(root), retain_versions=1, min_age_s=0)
    on_disk = {
        f"{d.name}/{f.name}"
        for d in root.glob("event_month=*")
        for f in d.iterdir()
        if f.is_file()
    }
    assert on_disk == model
    # and the snapshot still resolves to the same set afterwards
    assert set(snapshot(str(root))[1]) == model
