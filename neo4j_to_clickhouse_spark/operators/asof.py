"""Temporal joins Spark has no native operator for: as-of (point-in-time)
and range (interval-containment).

As-of: for each probe (key, t), the latest event row for that key with
``event_time <= t``.

This answers "what was entity X's state when Y happened" without a
per-probe scan: time-travel debugging of CDC state, feature extraction at
label time (the leakage-free training-data join), and reconciliation
against external snapshots.

Scale shape — the union + carry-forward window, NOT a per-probe subquery
or a range self-join:

1. tag events kind=0 and probes kind=1, union them;
2. one hash shuffle on the key, sort within partitions by
   ``(time, kind)`` — so an event at exactly the probe time sorts first
   and is visible to the probe;
3. ``last(col, ignorenulls=True)`` over rows-unbounded-preceding carries
   each event attribute forward to every later row;
4. keep the probe rows.

Cost: ONE shuffle of events+probes, linear window pass, regardless of how
many probes hit the same key. The naive formulations are O(probes x
events-per-key) (range join) or one scan per probe (subquery) — both
collapse at 100 TB.

Known limit of the single-window form: it partitions by KEY, so one hot
key is one task (AQE cannot split window partitions). When a single key
can carry enough rows to stall a task, use ``asof_join_bucketed``, which
runs the same computation partitioned by (key, time-bucket).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    events: DataFrame,
    probes: DataFrame,
    key_col: str,
    event_time_col: str,
    probe_time_col: str,
    value_cols: list[str],
    tie_break_col: str | None = None,
) -> DataFrame:
    """For every probe row, attach the value columns of the latest event
    with ``event_time <= probe_time`` for the same key (NULLs when the key
    has no event at or before the probe time).

    ``tie_break_col`` orders events sharing one timestamp (e.g. event_id)
    so the winner is deterministic — same convention as the latest-state
    view's ``(event_timestamp, event_id)`` total order.

    Output: probe columns (key, probe time) + the carried value columns.
    """
    from pyspark.sql import types as T

    tb = tie_break_col
    # the carried unit is ONE struct of all value columns — carrying each
    # column independently with last(ignorenulls) would stitch attributes
    # from DIFFERENT events whenever a newer event has a NULL column
    struct_t = T.StructType(
        [T.StructField(c, events.schema[c].dataType) for c in value_cols]
    )
    ev = events.select(
        F.col(key_col).alias("__k"),
        F.col(event_time_col).alias("__t"),
        F.lit(0).alias("__kind"),
        (F.col(tb) if tb else F.lit(None).cast("string")).alias("__tb"),
        F.struct(*[F.col(c).alias(c) for c in value_cols]).alias("__v"),
    )
    tb_type = events.schema[tb].dataType if tb else T.StringType()
    pr = probes.select(
        F.col(key_col).alias("__k"),
        F.col(probe_time_col).alias("__t"),
        F.lit(1).alias("__kind"),
        F.lit(None).cast(tb_type).alias("__tb"),
        F.lit(None).cast(struct_t).alias("__v"),
    )
    # (time, kind, tie-break): events at the probe's exact time sort before
    # the probe; among same-time events the highest tie-break wins (it is
    # the last one the carry-forward sees).
    w = (
        Window.partitionBy("__k")
        .orderBy("__t", "__kind", "__tb")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = ev.unionByName(pr).select(
        "__k",
        "__t",
        "__kind",
        F.last("__v", ignorenulls=True).over(w).alias("__c"),
    )
    return carried.filter(F.col("__kind") == 1).select(
        F.col("__k").alias(key_col),
        F.col("__t").alias(probe_time_col),
        *[F.col("__c")[c].alias(c) for c in value_cols],
    )


def asof_join_forward(
    events: DataFrame,
    probes: DataFrame,
    key_col: str,
    event_time_col: str,
    probe_time_col: str,
    value_cols: list[str],
    tie_break_col: str | None = None,
) -> DataFrame:
    """For every probe row, attach the value columns of the EARLIEST
    event with ``event_time >= probe_time`` for the same key — the
    forward as-of ("what happens next": time-to-event features, next-
    touchpoint attribution). NULLs when nothing follows.

    Mirror image of :func:`asof_join` with the same one-shuffle scale
    shape: probes sort BEFORE same-time events (equality matches), the
    carry window looks forward (``first(ignorenulls)`` over
    current-row..unbounded-following), and among same-time events the
    LOWEST ``tie_break_col`` wins — the first one the forward scan sees.
    """
    from pyspark.sql import types as T

    tb = tie_break_col
    struct_t = T.StructType(
        [T.StructField(c, events.schema[c].dataType) for c in value_cols]
    )
    ev = events.select(
        F.col(key_col).alias("__k"),
        F.col(event_time_col).alias("__t"),
        F.lit(1).alias("__kind"),
        (F.col(tb) if tb else F.lit(None).cast("string")).alias("__tb"),
        F.struct(*[F.col(c).alias(c) for c in value_cols]).alias("__v"),
    )
    tb_type = events.schema[tb].dataType if tb else T.StringType()
    pr = probes.select(
        F.col(key_col).alias("__k"),
        F.col(probe_time_col).alias("__t"),
        F.lit(0).alias("__kind"),
        F.lit(None).cast(tb_type).alias("__tb"),
        F.lit(None).cast(struct_t).alias("__v"),
    )
    # __tb sorts nulls LAST: the forward scan takes the FIRST row in
    # order, so under Spark's nulls-first ascending default an event
    # with a NULL tie-break would silently beat every non-null id at
    # the same timestamp (the backward join is immune — its carry takes
    # the LAST row, where nulls-first already makes NULL lose).
    w = (
        Window.partitionBy("__k")
        .orderBy("__t", "__kind", F.asc_nulls_last("__tb"))
        .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    )
    carried = ev.unionByName(pr).select(
        "__k",
        "__t",
        "__kind",
        F.first("__v", ignorenulls=True).over(w).alias("__c"),
    )
    return carried.filter(F.col("__kind") == 0).select(
        F.col("__k").alias(key_col),
        F.col("__t").alias(probe_time_col),
        *[F.col("__c")[c].alias(c) for c in value_cols],
    )


def asof_join_bucketed(
    events: DataFrame,
    probes: DataFrame,
    key_col: str,
    event_time_col: str,
    probe_time_col: str,
    value_cols: list[str],
    tie_break_col: str | None = None,
    bucket_seconds: int = 604800,
) -> DataFrame:
    """Skew-safe variant of :func:`asof_join` — identical semantics, but
    the carry-forward window partitions on ``(key, time-bucket)`` instead
    of the key alone.

    Why it exists: ``asof_join``'s single window partition per key means
    one HOT key (an entity with 10^8 events+probes) serializes into ONE
    task, and AQE cannot split window partitions. Bucketing the timeline
    makes the unit of window work ``(key, bucket)``, so a hot key spreads
    over ``timespan / bucket_seconds`` tasks.

    Two-level carry-forward:

    1. per ``(key, bucket)`` reduce events to the bucket's LAST event —
       a hash aggregate, so partial (map-side) aggregation already spreads
       the hot key across input tasks;
    2. per key, carry bucket-last states forward over the bucket sequence
       (``rowsBetween(unboundedPreceding, -1)`` — strictly earlier
       buckets). This window IS per-key single-task, but its input is one
       row per (key, active bucket): bounded by the calendar, not by the
       event count;
    3. within each ``(key, bucket)``: the usual union + carry-forward
       window, coalesced with the bucket's carried-in baseline for probes
       that precede every in-bucket event.

    Cost vs ``asof_join``: one extra shuffle (the bucket-summary
    aggregate) and a baseline join that reuses the ``(key, bucket)``
    exchange of the main window. Pick ``bucket_seconds`` so a hot key's
    densest bucket fits one task comfortably (default: one week).
    """
    from pyspark.sql import types as T

    tb = tie_break_col
    struct_t = T.StructType(
        [T.StructField(c, events.schema[c].dataType) for c in value_cols]
    )
    tb_type = events.schema[tb].dataType if tb else T.StringType()

    def _bucket(col):
        # floor-to-second is monotone in time, so an event at or before a
        # probe can never land in a LATER bucket than the probe.
        return F.floor(F.unix_timestamp(col) / bucket_seconds).cast("long")

    ev = events.select(
        F.col(key_col).alias("__k"),
        F.col(event_time_col).alias("__t"),
        F.lit(0).alias("__kind"),
        (F.col(tb) if tb else F.lit(None).cast("string")).alias("__tb"),
        F.struct(*[F.col(c).alias(c) for c in value_cols]).alias("__v"),
    ).withColumn("__b", _bucket(F.col("__t")))
    pr = probes.select(
        F.col(key_col).alias("__k"),
        F.col(probe_time_col).alias("__t"),
        F.lit(1).alias("__kind"),
        F.lit(None).cast(tb_type).alias("__tb"),
        F.lit(None).cast(struct_t).alias("__v"),
    ).withColumn("__b", _bucket(F.col("__t")))

    # level 1: each bucket's last event, same (time, tie-break) total order
    # as the window variant
    ev_sum = ev.groupBy("__k", "__b").agg(
        F.max_by(
            F.struct(F.col("__t"), F.col("__tb"), F.col("__v")),
            F.struct(F.col("__t"), F.col("__tb")),
        ).alias("__last")
    )
    # level 2: baseline carried INTO each bucket any event or probe touches
    # (strictly earlier buckets only — in-bucket events are level 3's job)
    buckets = (
        pr.select("__k", "__b")
        .distinct()
        .unionByName(ev_sum.select("__k", "__b"))
        .distinct()
    )
    wb = (
        Window.partitionBy("__k")
        .orderBy("__b")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    base = buckets.join(ev_sum, ["__k", "__b"], "left").select(
        "__k",
        "__b",
        F.last(F.col("__last")["__v"], ignorenulls=True).over(wb).alias("__base"),
    )
    # level 3: in-bucket carry-forward, falling back to the baseline when
    # no in-bucket event precedes the probe
    w = (
        Window.partitionBy("__k", "__b")
        .orderBy("__t", "__kind", "__tb")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = (
        ev.unionByName(pr)
        .join(base, ["__k", "__b"], "left")
        .select(
            "__k",
            "__t",
            "__kind",
            F.coalesce(
                F.last("__v", ignorenulls=True).over(w), F.col("__base")
            ).alias("__c"),
        )
    )
    return carried.filter(F.col("__kind") == 1).select(
        F.col("__k").alias(key_col),
        F.col("__t").alias(probe_time_col),
        *[F.col("__c")[c].alias(c) for c in value_cols],
    )


def range_join(
    events: DataFrame,
    intervals: DataFrame,
    event_time_col: str,
    start_col: str,
    end_col: str,
    bin_seconds: int = 86400,
) -> DataFrame:
    """Inner join of events to every interval containing their timestamp
    (``start <= t < end``), WITHOUT the O(events x intervals) nested-loop
    plan Spark produces for a raw inequality join.

    Standard time-binning: an event belongs to exactly ONE ``bin_seconds``
    bucket of its timestamp; an interval explodes to the (few) buckets it
    overlaps. The join is then a bucket EQUI-join (hash, shuffle bounded by
    events + intervals x bins-per-interval) followed by the exact
    containment filter. Because each event carries one bucket, no
    dedup pass is needed. Pick ``bin_seconds`` near the typical interval
    length: shorter bins fan intervals wider; longer bins make each bucket
    join more non-matching pairs for the filter to drop.

    Output: all interval columns + all event columns (name collisions are
    the caller's to avoid).
    """
    ev = events.withColumn(
        "__bin", (F.unix_timestamp(F.col(event_time_col)) / bin_seconds)
        .cast("long"),
    )
    iv = intervals.withColumn(
        "__bin",
        F.explode(
            F.sequence(
                (F.unix_timestamp(F.col(start_col)) / bin_seconds).cast("long"),
                (F.unix_timestamp(F.col(end_col)) / bin_seconds).cast("long"),
            )
        ),
    )
    return (
        iv.join(ev, "__bin")
        .filter(
            (F.col(event_time_col) >= F.col(start_col))
            & (F.col(event_time_col) < F.col(end_col))
        )
        .drop("__bin")
    )
