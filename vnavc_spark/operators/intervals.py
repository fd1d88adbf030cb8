"""Interval analytics: sessionization to intervals and sweep-line
concurrency.

The sweep-line (+1 at interval start, −1 at end, running sum) is the
classic max-overlap algorithm; the Spark shape here is a TWO-LEVEL
prefix sum so no day's point stream ever funnels through one task's
sort in a single global window: points aggregate per (day, hour)
bucket with a local running sum, hour buckets carry their totals
forward through a tiny per-day window (≤ 24 rows per day), and the
day maximum is max over hours of (carry-in + local max). The regroup
is exact — bucketing by hour(t) preserves the (t, delta) sweep order,
so the two-level prefix sums are bit-identical to a single sweep.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def session_intervals(
    events: DataFrame,
    gap_s: int = 1800,
    user_col: str = "user_id",
    ts_col: str = "ts",
    id_col: str = "event_id",
) -> DataFrame:
    """Collapse an event stream into session intervals
    (user, session_id, s_start, s_end) with a ``gap_s`` inactivity
    boundary — the interval-producing form of q31's sessionize (same
    lag + running-sum shape, one shuffle on the user key shared by
    both windows and the final aggregate)."""
    sec = F.unix_timestamp(ts_col)
    w = Window.partitionBy(user_col).orderBy(ts_col, id_col)
    t = events.select(user_col, id_col, ts_col).withColumn(
        "_sec", sec
    ).withColumn("_prev", F.lag("_sec").over(w))
    s = t.withColumn(
        "_new",
        F.when(
            F.col("_prev").isNull() | (F.col("_sec") - F.col("_prev") > gap_s),
            1,
        ).otherwise(0),
    )
    sid = F.sum("_new").over(
        w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        s.withColumn("session_id", sid)
        .groupBy(user_col, "session_id")
        .agg(
            F.min(ts_col).alias("s_start"),
            F.max(ts_col).alias("s_end"),
        )
    )


def max_concurrency_by_day(
    intervals: DataFrame,
    start_col: str = "s_start",
    end_col: str = "s_end",
) -> DataFrame:
    """Per-day maximum number of simultaneously-active CLOSED
    intervals [start, end], plus the count of intervals touching the
    day. Sweep convention: at equal timestamps starts count before
    ends (two intervals meeting at an instant overlap).

    Multi-day intervals are clipped into per-day segments — a
    segment starting at midnight carries the open interval into the
    day, so cross-day state needs no separate carry pass. The −1
    point is emitted only in the interval's final day (the interval
    stays counted through every earlier day's end, which is exactly
    its live range there).

    Scale shape: one shuffle builds the (day, t, delta) point
    aggregate; the sweep itself is the two-level prefix sum in the
    module docstring — per-(day, hour) local running sums plus a
    ≤ 24-row hour-carry window per day. No global sort, no
    whole-day single-task sort.
    """
    from vnavc_spark.cache import tracked_persist

    st, en = F.col(start_col), F.col(end_col)
    # feeds both the sweep points and the per-day session counts —
    # unpersisted, the upstream (often a sessionization with its own
    # shuffle) runs once per consumer
    # inverted intervals (end < start) are dropped, matching the
    # empty generate_series a SQL oracle produces for them —
    # F.sequence(start, stop) would otherwise step BACKWARDS and
    # explode a descending garbage day list (round-5 advice)
    days = tracked_persist(
        intervals.filter(en >= st).select(
            st.alias("_s"),
            en.alias("_e"),
            F.explode(F.sequence(F.to_date(st), F.to_date(en))).alias("day"),
        ),
        "interval_days",
    )
    day_ts = F.col("day").cast("timestamp")
    start_pts = days.select(
        "day",
        F.greatest(F.col("_s"), day_ts).alias("t"),
        F.lit(1).alias("delta"),
    )
    end_pts = days.filter(F.to_date("_e") == F.col("day")).select(
        "day", F.col("_e").alias("t"), F.lit(-1).alias("delta")
    )
    pts = start_pts.unionByName(end_pts)
    agg = pts.groupBy("day", "t", "delta").agg(
        F.sum("delta").cast("long").alias("dsum")
    )
    hour = F.date_trunc("hour", "t")
    wl = (
        Window.partitionBy("day", "_h")
        .orderBy(F.col("t").asc(), F.col("delta").desc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    loc = agg.withColumn("_h", hour).withColumn(
        "run", F.sum("dsum").over(wl)
    )
    ha = loc.groupBy("day", "_h").agg(
        F.max("run").alias("lmax"), F.sum("dsum").alias("ltot")
    )
    wh = (
        Window.partitionBy("day")
        .orderBy("_h")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    ha = ha.withColumn(
        "carry", F.coalesce(F.sum("ltot").over(wh), F.lit(0).cast("long"))
    )
    daymax = ha.groupBy("day").agg(
        F.max(F.col("carry") + F.col("lmax")).cast("long").alias(
            "max_concurrent"
        )
    )
    nses = days.groupBy("day").agg(
        F.count("*").cast("long").alias("n_sessions")
    )
    return daymax.join(nses, on="day").select(
        F.date_format("day", "yyyy-MM-dd").alias("day"),
        "n_sessions",
        "max_concurrent",
    )


def coverage_by_day(
    intervals: DataFrame,
    start_col: str = "s_start",
    end_col: str = "s_end",
) -> DataFrame:
    """Per-day union coverage of an interval set — how much of each
    day was covered by AT LEAST ONE interval (microseconds), how many
    disjoint covered stretches ("islands") there were, and the
    longest one. The utilization / SLA-coverage complement of
    ``max_concurrency_by_day``: that one asks "how deep was the
    overlap", this one asks "how wide was the union".

    Semantics: intervals are closed; intervals that touch
    (next.start == prev.end) merge into one island; only
    positive-length per-day segments contribute (a single-point
    interval covers zero time and is dropped, matching the
    ``es > ss`` filter a SQL oracle applies). Multi-day intervals are
    clipped to [day 00:00, next-day 00:00] per day.

    Scale shape: island detection is the classic sorted sweep
    (running max of interval ends; a new island starts where
    ``start > max(all previous ends)``) — but both prefix
    computations (the running END max and the running island-break
    sum) are TWO-LEVEL: local within (day, hour-of-start) windows
    plus a ≤ 24-row per-day hour-carry window, so no whole-day
    single-task sort exists. The regroup is exact because the hour
    bucket is a monotonic function of the sort key ``ss``."""
    from vnavc_spark.cache import tracked_persist

    st, en = F.col(start_col), F.col(end_col)
    # clip each interval into per-day segments in epoch MICROseconds
    # (the testdata timestamps carry sub-ms precision; µs arithmetic
    # keeps every boundary integer-exact on both engines).
    # inverted intervals are dropped BEFORE F.sequence (round-5
    # advice: a descending sequence explodes, it isn't empty)
    seg = (
        intervals.filter(en >= st)
        .select(
            st.alias("_s"),
            en.alias("_e"),
            F.explode(F.sequence(F.to_date(st), F.to_date(en))).alias("day"),
        )
        .select(
            "day",
            F.unix_micros(
                F.greatest(F.col("_s"), F.col("day").cast("timestamp"))
            ).alias("ss"),
            F.unix_micros(
                F.least(
                    F.col("_e"),
                    F.date_add(F.col("day"), 1).cast("timestamp"),
                )
            ).alias("es"),
        )
        .filter(F.col("es") > F.col("ss"))
    )
    # hour-of-start bucket: any monotonic bucketing of ss keeps the
    # (ss, es) sweep order across buckets, so the two-level prefix
    # max/sum below is bit-identical to one per-day sweep
    seg = tracked_persist(
        seg.withColumn("_h", F.expr("ss div 3600000000")), "coverage_seg"
    )
    wl_prev = (
        Window.partitionBy("day", "_h")
        .orderBy("ss", "es")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    loc = seg.withColumn("pmax_loc", F.max("es").over(wl_prev))
    wh = (
        Window.partitionBy("day")
        .orderBy("_h")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    ha = (
        seg.groupBy("day", "_h")
        .agg(F.max("es").alias("hmax"))
        .withColumn("carry", F.max("hmax").over(wh))
        .select("day", "_h", "carry")
    )
    # greatest() skips nulls: first row of the first hour has neither
    # a local prefix nor a carry -> null pmax -> island break
    pmax = F.greatest("pmax_loc", "carry")
    b = tracked_persist(
        loc.join(ha, ["day", "_h"]).withColumn(
            "brk",
            F.when(pmax.isNull() | (F.col("ss") > pmax), F.lit(1))
            .otherwise(F.lit(0))
            .cast("long"),
        ),
        "coverage_brk",
    )
    wl_cur = (
        Window.partitionBy("day", "_h")
        .orderBy("ss", "es")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    t = b.withColumn("lsum", F.sum("brk").over(wl_cur))
    hb = (
        b.groupBy("day", "_h")
        .agg(F.sum("brk").alias("btot"))
        .withColumn(
            "bcarry",
            F.coalesce(F.sum("btot").over(wh), F.lit(0).cast("long")),
        )
        .select("day", "_h", "bcarry")
    )
    isl = (
        t.join(hb, ["day", "_h"])
        .withColumn("island", F.col("bcarry") + F.col("lsum"))
        .groupBy("day", "island")
        .agg(F.min("ss").alias("i_s"), F.max("es").alias("i_e"))
    )
    return (
        isl.groupBy("day")
        .agg(
            F.count("*").cast("long").alias("n_islands"),
            F.sum(F.col("i_e") - F.col("i_s")).cast("long").alias(
                "covered_us"
            ),
            F.max(F.col("i_e") - F.col("i_s")).cast("long").alias(
                "longest_us"
            ),
        )
        .select(
            F.date_format("day", "yyyy-MM-dd").alias("day"),
            "n_islands",
            "covered_us",
            "longest_us",
        )
    )
