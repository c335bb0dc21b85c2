"""Interval-concurrency sweep: how many intervals are open at each instant.

The classic +1/-1 boundary sweep (max concurrent sessions / open orders /
in-flight requests) — a running sum over ALL boundaries in time order,
which is exactly the kind of innocent global-window query that collapses
to a single reducer at scale. This module is the distributed
decomposition, the same two-level prefix-scan shape as
``operators/spans.py:sequence_gaps`` and the segmented as-of join:

1. Boundary deltas pre-aggregate BY TIMESTAMP (one map-side-combinable
   shuffle): the running sum over per-instant NET deltas is independent
   of any within-instant order, so tie-break rules vanish before the
   scan — the sweep is deterministic by construction.
2. The distinct instants bucket by a coarse time grain; each bucket's
   internal cumulative sum is a per-bucket window (embarrassingly
   parallel, shuffled on the bucket key).
3. Bucket TOTALS — n/bucket_width rows — carry the cross-bucket carry:
   an exclusive prefix sum over the tiny summary frame, broadcast back
   by the bucket key. A century of seconds at hourly buckets is <1M
   summary rows; the naive formulation windows every boundary of 100 TB
   through one task.

No reference counterpart (the reference has no ordered analytics at
all — SURVEY.md §2.4); the naive single-window SQL is what the DuckDB
oracle runs.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def interval_concurrency(
    df: DataFrame,
    start_col: str | Column,
    end_col: str | Column,
    bucket_seconds: int = 7 * 24 * 3600,
) -> DataFrame:
    """Concurrency curve for half-open intervals [start, end).

    Returns (t, delta, concurrent): one row per distinct boundary
    instant, with the net change at that instant and the number of
    intervals open at-and-after it. ``max(concurrent)`` is the peak;
    joining back on ``t`` ranges answers "how loaded was the system when
    X happened". End boundaries subtract exactly where start boundaries
    add, so the curve returns to zero after the last interval.

    ``bucket_seconds`` sets the summary-frame grain of the two-level
    prefix sum — pick it so distinct-instants / bucket_seconds partitions
    comfortably (default: weekly buckets).
    """
    start = F.col(start_col) if isinstance(start_col, str) else start_col
    end = F.col(end_col) if isinstance(end_col, str) else end_col
    # NULL boundaries are dropped as a PAIR: an interval missing either
    # endpoint has no defined span, and a lone NULL boundary would form a
    # NULL bucket that sorts FIRST — its delta would fold into every real
    # bucket's carry offset, shifting the whole curve by a constant.
    df = df.where(start.isNotNull() & end.isNotNull())
    bounds = df.select(start.alias("t"), F.lit(1).alias("d")).unionAll(
        df.select(end.alias("t"), F.lit(-1).alias("d"))
    )
    # (1) net delta per instant — map-side combine collapses the 2x-rows
    # boundary stream to one row per distinct instant before the shuffle.
    deltas = bounds.groupBy("t").agg(F.sum("d").cast("bigint").alias("delta"))
    # (2) per-bucket cumulative sums.
    b = deltas.withColumn(
        "_bkt", F.floor(F.unix_micros(F.col("t")) / F.lit(bucket_seconds * 1_000_000))
    )
    w_in = Window.partitionBy("_bkt").orderBy("t")
    b = b.withColumn("_cum", F.sum("delta").over(w_in))
    # (3) exclusive prefix over the bucket summary frame (n/width rows).
    summary = b.groupBy("_bkt").agg(F.sum("delta").alias("_tot"))
    w_b = Window.orderBy("_bkt").rowsBetween(Window.unboundedPreceding, -1)
    offsets = summary.withColumn(
        "_off", F.coalesce(F.sum("_tot").over(w_b), F.lit(0))
    ).select("_bkt", "_off")
    out = b.join(offsets, "_bkt")
    return out.select(
        "t",
        "delta",
        (F.col("_cum") + F.col("_off")).cast("bigint").alias("concurrent"),
    )


def peak_rate(
    events: DataFrame,
    key_col: str = "user_id",
    ts_col: str = "ts",
    window_seconds: int = 60,
) -> DataFrame:
    """Per-key peak sliding-window event rate: the maximum number of
    events inside ANY ``window_seconds`` window (inclusive value-based
    frame ``[t - W, t]`` anchored at each event), plus the earliest
    instant attaining it — the rate-limit / burst-abuse audit ("did this
    user ever exceed N requests per minute, and when first?").

    Exact integers end to end: the frame is a RANGE window over epoch
    MICROSECONDS, so within-tie ordering cannot matter (all peers of an
    instant share one frame — deterministic cross-engine without a
    tiebreak), and peak/first-instant are min/max aggregates of bigints.

    Plan: one shuffle on the key; the RANGE window is per-key (a bot key
    with 10^8 events lands in one partition — AQE skew-split or the
    sessionize_segmented-style decomposition applies if that matters;
    normal keys dominate this audit). Returns
    (key, n_events, peak_n, peak_at_us).
    """
    us = F.expr(f"unix_micros(cast({ts_col} as timestamp))")
    base = events.where(F.col(ts_col).isNotNull()).select(
        F.col(key_col).alias("key"), us.alias("us"))
    w = (
        Window.partitionBy("key").orderBy("us")
        .rangeBetween(-window_seconds * 1_000_000, 0)
    )
    counted = base.select(
        "key", "us", F.count(F.lit(1)).over(w).alias("_in_w"))
    peaks = counted.groupBy("key").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_events"),
        F.max("_in_w").cast("bigint").alias("peak_n"),
    )
    # earliest instant attaining the peak: min-struct argmin over
    # (-count, us) — one aggregate, no second window pass
    arg = counted.groupBy("key").agg(
        F.min(F.struct((-F.col("_in_w")).alias("_neg"),
                       F.col("us").alias("us"))).alias("_a"))
    # NULL-SAFE join: groupBy kept a NULL key as a real group — a plain
    # equi-join would silently drop it (the recurring defect class)
    arg = arg.select(F.col("key").alias("_ak"), "_a")
    return (
        peaks.join(arg, F.col("key").eqNullSafe(F.col("_ak")))
        .select(
            F.col("key").alias(key_col),
            "n_events",
            "peak_n",
            F.col("_a.us").cast("bigint").alias("peak_at_us"),
        )
    )
