"""Interval (range) join — bucketed, never a nested-loop band join.

Joins a table of intervals ``(start_ts, end_ts)`` against a table of points
(one timestamp) on containment ``start <= point <= end`` WITHOUT an equality
key. Catalyst plans a bare inequality join as BroadcastNestedLoopJoin (or a
cartesian product when neither side is small) — O(|intervals|·|points|).

Scale path (the standard bucketed range join, as in Spark's own
spark.sql.sources.v2 range-join rewrites and DataFusion/DuckDB's IEJoin
literature): pick a bucket width ``W``, explode every interval into the
integer buckets it overlaps (``sequence(floor(start/W), floor(end/W))``),
map every point to its single bucket, and hash-join on the bucket with the
containment predicate as a post-filter. Each (interval, point) pair meets in
EXACTLY ONE bucket — the point's own — so no dedup pass is needed. Cost:
one hash shuffle of |points| + |intervals|·(len/W + 1) rows; choose W near
the median interval length so the blow-up factor stays ~2 and each bucket's
candidate set is local. Skew (a bucket holding a hot burst) is handled by
AQE skew-join splitting, same as any hash join.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["interval_join", "interval_overlap_join"]

_SECONDS_PER_DAY = 86400


def interval_join(
    intervals: DataFrame,
    points: DataFrame,
    start: str,
    end: str,
    point_ts: str,
    bucket_days: int = 30,
    how: str = "inner",
) -> DataFrame:
    """Join ``points`` to every interval containing them (inclusive ends).

    ``bucket_days`` is the bucket width; intervals longer than the width
    explode into multiple bucket rows (bounded, linear in len/width).
    ``how='inner'`` keeps only contained pairs; the result carries all
    columns of both inputs.
    """
    if how != "inner":
        raise ValueError("interval_join supports how='inner' (aggregate + join back for outer shapes)")
    common = set(intervals.columns) & set(points.columns)
    if common:
        raise ValueError(
            f"intervals and points share column names {sorted(common)}; "
            "rename before joining (the result carries all columns of both)")
    w = F.lit(bucket_days * _SECONDS_PER_DAY)
    s_epoch = F.col(start).cast("timestamp").cast("long")
    e_epoch = F.col(end).cast("timestamp").cast("long")
    p_epoch = F.col(point_ts).cast("timestamp").cast("long")

    iv = intervals.withColumn(
        "_bucket", F.explode(F.sequence(F.floor(s_epoch / w), F.floor(e_epoch / w)))
    )
    pt = points.withColumn("_bucket", F.floor(p_epoch / w))
    joined = iv.join(pt, on="_bucket", how="inner").where(
        (F.col(point_ts) >= F.col(start)) & (F.col(point_ts) <= F.col(end))
    )
    return joined.drop("_bucket")


def interval_overlap_join(
    left: DataFrame,
    right: DataFrame,
    l_start: str,
    l_end: str,
    r_start: str,
    r_end: str,
    bucket_days: int = 30,
) -> DataFrame:
    """Interval×interval OVERLAP join (inclusive ends): every pair with
    ``l_start <= r_end AND r_start <= l_end``, without an equality key.

    Same bucketed shape as :func:`interval_join`, but both sides explode
    into their covered buckets, so a pair can meet in EVERY bucket their
    intersection spans. Instead of a distinct pass over the (possibly
    large) join output, each pair is ATTRIBUTED to exactly one bucket —
    the first bucket of the intersection, ``floor(max(l_start, r_start)
    / W)`` — and emitted only there: a post-join filter on values both
    rows already carry, no extra shuffle. Cost is one hash join on the
    bucket key; blow-up factor is len/W + 1 per interval, so pick ``W``
    near the median interval length. For a self-join pass the same frame
    twice (with renamed columns) and keep one orientation with a key
    inequality filter on the result.
    """
    common = set(left.columns) & set(right.columns)
    if common:
        raise ValueError(
            f"left and right share column names {sorted(common)}; "
            "rename before joining (the result carries all columns of both)")
    w = F.lit(bucket_days * _SECONDS_PER_DAY)

    def _epoch(c: str):
        return F.col(c).cast("timestamp").cast("long")

    lv = left.withColumn(
        "_bucket",
        F.explode(F.sequence(F.floor(_epoch(l_start) / w),
                             F.floor(_epoch(l_end) / w))))
    rv = right.withColumn(
        "_bucket",
        F.explode(F.sequence(F.floor(_epoch(r_start) / w),
                             F.floor(_epoch(r_end) / w))))
    meet = F.floor(F.greatest(_epoch(l_start), _epoch(r_start)) / w)
    return (
        lv.join(rv, on="_bucket", how="inner")
        .where(
            (F.col(l_start) <= F.col(r_end))
            & (F.col(r_start) <= F.col(l_end))
            & (F.col("_bucket") == meet)
        )
        .drop("_bucket")
    )
