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

__all__ = ["interval_join"]

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
