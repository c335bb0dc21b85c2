"""Two-sample distribution drift: the Kolmogorov–Smirnov statistic.

The drift gate a training-data pipeline runs before trusting a new batch:
"does this week's value distribution still look like last week's?" KS is
the max gap between the two empirical CDFs — and unlike PSI or KL it
needs NO log(), so every emitted double derives from exact integer
cumulative counts through single IEEE divisions and passes the exact
cross-engine hash gate.

No reference counterpart (the reference has no ordered analytics at all —
SURVEY.md §2.4). The naive formulation is a cumulative sum over a global
per-key value order — the single-reducer window trap — so the cumulative
counts run through the same two-level bucketed prefix scan as
``operators/sweep.py:interval_concurrency`` / ``spans.py:sequence_gaps``:

1. ONE map-side-combinable shuffle collapses the corpus to per
   (key, distinct value) counts for each sample — within-value order
   vanishes before any scan, so the statistic is deterministic by
   construction.
2. In-bucket cumulative sums window on (key, value-bucket); the
   cross-bucket carry is an exclusive prefix over the values/width
   summary frame, broadcast back — no per-key single-task scan.
3. Sample totals are key-cardinality-sized and broadcast; the max-gap
   and its argmin location re-aggregate the distinct-values frame.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

__all__ = ["ks_drift", "ks_from_counts"]


def ks_drift(
    df: DataFrame,
    key: str,
    value: Column,
    sample_a: Column,
    bucket_width: int = 1024,
    min_n: int = 1,
) -> DataFrame:
    """Per-group two-sample KS statistic between the rows where
    ``sample_a`` is true (sample A) and the rest (sample B), over the
    INTEGER-valued ``value`` column (pass cents / rebased units — the
    usual exact-stats discipline).

    Returns (key, n_a, n_b, ks, ks_at_value): the max
    ``|F_A(v) − F_B(v)|`` over the pooled distinct values, and the
    smallest value attaining it. Groups where either sample is smaller
    than ``min_n`` are dropped (the statistic is meaningless one-sided).

    ``bucket_width`` sets the prefix-scan grain in VALUE units: per-key
    summary rows ≈ value_range / bucket_width.
    """
    vi = value.cast("bigint")
    # rows whose sample predicate evaluates to NULL belong to NEITHER
    # sample — drop them rather than letting when().otherwise(0) silently
    # misfile them into sample B and skew F_B
    per_v = (
        df.where(vi.isNotNull() & sample_a.isNotNull())
        .groupBy(key, vi.alias("v"))
        .agg(
            F.sum(F.when(sample_a, 1).otherwise(0)).cast("bigint").alias("ca"),
            F.sum(F.when(sample_a, 0).otherwise(1)).cast("bigint").alias("cb"),
        )
    )
    return ks_from_counts(per_v, key, bucket_width=bucket_width, min_n=min_n)


def ks_from_counts(
    per_v: DataFrame,
    key: str,
    bucket_width: int = 1024,
    min_n: int = 1,
) -> DataFrame:
    """KS statistic from a pre-aggregated count frame (key, v, ca, cb) —
    the mergeable-partial entry point: per-(key, value) counts SUM across
    batches/epochs/shards, so an incremental consumer (e.g. the streaming
    drift monitor) accumulates counts and calls this for the readout.
    Same two-level bucketed prefix scan and exact integer-derived doubles
    as :func:`ks_drift` (which is now a thin wrapper over this)."""
    b = per_v.withColumn("_bkt", F.floor(F.col("v") / F.lit(int(bucket_width))))
    w_in = Window.partitionBy(key, "_bkt").orderBy("v")
    b = (
        b.withColumn("_cuma", F.sum("ca").over(w_in))
        .withColumn("_cumb", F.sum("cb").over(w_in))
    )
    summary = b.groupBy(key, "_bkt").agg(
        F.sum("ca").alias("_ta"), F.sum("cb").alias("_tb"))
    w_b = (
        Window.partitionBy(key).orderBy("_bkt")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    offsets = summary.select(
        key, "_bkt",
        F.coalesce(F.sum("_ta").over(w_b), F.lit(0)).alias("_offa"),
        F.coalesce(F.sum("_tb").over(w_b), F.lit(0)).alias("_offb"),
    )
    cums = b.join(offsets, [key, "_bkt"]).select(
        key, "v",
        (F.col("_cuma") + F.col("_offa")).cast("bigint").alias("cuma"),
        (F.col("_cumb") + F.col("_offb")).cast("bigint").alias("cumb"),
    )
    totals = per_v.groupBy(key).agg(
        F.sum("ca").cast("bigint").alias("n_a"),
        F.sum("cb").cast("bigint").alias("n_b"),
    )
    gaps = (
        cums.join(F.broadcast(totals), key)
        .where((F.col("n_a") >= min_n) & (F.col("n_b") >= min_n))
        .withColumn(
            "gap",
            F.abs(F.col("cuma") / F.col("n_a") - F.col("cumb") / F.col("n_b")),
        )
    )
    ks = gaps.groupBy(key, "n_a", "n_b").agg(F.max("gap").alias("ks"))
    # smallest value attaining the max gap: float equality is safe here —
    # both engines form gap from identical integer operands, so the max
    # and its attaining rows are bit-identical
    at = (
        gaps.join(F.broadcast(ks.select(key, "ks")), key)
        .where(F.col("gap") == F.col("ks"))
        .groupBy(key)
        .agg(F.min("v").alias("ks_at_value"))
    )
    return ks.join(at, key).select(key, "n_a", "n_b", "ks", "ks_at_value")
