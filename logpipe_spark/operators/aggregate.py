"""Aggregations (A1–A4) — exact hash aggregates, Spark-first.

The reference streams partial aggregates out of an in-memory Map, flushing
all groups every 30 s or at 1000 groups (``src/transformers/aggregateTransformer.js:92-96``).
That partial→merge dance is exactly what Spark's HashAggregateExec does
internally (partial_* → exchange → final, with real spill); our batch engine
deliberately emits **exact finals** equal to merging all reference partials
(SURVEY.md §2.3). The streaming analog (update-mode partials) lives in
:mod:`logpipe_spark.streaming`.

Reference quirks documented and not replicated (SURVEY.md §7.4): 1-record
groups emitted without ``count``; stats string-concat on the first CSV value;
we always emit exact counts and cast values to double.
"""

from __future__ import annotations

from typing import Callable, Sequence

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def count_by(df: DataFrame, key: str | Column, alias: str = "turn_count") -> DataFrame:
    """A2 Counter (``aggregateTransformer.js:164-176``): exact count per key."""
    key_col = F.col(key) if isinstance(key, str) else key
    key_name = key if isinstance(key, str) else "group_key"
    return df.groupBy(key_col.alias(key_name) if not isinstance(key, str) else key).agg(
        F.count(F.lit(1)).alias(alias)
    )


def count_by_with_passthrough(
    df: DataFrame, key: str, alias: str = "turn_count"
) -> tuple[DataFrame, DataFrame]:
    """Reference semantic A1: null/undefined keys bypass aggregation and pass
    through unmodified (``aggregateTransformer.js:71-73``). Returns
    (aggregated over non-null keys, passthrough rows)."""
    nulls = df.filter(F.col(key).isNull())
    agg = df.filter(F.col(key).isNotNull()).groupBy(key).agg(F.count(F.lit(1)).alias(alias))
    return agg, nulls


def stats_by(
    df: DataFrame,
    key: str | Sequence[str],
    value: Column | str,
    round_dp: int | None = None,
) -> DataFrame:
    """A3 Stats (``aggregateTransformer.js:185-213``): count/sum/min/max/avg.

    Non-numeric values are skipped via ``try_cast`` → NULL (≙ the isNaN
    guard); Spark aggregate functions ignore NULLs, matching the reference's
    skip-don't-crash semantic. Output columns: count, sum, min, max, avg.
    """
    keys = [key] if isinstance(key, str) else list(key)
    v = (F.col(value) if isinstance(value, str) else value).try_cast("double")
    aggs = [
        F.count(v).alias("count"),
        F.sum(v).alias("sum"),
        F.min(v).alias("min"),
        F.max(v).alias("max"),
        F.avg(v).alias("avg"),
    ]
    if round_dp is not None:
        aggs = [a if i == 0 else F.round(a, round_dp).alias(n)
                for i, (a, n) in enumerate(zip(aggs, ["count", "sum", "min", "max", "avg"]))]
    return df.groupBy(*keys).agg(*aggs)


def fold_by(
    df: DataFrame,
    key: str,
    fold: Callable[[pd.DataFrame], dict],
    out_schema: str,
) -> DataFrame:
    """A1 generic fold (``aggregateFn(acc, record)``, aggregateTransformer.js:33-36)
    as a grouped-map pandas aggregate: the user fold sees the whole group as a
    pandas DataFrame (Arrow-batched — vectorized, not per-row) and returns one
    dict of aggregate values. Key column(s) are prepended automatically.

    At scale this shuffles once on ``key`` — same exchange a builtin groupBy
    needs; prefer builtin aggregate expressions whenever they can express the
    fold.
    """

    def apply(pdf: pd.DataFrame) -> pd.DataFrame:
        res = fold(pdf)
        row = {key: pdf[key].iloc[0], **res}
        return pd.DataFrame([row])

    return df.groupBy(key).applyInPandas(apply, schema=out_schema)


def kmv_distinct(df: DataFrame, group_col: str, key_col: str,
                 k: int = 64) -> DataFrame:
    """KMV (k-minimum-values / bottom-k) distinct-count sketch with
    CROSS-ENGINE-DETERMINISTIC estimates.

    HLL (`approx_count_distinct`) estimates differ between engines by
    construction, so the flagship_approx oracle can only check rows+schema.
    KMV closes that gap: hash keys with md5 (identical in Spark and
    DuckDB), keep the k smallest distinct hashes per group, and estimate

        n ≈ (k - 1) * M / v_k

    where v_k is the k-th smallest hash prefix as an integer and M = 16^8
    is the prefix space — ALL INTEGER ARITHMETIC, so both engines produce
    the identical estimate and the driver's value-hash check passes on an
    approximate aggregate. Groups with fewer than k distinct keys are
    counted exactly (the sketch is lossless below k).

    Scale shape: one distinct shuffle on (group, hash) then a per-group
    bottom-k window — the same cost class as exact distinct. The win over
    exact is NOT this batch form but its mergeability: bottom-k sets union
    across partitions/days into an O(k) state (the streaming/rollup path),
    and the estimate is reproducible anywhere md5 exists.

    Returns (group, n_hashes, estimate): n_hashes = min(k, true distinct).
    """
    from pyspark.sql import Window

    m = 16 ** 8  # value space of an 8-hex-digit prefix
    d = (
        df.select(F.col(group_col).alias("grp"),
                  F.md5(F.col(key_col).cast("string")).alias("h"))
        .distinct()
    )
    w = Window.partitionBy("grp").orderBy("h")
    ranked = d.withColumn("rn", F.row_number().over(w)).filter(F.col("rn") <= k)
    kth = (
        ranked.filter(F.col("rn") == k)
        .select("grp", F.conv(F.substring("h", 1, 8), 16, 10)
                .cast("bigint").alias("vk"))
    )
    return (
        ranked.groupBy("grp").agg(F.count(F.lit(1)).alias("n_hashes"))
        .join(kth, "grp", "left")
        .select(
            F.col("grp").alias(group_col),
            F.col("n_hashes").cast("bigint").alias("n_hashes"),
            F.when(F.col("vk").isNull(), F.col("n_hashes"))
            .otherwise(F.expr(
                f"({k} - 1) * cast({m} AS bigint) div greatest(vk, 1)"))
            .cast("bigint").alias("estimate"),
        )
    )
