"""Deterministic HLL (operators/hll.py): accuracy on both estimator
branches, exact mergeability, and the bounded-shuffle sketch shape."""

from __future__ import annotations

from pyspark.sql import functions as F

from logpipe_spark.operators.hll import (
    hll_distinct,
    hll_estimate,
    hll_merge,
    hll_sketch,
)

P = 9
M = 1 << P


def test_hll_accuracy_linear_branch(spark):
    # n << m exercises the linear-counting branch; it is near-exact there
    n = 80
    df = spark.range(n).select(F.concat(F.lit("k"), F.col("id")).alias("k"),
                               F.lit("g").alias("g"))
    est = hll_distinct(df, "k", ["g"], p=P).collect()[0]["hll_distinct"]
    assert abs(est - n) <= max(5, 0.10 * n), est


def test_hll_accuracy_raw_branch(spark):
    # n >> m forces the raw HLL branch; rse = 1.04/sqrt(m) ~ 4.6%
    n = 50_000
    df = spark.range(n).select(F.concat(F.lit("k"), F.col("id")).alias("k"),
                               F.lit("g").alias("g"))
    est = hll_distinct(df, "k", ["g"], p=P).collect()[0]["hll_distinct"]
    assert abs(est - n) / n < 0.15, est


def test_hll_merge_equals_whole(spark):
    df = spark.range(5_000).select(
        F.concat(F.lit("k"), F.col("id")).alias("k"),
        (F.col("id") % 3).cast("string").alias("g"))
    a = hll_sketch(df.filter(F.col("id") < 2_000), "k", ["g"], p=P)
    b = hll_sketch(df.filter(F.col("id") >= 2_000), "k", ["g"], p=P)
    merged = hll_merge(a.unionByName(b), ["g"])
    whole = hll_sketch(df, "k", ["g"], p=P)
    assert (sorted(map(tuple, merged.collect()))
            == sorted(map(tuple, whole.collect())))
    # and the estimate off the merged sketch equals the one-shot estimate
    em = sorted(map(tuple, hll_estimate(merged, ["g"], p=P).collect()))
    ew = sorted(map(tuple, hll_distinct(df, "k", ["g"], p=P).collect()))
    assert em == ew


def test_hll_duplicates_do_not_move_estimate(spark):
    base = spark.range(1_000).select(
        F.concat(F.lit("k"), F.col("id")).alias("k"), F.lit("g").alias("g"))
    dup = base.unionByName(base).unionByName(base)
    e1 = hll_distinct(base, "k", ["g"], p=P).collect()[0]["hll_distinct"]
    e3 = hll_distinct(dup, "k", ["g"], p=P).collect()[0]["hll_distinct"]
    assert e1 == e3


def test_hll_sketch_bounded_and_partial_agg(spark):
    df = spark.range(20_000).select(
        F.concat(F.lit("k"), F.col("id")).alias("k"), F.lit("g").alias("g"))
    sk = hll_sketch(df, "k", ["g"], p=P)
    assert sk.count() <= M
    plan = sk._jdf.queryExecution().executedPlan().toString()
    # map-side combine before the exchange caps shuffle rows at m per task
    assert plan.count("HashAggregate") >= 2
