"""Bucketed-table co-location: conv-level aggregation without a shuffle."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from logpipe_spark.plans.bucketing import (plan_has_exchange, read_bucketed,
                                           save_bucketed)
from logpipe_spark.synth import synth_transcripts


@pytest.fixture(scope="module")
def bucketed(spark):
    t = synth_transcripts(spark, n_turns=3000, n_convs=60)
    name = "lp_test_bucketed"
    save_bucketed(t, name, buckets=8)
    yield name
    spark.sql(f"DROP TABLE IF EXISTS {name}")


def test_bucketed_agg_has_no_exchange(spark, bucketed):
    t = read_bucketed(spark, bucketed)
    spans = t.groupBy("conv_id").agg(
        F.count(F.lit(1)).alias("n_turns"),
        F.min("ts").alias("first_ts"), F.max("ts").alias("last_ts"))
    assert not plan_has_exchange(spans), "bucketing should elide the shuffle"
    # the same agg over the unbucketed frame DOES shuffle
    raw = synth_transcripts(spark, n_turns=3000, n_convs=60)
    raw_spans = raw.groupBy("conv_id").agg(F.count(F.lit(1)).alias("n"))
    assert plan_has_exchange(raw_spans)


def test_bucketed_results_equal_unbucketed(spark, bucketed):
    t = read_bucketed(spark, bucketed)
    raw = synth_transcripts(spark, n_turns=3000, n_convs=60)
    a = {r.conv_id: r.n for r in
         t.groupBy("conv_id").agg(F.count(F.lit(1)).alias("n")).collect()}
    b = {r.conv_id: r.n for r in
         raw.groupBy("conv_id").agg(F.count(F.lit(1)).alias("n")).collect()}
    assert a == b
