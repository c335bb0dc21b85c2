"""NULL-input semantics regressions (second review sweep): operators whose
group/boundary/value columns can be NULL must follow a DOCUMENTED policy,
never join-luck — each case here reproduced a silent corruption before the
fix."""

from __future__ import annotations

from datetime import datetime

from pyspark.sql import functions as F


def _ts(s):
    return datetime(2024, 1, 1, 0, 0, s)


def test_time_weighted_avg_locf_through_null_observation(spark):
    """(0,100), (10s,NULL), (20s,100): LOCF holds 100 the whole window —
    the NULL row used to count 10 s of duration with zero value mass,
    deflating the average to 50.00."""
    from logpipe_spark.operators.gapfill import time_weighted_avg

    df = spark.createDataFrame(
        [(1, 1, _ts(0), 100.0), (1, 2, _ts(10), None),
         (1, 3, _ts(20), 100.0)],
        "user_id long, event_id long, ts timestamp, value double")
    r = time_weighted_avg(df, "ts", ["user_id"], "value").collect()[0]
    assert (r.n_intervals, r.total_seconds) == (1, 20)
    assert r.twa_cents == 10000.0          # 100.00 held throughout


def test_gapfill_interp_valueless_bucket_is_target_not_anchor(spark):
    """Hourly buckets A(100), B(all-NULL values), C(300): B used to serve
    as a TIME anchor while the VALUE anchors skipped it — blending C's
    value as if reached at B's time. Now B is an interpolation TARGET
    (anchors are value-bearing buckets only): B = 100 + (300-100)*1h/2h
    = 200; and sum_cents-bearing rows pass through untouched."""
    from logpipe_spark.operators.gapfill import time_gapfill_interp

    rows = [(1, datetime(2024, 1, 1, 0, 0, 0), 1.0),
            (1, datetime(2024, 1, 1, 1, 0, 0), None),   # observed, valueless
            (1, datetime(2024, 1, 1, 2, 0, 0), 3.0)]
    df = spark.createDataFrame(rows, "user_id long, ts timestamp, value double")
    out = {r.bucket_ts.hour: r for r in time_gapfill_interp(
        df, "ts", ["user_id"], "value", 3600).collect()}
    assert out[0].interp_cents == 100 and out[2].interp_cents == 300
    mid = out[1]
    assert not mid.is_gap and mid.n_events == 1 and mid.sum_cents is None
    assert mid.interp_cents == 200         # linear blend at B's OWN time


def test_interval_concurrency_drops_null_boundaries(spark):
    """A NULL end used to leave a lone -1 delta in a NULL bucket that
    sorts first, folding -1 into EVERY real bucket's carry — the whole
    curve shifted down by one."""
    from logpipe_spark.operators.sweep import interval_concurrency

    df = spark.createDataFrame(
        [(_ts(0), _ts(10)), (_ts(5), None), (_ts(2), _ts(8))],
        "s timestamp, e timestamp")
    out = sorted(interval_concurrency(df, "s", "e").collect(),
                 key=lambda r: r.t)
    assert [r.concurrent for r in out] == [1, 2, 1, 0]  # returns to zero
    assert all(r.t is not None for r in out)


def test_pareto_front_drops_null_coordinates(spark):
    from logpipe_spark.operators.skyline import pareto_front

    df = spark.createDataFrame(
        [(None, 5), (1, 1), (2, 3)], "x long, y long")
    out = sorted((r.x, r.y) for r in pareto_front(df, "x", "y").collect())
    assert out == [(2, 3)]                 # NULL-x row neither kept nor lost


def test_hll_ignores_null_keys(spark):
    """COUNT(DISTINCT) ignores NULLs: estimates with and without NULL keys
    must be identical (the phantom NULL register used to add one)."""
    from logpipe_spark.operators.hll import hll_distinct

    clean = spark.createDataFrame(
        [("g", i) for i in range(50)], "g string, k long")
    noisy = clean.unionByName(spark.createDataFrame(
        [("g", None)] * 7, "g string, k long"))
    a = hll_distinct(clean, "k", ["g"]).collect()[0].hll_distinct
    b = hll_distinct(noisy, "k", ["g"]).collect()[0].hll_distinct
    assert a == b


def test_percentiles_and_mad_ignore_null_values(spark):
    """NULLs sort FIRST under Spark asc: unfiltered they occupy the lowest
    ranks, shift every percentile/median, and can BE the selected element
    (percentile_disc/median semantics ignore NULLs)."""
    from logpipe_spark.operators.aggregate import (median_mad,
                                                   percentiles_disc,
                                                   weighted_median)

    rows = ([("g", None)] * 5
            + [("g", v) for v in (10, 20, 30, 40, 50)])
    df = spark.createDataFrame(rows, "k string, v long")
    p = percentiles_disc(df, "k", "v", ps=(0.5,)).collect()[0]
    assert (p.p50, p.n) == (30, 5)           # was NULL / n=10 before

    m = median_mad(df, "k", "v").collect()[0]
    assert (m.median_value, m.n) == (30, 5)  # lower median of 5 reals

    wrows = [("g", None, 4), ("g", 1, 1), ("g", 2, 1), ("g", 3, 1)]
    wdf = spark.createDataFrame(wrows, "k string, v long, w long")
    wm = weighted_median(wdf, "k", "v", "w").collect()[0]
    assert (wm.median_value, wm.total_weight) == (2, 3)  # null weight out


def test_snapshot_diff_null_key_in_both_is_not_added(spark):
    """The key join is NULL-SAFE, so a NULL-key row present in BOTH
    snapshots matches — presence must come from an explicit side marker,
    not key.isNotNull() (which misclassified the matched pair as
    'added')."""
    from logpipe_spark.operators.diff import snapshot_diff

    old = spark.createDataFrame([(None, 1), (1, 2)], "k long, v long")
    new = spark.createDataFrame([(None, 1), (2, 9)], "k long, v long")
    out = {r.k: r.change_type for r in snapshot_diff(
        old, new, ["k"], include_unchanged=True).collect()}
    assert out[None] == "unchanged"
    assert out[1] == "removed" and out[2] == "added"


def test_cli_exclude_matches_keeps_null_field_rows(spark):
    """--exclude-matches with a NULL filter field: ~NULL is NULL and
    filter() would drop the non-matching row — the predicate must
    coalesce to False before negation."""
    import argparse

    from logpipe_spark.cli import apply_transforms, build_parser

    args = build_parser().parse_args(
        ["-i", "x", "--filter", "tool:bash", "--exclude-matches"])
    df = spark.createDataFrame(
        [("c1", "bash"), ("c2", None), ("c3", "editor")],
        "conv_id string, tool string")
    kept = {r.conv_id for r in apply_transforms(df, args).collect()}
    assert kept == {"c2", "c3"}


def test_cli_select_merges_shared_top_level(spark):
    from logpipe_spark.cli import apply_transforms, build_parser

    args = build_parser().parse_args(["-i", "x", "--select", "m.a,m.b,x"])
    df = spark.createDataFrame(
        [((1, 2), 9)], "m struct<a:int,b:int>, x int")
    out = apply_transforms(df, args)
    assert out.columns == ["m", "x"]       # ONE merged struct, no dupes
    r = out.collect()[0]
    assert (r.m.a, r.m.b, r.x) == (1, 2, 9)


def test_audio_chunk_plan_honors_chunk_ms(spark):
    """n chunks derives from the REQUESTED window — the stored n_chunks
    column was computed with the default 30 s window, so chunk_ms=10000
    used to cover only a third of the audio."""
    from logpipe_spark.trainprep.multimodal import audio_chunk_plan

    meta = spark.createDataFrame([(1, 60000, 2)],
                                 "doc_id long, duration_ms int, n_chunks int")
    out = sorted((r.chunk_idx, r.start_ms, r.end_ms) for r in
                 audio_chunk_plan(meta, chunk_ms=10000).collect())
    assert len(out) == 6
    assert out[0] == (0, 0, 10000) and out[-1] == (5, 50000, 60000)


def test_peak_rate_null_key_is_a_group(spark):
    import datetime as dt
    from logpipe_spark.operators.sweep import peak_rate

    t0 = dt.datetime(2024, 1, 1)
    rows = [(None, t0), (None, t0 + dt.timedelta(seconds=30)),
            (1, t0)]
    df = spark.createDataFrame(rows, "user_id int, ts timestamp")
    out = {r.user_id: r.peak_n
           for r in peak_rate(df, window_seconds=60).collect()}
    assert out == {None: 2, 1: 1}


def test_theil_sen_null_key_is_a_series(spark):
    from pyspark.sql import functions as F
    from logpipe_spark.operators.aggregate import theil_sen

    rows = [(None, 0, 0), (None, 1, 2), (None, 2, 4), ("a", 0, 0),
            ("a", 1, 1)]
    df = spark.createDataFrame(rows, "k string, x int, y int")
    out = {r.k: r.slope for r in
           theil_sen(df, "k", F.col("x"), F.col("y")).collect()}
    assert out == {None: 2.0, "a": 1.0}
