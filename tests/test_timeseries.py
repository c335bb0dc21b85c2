"""Time-series custom operators: as-of join, interval join, hypertable
rollup, exact discrete percentiles.

The driver-shaped oracle parity for the four queries lives in
test_oracle_parity.py; here we check (a) operator semantics against
INDEPENDENT formulations (DuckDB's native ASOF JOIN, a naive Catalyst
inequality join, pandas recomputation) and (b) the PLAN SHAPES that make
them scale — no nested-loop joins, no join at all for as-of.
"""

from __future__ import annotations

import duckdb
import pandas as pd
from pyspark.sql import functions as F

from logpipe_spark.operators.aggregate import percentiles_disc, time_rollup
from logpipe_spark.operators.asof import asof_join
from logpipe_spark.operators.rangejoin import interval_join
from tests.conftest import SF_TINY


def _events(spark):
    return (
        spark.read.parquet(f"{SF_TINY}/events.parquet")
        .withColumn("ts", F.col("ts").cast("timestamp"))
    )


def test_asof_matches_duckdb_native_asof(spark):
    """Third formulation: DuckDB ASOF LEFT JOIN agrees with the engine's
    union+window on the same (click ← latest prior error) task."""
    ev = _events(spark)
    clicks = ev.filter(F.col("event_type") == "click").select("user_id", "event_id", "ts")
    errors = ev.filter(F.col("event_type") == "error").select(
        "user_id", "event_id", "ts"
    )
    got = (
        asof_join(clicks, errors, on=["user_id"], ts="ts",
                  right_cols=["event_id"], prefix="err_", tiebreak="event_id")
        .select("event_id", "err_event_id")
        .toPandas()
        .sort_values("event_id")
        .reset_index(drop=True)
    )
    con = duckdb.connect()
    con.execute(f"CREATE VIEW e AS SELECT * FROM '{SF_TINY}/events.parquet'")
    want = con.sql(
        """
        SELECT l.event_id, r.event_id AS err_event_id
        FROM (SELECT * FROM e WHERE event_type = 'click') l
        ASOF LEFT JOIN (SELECT * FROM e WHERE event_type = 'error') r
          ON l.user_id = r.user_id AND l.ts >= r.ts
        ORDER BY l.event_id
        """
    ).df().reset_index(drop=True)
    assert len(got) == len(want) > 0
    pd.testing.assert_series_equal(
        got["err_event_id"].astype("Int64"), want["err_event_id"].astype("Int64"),
        check_names=False,
    )


def test_asof_plan_has_no_join(spark):
    """The union+window formulation must compile to zero Join operators
    (one exchange + one sort) — the property that makes it linear."""
    ev = _events(spark)
    clicks = ev.filter(F.col("event_type") == "click")
    errors = ev.filter(F.col("event_type") == "error")
    j = asof_join(clicks, errors, on=["user_id"], ts="ts", right_cols=["event_id"])
    plan = j._jdf.queryExecution().executedPlan().toString()
    assert "Join" not in plan, plan
    assert "Union" in plan and "Window" in plan


def test_asof_tolerance_nulls_stale_matches(spark):
    ev = _events(spark)
    clicks = ev.filter(F.col("event_type") == "click").select("user_id", "event_id", "ts")
    errors = ev.filter(F.col("event_type") == "error").select("user_id", "ts")
    loose = asof_join(clicks, errors, on=["user_id"], ts="ts", right_cols=[])
    tight = asof_join(
        clicks, errors, on=["user_id"], ts="ts", right_cols=[],
        tolerance_seconds=600,
    )
    lp = loose.select("event_id", "asof_ts").toPandas().set_index("event_id")
    tp = tight.select("event_id", "ts", "asof_ts").toPandas().set_index("event_id")
    # every within-tolerance match survives; every stale one is nulled
    merged = tp.join(lp, rsuffix="_loose")
    gap = (merged["ts"] - merged["asof_ts_loose"]).dt.total_seconds()
    keep = gap <= 600
    assert merged.loc[keep & merged["asof_ts_loose"].notna(), "asof_ts"].notna().all()
    assert merged.loc[~keep.fillna(False), "asof_ts"].isna().all()
    assert merged["asof_ts"].isna().sum() > merged["asof_ts_loose"].isna().sum()


def test_interval_join_matches_naive_inequality_join(spark):
    """Bucketed range join ≡ Catalyst's nested-loop inequality join, row for
    row — including intervals spanning multiple buckets (width 1 day,
    intervals 3 days long)."""
    orders = spark.read.parquet(f"{SF_TINY}/orders.parquet").limit(40)
    li = spark.read.parquet(f"{SF_TINY}/lineitem.parquet")
    win = orders.select(
        "o_orderkey",
        F.col("o_orderdate").cast("timestamp").alias("start_ts"),
        (F.col("o_orderdate").cast("timestamp") + F.expr("INTERVAL 3 DAYS")).alias("end_ts"),
    )
    pts = li.select(F.col("l_shipdate").cast("timestamp").alias("ship_ts"), "l_orderkey")
    fast = interval_join(win, pts, "start_ts", "end_ts", "ship_ts", bucket_days=1)
    naive = win.join(
        pts,
        (F.col("ship_ts") >= F.col("start_ts")) & (F.col("ship_ts") <= F.col("end_ts")),
    )
    cols = ["o_orderkey", "l_orderkey", "ship_ts"]
    f = fast.select(*cols).toPandas().sort_values(cols).reset_index(drop=True)
    n = naive.select(*cols).toPandas().sort_values(cols).reset_index(drop=True)
    assert len(f) == len(n) > 0
    pd.testing.assert_frame_equal(f, n)


def test_interval_join_plan_is_hash_or_merge_join(spark):
    """The scale property: an equality join on the bucket — never
    BroadcastNestedLoopJoin / CartesianProduct."""
    orders = spark.read.parquet(f"{SF_TINY}/orders.parquet")
    li = spark.read.parquet(f"{SF_TINY}/lineitem.parquet")
    win = orders.select(
        "o_orderkey",
        F.col("o_orderdate").cast("timestamp").alias("start_ts"),
        (F.col("o_orderdate").cast("timestamp") + F.expr("INTERVAL 14 DAYS")).alias("end_ts"),
    )
    pts = li.select(F.col("l_shipdate").cast("timestamp").alias("ship_ts"))
    plan = (
        interval_join(win, pts, "start_ts", "end_ts", "ship_ts")
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "NestedLoop" not in plan and "Cartesian" not in plan, plan
    assert "HashJoin" in plan or "SortMergeJoin" in plan, plan


def test_time_rollup_equals_direct_aggregate(spark):
    """Merging minute partials to hours == aggregating raw rows at hours."""
    ev = _events(spark)
    rolled = time_rollup(ev, "ts", ["event_type"], "value").toPandas()
    direct = (
        ev.groupBy(F.date_trunc("hour", F.col("ts")).alias("bucket_ts"), "event_type")
        .agg(
            F.count("value").cast("bigint").alias("n_events"),
            F.round(F.sum("value"), 2).alias("sum_value"),
            F.min("value").alias("min_value"),
            F.max("value").alias("max_value"),
        )
        .toPandas()
    )
    key = ["bucket_ts", "event_type"]
    r = rolled.sort_values(key).reset_index(drop=True)
    d = direct.sort_values(key).reset_index(drop=True)
    assert len(r) == len(d) > 0
    for c in ["n_events", "min_value", "max_value"]:
        pd.testing.assert_series_equal(r[c], d[c], check_names=False)
    # partial-merged sums can differ from direct sums only below the
    # rounding grain
    assert (r["sum_value"] - d["sum_value"]).abs().max() <= 0.011


def test_percentiles_disc_against_sorted_lists(spark):
    ev = _events(spark)
    got = percentiles_disc(ev, "event_type", "value", (0.5, 0.9), tiebreak="event_id")
    gp = got.toPandas().set_index("event_type")
    raw = ev.select("event_type", "value").toPandas()
    import math

    for et, grp in raw.groupby("event_type"):
        vals = sorted(grp["value"])
        n = len(vals)
        assert gp.loc[et, "n"] == n
        assert gp.loc[et, "p50"] == vals[math.ceil(0.5 * n) - 1]
        assert gp.loc[et, "p90"] == vals[math.ceil(0.9 * n) - 1]


def test_sessionize_partitions_all_events(spark):
    """Sessions tile the per-key event stream: counts conserve, spans are
    non-negative, and no intra-session gap exceeds the threshold (checked
    via recomputation on a small frame)."""
    from logpipe_spark.operators.spans import sessionize

    ev = _events(spark)
    out = sessionize(ev, "user_id", "ts", gap_seconds=21600, tiebreak="event_id")
    p = out.toPandas()
    assert p["n_events"].sum() == ev.count()
    assert (p["span_seconds"] >= 0).all()
    # session_idx is dense 0..k per user
    for _, grp in p.groupby("user_id"):
        assert sorted(grp["session_idx"]) == list(range(len(grp)))


def test_quantize_int8_reconstruction_error_bounded(spark):
    """Dequantized values sit within half a quantization step of the
    original floats, and q stays in int8 range."""
    from logpipe_spark.trainprep.similarity import quantize_int8

    emb = spark.read.parquet(f"{SF_TINY}/embeddings.parquet").limit(50)
    q = (
        emb.select(
            "vec_id",
            F.col("embedding").alias("x"),
            F.array_max(F.transform("embedding", lambda v: F.abs(v.cast("double")))).alias("m"),
        )
        .withColumn("scale", F.lit(127.0) / F.greatest(F.col("m"), F.lit(1e-12)))
        .withColumn("q", F.transform("x", lambda v: F.floor(v.cast("double") * F.col("scale") + F.lit(0.5)).cast("int")))
        .withColumn(
            "max_err",
            F.array_max(F.zip_with("x", "q", lambda xv, qv: F.abs(xv.cast("double") - qv / F.col("scale")))),
        )
        .withColumn("q_min", F.array_min("q"))
        .withColumn("q_max", F.array_max("q"))
    ).toPandas()
    assert (q["q_min"] >= -127).all() and (q["q_max"] <= 127).all()
    # max reconstruction error <= 0.5 / scale (half a step)
    assert (q["max_err"] <= 0.5 / q["scale"] + 1e-12).all()
    # checksums from the operator agree with recomputation
    got = quantize_int8(emb).toPandas().set_index("vec_id")
    import numpy as np
    for _, row in q.iterrows():
        assert got.loc[row["vec_id"], "q_sum"] == int(np.sum(row["q"]))


def test_cms_estimate_is_tight_upper_bound(spark):
    """CMS invariants: estimate >= exact for every key (min of counters can
    never undercount), sketch size <= depth*width, and with width >> keys
    most estimates are exact."""
    from logpipe_spark.operators.skew import cms_estimate, cms_sketch

    ev = _events(spark)
    sketch = cms_sketch(ev, "user_id", depth=3, width=512)
    assert sketch.count() <= 3 * 512
    exact = ev.groupBy("user_id").agg(F.count(F.lit(1)).alias("exact"))
    est = cms_estimate(sketch, exact.select("user_id"), "user_id",
                       depth=3, width=512)
    j = exact.join(est, "user_id").toPandas()
    assert (j["cms_count"] >= j["exact"]).all()
    assert (j["cms_count"] == j["exact"]).mean() > 0.5


def test_rollup_partials_merge_incrementally(spark):
    """The continuous-aggregate contract: fine partials computed on two
    disjoint ingest batches, unioned, merge to the SAME hourly finals as a
    full recompute — even when a batch boundary splits a fine bucket."""
    from logpipe_spark.operators.aggregate import (rollup_merge,
                                                   rollup_partials,
                                                   time_rollup)

    ev = _events(spark)
    # split mid-stream so some minute buckets straddle the two batches
    h1 = ev.filter(F.col("event_id") % 2 == 0)
    h2 = ev.filter(F.col("event_id") % 2 == 1)
    inc = rollup_merge(
        rollup_partials(h1, "ts", ["event_type"], "value").unionByName(
            rollup_partials(h2, "ts", ["event_type"], "value")),
        ["event_type"],
    )
    full = time_rollup(ev, "ts", ["event_type"], "value")
    key = ["bucket_ts", "event_type"]
    a = inc.toPandas().sort_values(key).reset_index(drop=True)
    b = full.toPandas().sort_values(key).reset_index(drop=True)
    assert len(a) == len(b) > 0
    for c in ["n_events", "min_value", "max_value"]:
        pd.testing.assert_series_equal(a[c], b[c], check_names=False)
    assert (a["sum_value"] - b["sum_value"]).abs().max() <= 0.011


def test_percentiles_approx_close_to_exact(spark):
    """The mergeable sketch path tracks the exact rank-based form within
    sketch tolerance (and exactly at accuracy >> n)."""
    from logpipe_spark.operators.aggregate import percentiles_approx

    ev = _events(spark)
    exact = percentiles_disc(ev, "event_type", "value", (0.5, 0.9),
                             tiebreak="event_id").toPandas().set_index("event_type")
    approx = percentiles_approx(ev, "event_type", "value", (0.5, 0.9),
                                accuracy=10000).toPandas().set_index("event_type")
    for et in exact.index:
        for c in ("p50", "p90"):
            lo, hi = exact[c].min(), exact[c].max()
            spread = max(hi - lo, 1.0)
            assert abs(exact.loc[et, c] - approx.loc[et, c]) <= 0.05 * spread + 5.0


def test_asof_segmented_equals_plain_at_all_widths(spark):
    """The prefix-scan decomposition returns byte-identical matches to the
    single-window form — at segment widths forcing many segments (60 s),
    a typical width (1 h), and one segment for everything (10^9 s)."""
    from logpipe_spark.operators.asof import asof_join, asof_join_segmented

    ev = _events(spark)
    clicks = ev.filter(F.col("event_type") == "click").select("user_id", "event_id", "ts")
    errors = ev.filter(F.col("event_type") == "error").select(
        "user_id", "event_id", "value", "ts")
    kw = dict(on=["user_id"], ts="ts", right_cols=["event_id", "value"],
              prefix="err_", tiebreak="event_id")
    plain = (asof_join(clicks, errors, **kw)
             .toPandas().sort_values("event_id").reset_index(drop=True))
    for width in (60, 3600, 10**9):
        seg = (asof_join_segmented(clicks, errors, segment_seconds=width, **kw)
               .toPandas().sort_values("event_id").reset_index(drop=True))
        pd.testing.assert_frame_equal(
            seg[plain.columns], plain, check_dtype=False), width


def test_asof_segmented_equals_plain_on_hot_key(spark):
    """One key holding ~50% of all rows (the skew case the decomposition
    exists for): results still identical, including tolerance nulling."""
    from logpipe_spark.operators.asof import asof_join, asof_join_segmented

    ev = _events(spark)
    hot = ev.withColumn(
        "user_id",
        F.when(F.col("event_id") % 2 == 0, F.lit(7)).otherwise(F.col("user_id")))
    clicks = hot.filter(F.col("event_type") == "click").select("user_id", "event_id", "ts")
    errors = hot.filter(F.col("event_type") == "error").select("user_id", "event_id", "ts")
    kw = dict(on=["user_id"], ts="ts", right_cols=["event_id"],
              prefix="err_", tiebreak="event_id", tolerance_seconds=7200)
    plain = (asof_join(clicks, errors, **kw)
             .toPandas().sort_values("event_id").reset_index(drop=True))
    seg = (asof_join_segmented(clicks, errors, segment_seconds=1800, **kw)
           .toPandas().sort_values("event_id").reset_index(drop=True))
    pd.testing.assert_frame_equal(seg[plain.columns], plain, check_dtype=False)


def test_sessionize_segmented_equals_plain(spark):
    """Segmented sessionization == single-window sessionization at widths
    forcing many segments, a typical width, and one segment — and on a
    hot-key corpus (one user holding ~50% of rows)."""
    from logpipe_spark.operators.spans import sessionize, sessionize_segmented

    for df in (
        _events(spark),
        _events(spark).withColumn(
            "user_id",
            F.when(F.col("event_id") % 2 == 0, F.lit(7))
            .otherwise(F.col("user_id"))),
    ):
        plain = (
            sessionize(df, "user_id", "ts", 21600, tiebreak="event_id")
            .toPandas().sort_values(["user_id", "session_idx"])
            .reset_index(drop=True))
        for width in (7200, 86400, 10**9):
            seg = (
                sessionize_segmented(df, "user_id", "ts", 21600,
                                     segment_seconds=width,
                                     tiebreak="event_id")
                .toPandas().sort_values(["user_id", "session_idx"])
                .reset_index(drop=True))
            pd.testing.assert_frame_equal(
                seg[plain.columns], plain, check_dtype=False)


def test_sequence_gaps_matches_global_lag(spark):
    """Bucketed two-level gap detection == naive global lag, on an id set
    engineered to hit every case: intra-bucket gaps, a gap crossing a
    bucket boundary, and whole buckets absent (width=8 -> buckets 0..)."""
    from logpipe_spark.operators.spans import sequence_gaps

    ids = [0, 1, 2, 5, 6, 7,          # gap 3-4 inside bucket 0
           8, 9,                      # bucket 1 truncated: gap 10-15 crosses
           16,                        # into bucket 2
           40, 41,                    # buckets 3,4 wholly absent: gap 17-39
           42, 63, 64]                # gap 43-62 spans bucket edge at 48,56
    df = spark.createDataFrame([(i,) for i in ids], "event_id long")
    got = {(r.gap_start, r.gap_end)
           for r in sequence_gaps(df, "event_id", bucket_width=8).collect()}
    want = set()
    for a, b in zip(sorted(ids), sorted(ids)[1:]):
        if b - a > 1:
            want.add((a + 1, b - 1))
    assert got == want
    assert (3, 4) in want and (17, 39) in want    # the engineered cases


def test_sequence_gaps_no_gaps_empty(spark):
    from logpipe_spark.operators.spans import sequence_gaps

    df = spark.createDataFrame([(i,) for i in range(20)], "event_id long")
    assert sequence_gaps(df, "event_id", bucket_width=4).count() == 0


def test_asof_tolerance_and_nearest_on_ntz_timestamps(spark):
    """TIMESTAMP_NTZ (the parquet-read default here) cannot cast straight
    to DOUBLE — tolerance and 'nearest' used to throw AnalysisException;
    the epoch math now hops through TIMESTAMP first."""
    from pyspark.sql import functions as F

    from logpipe_spark.operators.asof import asof_join

    left = spark.createDataFrame(
        [("k", "2024-01-01 00:10:00")], "k string, ts string"
    ).select("k", F.col("ts").cast("timestamp_ntz").alias("ts"))
    right = spark.createDataFrame(
        [("k", "2024-01-01 00:00:00", 1), ("k", "2024-01-01 00:11:00", 2)],
        "k string, ts string, v int"
    ).select("k", F.col("ts").cast("timestamp_ntz").alias("ts"), "v")

    back = asof_join(left, right, ["k"], tolerance_seconds=120.0).collect()[0]
    assert back.asof_v is None            # at-or-before match is 600 s stale
    wide = asof_join(left, right, ["k"], tolerance_seconds=3600.0).collect()[0]
    assert wide.asof_v == 1
    near = asof_join(left, right, ["k"], direction="nearest").collect()[0]
    assert near.asof_v == 2               # 60 s forward beats 600 s back


def test_cms_hash_fn_mismatch_raises(spark):
    """A sketch queried under a different hash_fn than it was built with
    must raise, not return plausible garbage (guards the round-3 default
    flip md5 -> xxhash64 for persisted sketches)."""
    import pytest

    from logpipe_spark.operators.skew import cms_estimate, cms_sketch

    ev = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    sketch = cms_sketch(ev, "user_id", depth=2, width=64, hash_fn="md5")
    keys = ev.select("user_id").distinct().limit(5)
    with pytest.raises(ValueError, match="built with hash_fn"):
        cms_estimate(sketch, keys, "user_id", depth=2, width=64,
                     hash_fn="xxhash64")
    # pre-stamp sketches (no hash_fn column) skip the check
    legacy = sketch.drop("hash_fn")
    est = cms_estimate(legacy, keys, "user_id", depth=2, width=64,
                       hash_fn="md5")
    assert est.count() == 5


def test_dispersion_index_fano(spark):
    """Hand-computed Fano factor: counts [3, 1] over two hour windows
    -> mean 2, population var 1, fano 0.5; a uniform key -> fano 0."""
    from logpipe_spark.operators.aggregate import dispersion_index

    rows = (
        # key 'bursty': 3 events in hour 0, 1 event in hour 1
        [("bursty", f"2026-01-01 00:0{m}:00") for m in (1, 2, 3)]
        + [("bursty", "2026-01-01 01:05:00")]
        # key 'steady': 2 events in each of two hours -> var 0
        + [("steady", "2026-01-01 00:01:00"),
           ("steady", "2026-01-01 00:02:00"),
           ("steady", "2026-01-01 01:01:00"),
           ("steady", "2026-01-01 01:02:00")]
    )
    df = spark.createDataFrame(rows, "k string, ts string").select(
        "k", F.col("ts").cast("timestamp").alias("ts"))
    out = {r.k: (r.n_windows, r.n_events, r.fano)
           for r in dispersion_index(df, "k", "ts").collect()}
    assert out["bursty"] == (2, 4, 0.5)
    assert out["steady"] == (2, 4, 0.0)


def test_changepoint_binseg_finds_level_shift(spark):
    """A series that jumps from level 2 to level 10 at hour 6 must split
    exactly there; a flat series has gain 0 at every split (argmax falls
    to the earliest t by the tie rule)."""
    from logpipe_spark.operators.drift import changepoint_binseg

    rows = []
    for h in range(12):
        level = 2 if h < 6 else 10
        for m in range(level):
            rows.append(("step", f"2026-01-01 {h:02d}:{m:02d}:00"))
    for h in range(8):
        for m in range(3):
            rows.append(("flat", f"2026-01-01 {h:02d}:{m:02d}:00"))
    df = spark.createDataFrame(rows, "k string, ts string").select(
        "k", F.col("ts").cast("timestamp").alias("ts"))
    out = {r.k: r for r in changepoint_binseg(df, "k", "ts").collect()}
    st = out["step"]
    assert (st.split_t, st.n_buckets) == (6, 12)
    assert (st.mean_left, st.mean_right) == (2.0, 10.0)
    assert st.gain > 0
    fl = out["flat"]
    assert fl.gain == 0.0 and fl.split_t == 1
    # single-bucket series have no valid split and are absent
    one = spark.createDataFrame(
        [("solo", "2026-01-01 00:00:00")], "k string, ts string"
    ).select("k", F.col("ts").cast("timestamp").alias("ts"))
    assert changepoint_binseg(one, "k", "ts").count() == 0
