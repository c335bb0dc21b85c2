"""Round-2 continuation batch 8: chi-square contingency association,
sliding-window exact distinct counts, TPC-H Q3-shape top-k join.

Oracle parity runs in the parametrized test_oracle_parity; here we
assert ENGINE invariants the oracle can't see: marginal consistency and
the zero-contribution independence case for the chi-square cells,
brute-force window membership for the sliding distinct count, and the
distributed-top-k plan shape for the Q3 query.
"""

from __future__ import annotations

from datetime import datetime

import pyspark.sql.functions as F

from logpipe_spark.operators.aggregate import chisq_contingency, sliding_distinct


# ------------------------------------------------------------ chi-square

def test_chisq_marginals_and_known_cells(spark):
    rows = [("en", "s1")] * 3 + [("en", "s2")] * 1 + [("fr", "s1")] * 1 + [
        ("fr", "s2")] * 3 + [(None, "s1"), ("en", None)]  # nulls dropped
    df = spark.createDataFrame(rows, "lang string, source string")
    out = {(r.lang, r.source): r
           for r in chisq_contingency(df, "lang", "source").collect()}
    assert set(out) == {("en", "s1"), ("en", "s2"), ("fr", "s1"), ("fr", "s2")}
    cell = out[("en", "s1")]
    assert (cell.n_obs, cell.n_row, cell.n_col, cell.n_total) == (3, 4, 4, 8)
    assert cell.expected == 2.0
    assert cell.contrib == 0.5  # (3-2)^2 / 2
    # marginal consistency: cells of one row sum to that row's total
    assert out[("en", "s1")].n_obs + out[("en", "s2")].n_obs == cell.n_row
    assert sum(r.n_obs for r in out.values()) == cell.n_total


def test_chisq_independent_table_has_zero_contrib(spark):
    # perfectly independent 2x3 table: every contrib must be exactly 0.0
    rows = [(a, b) for a in ("x", "y") for b in ("p", "q", "r")
            for _ in range(4)]
    df = spark.createDataFrame(rows, "lang string, source string")
    out = chisq_contingency(df, "lang", "source").collect()
    assert len(out) == 6
    assert all(r.expected == 4.0 and r.contrib == 0.0 for r in out)


# ------------------------------------------------------ sliding distinct

def test_sliding_distinct_brute_force(spark):
    ts = [
        ("2024-01-01 00:05:00", 1),
        ("2024-01-01 00:05:00", 1),   # duplicate user, same window set
        ("2024-01-01 00:29:00", 2),
        ("2024-01-01 00:31:00", 3),   # next slide bucket
        ("2024-01-01 01:00:00", 1),
        (None, 9),                     # null ts dropped
    ]
    df = spark.createDataFrame(ts, "ts string, user_id int").select(
        F.col("ts").cast("timestamp").alias("ts"), "user_id")
    out = {r.window_start.replace(tzinfo=None): r
           for r in sliding_distinct(df, "ts", "user_id").collect()}

    # brute force: every event belongs to exactly the two windows
    # [floor30(t), +1h) and [floor30(t)-30m, +1h)
    epoch = datetime(1970, 1, 1)
    expect: dict[datetime, set[int]] = {}
    counts: dict[datetime, int] = {}
    for s, uid in ts:
        if s is None:
            continue
        eu = int((datetime.fromisoformat(s) - epoch).total_seconds())
        base = (eu // 1800) * 1800
        for ws in (base, base - 1800):
            key = datetime.utcfromtimestamp(ws)
            expect.setdefault(key, set()).add(uid)
            counts[key] = counts.get(key, 0) + 1

    assert set(out) == set(expect)
    for ws, users in expect.items():
        row = out[ws]
        assert row.n_keys == len(users), ws
        assert row.n_events == counts[ws], ws
        assert (row.window_end - row.window_start).total_seconds() == 3600


def test_sliding_distinct_total_fanout(spark):
    # size/slide = 2 -> every non-null event is counted in exactly 2 windows
    df = spark.range(100).select(
        (F.lit("2024-01-01 00:00:00").cast("timestamp")
         + F.make_interval(mins=F.col("id"))).alias("ts"),
        (F.col("id") % 7).alias("user_id"))
    out = sliding_distinct(df, "ts", "user_id")
    assert out.agg(F.sum("n_events")).first()[0] == 200


# ------------------------------------------------------------- Q3 top-k

def test_shipping_priority_plan_is_distributed_topk(spark):
    from __spark_entry__ import q_shipping_priority

    df = q_shipping_priority(spark, "/root/testdata/sf0.001")
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "TakeOrderedAndProject" in plan  # not a global Sort + limit
    rows = df.collect()
    assert 0 < len(rows) <= 10
    cents = [r.revenue_cents for r in rows]
    assert cents == sorted(cents, reverse=True)
    assert all(abs(r.revenue - r.revenue_cents / 100.0) < 1e-12 for r in rows)


# ------------------------------------------------------------- OLS trend

def test_ols_trend_exact_line_and_degenerate_groups(spark):
    from logpipe_spark.operators.aggregate import ols_trend

    rows = [
        ("a", 0, 10), ("a", 1, 12), ("a", 2, 14),   # exact line y = 2x+10
        ("b", 5, 1), ("b", 5, 9),                    # zero x-variance: drop
        ("c", 0, 0), ("c", 2, 5),                    # slope 2.5, icpt 0.0
        ("d", 7, 3),                                 # n < min_n: drop
    ]
    df = spark.createDataFrame(rows, "k string, x int, y int")
    out = {r.k: r for r in ols_trend(df, "k", F.col("x"), F.col("y")).collect()}
    assert set(out) == {"a", "c"}
    assert (out["a"].slope, out["a"].intercept, out["a"].n) == (2.0, 10.0, 3)
    assert (out["c"].slope, out["c"].intercept) == (2.5, 0.0)


# -------------------------------------------------------------- KS drift

def _ks(spark, rows, **kw):
    from logpipe_spark.operators.drift import ks_drift

    df = spark.createDataFrame(rows, "k string, v int, a boolean")
    return {r.k: r for r in
            ks_drift(df, "k", F.col("v"), F.col("a"), **kw).collect()}


def test_ks_drift_known_case_and_bucket_carry(spark):
    # A=[1,2,3], B=[2,4]: CDF gaps 1/3, 1/6, 1/2, 0 -> ks=0.5 at v=3
    rows = ([("g", v, True) for v in (1, 2, 3)]
            + [("g", v, False) for v in (2, 4)])
    for width in (1, 2, 1024):   # width=1/2 force the cross-bucket carry
        out = _ks(spark, rows, bucket_width=width)
        r = out["g"]
        assert (r.n_a, r.n_b, r.ks, r.ks_at_value) == (3, 2, 0.5, 3), width


def test_ks_drift_identical_and_disjoint_samples(spark):
    same = ([("id", v, True) for v in (5, 6, 7)]
            + [("id", v, False) for v in (5, 6, 7)])
    dis = ([("dj", v, True) for v in (1, 2)]
           + [("dj", v, False) for v in (10, 11)])
    one_sided = [("os", 3, True)]  # no B rows: dropped
    out = _ks(spark, same + dis + one_sided)
    assert set(out) == {"id", "dj"}
    assert out["id"].ks == 0.0 and out["id"].ks_at_value == 5
    assert out["dj"].ks == 1.0 and out["dj"].ks_at_value == 2


# ------------------------------------------------- prefix-filter Jaccard

def test_jaccard_prefix_equals_inverted_index(spark):
    from logpipe_spark.trainprep.dedup import (
        jaccard_prefix_pairs, ngram_jaccard_pairs)

    # adversarial corpus: universal boilerplate shingle, a near-dup pair,
    # a disjoint doc, and length-skewed docs the length filter prunes
    rows = [
        (1, "the quick brown fox jumps over the lazy dog"),
        (2, "the quick brown fox jumps over the lazy cat"),
        (3, "completely different words appear in this document here"),
        (4, "the quick brown fox jumps over the lazy dog again and "
            "again with many extra trailing words padding the length"),
        (5, "short text only"),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    for t in (0.3, 0.5, 0.8):
        got = {(r.doc_a, r.doc_b, r.jaccard)
               for r in jaccard_prefix_pairs(docs, k=3, threshold=t,
                                             reuse=None).collect()}
        want = {(r.doc_a, r.doc_b, r.jaccard)
                for r in ngram_jaccard_pairs(docs, k=3, threshold=t,
                                             reuse=None).collect()}
        assert got == want, t
    # sanity at t=0.3: the near-dup pair survives, the disjoint doc never
    surviving = {(r.doc_a, r.doc_b) for r in jaccard_prefix_pairs(
        docs, k=3, threshold=0.3, reuse=None).collect()}
    assert (1, 2) in surviving
    assert all(3 not in p for p in surviving)


# --------------------------------------------------------------- streaks

def test_value_streaks_brute_force_and_nulls(spark):
    from logpipe_spark.operators.spans import value_streaks

    seq = ["a", "a", "a", "b", "a", "a", None, None, "b"]
    rows = [(1, i, v) for i, v in enumerate(seq)] + [(2, 0, "a")]
    df = spark.createDataFrame(rows, "k int, i int, v string")
    out = {(r.k, r.v): r for r in value_streaks(df, "k", "v", ["i"]).collect()}
    # user 1: a-runs 3,2 ; b-runs 1,1 ; null-run 2 (nulls are a value)
    assert (out[(1, "a")].longest_streak, out[(1, "a")].n_streaks,
            out[(1, "a")].n_rows) == (3, 2, 5)
    assert (out[(1, "b")].longest_streak, out[(1, "b")].n_streaks) == (1, 2)
    assert (out[(1, None)].longest_streak, out[(1, None)].n_streaks) == (2, 1)
    assert (out[(2, "a")].longest_streak, out[(2, "a")].n_streaks) == (1, 1)


def test_value_streaks_single_window_exchange(spark):
    from logpipe_spark.operators.spans import value_streaks

    df = spark.createDataFrame(
        [(1, 1, "x"), (1, 2, "x"), (2, 1, "y")], "k int, i int, v string")
    plan = (value_streaks(df, "k", "v", ["i"])
            ._jdf.queryExecution().executedPlan().toString())
    # the lag + running-sum form pays ONE sort (both window ops chain on
    # the same (k)-partitioned order); the two-row_number textbook form
    # would add a second differently-partitioned Sort + Exchange
    assert plan.count("+- Sort ") == 1, plan


# ------------------------------------------------------------ EWMA fold

def test_ewma_smooth_hand_cases(spark):
    from logpipe_spark.operators.aggregate import ewma_smooth

    rows = [
        ("a", 2, 20), ("a", 1, 10), ("a", 3, 40),   # order: 10,20,40
        ("b", 1, 7),                                 # single: ewma = itself
    ]
    df = spark.createDataFrame(rows, "k string, i int, v int")
    out = {r.k: r for r in
           ewma_smooth(df, "k", F.col("v"), ["i"], alpha=0.5).collect()}
    # a: seed 10 -> 10*.5+20*.5 = 15 -> 15*.5+40*.5 = 27.5
    assert (out["a"].n, out["a"].last_value, out["a"].ewma) == (3, 40.0, 27.5)
    assert (out["b"].n, out["b"].ewma) == (1, 7.0)


# --------------------------------------------------------------- Benford

def test_benford_digits_counts_and_constants(spark):
    from logpipe_spark.operators.profile import (
        BENFORD_EXPECTED, benford_digits)

    vals = [1, 19, 123, 2, 25, 9, -5, 0, None]   # digits: 1,1,1,2,2,9
    df = spark.createDataFrame([("g", v) for v in vals], "k string, v int")
    out = {r.digit: r for r in
           benford_digits(df, "k", F.col("v")).collect()}
    assert set(out) == {1, 2, 9}
    assert (out[1].n_obs, out[2].n_obs, out[9].n_obs) == (3, 2, 1)
    assert out[1].n_total == 6
    assert out[1].obs_frac == 0.5
    assert out[1].expected == BENFORD_EXPECTED[1]
    assert out[9].dev == 1 / 6 - BENFORD_EXPECTED[9]


# ------------------------------------------------------------- winsorize

def test_winsorize_clips_to_discrete_bounds(spark):
    from logpipe_spark.operators.aggregate import winsorize

    # 10 values: p10 = 1st element (=0), p90 = 9th (=80); 1000 clips down
    rows = [("g", i, v) for i, v in enumerate(
        [0, 10, 20, 30, 40, 50, 60, 70, 80, 1000])]
    df = spark.createDataFrame(rows, "k string, i long, v long")
    out = {r.i: r for r in winsorize(
        df, "k", "v", p_lo=0.1, p_hi=0.9, tiebreak="i").collect()}
    assert out[9].v == 1000 and out[9].v_w == 80 and out[9].clipped
    assert out[0].v_w == 0 and not out[0].clipped  # p10 element itself
    assert all(not out[i].clipped and out[i].v_w == out[i].v
               for i in range(9))
    assert len(out) == 10  # row-preserving transform


def test_winsorize_preserves_null_key_rows(spark):
    from logpipe_spark.operators.aggregate import winsorize

    rows = [("g", 1, 10), ("g", 2, 20), ("g", 3, 999), (None, 4, 5)]
    df = spark.createDataFrame(rows, "k string, i long, v long")
    out = winsorize(df, "k", "v", p_lo=0.05, p_hi=0.7, tiebreak="i")
    got = {r.i: r for r in out.collect()}
    assert len(got) == 4  # the NULL-key row survives (null-safe join)
    assert got[4].k is None
