"""Hand-computed cases for the round-4 continuation statistics ops —
the parity suites prove engine==oracle; these prove both equal MATH.
"""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from logpipe_spark.operators.drift import kruskal_wallis, mann_kendall


def test_kruskal_wallis_hand_case(spark):
    # A=[1,2], B=[3,4]: ranks 1..4, R_A=3, R_B=7,
    # H = 12/(4*5) * (3²/2 + 7²/2) - 3*5 = 0.6*29 - 15 = 2.4, no ties.
    df = spark.createDataFrame(
        [("a", 1), ("a", 2), ("b", 3), ("b", 4)], "k string, v long")
    row = kruskal_wallis(df, "k", F.col("v")).collect()[0]
    assert row.n == 4 and row.k == 2 and row.tie_t == 0.0
    assert abs(row.h_raw - 2.4) < 1e-12
    assert abs(row.h - 2.4) < 1e-12


def test_kruskal_wallis_ties_and_degenerate(spark):
    # all values tied -> correction term 1 - T/(n³-n) = 0 -> empty
    df = spark.createDataFrame(
        [("a", 5), ("a", 5), ("b", 5), ("b", 5)], "k string, v long")
    assert kruskal_wallis(df, "k", F.col("v")).count() == 0
    # ties across groups: A=[1,2], B=[2,3] -> doubled avg rank of the
    # tied 2s is 2*2+2-1=5 (avg rank 2.5); T = 2³-2 = 6
    df2 = spark.createDataFrame(
        [("a", 1), ("a", 2), ("b", 2), ("b", 3)], "k string, v long")
    row = kruskal_wallis(df2, "k", F.col("v")).collect()[0]
    # R_A = 1 + 2.5 = 3.5, R_B = 2.5 + 4 = 6.5
    h_raw = 12.0 / 20.0 * (3.5**2 / 2 + 6.5**2 / 2) - 15.0
    corr = 1.0 - 6.0 / 60.0
    assert row.tie_t == 6.0
    assert abs(row.h_raw - h_raw) < 1e-12
    assert abs(row.h - h_raw / corr) < 1e-12


def test_mann_kendall_hand_case(spark):
    # series [1,2,2,3] over days 1..4: S = 5 (five rising pairs, one
    # tie), tie2x = 2, tau_b = 2*5 / sqrt((12-2)*12)
    df = spark.createDataFrame(
        [("k", 1, 1), ("k", 2, 2), ("k", 3, 2), ("k", 4, 3)],
        "g string, d long, v long")
    row = mann_kendall(df, "g", F.col("v"), F.col("d")).collect()[0]
    assert row.n_obs == 4 and row.s_stat == 5 and row.tie_t == 1
    assert abs(row.tau_b - 10.0 / math.sqrt(120.0)) < 1e-12


def test_mann_kendall_all_tied_is_null(spark):
    df = spark.createDataFrame(
        [("k", 1, 7), ("k", 2, 7), ("k", 3, 7)],
        "g string, d long, v long")
    row = mann_kendall(df, "g", F.col("v"), F.col("d")).collect()[0]
    assert row.s_stat == 0
    assert row.tau_b is None


def test_mann_kendall_perfect_trend(spark):
    # strictly increasing, no ties: S = n(n-1)/2, tau_b = 1.0 exactly
    rows = [("k", i, i * 10) for i in range(1, 7)]
    df = spark.createDataFrame(rows, "g string, d long, v long")
    row = mann_kendall(df, "g", F.col("v"), F.col("d")).collect()[0]
    assert row.s_stat == 15
    assert row.tau_b == 1.0


def test_wilson_lower_bound_ranks_small_n_below_large_n(spark, tmp_path):
    # 3/3 must NOT outrank 97/100 under the Wilson lower bound
    nd3, s3 = 3.0, 3.0
    nd100, s100 = 100.0, 97.0

    def wilson(s, n):
        p = s / n
        z2 = 1.96 * 1.96
        num = (p + z2 / (2.0 * n)
               - 1.96 * math.sqrt(p * (1.0 - p) / n + z2 / (4.0 * n * n)))
        return num / (1.0 + z2 / n)

    assert wilson(s3, nd3) < wilson(s100, nd100)


def test_levene_hand_case(spark):
    # group a: 1,3,5 (med 3, z = 2,0,2); group b: 10,10,10,10 (z all 0)
    # Sz_a=4 Qz_a=8 n_a=3; Sz_b=0 n_b=4; N=7 k=2
    # tsum = 16/3 + 0; ssb = 16/3 - 16/7; ssw = 8 - 16/3
    from logpipe_spark.operators.drift import levene_test
    rows = [("a", 1), ("a", 3), ("a", 5)] + [("b", 10)] * 4
    df = spark.createDataFrame(rows, "g string, v long")
    row = levene_test(df, "g", F.col("v")).collect()[0]
    assert row.n == 7 and row.k == 2
    assert abs(row.ss_between - (16.0 / 3 - 16.0 / 7)) < 1e-12
    assert abs(row.ss_within - (8.0 - 16.0 / 3)) < 1e-12
    f_exp = (row.ss_between / 1.0) / (row.ss_within / 5.0)
    assert abs(row.f_stat - f_exp) < 1e-12


def test_levene_even_group_uses_lower_median(spark):
    # group a: 1,2,3,4 -> lower median 2 (position (4+1) div 2 = 2),
    # z = 1,0,1,2; a constant group alone degenerates (ssw=0 filtered)
    from logpipe_spark.operators.drift import levene_test
    rows = [("a", 1), ("a", 2), ("a", 3), ("a", 4),
            ("b", 5), ("b", 7)]
    df = spark.createDataFrame(rows, "g string, v long")
    row = levene_test(df, "g", F.col("v")).collect()[0]
    # z_a sums: S=4, Q=6; z_b: |5-5|,|7-5| -> S=2, Q=4
    assert row.n == 6 and row.k == 2
    tsum = 16.0 / 4 + 4.0 / 2
    assert abs(row.ss_between - (tsum - 36.0 / 6)) < 1e-12
    assert abs(row.ss_within - (10.0 - tsum)) < 1e-12


def test_levene_all_constant_groups_empty(spark):
    from logpipe_spark.operators.drift import levene_test
    rows = [("a", 5)] * 3 + [("b", 9)] * 3
    df = spark.createDataFrame(rows, "g string, v long")
    assert levene_test(df, "g", F.col("v")).count() == 0


def test_cohens_kappa_hand_case(spark):
    # classic 2x2: a/a x20, b/b x15, a/b x10, b/a x5 -> n=50, agree=35
    # po=0.7; marginals a:30/25, b:20/25 -> pe=(750+500)/2500=0.5
    # kappa = 0.2/0.5 = 0.4
    from logpipe_spark.operators.aggregate import cohens_kappa
    rows = ([("a", "a")] * 20 + [("b", "b")] * 15
            + [("a", "b")] * 10 + [("b", "a")] * 5)
    df = spark.createDataFrame(rows, "r1 string, r2 string")
    row = cohens_kappa(df, "r1", "r2").collect()[0]
    assert row.n == 50 and row.n_agree == 35
    assert abs(row.po - 0.7) < 1e-15 and abs(row.pe - 0.5) < 1e-15
    assert abs(row.kappa - 0.4) < 1e-15


def test_cohens_kappa_null_is_a_category(spark):
    # both raters abstain on 2 rows -> those count as agreement
    from logpipe_spark.operators.aggregate import cohens_kappa
    rows = [("a", "a"), ("a", "a"), (None, None), (None, None),
            ("a", None), (None, "a")]
    df = spark.createDataFrame(rows, "r1 string, r2 string")
    row = cohens_kappa(df, "r1", "r2").collect()[0]
    assert row.n == 6 and row.n_agree == 4
    # marginals: a: (3,3), NULL: (3,3) -> pe = (9+9)/36 = 0.5
    assert abs(row.pe - 0.5) < 1e-15


def test_cohens_kappa_constant_raters_degenerate(spark):
    from logpipe_spark.operators.aggregate import cohens_kappa
    df = spark.createDataFrame([("a", "a")] * 5, "r1 string, r2 string")
    row = cohens_kappa(df, "r1", "r2").collect()[0]
    assert row.pe == 1.0 and row.kappa is None


def test_cohens_kappa_disjoint_categories(spark):
    # raters never share a category: pe = 0, kappa = po = 0
    from logpipe_spark.operators.aggregate import cohens_kappa
    df = spark.createDataFrame(
        [("a", "x"), ("b", "y")], "r1 string, r2 string")
    row = cohens_kappa(df, "r1", "r2").collect()[0]
    assert row.pe == 0.0 and row.kappa == 0.0


def test_pr_auc_perfect_and_inverted(spark):
    from logpipe_spark.operators.drift import pr_auc
    # perfect: the positive outranks the negative -> AP = 1
    df = spark.createDataFrame(
        [("k", 100, True), ("k", 10, False)], "g string, v long, y boolean")
    row = pr_auc(df, "g", F.col("v"), F.col("y")).collect()[0]
    assert row.n_pos == 1 and row.n_neg == 1 and row.ap == 1.0
    # inverted: positive ranked below the negative -> AP = P@2 = 0.5
    df2 = spark.createDataFrame(
        [("k", 10, True), ("k", 100, False)], "g string, v long, y boolean")
    row2 = pr_auc(df2, "g", F.col("v"), F.col("y")).collect()[0]
    assert row2.ap == 0.5


def test_pr_auc_hand_case_mixed(spark):
    from logpipe_spark.operators.drift import pr_auc
    # buckets (width 1): 300:pos, 200:neg, 100:pos
    # desc: t1 np=1 tp=1 pp=1 -> 1.0; t2 np=0; t3 np=1 tp=2 pp=3 -> 2/3
    # AP = (1 + 2/3)/2 = 5/6
    rows = [("k", 300, True), ("k", 200, False), ("k", 100, True)]
    df = spark.createDataFrame(rows, "g string, v long, y boolean")
    row = pr_auc(df, "g", F.col("v"), F.col("y"), score_bucket=1).collect()[0]
    assert row.n_thresholds == 3
    assert abs(row.ap - (1.0 + 2.0 / 3.0) / 2.0) < 1e-15


def test_pr_auc_no_positives_dropped(spark):
    from logpipe_spark.operators.drift import pr_auc
    df = spark.createDataFrame(
        [("k", 1, False), ("k", 2, False)], "g string, v long, y boolean")
    assert pr_auc(df, "g", F.col("v"), F.col("y")).count() == 0


def test_rolling_corr_hand_case(spark):
    from logpipe_spark.operators.aggregate import rolling_corr
    # perfectly correlated series -> r = 1; anti-correlated -> r = -1
    rows = [("k", d, d, 2 * d) for d in range(1, 5)]
    rows += [("m", d, d, 10 - d) for d in range(1, 5)]
    df = spark.createDataFrame(rows, "g string, dnum long, x long, y long")
    out = {(r.g, r.dnum): r for r in
           rolling_corr(df, "g", "dnum", "x", "y").collect()}
    assert out[("k", 4)].n_window == 4 and out[("k", 4)].r == 1.0
    assert out[("m", 4)].r == -1.0
    # first two days lack min_points=3
    assert ("k", 1) not in out and ("k", 2) not in out


def test_rolling_corr_gap_shrinks_frame_and_flat_is_null(spark):
    from logpipe_spark.operators.aggregate import rolling_corr
    # days 1,2,3 then a jump to 20: the frame at 20 has only itself
    rows = [("k", 1, 1, 5), ("k", 2, 2, 5), ("k", 3, 3, 5), ("k", 20, 4, 9)]
    df = spark.createDataFrame(rows, "g string, dnum long, x long, y long")
    out = {r.dnum: r for r in
           rolling_corr(df, "g", "dnum", "x", "y", min_points=1).collect()}
    assert out[20].n_window == 1 and out[20].r is None  # var 0 -> NULL
    assert out[3].n_window == 3 and out[3].r is None    # y flat -> NULL


def test_kaplan_meier_hand_case(spark):
    # classic: t=1 d=1/n=4 -> S=3/4; t=2 c=1 (S unchanged, n drops to 2);
    # t=3 d=1/n=2 -> S = 3/4 * 1/2 = 3/8
    from logpipe_spark.operators.aggregate import kaplan_meier
    rows = [(1, 1, 0), (2, 0, 1), (3, 1, 0), (4, 0, 1)]
    df = spark.createDataFrame(
        rows, "day_off long, n_events long, n_censored long")
    out = {r.day_off: r for r in kaplan_meier(df).collect()}
    assert out[1].n_risk == 4 and abs(out[1].survival - 0.75) < 1e-15
    assert out[2].n_risk == 3 and abs(out[2].survival - 0.75) < 1e-15
    assert out[3].n_risk == 2 and abs(out[3].survival - 0.375) < 1e-15
    assert out[4].n_risk == 1 and abs(out[4].survival - 0.375) < 1e-15


def test_kaplan_meier_no_censoring_matches_empirical(spark):
    # without censoring S(t) is the empirical survivor function
    from logpipe_spark.operators.aggregate import kaplan_meier
    rows = [(1, 2, 0), (2, 3, 0), (5, 5, 0)]
    df = spark.createDataFrame(
        rows, "day_off long, n_events long, n_censored long")
    out = {r.day_off: r for r in kaplan_meier(df).collect()}
    assert abs(out[1].survival - 8.0 / 10) < 1e-15
    assert abs(out[2].survival - 5.0 / 10) < 1e-15
    assert abs(out[5].survival - 0.0) < 1e-15


def test_bootstrap_ci_brackets_mean_and_is_deterministic(spark):
    from logpipe_spark.operators.aggregate import bootstrap_ci
    rows = [("k", i, 100 + (i % 7)) for i in range(200)]
    df = spark.createDataFrame(rows, "g string, id long, v long")
    r1 = bootstrap_ci(df, "g", F.col("v"), "id").collect()[0]
    r2 = bootstrap_ci(df, "g", F.col("v"), "id").collect()[0]
    assert r1 == r2  # same hash draws -> bit-identical CI
    assert r1.n == 200 and r1.n_resamples == 40
    assert r1.ci_lo <= r1.mean <= r1.ci_hi
    assert r1.ci_lo < r1.ci_hi  # non-degenerate on a varying metric
    # CI width sane: well under the full value spread
    assert r1.ci_hi - r1.ci_lo < 7


def test_bootstrap_ci_positions_with_default_b(spark):
    # m=40 resamples -> lo pos (25*40+999)//1000 = 1, hi = 39
    from logpipe_spark.operators.aggregate import bootstrap_ci
    rows = [("k", i, 50) for i in range(30)]
    df = spark.createDataFrame(rows, "g string, id long, v long")
    r = bootstrap_ci(df, "g", F.col("v"), "id").collect()[0]
    # constant metric: every resample mean is exactly 50
    assert r.ci_lo == 50.0 and r.ci_hi == 50.0 and r.mean == 50.0


def test_wilcoxon_signed_hand_case(spark):
    # d = [1, -2, 3, 4] (no ties, plus a zero pair that must drop):
    # |d| ranks 1..4, W+ = 1+3+4 = 8 -> w2_plus = 16; mu2 = 10,
    # var2 = 4*5*9/6 = 30, z = 6/sqrt(30)
    from logpipe_spark.operators.drift import wilcoxon_signed
    df = spark.createDataFrame(
        [("k", 1), ("k", -2), ("k", 3), ("k", 4), ("k", 0)],
        "g string, d long")
    row = wilcoxon_signed(df, "g", F.col("d")).collect()[0]
    assert row.n_pairs == 4
    assert row.w2_plus == 16.0
    assert abs(row.z - 6.0 / math.sqrt(30.0)) < 1e-12


def test_wilcoxon_signed_ties(spark):
    # d = [1, -1, 2]: tied |d|=1 pair gets doubled avg rank 3 each;
    # w2p = 3 (the positive 1) + 6 (the 2) = 9; mu2 = 6,
    # var2 = 3*4*7/6 - (2^3-2)/12 = 14 - 0.5 = 13.5
    from logpipe_spark.operators.drift import wilcoxon_signed
    df = spark.createDataFrame(
        [("k", 1), ("k", -1), ("k", 2)], "g string, d long")
    row = wilcoxon_signed(df, "g", F.col("d")).collect()[0]
    assert row.n_pairs == 3 and row.w2_plus == 9.0
    assert abs(row.z - 3.0 / math.sqrt(13.5)) < 1e-12


def test_runs_test_hand_case(spark):
    # time order [1,5,2,6,3,7]: lower median = 3 (dropped), signs
    # -,+,-,+,+ -> 4 runs, n1=3 (+), n2=2 (-);
    # mu = 12/5 + 1 = 3.4, var = 12*(12-5)/(25*4) = 0.84
    from logpipe_spark.operators.drift import runs_test
    rows = [("k", t, v) for t, v in enumerate([1, 5, 2, 6, 3, 7])]
    df = spark.createDataFrame(rows, "g string, t long, v long")
    row = runs_test(df, "g", ["t"], F.col("v")).collect()[0]
    assert (row.n_pos, row.n_neg, row.n_runs) == (3, 2, 4)
    assert abs(row.z - (4 - 3.4) / math.sqrt(0.84)) < 1e-12


def test_runs_test_degenerate_split_z_null(spark):
    # one row on each side of the median -> p == n -> var 0 -> z NULL
    from logpipe_spark.operators.drift import runs_test
    df = spark.createDataFrame(
        [("k", 0, 1), ("k", 1, 2), ("k", 2, 3)], "g string, t long, v long")
    row = runs_test(df, "g", ["t"], F.col("v")).collect()[0]
    assert row.n_pos == 1 and row.n_neg == 1 and row.z is None


def test_cliffs_delta_hand_case(spark):
    # pos x = [3,4], neg y = [1,4]: gt=2 (3>1, 4>1), lt=1 (3<4),
    # tie=1 (4,4) -> delta = (2-1)/4 = 0.25
    from logpipe_spark.operators.drift import cliffs_delta
    df = spark.createDataFrame(
        [("k", 3, True), ("k", 4, True), ("k", 1, False), ("k", 4, False)],
        "g string, v long, lab boolean")
    row = cliffs_delta(df, "g", F.col("v"), F.col("lab")).collect()[0]
    assert (row.n_pos, row.n_neg) == (2, 2)
    assert abs(row.delta - 0.25) < 1e-15


def test_cliffs_delta_equals_2auc_minus_1_without_ties(spark):
    from logpipe_spark.operators.drift import auc_rank, cliffs_delta
    rows = [("k", v, v % 3 == 0) for v in range(1, 21)]
    df = spark.createDataFrame(rows, "g string, v long, lab boolean")
    d = cliffs_delta(df, "g", F.col("v"), F.col("lab")).collect()[0].delta
    a = auc_rank(df, "g", F.col("v"), F.col("lab")).collect()[0].auc
    assert abs(d - (2 * a - 1)) < 1e-12


def test_kuiper_hand_case_and_vs_ks(spark):
    # A=[1,2] fully below B=[3,4]: D+ = 1, D- = 0, V = 1
    from logpipe_spark.operators.drift import kuiper_drift
    df = spark.createDataFrame(
        [("k", 1, True), ("k", 2, True), ("k", 3, False), ("k", 4, False)],
        "g string, v long, a boolean")
    row = kuiper_drift(df, "g", F.col("v"), F.col("a")).collect()[0]
    assert (row.d_plus, row.d_minus, row.kuiper) == (1.0, 0.0, 1.0)
    # interleaved shift: kuiper >= ks always
    from logpipe_spark.operators.drift import ks_drift
    rows = [("k", v, v % 2 == 0) for v in range(1, 11)]
    df2 = spark.createDataFrame(rows, "g string, v long, a boolean")
    kd = kuiper_drift(df2, "g", F.col("v"), F.col("a")).collect()[0]
    ks = ks_drift(df2, "g", F.col("v"), F.col("a")).collect()[0]
    assert kd.kuiper >= ks.ks - 1e-15


def test_holt_winters_matches_python_replay(spark):
    # replay the exact fold in Python floats (same IEEE ops/order)
    from logpipe_spark.operators.aggregate import holt_winters
    xs = [10.0, 20.0, 15.0, 30.0, 25.0, 40.0]
    a, b, g, p = 0.3, 0.1, 0.2, 2
    l, tr, s = xs[0], 0.0, [0.0] * p
    for i in range(1, len(xs)):
        slot = (i % p)  # 0-based python == (acc.i mod p) with acc.i = i
        sp = s[slot]
        nl = a * (xs[i] - sp) + (1.0 - a) * (l + tr)
        tr = b * (nl - l) + (1.0 - b) * tr
        s[slot] = g * (xs[i] - nl) + (1.0 - g) * sp
        l = nl
    want = l + tr + s[len(xs) % p]
    rows = [("k", t, int(v)) for t, v in enumerate(xs)]
    df = spark.createDataFrame(rows, "g string, t long, v long")
    got = holt_winters(df, "g", F.col("v"), ["t"],
                       alpha=a, beta=b, gamma=g, period=p).collect()[0]
    assert got.n == len(xs)
    assert abs(got.level - l) < 1e-12 and abs(got.trend - tr) < 1e-12
    assert abs(got.forecast - want) < 1e-12


def test_holt_winters_single_point(spark):
    from logpipe_spark.operators.aggregate import holt_winters
    df = spark.createDataFrame([("k", 0, 7)], "g string, t long, v long")
    row = holt_winters(df, "g", F.col("v"), ["t"]).collect()[0]
    assert (row.n, row.level, row.trend, row.forecast) == (1, 7.0, 0.0, 7.0)


def test_runs_merge_boundary_identity(spark):
    # two day-segments; the boundary signs MATCH (runs merge: -1) for
    # one key and DIFFER (no adjustment) for another. Both must equal
    # the full-stream runs_test.
    from logpipe_spark.operators.drift import (runs_merge, runs_partials,
                                               runs_test)
    rows = []
    # median of [1,1,5,9,9] is 5 (dropped). key a kept signs
    # seg0 = -,+ ; seg1 = +,- -> full stream -,+,+,- = 3 runs;
    # naive seg sum 2+2 = 4, one boundary join
    for t, v in enumerate([1, 9, 5, 9, 1]):
        rows.append(("a", t // 3, t, v))
    # key b kept signs seg0 = -,+ ; seg1 = -,+ -> 4 runs, no join
    for t, v in enumerate([1, 9, 5, 1, 9]):
        rows.append(("b", t // 3, t, v))
    df = spark.createDataFrame(rows, "g string, d long, t long, v long")
    parts = runs_partials(df, "g", F.col("d"), ["t"], F.col("v"))
    got = {r._k: (r.n_pos, r.n_neg, r.n_runs, r.z)
           for r in runs_merge(parts, "_k").collect()}
    want = {r.g: (r.n_pos, r.n_neg, r.n_runs, r.z)
            for r in runs_test(df, "g", ["t"], F.col("v")).collect()}
    assert got == want
    assert got["a"][2] == 3 and got["b"][2] == 4


def test_hellinger_hand_case(spark):
    # A=[1,1,2], B=[1,2,2]: per v terms (sqrt(2/3)-sqrt(1/3))^2 twice,
    # H = sqrt(0.5*s) = sqrt(2/3) - sqrt(1/3).
    from logpipe_spark.operators.drift import hellinger_drift

    df = spark.createDataFrame(
        [("k", 1, True), ("k", 1, True), ("k", 2, True),
         ("k", 1, False), ("k", 2, False), ("k", 2, False)],
        "g string, v long, ia boolean")
    row = hellinger_drift(df, "g", F.col("v"), F.col("ia")).collect()[0]
    assert row.n_a == 3 and row.n_b == 3
    exp = math.sqrt(2.0 / 3.0) - math.sqrt(1.0 / 3.0)
    assert abs(row.hellinger - exp) < 1e-12


def test_hellinger_identical_is_zero(spark):
    from logpipe_spark.operators.drift import hellinger_drift

    rows = [("k", v, ia) for v in (1, 2, 3) for ia in (True, False)]
    df = spark.createDataFrame(rows, "g string, v long, ia boolean")
    row = hellinger_drift(df, "g", F.col("v"), F.col("ia")).collect()[0]
    assert row.hellinger == 0.0


def test_friedman_hand_case(spark):
    # 3 blocks, 3 treatments, identical ranking (counts 1<2<3) in every
    # block -> the no-tie maximum Q = n(k-1) = 6.
    from logpipe_spark.operators.drift import friedman_test

    rows = []
    for b in (1, 2, 3):
        rows += [(b, "x")] * 1 + [(b, "y")] * 2 + [(b, "z")] * 3
    df = spark.createDataFrame(rows, "b long, t string")
    row = friedman_test(df, F.col("b"), F.col("t")).collect()[0]
    assert row.k == 3 and row.n_blocks == 3
    assert abs(row.q_stat - 6.0) < 1e-12


def test_friedman_constant_grid_is_null(spark):
    # every cell the same count -> all ranks tied -> denominator 0.
    from logpipe_spark.operators.drift import friedman_test

    rows = [(b, t) for b in (1, 2) for t in ("x", "y", "z")]
    df = spark.createDataFrame(rows, "b long, t string")
    row = friedman_test(df, F.col("b"), F.col("t")).collect()[0]
    assert row.q_stat is None


def test_cochran_q_hand_case(spark):
    # Success matrix rows (blocks) x cols (treatments):
    # [1,1,0],[1,0,0],[1,1,1],[0,0,0]: C=(3,2,1), N=6, sumR^2=14,
    # Q = 2*(3*14-36)/(3*6-14) = 3.
    from logpipe_spark.operators.drift import cochran_q

    mat = {"b1": (1, 1, 0), "b2": (1, 0, 0),
           "b3": (1, 1, 1), "b4": (0, 0, 0)}
    rows = [(b, t, x) for b, xs in mat.items()
            for t, x in zip(("x", "y", "z"), xs)]
    df = spark.createDataFrame(rows, "b string, t string, v long")
    row = cochran_q(df, F.col("b"), F.col("t"),
                    F.col("v") > 0).collect()[0]
    assert row.k == 3 and row.n_blocks == 4 and row.n_success == 6
    assert abs(row.q_stat - 3.0) < 1e-12


def test_readability_hand_case(spark):
    # "the sky is blue": 4 words, all one vowel run -> grade 5.0;
    # "banana banana": 0 monosyllables -> grade 20.0, 3 syl/word.
    from logpipe_spark.trainprep.textqual import readability

    df = spark.createDataFrame(
        [(1, "the sky is blue", "s1"), (2, "banana banana", "s2")],
        "doc_id long, text string, source string")
    out = {r.source: r for r in readability(df).collect()}
    r1, r2 = out["s1"], out["s2"]
    assert r1.n_words == 4 and r1.n_mono == 4
    assert r1.forcast_grade == 5.0 and r1.syl_per_word == 1.0
    assert r1.avg_word_len == 3.0
    assert r2.n_words == 2 and r2.n_mono == 0
    assert r2.forcast_grade == 20.0 and r2.syl_per_word == 3.0
    assert r2.avg_word_len == 6.0


def test_reciprocity_hand_case(spark):
    # Edges {a->b, b->a, a->c} after dedup + self-loop drop:
    # 2 of 3 are mutual.
    from logpipe_spark.operators.graph import reciprocity

    df = spark.createDataFrame(
        [("a", "b"), ("a", "b"), ("b", "a"), ("a", "c"), ("c", "c")],
        "src string, dst string")
    row = reciprocity(df).collect()[0]
    assert row.n_edges == 3 and row.n_mutual == 2
    assert abs(row.reciprocity - 2.0 / 3.0) < 1e-15


def test_cvm_hand_case(spark):
    # A=[1,2], B=[2,3]: pooled weights (1,2,1), gaps (0.5,0.5,0),
    # T = (2*2/16) * (1*0.25 + 2*0.25) = 0.1875.
    from logpipe_spark.operators.drift import cvm_drift

    df = spark.createDataFrame(
        [("k", 1, True), ("k", 2, True), ("k", 2, False), ("k", 3, False)],
        "g string, v long, ia boolean")
    row = cvm_drift(df, "g", F.col("v"), F.col("ia")).collect()[0]
    assert row.n_a == 2 and row.n_b == 2
    assert row.cvm == 0.1875


def test_cvm_identical_is_zero(spark):
    from logpipe_spark.operators.drift import cvm_drift

    rows = [("k", v, ia) for v in (1, 2, 3) for ia in (True, False)]
    df = spark.createDataFrame(rows, "g string, v long, ia boolean")
    assert cvm_drift(df, "g", F.col("v"),
                     F.col("ia")).collect()[0].cvm == 0.0


def test_page_hinkley_hand_case(spark):
    # series [1,1,4], delta=0.5: m = -0.5 -> -1.0 -> 0.5 (running mean
    # 1, 1, 2), mn = -1.0 -> PH = 1.5. All values exact binary.
    from logpipe_spark.operators.drift import page_hinkley

    df = spark.createDataFrame(
        [("k", 1, 1), ("k", 2, 1), ("k", 3, 4)],
        "g string, d long, v long")
    row = page_hinkley(df, "g", F.col("v"), ["d"],
                       delta=0.5).collect()[0]
    assert row.n == 3
    assert row.m_final == 0.5 and row.ph == 1.5


def test_page_hinkley_single_point_and_flat(spark):
    from logpipe_spark.operators.drift import page_hinkley

    one = spark.createDataFrame([("k", 1, 7)], "g string, d long, v long")
    row = page_hinkley(one, "g", F.col("v"), ["d"]).collect()[0]
    assert row.n == 1 and row.ph == 0.0
    # constant series: every deviation is exactly 0 -> PH = 0
    flat = spark.createDataFrame(
        [("k", d, 5) for d in range(1, 6)], "g string, d long, v long")
    row = page_hinkley(flat, "g", F.col("v"), ["d"]).collect()[0]
    assert row.m_final == 0.0 and row.ph == 0.0


def test_wasserstein_hand_case(spark):
    # A=[0,2], B=[1,1]: both transports move 0.5 mass a distance 1 ->
    # W1 = 1.0 (num = 1*|1*2-0| + 1*|1*2-2*2| = 4, / (2*2)).
    from logpipe_spark.operators.drift import wasserstein_drift

    df = spark.createDataFrame(
        [("k", 0, True), ("k", 2, True), ("k", 1, False), ("k", 1, False)],
        "g string, v long, ia boolean")
    row = wasserstein_drift(df, "g", F.col("v"), F.col("ia")).collect()[0]
    assert row.n_a == 2 and row.n_b == 2
    assert row.wasserstein == 1.0


def test_energy_hand_case_and_zero(spark):
    # Same data: Sxy = 4, Sxx = 2, Syy = 0 ->
    # E = 2*4/4 - 2*2/4 - 0 = 1.0; identical samples -> exactly 0.
    from logpipe_spark.operators.drift import energy_drift

    df = spark.createDataFrame(
        [("k", 0, True), ("k", 2, True), ("k", 1, False), ("k", 1, False)],
        "g string, v long, ia boolean")
    row = energy_drift(df, "g", F.col("v"), F.col("ia")).collect()[0]
    assert row.energy == 1.0

    same = [("k", v, ia) for v in (1, 5, 9) for ia in (True, False)]
    df2 = spark.createDataFrame(same, "g string, v long, ia boolean")
    row2 = energy_drift(df2, "g", F.col("v"), F.col("ia")).collect()[0]
    assert row2.energy == 0.0


def test_wasserstein_identical_is_zero_and_shift_is_delta(spark):
    # W1 between X and X+c is exactly c for equal-size samples.
    from logpipe_spark.operators.drift import wasserstein_drift

    rows = ([("k", v, True) for v in (1, 4, 6)]
            + [("k", v + 3, False) for v in (1, 4, 6)])
    df = spark.createDataFrame(rows, "g string, v long, ia boolean")
    row = wasserstein_drift(df, "g", F.col("v"), F.col("ia")).collect()[0]
    assert row.wasserstein == 3.0


def test_drift_panel_matches_individual_statistics(spark):
    # The one-scan panel must equal each statistic computed standalone.
    from logpipe_spark.operators.drift import (
        cvm_drift, drift_panel, energy_drift, hellinger_drift, ks_drift,
        kuiper_drift, wasserstein_drift)

    rows = [("k", v, v % 3 == 0) for v in range(1, 30)] + \
           [("k2", v, v % 2 == 0) for v in range(5, 25)]
    df = spark.createDataFrame(rows, "g string, v long, ia boolean")
    args = (df, "g", F.col("v"), F.col("ia"))
    panel = {r.g: r for r in drift_panel(*args).collect()}
    assert set(panel) == {"k", "k2"}
    for r in ks_drift(*args).collect():
        assert panel[r.g].ks == r.ks
        assert panel[r.g].n_a == r.n_a and panel[r.g].n_b == r.n_b
    for r in kuiper_drift(*args).collect():
        assert panel[r.g].kuiper == r.kuiper
    for r in hellinger_drift(*args).collect():
        assert panel[r.g].hellinger == r.hellinger
    for r in cvm_drift(*args).collect():
        assert panel[r.g].cvm == r.cvm
    for r in wasserstein_drift(*args).collect():
        assert panel[r.g].wasserstein == r.wasserstein
    for r in energy_drift(*args).collect():
        assert panel[r.g].energy == r.energy


def test_l_moments_hand_case(spark):
    # [1,2,3,4]: l1=2.5, l2=5/6, l3=0 (symmetric), l_cv=1/3.
    from logpipe_spark.operators.aggregate import l_moments

    df = spark.createDataFrame(
        [("k", v) for v in (1, 2, 3, 4)], "g string, v long")
    row = l_moments(df, "g", F.col("v")).collect()[0]
    assert row.n == 4 and row.l1 == 2.5
    assert abs(row.l2 - 5.0 / 6.0) < 1e-12
    assert abs(row.l3) < 1e-12
    assert abs(row.l_cv - 1.0 / 3.0) < 1e-12
    assert abs(row.l_skew) < 1e-12


def test_l_moments_ties_match_pairwise_identity(spark):
    # [1,1,3,3]: l2 = mean pairwise |xi-xj| / 2 = (8/6)/2 = 2/3.
    from logpipe_spark.operators.aggregate import l_moments

    df = spark.createDataFrame(
        [("k", v) for v in (1, 1, 3, 3)], "g string, v long")
    row = l_moments(df, "g", F.col("v")).collect()[0]
    assert row.l1 == 2.0
    assert abs(row.l2 - 2.0 / 3.0) < 1e-12


def test_l_moments_degenerate(spark):
    # n=1: l2/l3/ratios NULL; constant series: l2=0 -> l_skew NULL.
    from logpipe_spark.operators.aggregate import l_moments

    one = spark.createDataFrame([("k", 7)], "g string, v long")
    r = l_moments(one, "g", F.col("v")).collect()[0]
    assert r.l1 == 7.0 and r.l2 is None and r.l3 is None
    flat = spark.createDataFrame(
        [("k", 5)] * 4, "g string, v long")
    r2 = l_moments(flat, "g", F.col("v")).collect()[0]
    assert r2.l2 == 0.0 and r2.l_skew is None and r2.l_cv == 0.0


def test_mean_excess_hand_case(spark):
    # values 1..10: p50 thr=5 -> mean excess 3.0; p75 thr=8 -> 1.5;
    # p90 thr=9 -> 1.0; p95 thr=10 -> nothing exceeds (NULL).
    from logpipe_spark.operators.aggregate import mean_excess_curve

    df = spark.createDataFrame(
        [("k", v) for v in range(1, 11)], "g string, v long")
    out = {r.pct: r for r in
           mean_excess_curve(df, "g", F.col("v")).collect()}
    assert out[50].threshold == 5 and out[50].mean_excess == 3.0
    assert out[75].threshold == 8 and out[75].mean_excess == 1.5
    assert out[90].threshold == 9 and out[90].mean_excess == 1.0
    assert out[95].threshold == 10 and out[95].n_exceed == 0
    assert out[95].mean_excess is None


def test_gpd_tail_fit_uniform_exceedances(spark):
    # values 1..100: p90 threshold = 90, exceedances 1..10 (uniform) —
    # the GPD with xi = -1 IS the uniform: xi-hat = 2 - 5.5/(11/6) = -1,
    # sigma-hat = 5.5 * (3 - 1) = 11 (support [0, 11] brackets 1..10).
    from logpipe_spark.operators.aggregate import gpd_tail_fit

    df = spark.createDataFrame(
        [("k", v) for v in range(1, 101)], "g string, v long")
    row = gpd_tail_fit(df, "g", F.col("v"), pct=90).collect()[0]
    assert row.threshold == 90 and row.n_exceed == 10
    assert row.l1 == 5.5
    assert abs(row.l2 - 11.0 / 6.0) < 1e-12
    assert abs(row.xi - (-1.0)) < 1e-12
    assert abs(row.sigma - 11.0) < 1e-12


def test_gpd_tail_fit_constant_exceedances_null(spark):
    # all exceedances equal -> l2 = 0 -> xi/sigma NULL (guarded).
    from logpipe_spark.operators.aggregate import gpd_tail_fit

    rows = [("k", v) for v in (1, 2, 3, 4, 5, 6, 7, 8, 9)] + \
           [("k", 50)] * 3
    df = spark.createDataFrame(rows, "g string, v long")
    row = gpd_tail_fit(df, "g", F.col("v"), pct=75).collect()[0]
    assert row.l2 == 0.0 and row.xi is None and row.sigma is None


def test_anderson_darling_hand_cases(spark):
    # identical samples -> 0 exactly; complete separation A=[1,1] vs
    # B=[2,2] -> at v=1: l=2, ga=4, gb=-4, den=16 -> A2 = 1+1 = 2.0.
    from logpipe_spark.operators.drift import anderson_darling

    same = [("k", v, ia) for v in (1, 2) for ia in (True, False)]
    df = spark.createDataFrame(same, "g string, v long, ia boolean")
    assert anderson_darling(df, "g", F.col("v"),
                            F.col("ia")).collect()[0].a2 == 0.0

    sep = spark.createDataFrame(
        [("k", 1, True), ("k", 1, True), ("k", 2, False), ("k", 2, False)],
        "g string, v long, ia boolean")
    row = anderson_darling(sep, "g", F.col("v"), F.col("ia")).collect()[0]
    assert row.n_a == 2 and row.n_b == 2
    assert row.a2 == 2.0


def test_turn_taking_hand_case(spark):
    # conv A: roles u,a,u,a (3 switches over 4 turns, runs of 1);
    # conv B: u,u,u (0 switches, one run of 3).
    from logpipe_spark.operators.spans import turn_taking

    rows = [("A", 0, "u"), ("A", 1, "a"), ("A", 2, "u"), ("A", 3, "a"),
            ("B", 0, "u"), ("B", 1, "u"), ("B", 2, "u")]
    df = spark.createDataFrame(rows, "conv_id string, turn_idx int, role string")
    out = {r.conv_id: r for r in turn_taking(df).collect()}
    a, b = out["A"], out["B"]
    assert a.n_turns == 4 and a.n_switches == 3 and a.n_roles == 2
    assert a.alternation_rate == 1.0 and a.avg_run_len == 1.0
    assert b.n_switches == 0 and b.alternation_rate == 0.0
    assert b.avg_run_len == 3.0
    one = spark.createDataFrame([("C", 0, "u")],
                                "conv_id string, turn_idx int, role string")
    c = turn_taking(one).collect()[0]
    assert c.alternation_rate is None and c.avg_run_len == 1.0


def test_shift_function_pure_location_shift(spark):
    # B = A + 7 exactly -> the shift function is flat at -7 (A lags B)
    # ... with A as first sample: Q_a - Q_b = -7 at every decile.
    from logpipe_spark.operators.drift import shift_function

    vals = [3, 8, 15, 22, 40, 41, 50, 66, 78, 90]
    rows = ([("k", v, True) for v in vals]
            + [("k", v + 7, False) for v in vals])
    df = spark.createDataFrame(rows, "g string, v long, ia boolean")
    out = shift_function(df, "g", F.col("v"), F.col("ia")).collect()
    assert len(out) == 9
    assert all(r.shift == -7 for r in out)
    p50 = next(r for r in out if r.pct == 50)
    assert p50.q_a == 40 and p50.q_b == 47


def _fw_events(spark, rows):
    import datetime as dt

    base = dt.datetime(2024, 1, 1)
    data = [(u, t, base + dt.timedelta(seconds=s)) for u, t, s in rows]
    return spark.createDataFrame(
        data, "user_id string, event_type string, ts timestamp")


def test_funnel_windowed_restart_beats_greedy(spark):
    # A@0, A@10, B@12, w=5: greedy-earliest (chain from A@0) strands
    # the user; the most-recent-prefix DP completes via A@10 -> B@12.
    from logpipe_spark.operators.funnel import funnel_windowed

    ev = _fw_events(spark, [("u", "A", 0), ("u", "A", 10), ("u", "B", 12)])
    out = {r.step: r.n_users for r in
           funnel_windowed(ev, ["A", "B"], window_seconds=5).collect()}
    assert out == {"A": 1, "B": 1}


def test_funnel_windowed_timeout_and_strictness(spark):
    # w=3: A@0 -> B@5 times out; A@5 is NOT strictly before B@5 -> the
    # same-ts tie ordering (higher step first) must not let the A@5
    # overwrite rescue it. Boundary: gap == w passes.
    from logpipe_spark.operators.funnel import funnel_windowed

    ev = _fw_events(spark, [("u", "A", 0), ("u", "A", 5), ("u", "B", 5)])
    out = {r.step: r.n_users for r in
           funnel_windowed(ev, ["A", "B"], window_seconds=3).collect()}
    assert out == {"A": 1, "B": 0}

    ev2 = _fw_events(spark, [("v", "A", 0), ("v", "B", 3)])
    out2 = {r.step: r.n_users for r in
            funnel_windowed(ev2, ["A", "B"], window_seconds=3).collect()}
    assert out2 == {"A": 1, "B": 1}


def test_funnel_windowed_zero_step_rows_present(spark):
    # steps nobody reaches still emit a 0 row (left join + coalesce).
    from logpipe_spark.operators.funnel import funnel_windowed

    ev = _fw_events(spark, [("u", "A", 0)])
    out = {r.step: r.n_users for r in
           funnel_windowed(ev, ["A", "B", "C"],
                           window_seconds=10).collect()}
    assert out == {"A": 1, "B": 0, "C": 0}


def test_decompose_series_constant_and_gap(spark):
    import datetime as dt

    from logpipe_spark.operators.aggregate import decompose_series

    base = dt.datetime(2024, 1, 1)

    def ev(days, per_day=5):
        rows = [("k", base + dt.timedelta(days=d, hours=h))
                for d in days for h in range(per_day)]
        return spark.createDataFrame(rows, "g string, ts timestamp")

    # constant 5/day for 14 days: interior trend exactly 5.0, seasonal
    # and remainder exactly 0.0; the first/last 3 days have NULL trend.
    out = {r.d: r for r in
           decompose_series(ev(range(14)), "g").collect()}
    d0 = min(out)
    for off, r in ((3, out[d0 + 3]), (10, out[d0 + 10])):
        assert r.x == 5 and r.trend == 5.0
        assert r.seasonal == 0.0 and r.remainder == 0.0
    assert out[d0].trend is None and out[d0 + 13].trend is None

    # calendar gap: days 0-5 then 10-15 — a ROWS frame would bridge the
    # hole; the RANGE frame must leave trend NULL beside it (day 4's
    # window [1,7] sees only days 1-5).
    out2 = {r.d: r for r in
            decompose_series(ev(list(range(6)) + list(range(10, 16))),
                             "g").collect()}
    d0 = min(out2)
    assert out2[d0 + 4].trend is None
    assert all(r.trend is None for r in out2.values())


def test_durbin_watson_hand_case(spark):
    from logpipe_spark.operators.drift import durbin_watson

    # x = [1,2,3,4,5,6,7,8]: sum d² = 7, xbar = 4.5,
    # sum (x-xbar)² = 42 -> DW = 7/42 = 1/6
    rows = [("c", i, i + 1) for i in range(8)]
    df = spark.createDataFrame(rows, "k string, t int, x long")
    out = durbin_watson(df, "k", "t", "x", min_n=8).collect()
    assert len(out) == 1 and out[0].n == 8
    assert abs(out[0].dw - 7.0 / 42.0) < 1e-15
    # alternating series [1,3,1,3,...]: strong negative autocorr, DW
    # = n·sum d²/(n·sum x² - S²): d²=4×7=28, S=16, Q=40: 8·28/(320-256)=3.5
    rows2 = [("c", i, 1 if i % 2 == 0 else 3) for i in range(8)]
    df2 = spark.createDataFrame(rows2, "k string, t int, x long")
    out2 = durbin_watson(df2, "k", "t", "x", min_n=8).collect()
    assert abs(out2[0].dw - 3.5) < 1e-15
    # constant series -> zero variance -> NULL dw (ANSI guard)
    rows3 = [("c", i, 5) for i in range(8)]
    df3 = spark.createDataFrame(rows3, "k string, t int, x long")
    out3 = durbin_watson(df3, "k", "t", "x", min_n=8).collect()
    assert out3[0].dw is None
    # short series filtered by min_n
    rows4 = [("c", i, i) for i in range(5)]
    df4 = spark.createDataFrame(rows4, "k string, t int, x long")
    assert durbin_watson(df4, "k", "t", "x", min_n=8).count() == 0


def test_kendall_tau_hand_cases(spark):
    from logpipe_spark.operators.drift import kendall_tau

    # perfect concordance: tau_b = 1
    rows = [("g", i, i, i * 2) for i in range(5)]
    df = spark.createDataFrame(rows, "k string, id int, x long, y long")
    out = kendall_tau(df, "k", "x", "y", "id").collect()
    assert out[0].tau_b == 1.0 and out[0].concordant == 10
    # x=[1,2,3], y=[3,2,1]: all discordant -> tau_b = -1
    rows2 = [("g", 1, 1, 3), ("g", 2, 2, 2), ("g", 3, 3, 1)]
    df2 = spark.createDataFrame(rows2, "k string, id int, x long, y long")
    assert kendall_tau(df2, "k", "x", "y", "id").collect()[0].tau_b == -1.0
    # tie case: x=[1,1,2], y=[1,2,3]. Pairs: (1,2) tie-x-only;
    # (1,3),(2,3) concordant. C=2 D=0 Tx=1 Ty=0.
    # tau_b = 2/sqrt((2+0)*(2+1)) = 2/sqrt 6
    rows3 = [("g", 1, 1, 1), ("g", 2, 1, 2), ("g", 3, 2, 3)]
    df3 = spark.createDataFrame(rows3, "k string, id int, x long, y long")
    r3 = kendall_tau(df3, "k", "x", "y", "id").collect()[0]
    assert r3.concordant == 2 and r3.discordant == 0
    assert abs(r3.tau_b - 2.0 / math.sqrt(6.0)) < 1e-15
    # all-tied x margin -> denominator 0 -> NULL
    rows4 = [("g", 1, 7, 1), ("g", 2, 7, 2), ("g", 3, 7, 3)]
    df4 = spark.createDataFrame(rows4, "k string, id int, x long, y long")
    assert kendall_tau(df4, "k", "x", "y", "id").collect()[0].tau_b is None
    # max_rows cap keeps at most that many members per group
    rows5 = [("g", i, i, i) for i in range(10)]
    df5 = spark.createDataFrame(rows5, "k string, id int, x long, y long")
    r5 = kendall_tau(df5, "k", "x", "y", "id", max_rows=4).collect()[0]
    assert r5.n == 4 and r5.concordant == 6  # C(4,2) all concordant


def test_morans_i_hand_cases(spark):
    from logpipe_spark.operators.spatial import morans_i

    # two occupied cells side by side, counts 1 and 3 (cell=1):
    # n=2, S=4, dev=[-2, 2]; W=2 (both directions);
    # num = 2 * (-2*2) = -8; den = 8 -> I = (2/2) * (-8/8) = -1
    pts = [(0.5, 0.5)] + [(1.5, 0.5)] * 3
    df = spark.createDataFrame(pts, "x double, y double")
    r = morans_i(df, cell=1.0).collect()[0]
    assert r.n_cells == 2 and r.w_pairs == 2
    assert r.morans_i == -1.0
    # isolated cells (no adjacency) -> NULL
    pts2 = [(0.5, 0.5), (5.5, 5.5)]
    df2 = spark.createDataFrame(pts2, "x double, y double")
    r2 = morans_i(df2, cell=1.0).collect()[0]
    assert r2.w_pairs == 0 and r2.morans_i is None
    # clustered equal-count line of 3 cells, counts [2,2,2]: dev=0
    # everywhere -> den=0 -> NULL (uniform field has no variance)
    pts3 = [(x + 0.5, 0.5) for x in range(3) for _ in range(2)]
    df3 = spark.createDataFrame(pts3, "x double, y double")
    assert morans_i(df3, cell=1.0).collect()[0].morans_i is None


def test_yules_k_hand_case(spark):
    from logpipe_spark.trainprep.textqual import yules_k

    # source a: "x x y" -> counts {x:2, y:1}, N=3, sum c²=5
    # K = 10^4 * (5-3)/9 = 2222.2...
    df = spark.createDataFrame(
        [("a", "x x y"), ("b", "p q r")], "source string, text string")
    out = {r.source: r for r in yules_k(df).collect()}
    assert out["a"].vocab == 2 and out["a"].n_tokens == 3
    assert abs(out["a"].yules_k - 10000.0 * 2.0 / 9.0) < 1e-12
    # all-distinct source: sum c² = N -> K = 0
    assert out["b"].yules_k == 0.0


def test_sequence_match_hand_case(spark):
    from logpipe_spark.operators.funnel import sequence_match

    rows = [
        ("c1", 0, "u"), ("c1", 1, "t"), ("c1", 2, "a"),   # u.*t.*a
        ("c2", 0, "s"), ("c2", 1, "t"), ("c2", 2, "t"),   # tt
        ("c3", 0, "s"), ("c3", 1, "a"), ("c3", 2, "u"),   # ^s.*u$
    ]
    df = spark.createDataFrame(rows, "conv_id string, turn_idx int, sym string")
    out = {r.pattern: r for r in sequence_match(df, [
        ("uta", "u.*t.*a"), ("tt", "tt"), ("s_u", "^s.*u$")]).collect()}
    assert out["uta"].n_match == 1 and out["uta"].n_keys == 3
    assert out["tt"].n_match == 1
    assert out["s_u"].n_match == 1
    assert abs(out["uta"].share - 1.0 / 3.0) < 1e-15


def test_cross_corr_hand_cases(spark):
    from logpipe_spark.operators.aggregate import cross_corr_from_counts

    # b is a shifted one bucket right: at lag=+1 the paired series are
    # identical -> r == 1.0 exactly (integer sufficient stats)
    vals = [1, 5, 2, 8, 3, 9]
    a = spark.createDataFrame(
        [(m, v) for m, v in enumerate(vals)], "m long, c long")
    b = spark.createDataFrame(
        [(m + 1, v) for m, v in enumerate(vals)], "m long, c long")
    out = {r.lag: r for r in
           cross_corr_from_counts(a, b, lags=(0, 1)).collect()}
    assert out[1].n_pairs == 6 and out[1].r == 1.0
    # anti-correlated at lag 0: y = 10 - x -> r == -1.0
    b2 = spark.createDataFrame(
        [(m, 10 - v) for m, v in enumerate(vals)], "m long, c long")
    out2 = {r.lag: r for r in
            cross_corr_from_counts(a, b2, lags=(0,)).collect()}
    assert out2[0].r == -1.0
    # constant right margin -> zero variance -> NULL (ANSI guard)
    b3 = spark.createDataFrame(
        [(m, 4) for m in range(6)], "m long, c long")
    out3 = cross_corr_from_counts(a, b3, lags=(0,)).collect()
    assert out3[0].r is None
    # pairwise-present only: disjoint buckets produce no row for the lag
    b4 = spark.createDataFrame([(100, 1)], "m long, c long")
    assert cross_corr_from_counts(a, b4, lags=(0,)).count() == 0


def test_freshness_lag_hand_case(spark):
    from logpipe_spark.operators.profile import freshness_lag

    rows = [
        ("a", "2024-01-01 00:00:00"), ("a", "2024-01-01 00:00:10"),
        ("a", "2024-01-01 00:00:30"),
        ("b", "2024-01-01 00:01:00"),
    ]
    df = spark.createDataFrame(rows, "k string, ts string").select(
        "k", F.col("ts").cast("timestamp").alias("ts"))
    out = {r.k: r for r in freshness_lag(df, "k").collect()}
    # key a: 3 rows spanning 30s -> mean gap 15s; hwm is key b's ts
    assert out["a"].n == 3
    assert out["a"].staleness_us == 30_000_000
    assert out["a"].mean_gap_us == 15_000_000.0
    # key b: newest row -> zero staleness; single row -> NULL gap
    assert out["b"].staleness_us == 0
    assert out["b"].mean_gap_us is None


def test_bradley_terry_hand_cases(spark):
    from logpipe_spark.operators.graph import bradley_terry

    # A beats B 3:1 -> MM fixed point p_A=1.5, p_B=0.5 (reached in one
    # round and stable), i.e. P(A beats B) = 0.75 = 3/4
    rows = [("a", "b")] * 3 + [("b", "a")]
    df = spark.createDataFrame(rows, "winner string, loser string")
    out = {r.item: r for r in bradley_terry(df, iters=2).collect()}
    assert out["a"].wins == 3 and out["a"].games == 4
    assert out["a"].strength == 1.5 and out["b"].strength == 0.5
    # chain a>b (x2), b>c (x2): replay the two MM rounds in python
    # floats (fold order: opponents sorted by id)
    rows2 = [("a", "b")] * 2 + [("b", "c")] * 2
    df2 = spark.createDataFrame(rows2, "winner string, loser string")
    out2 = {r.item: r for r in bradley_terry(df2, iters=2).collect()}
    pa, pb, pc = 1.0, 1.0, 1.0
    for _ in range(2):
        da = (0.0 + 2.0 / (pa + pb))
        db = (0.0 + 2.0 / (pb + pa)) + 2.0 / (pb + pc)
        dc = (0.0 + 2.0 / (pc + pb))
        pa, pb, pc = 2.0 / da, 2.0 / db, 0.0 / dc
    assert out2["a"].strength == pa
    assert out2["b"].strength == pb
    assert out2["c"].strength == 0.0   # 0-win item collapses exactly
    assert out2["b"].wins == 2 and out2["b"].games == 4


def test_preference_pairs_hand_case(spark):
    from logpipe_spark.trainprep.curate import preference_pairs

    rows = [
        ("c1", 0, "short"), ("c1", 1, "the longest answer"),
        ("c1", 2, "middle one"),
        ("c2", 0, "same"), ("c2", 1, "same"),      # all tied -> dropped
        ("c3", 0, "only one"),                      # single cand -> dropped
    ]
    df = spark.createDataFrame(rows, "conv_id string, turn_idx int, text string")
    out = preference_pairs(
        df, "conv_id", "turn_idx", F.length("text").cast("bigint")).collect()
    assert len(out) == 1
    r = out[0]
    assert r.conv_id == "c1" and r.chosen_id == 1 and r.rejected_id == 0
    assert r.margin == len("the longest answer") - len("short")
    # tie on score breaks toward the lower turn_idx on both ends
    rows2 = [("c4", 0, "aa"), ("c4", 1, "aa"), ("c4", 2, "bbbb")]
    df2 = spark.createDataFrame(rows2, "conv_id string, turn_idx int, text string")
    r2 = preference_pairs(
        df2, "conv_id", "turn_idx", F.length("text").cast("bigint")).collect()[0]
    assert r2.chosen_id == 2 and r2.rejected_id == 0


def test_diff_in_diff_hand_case(spark):
    from logpipe_spark.operators.drift import diff_in_diff

    # treat: pre mean 10, post mean 14 (+4); ctrl: pre 20, post 21 (+1)
    # -> DiD = +3
    rows = (
        [(True, False, 10)] * 2 + [(True, True, 14)] * 3
        + [(False, False, 20)] * 2 + [(False, True, 21)] * 4)
    df = spark.createDataFrame(rows, "t boolean, p boolean, v long")
    r = diff_in_diff(df, F.col("t"), F.col("p"), F.col("v")).collect()[0]
    assert (r.n_tp, r.n_tr, r.n_cp, r.n_cr) == (3, 2, 4, 2)
    assert r.m_treat_post == 14.0 and r.m_ctrl_pre == 20.0
    assert r.did == 3.0
    # empty cell -> NULL estimate
    rows2 = [(True, True, 1), (False, True, 2), (False, False, 3)]
    df2 = spark.createDataFrame(rows2, "t boolean, p boolean, v long")
    r2 = diff_in_diff(df2, F.col("t"), F.col("p"), F.col("v")).collect()[0]
    assert r2.did is None and r2.m_treat_post is None


def test_fleiss_kappa_hand_cases(spark):
    from logpipe_spark.operators.aggregate import fleiss_kappa

    # perfect agreement, both categories used: kappa = 1
    df = spark.createDataFrame([(3,), (0,), (3,), (0,)], "votes int")
    r = fleiss_kappa(df, "votes", raters=3).collect()[0]
    assert r.n_items == 4 and r.p_bar == 1.0 and r.kappa == 1.0
    # replay the textbook formula in python for a mixed case
    votes = [3, 2, 1, 0, 2, 3]
    df2 = spark.createDataFrame([(v,) for v in votes], "votes int")
    r2 = fleiss_kappa(df2, "votes", raters=3).collect()[0]
    n, k = float(len(votes)), 3.0
    a = float(sum(g * g + (3 - g) * (3 - g) for g in votes))
    cpos = float(sum(votes))
    nk = n * k
    p_bar = (a - nk) / (nk * 2.0)
    p_e = (cpos * cpos + (nk - cpos) * (nk - cpos)) / (nk * nk)
    assert r2.p_bar == p_bar and r2.p_e == p_e
    assert r2.kappa == (p_bar - p_e) / (1.0 - p_e)
    # unanimous single-category voting: P_e = 1 -> NULL (degenerate)
    df3 = spark.createDataFrame([(3,), (3,)], "votes int")
    r3 = fleiss_kappa(df3, "votes", raters=3).collect()[0]
    assert r3.p_e == 1.0 and r3.kappa is None


def test_boxplot_stats_hand_case(spark):
    from logpipe_spark.operators.aggregate import boxplot_stats

    # 1..8 plus one far outlier 100: n=9, rank-based quartiles at
    # ceil(p*9): p25 -> rank 3 (v=3), p50 -> rank 5 (v=5),
    # p75 -> rank 7 (v=7); IQR=4 -> fences (-3, 13): one high outlier
    vals = list(range(1, 9)) + [100]
    df = spark.createDataFrame([("k", v) for v in vals], "k string, v long")
    r = boxplot_stats(df, "k", "v").collect()[0]
    assert (r.p25, r.p50, r.p75, r.iqr) == (3, 5, 7, 4)
    assert r.n == 9 and r.n_low == 0 and r.n_high == 1


def test_topk_movers_hand_case(spark):
    from logpipe_spark.operators.aggregate import topk_movers

    # u1: 1 pre / 5 post (+4); u2: 3 / 1 (-2); u3: 2 / 2 (0)
    rows = ([("u1", False)] + [("u1", True)] * 5
            + [("u2", False)] * 3 + [("u2", True)]
            + [("u3", False)] * 2 + [("u3", True)] * 2)
    df = spark.createDataFrame(rows, "u string, post boolean")
    out = topk_movers(df, "u", F.col("post"), k=2).collect()
    assert [(r.u, r.change, r.rank) for r in out] == [
        ("u1", 4, 1), ("u2", -2, 2)]


def test_oov_rate_hand_case(spark):
    from logpipe_spark.trainprep.textqual import oov_rate

    # vocab_size=2 -> vocab {a (x4), b (x2)} (count desc, token asc);
    # src1 tokens: a a b c -> 1 OOV of 4; src2: a a d e -> 2 of 4
    df = spark.createDataFrame(
        [("s1", "a a b c"), ("s2", "a a d e"), ("s3", "b")],
        "source string, text string")
    out = {r.source: r for r in oov_rate(df, vocab_size=2).collect()}
    assert out["s1"].n_oov == 1 and out["s1"].n_tokens == 4
    assert out["s2"].n_oov == 2
    assert out["s3"].n_oov == 0
    assert out["s2"].oov_rate == 0.5


def test_srm_check_hand_case(spark):
    from logpipe_spark.operators.profile import srm_check

    # balanced by construction: pick unit ids whose md5-arm is known
    rows = [("e", f"u{i}") for i in range(40)]
    df = spark.createDataFrame(rows, "k string, u string")
    r = srm_check(df, "u", "k").collect()[0]
    n0, n1 = r.n_arm0, r.n_arm1
    assert n0 + n1 == 40
    d = float(n0 - n1)
    assert r.chi2 == d * d / 40.0
    assert r.srm_suspect == (r.chi2 > 3.84)
    # gross mismatch: duplicate rows do NOT inflate (distinct units)
    df2 = spark.createDataFrame(rows * 3, "k string, u string")
    r2 = srm_check(df2, "u", "k").collect()[0]
    assert (r2.n_arm0, r2.n_arm1) == (n0, n1)


def test_kfold_balance_hand_case(spark):
    from logpipe_spark.trainprep.curate import kfold_balance

    rows = [(f"d{i}", "s1") for i in range(50)] + [
        (f"x{i}", "s2") for i in range(10)]
    df = spark.createDataFrame(rows, "doc_id string, source string")
    out = kfold_balance(df, k=5).collect()
    by_stratum = {}
    for r in out:
        by_stratum.setdefault(r.stratum, 0)
        by_stratum[r.stratum] += r.n
        assert r.share == r.n / float(r.n_stratum)
    assert by_stratum == {"s1": 50, "s2": 10}
    # determinism: same input -> identical assignment
    out2 = kfold_balance(df, k=5).collect()
    assert sorted(map(tuple, out)) == sorted(map(tuple, out2))


def test_diff_in_diff_by_hand_case(spark):
    from logpipe_spark.operators.drift import diff_in_diff_by

    rows = (
        [("g1", True, False, 10)] * 2 + [("g1", True, True, 14)] * 2
        + [("g1", False, False, 20)] + [("g1", False, True, 21)]
        + [("g2", True, True, 5)])   # g2 missing three cells -> NULL
    df = spark.createDataFrame(rows, "g string, t boolean, p boolean, v long")
    out = {r.g: r for r in diff_in_diff_by(
        df, "g", F.col("t"), F.col("p"), F.col("v")).collect()}
    assert out["g1"].did == (14.0 - 10.0) - (21.0 - 20.0)
    assert out["g2"].did is None


def test_attribution_credits_hand_case(spark):
    from logpipe_spark.operators.funnel import attribution_credits

    # u1 converts at t=100 with touches A(10), B(20), A(30):
    # first=A, last=A, linear: each 2520/3=840
    # u2 converts at t=50 with one touch B(40): all credit to B
    touches = spark.createDataFrame(
        [("u1", "A", 10, 1), ("u1", "B", 20, 2), ("u1", "A", 30, 3),
         ("u2", "B", 40, 4), ("u2", "C", 60, 5)],   # C is post-conv
        "user_id string, channel string, tsu long, event_id long")
    conv = spark.createDataFrame(
        [("u1", 100), ("u2", 50)], "user_id string, conv_tsu long")
    out = {r.channel: r for r in
           attribution_credits(touches, conv).collect()}
    assert out["A"].n_first == 1 and out["A"].n_last == 1
    assert out["A"].linear_scaled == 1680          # two A touches
    assert out["B"].n_first == 1 and out["B"].n_last == 1
    assert out["B"].linear_scaled == 840 + 2520    # u1's B + u2's only
    assert "C" not in out
    assert out["B"].linear == (840 + 2520) / 2520.0


def test_bigram_accuracy_hand_case(spark):
    from logpipe_spark.trainprep.textqual import bigram_accuracy

    # model from the whole corpus: after 'a' -> 'b' (2 of 3), after
    # 'b' -> 'a' (1, tie broken to 'a' over 'c' by w2 asc at c=1? no:
    # counts b->a:1, b->c:1 -> tie -> 'a')
    df = spark.createDataFrame(
        [("s1", "a b a b"), ("s2", "a c b c")],
        "source string, text string")
    out = {r.source: r for r in bigram_accuracy(df).collect()}
    # s1 bigrams: (a,b),(b,a),(a,b): a->b pred=b hits 2; b->a pred=a hit
    assert out["s1"].n_bigrams == 3 and out["s1"].n_hits == 3
    # s2 bigrams: (a,c) miss, (c,b) pred? c->b only once -> pred=b hit,
    # (b,c) pred=a miss
    assert out["s2"].n_bigrams == 3 and out["s2"].n_hits == 1
    assert out["s2"].accuracy == 1.0 / 3.0
    # single-token doc contributes nothing
    df2 = spark.createDataFrame([("s3", "x")], "source string, text string")
    assert bigram_accuracy(df2).count() == 0


def test_topic_boundaries_hand_case(spark):
    from logpipe_spark.operators.spans import topic_boundaries

    rows = [
        ("c1", 0, "alpha beta alpha"),   # vec {alpha:2, beta:1}, n2=5
        ("c1", 1, "alpha beta"),         # vec {alpha:1, beta:1}, n2=2
        ("c1", 2, "gamma delta"),        # disjoint from turn 1
    ]
    df = spark.createDataFrame(rows, "conv_id string, turn_idx int, text string")
    out = {r.boundary_turn: r for r in
           topic_boundaries(df, threshold=0.5).collect()}
    # boundary at turn 1: dot = 2*1 + 1*1 = 3, cos = 3/sqrt(5*2)
    import math
    assert out[1].cos == 3.0 / math.sqrt(10.0)
    assert not out[1].is_boundary
    # boundary at turn 2: zero overlap -> cos 0 -> boundary (left join!)
    assert out[2].cos == 0.0 and out[2].is_boundary


def test_watermark_score_hand_case(spark):
    from logpipe_spark.trainprep.textqual import watermark_score
    import hashlib
    import math

    text = "the quick brown fox jumps over the lazy dog"
    toks = text.split(" ")
    greens = 0
    for a, b in zip(toks, toks[1:]):
        h = int(hashlib.md5(f"{a}:{b}".encode()).hexdigest()[:8], 16)
        greens += 1 if h % 2 == 0 else 0
    df = spark.createDataFrame([("s", text)], "source string, text string")
    r = watermark_score(df).collect()[0]
    n = len(toks) - 1
    assert r.n_bigrams == n and r.greens == greens
    assert r.z == (2.0 * greens - n) / math.sqrt(float(n))
    # fully green synthetic: repeat one green bigram only
    # find a green pair deterministically
    pair = None
    for x in ["aa", "bb", "cc", "dd", "ee"]:
        h = int(hashlib.md5(f"{x}:{x}".encode()).hexdigest()[:8], 16)
        if h % 2 == 0:
            pair = x
            break
    assert pair is not None
    df2 = spark.createDataFrame(
        [("w", " ".join([pair] * 10))], "source string, text string")
    r2 = watermark_score(df2).collect()[0]
    assert r2.green_frac == 1.0 and r2.z == 9.0 / 3.0


def test_ams_f2_hand_case(spark):
    from logpipe_spark.operators.skew import ams_f2

    # exact F2 of {a x3, b x2, c x1} = 9 + 4 + 1 = 14
    rows = [("a",)] * 3 + [("b",)] * 2 + [("c",)]
    df = spark.createDataFrame(rows, "k string")
    r = ams_f2(df, "k", k=9, hash_fn="md5").collect()[0]
    assert r.n_values == 3 and r.f2_exact == 14.0
    assert r.rel_err == abs(r.f2_est - 14.0) / 14.0
    # estimator sanity: E[est] = F2; with 9 estimators the median is
    # within a loose constant factor on this tiny input
    assert 0.0 <= r.f2_est <= 36.0 * 14.0
    # xxhash64 fast path returns the same exact F2 and a valid estimate
    r2 = ams_f2(df, "k", k=9, hash_fn="xxhash64").collect()[0]
    assert r2.f2_exact == 14.0 and r2.f2_est >= 0.0


def test_rbo_overlap_hand_cases(spark):
    from logpipe_spark.trainprep.similarity import rbo_overlap

    def ranked(qid, ids):
        return [(qid, nid, r + 1) for r, nid in enumerate(ids)]

    schema = "query_id int, neighbor_id int, rank int"
    # identical top-5 lists: overlap_d = d at every depth ->
    # RBO = (1-p) * sum p^(d-1) = (1-p)(1-p^5)/(1-p)... replay exactly
    a = spark.createDataFrame(ranked(1, [10, 11, 12, 13, 14]), schema)
    r = rbo_overlap(a, a, k=5, p=0.9).collect()[0]
    expect = 0.0
    for d in range(1, 6):
        expect = expect + (0.9 ** (d - 1)) * (float(d) / float(d))
    assert r.rbo == (1.0 - 0.9) * expect and r.n_common == 5
    # disjoint lists: zero overlap everywhere -> rbo 0.0, row KEPT
    b = spark.createDataFrame(ranked(1, [20, 21, 22, 23, 24]), schema)
    r2 = rbo_overlap(a, b, k=5, p=0.9).collect()[0]
    assert r2.rbo == 0.0 and r2.n_common == 0
    # same items reversed order: overlap only at full depth
    c = spark.createDataFrame(ranked(1, [14, 13, 12, 11, 10]), schema)
    r3 = rbo_overlap(a, c, k=5, p=0.9).collect()[0]
    # mr for item at ranks (i, 6-i): max -> [5,4,3,4,5]; overlap_d:
    # d=3 ->1, d=4 ->3, d=5 ->5
    expect3 = 0.0
    for d, ov in ((1, 0), (2, 0), (3, 1), (4, 3), (5, 5)):
        expect3 = expect3 + (0.9 ** (d - 1)) * (float(ov) / float(d))
    assert r3.rbo == (1.0 - 0.9) * expect3 and r3.n_common == 5


def test_capture_recapture_hand_case(spark):
    from logpipe_spark.operators.profile import capture_recapture

    # pre window sees {a,b,c}, post sees {b,c,d,e}: n1=3, n2=4, m=2,
    # Chapman = 4*5/3 - 1 = 17/3; exact = 5
    rows = [("a", False), ("b", False), ("c", False),
            ("b", True), ("c", True), ("d", True), ("e", True)]
    df = spark.createDataFrame(rows, "u string, post boolean")
    r = capture_recapture(df, "u", F.col("post")).collect()[0]
    assert (r.n_first, r.n_second, r.n_both, r.n_exact) == (3, 4, 2, 5)
    assert r.estimate == 4.0 * 5.0 / 3.0 - 1.0
    assert r.rel_err == abs(r.estimate - 5.0) / 5.0
    # duplicate sightings don't inflate (distinct-unit flags)
    df2 = spark.createDataFrame(rows * 4, "u string, post boolean")
    r2 = capture_recapture(df2, "u", F.col("post")).collect()[0]
    assert (r2.n_first, r2.n_second) == (3, 4)


def test_growth_accounting_hand_case(spark):
    from logpipe_spark.operators.segment import growth_accounting

    # u1: weeks 1,2,4  -> new@1, retained@2, churned@3, resurrected@4,
    #                     churned@5
    # u2: weeks 2      -> new@2, churned@3
    rows = [("u1", 1), ("u1", 2), ("u1", 4), ("u2", 2), ("u1", 4)]
    df = spark.createDataFrame(rows, "u string, w long")
    out = {r.week: r for r in growth_accounting(df, "u", "w").collect()}
    assert out[1].n_new == 1 and out[1].n_churned == 0
    assert out[2].n_new == 1 and out[2].n_retained == 1
    assert out[3].n_churned == 2 and out[3].n_new == 0
    assert out[4].n_resurrected == 1 and out[4].n_retained == 0
    assert out[5].n_churned == 1
    assert sorted(out) == [1, 2, 3, 4, 5]


def test_cuped_adjustment_hand_case(spark):
    from logpipe_spark.operators.drift import cuped_adjustment

    # perfectly correlated covariate: y = 3x -> theta = 3, rho = 1,
    # CUPED removes all variance
    rows = [(i, 3 * i) for i in range(1, 6)]
    df = spark.createDataFrame(rows, "x long, y long")
    r = cuped_adjustment(df, "x", "y").collect()[0]
    assert r.n_units == 5 and r.theta == 3.0
    assert r.rho == 1.0 and r.var_reduction == 1.0
    # replay a mixed case in python floats (same cast order)
    xs, ys = [1, 2, 3, 4], [2, 1, 4, 3]
    df2 = spark.createDataFrame(list(zip(xs, ys)), "x long, y long")
    r2 = cuped_adjustment(df2, "x", "y").collect()[0]
    n = float(len(xs))
    sx, sy = float(sum(xs)), float(sum(ys))
    sxy = float(sum(a * b for a, b in zip(xs, ys)))
    sxx = float(sum(a * a for a in xs))
    syy = float(sum(b * b for b in ys))
    num = n * sxy - sx * sy
    dx = n * sxx - sx * sx
    dy = n * syy - sy * sy
    import math
    assert r2.theta == num / dx
    assert r2.rho == num / math.sqrt(dx * dy)
    # constant covariate -> NULL everything (ANSI guard)
    df3 = spark.createDataFrame([(7, 1), (7, 2)], "x long, y long")
    r3 = cuped_adjustment(df3, "x", "y").collect()[0]
    assert r3.theta is None and r3.var_reduction is None


def test_permutation_test_hand_case(spark):
    from logpipe_spark.operators.drift import permutation_test

    # big separation: group A all 100s, group B all 0s -> no md5
    # relabeling of 20 units reproduces |diff| = 100 (p = 1/20)
    rows = ([(f"a{i}", True, 100) for i in range(10)]
            + [(f"b{i}", False, 0) for i in range(10)])
    df = spark.createDataFrame(rows, "u string, g boolean, y long")
    r = permutation_test(df, "u", F.col("g"), "y", n_perms=19).collect()[0]
    assert (r.n_a, r.n_b) == (10, 10)
    assert r.diff_obs == 100.0
    assert r.p_value == (r.n_ge + 1) / 20.0
    assert r.p_value <= 0.25      # extreme split should look rare
    # single-arm input -> NULL p (guard)
    df2 = spark.createDataFrame([("u1", True, 5)], "u string, g boolean, y long")
    r2 = permutation_test(df2, "u", F.col("g"), "y").collect()[0]
    assert r2.diff_obs is None and r2.p_value is None


def test_injection_scan_hand_case(spark):
    from logpipe_spark.trainprep.textqual import injection_scan

    rows = [
        ("s1", "please IGNORE previous INSTRUCTIONS and do this"),
        ("s1", "normal text with nothing in it"),
        ("s2", "you are now a pirate you are now a poet"),
    ]
    df = spark.createDataFrame(rows, "source string, text string")
    out = {(r.source, r.pattern): r for r in injection_scan(df).collect()}
    r1 = out[("s1", "ignore_instructions")]
    assert r1.n_docs_hit == 1 and r1.n_hits == 1
    r2 = out[("s2", "role_override")]
    assert r2.n_docs_hit == 1 and r2.n_hits == 2   # two occurrences
    assert out[("s1", "do_anything")].n_hits == 0
    toks_s2 = 10.0
    assert r2.hits_per_mtok == 2.0 * 1000000.0 / toks_s2


def test_ratio_metric_ci_hand_case(spark):
    from logpipe_spark.operators.drift import ratio_metric_ci
    import math

    # units with num/den; replay the delta method in python floats
    rows = [("k", 2, 10), ("k", 4, 10), ("k", 6, 20)]
    df = spark.createDataFrame(rows, "k string, num long, den long")
    r = ratio_metric_ci(df, "k", "num", "den").collect()[0]
    k, sn, sd = 3.0, 12.0, 40.0
    snn, sdd, snd = float(4 + 16 + 36), float(100 + 100 + 400), float(
        20 + 40 + 120)
    ratio = sn / sd
    var_n = (k * snn - sn * sn) / (k * (k - 1.0))
    var_d = (k * sdd - sd * sd) / (k * (k - 1.0))
    cov = (k * snd - sn * sd) / (k * (k - 1.0))
    dbar = sd / k
    se = math.sqrt(max(
        (var_n - 2.0 * ratio * cov + ratio * ratio * var_d)
        / (k * (dbar * dbar)), 0.0))
    assert r.ratio == ratio and r.se == se
    assert r.ci_lo == ratio - 1.96 * se
    assert r.ci_hi == ratio + 1.96 * se
    # single unit -> NULL bounds
    df2 = spark.createDataFrame([("k", 1, 2)], "k string, num long, den long")
    r2 = ratio_metric_ci(df2, "k", "num", "den").collect()[0]
    assert r2.ratio == 0.5 and r2.se is None and r2.ci_lo is None


def test_class_weights_hand_case(spark):
    from logpipe_spark.trainprep.curate import class_weights

    rows = [("a",)] * 6 + [("b",)] * 3 + [("c",)]
    df = spark.createDataFrame(rows, "label string")
    out = {r.label: r for r in class_weights(df, "label").collect()}
    # sklearn balanced: total / (k * n_c)
    assert out["a"].weight == 10.0 / (3.0 * 6.0)
    assert out["b"].weight == 10.0 / (3.0 * 3.0)
    assert out["c"].weight == 10.0 / (3.0 * 1.0)
    assert out["a"].n == 6


def test_split_half_reliability_hand_case(spark):
    from logpipe_spark.operators.drift import split_half_reliability
    import math

    # three units with correlated halves; replay in python floats
    halves = [(10, 12), (20, 18), (30, 33)]
    rows = []
    for i, (a, b) in enumerate(halves):
        rows += [(f"u{i}", True, a), (f"u{i}", False, b)]
    df = spark.createDataFrame(rows, "k string, h boolean, v long")
    r = split_half_reliability(df, "k", F.col("h"), F.col("v")).collect()[0]
    n = 3.0
    sa, sb = 60.0, 63.0
    sab = float(10 * 12 + 20 * 18 + 30 * 33)
    saa = float(100 + 400 + 900)
    sbb = float(144 + 324 + 1089)
    num = n * sab - sa * sb
    da = n * saa - sa * sa
    db = n * sbb - sb * sb
    rr = num / math.sqrt(da * db)
    assert r.n_units == 3 and r.r_half == rr
    assert r.reliability == 2.0 * rr / (1.0 + rr)
    # constant half -> NULL (zero variance guard)
    rows2 = [("u1", True, 5), ("u1", False, 1),
             ("u2", True, 5), ("u2", False, 2),
             ("u3", True, 5), ("u3", False, 3)]
    df2 = spark.createDataFrame(rows2, "k string, h boolean, v long")
    r2 = split_half_reliability(df2, "k", F.col("h"), F.col("v")).collect()[0]
    assert r2.r_half is None and r2.reliability is None


def test_kendalls_w_hand_cases(spark):
    from logpipe_spark.operators.drift import kendalls_w

    # perfect concordance, no ties: W = 1 exactly
    rows = [(i, i * 2, i * 3, i * 10) for i in range(1, 5)]
    df = spark.createDataFrame(rows, "id int, a long, b long, c long")
    r = kendalls_w(df, "id", ["a", "b", "c"]).collect()[0]
    assert r.n_items == 4 and r.w == 1.0
    # one ranker reversed: classic m=3, n=4 textbook replay
    rows2 = [(1, 1, 1, 4), (2, 2, 2, 3), (3, 3, 3, 2), (4, 4, 4, 1)]
    df2 = spark.createDataFrame(rows2, "id int, a long, b long, c long")
    r2 = kendalls_w(df2, "id", ["a", "b", "c"]).collect()[0]
    # R = [2*6, 2*7... doubled]: R_i = a+b+c ranks: [6,7,8,9]+rev ->
    # [1+1+4, 2+2+3, 3+3+2, 4+4+1] = [6,7,8,9]; S = sum((R-7.5)^2) = 5
    # W = 12*5/(9*60) = 1/9
    assert abs(r2.w - 12.0 * 5.0 / (9.0 * 60.0)) < 1e-15
    # all-tied rankers -> den 0 -> NULL
    rows3 = [(i, 7, 7, 7) for i in range(4)]
    df3 = spark.createDataFrame(rows3, "id int, a long, b long, c long")
    assert kendalls_w(df3, "id", ["a", "b", "c"]).collect()[0].w is None


def test_recency_weighted_hand_case(spark):
    from logpipe_spark.operators.aggregate import recency_weighted_counts

    # events at the hwm week (age 0, w=1), one week back (w=0.5), and
    # far past the horizon (w=0)
    rows = [
        ("a", "2024-06-01 00:00:00"),                 # hwm, age 0
        ("a", "2024-05-25 00:00:00"),                 # age 1 -> 0.5
        ("a", "2024-05-25 00:00:00"),                 # age 1 -> 0.5
        ("a", "2020-01-01 00:00:00"),                 # age >> 30 -> 0
        ("b", "2024-06-01 00:00:00"),
    ]
    df = spark.createDataFrame(rows, "k string, ts string").select(
        "k", F.col("ts").cast("timestamp").alias("ts"))
    out = {r.k: r for r in recency_weighted_counts(df, "k").collect()}
    assert out["a"].n_events == 4 and out["a"].n_recent == 3
    assert out["a"].weighted == 1.0 + 0.5 + 0.5    # exact dyadics
    assert out["b"].weighted == 1.0


def test_prefix_dup_rate_hand_case(spark):
    from logpipe_spark.trainprep.textqual import prefix_dup_rate

    boiler = "x" * 70
    rows = [
        ("s1", boiler + "aaa"), ("s1", boiler + "bbb"),   # shared prefix
        ("s1", "unique text one"),
        ("s2", boiler + "ccc"),                            # cross-source!
        ("s2", "another unique"),
    ]
    df = spark.createDataFrame(rows, "source string, text string")
    out = {r.source: r for r in prefix_dup_rate(df).collect()}
    # the 64-char prefix is shared by three docs across s1 and s2
    assert out["s1"].n_prefix_dup == 2 and out["s1"].n_docs == 3
    assert out["s2"].n_prefix_dup == 1
    assert out["s1"].dup_rate == 2.0 / 3.0
    # short docs compare their full text as the prefix
    df2 = spark.createDataFrame(
        [("s3", "short"), ("s3", "short"), ("s3", "other")],
        "source string, text string")
    assert prefix_dup_rate(df2).collect()[0].n_prefix_dup == 2


def test_proportion_diff_ci_hand_case(spark):
    from logpipe_spark.operators.drift import proportion_diff_ci
    import math

    # arm1: 2/10 successes, arm2: 6/10 — replay Newcombe in python
    rows = ([("k", False, True)] * 2 + [("k", False, False)] * 8
            + [("k", True, True)] * 6 + [("k", True, False)] * 4)
    df = spark.createDataFrame(rows, "k string, g boolean, s boolean")
    r = proportion_diff_ci(df, "k", F.col("g"), F.col("s")).collect()[0]
    assert (r.n1, r.k1, r.n2, r.k2) == (10, 2, 10, 6)

    def wilson(k, n, sgn):
        p, nd = k / n, float(n)
        c2n = (1.96 * 1.96) / (2.0 * nd)
        rad = 1.96 * math.sqrt(p * (1.0 - p) / nd
                               + (1.96 * 1.96) / (4.0 * (nd * nd)))
        den = 1.0 + (1.96 * 1.96) / nd
        return (p + c2n + sgn * rad) / den

    p1, p2 = 0.2, 0.6
    l1, u1 = wilson(2.0, 10.0, -1), wilson(2.0, 10.0, +1)
    l2, u2 = wilson(6.0, 10.0, -1), wilson(6.0, 10.0, +1)
    d = p2 - p1
    assert r.diff == d
    assert r.ci_lo == d - math.sqrt((p1 - l1) ** 2 + (u2 - p2) ** 2)
    assert r.ci_hi == d + math.sqrt((u1 - p1) ** 2 + (p2 - l2) ** 2)
    assert r.ci_lo < d < r.ci_hi


def test_mood_median_hand_case(spark):
    from logpipe_spark.operators.drift import mood_median_test

    # A = [1,2,3], B = [4,5,6]: grand median 3; every cell deviates by
    # 1.5 from e = 1.5 -> chi2 = 4 * 1.5 = 6
    rows = [("a", 1), ("a", 2), ("a", 3), ("b", 4), ("b", 5), ("b", 6)]
    df = spark.createDataFrame(rows, "g string, v long")
    r = mood_median_test(df, "g", F.col("v")).collect()[0]
    assert r.n == 6 and r.k_groups == 2 and r.grand_median == 3
    assert r.chi2 == 6.0
    # identical groups: observed == expected -> chi2 = 0
    rows2 = [("a", 1), ("a", 9), ("b", 1), ("b", 9)]
    df2 = spark.createDataFrame(rows2, "g string, v long")
    r2 = mood_median_test(df2, "g", F.col("v")).collect()[0]
    assert r2.grand_median == 1 and r2.chi2 == 0.0


def test_sign_test_hand_case(spark):
    from logpipe_spark.operators.drift import sign_test
    import math

    rows = [("k", 1, 5), ("k", 2, 7), ("k", 3, 3), ("k", 9, 1)]
    df = spark.createDataFrame(rows, "k string, pre long, post long")
    r = sign_test(df, "k", F.col("pre"), F.col("post")).collect()[0]
    assert (r.n_pos, r.n_neg, r.n_tie) == (2, 1, 1)
    assert r.z == 1.0 / math.sqrt(3.0)
    # all tied -> NULL z
    df2 = spark.createDataFrame([("k", 4, 4)], "k string, pre long, post long")
    assert sign_test(df2, "k", F.col("pre"), F.col("post")).collect()[0].z is None


def test_stump_split_hand_case(spark):
    from logpipe_spark.operators.drift import stump_split

    # perfectly separable at v <= 2: labels [0,0,1,1] on v=[1,2,3,4]
    rows = [(1, False), (2, False), (3, True), (4, True)]
    df = spark.createDataFrame(rows, "v long, y boolean")
    r = stump_split(df, F.col("v"), F.col("y")).collect()[0]
    assert r.threshold == 2 and r.split_gini == 0.0
    assert (r.n_left, r.pos_left, r.n_right, r.pos_right) == (2, 0, 2, 2)
    assert r.parent_gini == 0.5 and r.gain == 0.5
    # no signal: every split leaves the same impurity; tie broken to
    # the smallest threshold
    rows2 = [(1, True), (1, False), (2, True), (2, False)]
    df2 = spark.createDataFrame(rows2, "v long, y boolean")
    r2 = stump_split(df2, F.col("v"), F.col("y")).collect()[0]
    assert r2.threshold == 1 and r2.gain == 0.0


def test_gk_lambda_hand_case(spark):
    from logpipe_spark.operators.assoc import goodman_kruskal_lambda

    # x perfectly predicts y: lambda = 1
    rows = [("a", "p")] * 3 + [("b", "q")] * 3
    df = spark.createDataFrame(rows, "x string, y string")
    r = goodman_kruskal_lambda(df, "x", "y").collect()[0]
    assert r.lambda_yx == 1.0 and r.n == 6 and r.n_modal == 3
    # x useless: same modal y in every x -> lambda = 0
    rows2 = [("a", "p"), ("a", "p"), ("a", "q"),
             ("b", "p"), ("b", "p"), ("b", "q")]
    df2 = spark.createDataFrame(rows2, "x string, y string")
    r2 = goodman_kruskal_lambda(df2, "x", "y").collect()[0]
    assert r2.lambda_yx == 0.0
    # degenerate marginal (one y value) -> NULL
    rows3 = [("a", "p"), ("b", "p")]
    df3 = spark.createDataFrame(rows3, "x string, y string")
    assert goodman_kruskal_lambda(df3, "x", "y").collect()[0].lambda_yx is None


def test_weighted_kappa_hand_cases(spark):
    from logpipe_spark.operators.aggregate import weighted_kappa

    # perfect agreement across two categories: A = 0 -> kappa = 1
    rows = [(0, 0)] * 3 + [(3, 3)] * 3
    df = spark.createDataFrame(rows, "a long, b long")
    r = weighted_kappa(df, "a", "b").collect()[0]
    assert r.obs_disagreement == 0.0 and r.kappa_w == 1.0
    # textbook replay: mixed 2-category ordinal table
    rows2 = [(0, 0)] * 4 + [(0, 1)] * 1 + [(1, 0)] * 2 + [(1, 1)] * 3
    df2 = spark.createDataFrame(rows2, "a long, b long")
    r2 = weighted_kappa(df2, "a", "b").collect()[0]
    n = 10.0
    a_mass = 1.0 * 1 + 1.0 * 2          # (i-j)^2 = 1 for both off cells
    r0, r1, c0, c1 = 5.0, 5.0, 6.0, 4.0
    b_mass = 1.0 * r0 * c1 + 1.0 * r1 * c0
    assert r2.obs_disagreement == a_mass
    assert r2.exp_disagreement == b_mass
    assert r2.kappa_w == 1.0 - n * a_mass / b_mass
    # all mass in one identical cell pair: zero expected -> NULL
    df3 = spark.createDataFrame([(2, 2)] * 4, "a long, b long")
    assert weighted_kappa(df3, "a", "b").collect()[0].kappa_w is None


def test_cochran_armitage_hand_case(spark):
    from logpipe_spark.operators.drift import cochran_armitage
    import math

    # rates rising with score: w=0: 1/10, w=1: 5/10, w=2: 9/10
    rows = ([(0, True)] * 1 + [(0, False)] * 9
            + [(1, True)] * 5 + [(1, False)] * 5
            + [(2, True)] * 9 + [(2, False)] * 1)
    df = spark.createDataFrame(rows, "w long, y boolean")
    r = cochran_armitage(df, F.col("w"), F.col("y")).collect()[0]
    assert (r.n, r.k_success, r.n_groups) == (30, 15, 3)
    n, k = 30.0, 15.0
    a = float(0 * (1 * 30 - 10 * 15) + 1 * (5 * 30 - 10 * 15)
              + 2 * (9 * 30 - 10 * 15))
    s1, s2 = float(0 * 10 + 1 * 10 + 2 * 10), float(0 + 10 + 40)
    pbar = k / n
    sw = s2 - s1 * s1 / n
    z = (a / n) / math.sqrt(pbar * (1.0 - pbar) * sw)
    assert r.z == z and r.z > 3.0      # strong positive trend
    # flat rates -> numerator 0 -> z = 0
    rows2 = [(0, True), (0, False), (1, True), (1, False)]
    df2 = spark.createDataFrame(rows2, "w long, y boolean")
    assert cochran_armitage(df2, F.col("w"), F.col("y")).collect()[0].z == 0.0


def test_mcc_eval_hand_cases(spark):
    from logpipe_spark.operators.aggregate import mcc_eval
    import math

    # perfect predictor -> MCC 1; inverted -> -1
    rows = [(True, True)] * 3 + [(False, False)] * 5
    df = spark.createDataFrame(rows, "p boolean, a boolean")
    assert mcc_eval(df, F.col("p"), F.col("a")).collect()[0].mcc == 1.0
    rows2 = [(True, False)] * 3 + [(False, True)] * 5
    df2 = spark.createDataFrame(rows2, "p boolean, a boolean")
    assert mcc_eval(df2, F.col("p"), F.col("a")).collect()[0].mcc == -1.0
    # mixed table replay
    rows3 = ([(True, True)] * 6 + [(True, False)] * 2
             + [(False, True)] * 1 + [(False, False)] * 11)
    df3 = spark.createDataFrame(rows3, "p boolean, a boolean")
    r = mcc_eval(df3, F.col("p"), F.col("a")).collect()[0]
    tp, fp, fn, tn = 6.0, 2.0, 1.0, 11.0
    mcc = (tp * tn - fp * fn) / math.sqrt(
        (tp + fp) * (tp + fn) * (tn + fp) * (tn + fn))
    assert r.mcc == mcc
    # degenerate margin -> NULL
    rows4 = [(True, True), (True, False)]
    df4 = spark.createDataFrame(rows4, "p boolean, a boolean")
    assert mcc_eval(df4, F.col("p"), F.col("a")).collect()[0].mcc is None


def test_speaker_dominance_hand_case(spark):
    from logpipe_spark.operators.spans import speaker_dominance

    rows = [
        ("c1", "user", "hi"), ("c1", "assistant", "a" * 18),
        ("c2", "user", "xx"), ("c2", "assistant", "yy"),  # tie -> role asc
    ]
    df = spark.createDataFrame(rows, "conv_id string, role string, text string")
    out = {r.conv_id: r for r in speaker_dominance(df).collect()}
    assert out["c1"].dom_role == "assistant"
    assert out["c1"].share == 18.0 / 20.0
    assert out["c2"].dom_role == "assistant"   # 'assistant' < 'user'
    assert out["c2"].share == 0.5


def test_support_guard_raises_on_unbounded_support(spark):
    # r04 verdict item 2: the bounded-support precondition of the
    # fold-based EDF statistics is structural now — a key whose
    # distinct-value support exceeds max_support raises loudly while
    # scanning the count frame (before any collect_list materializes),
    # instead of OOMing a task at scale.
    from logpipe_spark.operators.drift import (
        anderson_darling, cvm_drift, hellinger_drift)

    rows = [("k", v, v % 2 == 0) for v in range(40)]
    df = spark.createDataFrame(rows, "g string, v long, ia boolean")
    for op, kw in ((hellinger_drift, {}), (cvm_drift, {}),
                   (anderson_darling, {})):
        with pytest.raises(Exception, match="max_support"):
            op(df, "g", F.col("v"), F.col("ia"),
               max_support=8, **kw).collect()
        # within bound: untouched result (the guard is a no-op branch)
        out = op(df, "g", F.col("v"), F.col("ia"),
                 max_support=40).collect()
        assert len(out) == 1 and out[0].n_a == 20 and out[0].n_b == 20


def test_drift_panel_pre_bucket_monotone_invariants(spark):
    # KS / Kuiper / Hellinger / CvM are invariant under any strictly
    # monotone relabeling of the support. With pre_bucket >= n_pool the
    # exact equi-depth rebucket assigns each distinct raw value its own
    # bucket id (a monotone relabeling), so the four shape statistics
    # of the raw-double panel must EQUAL the integer-valued panel's,
    # while W1/energy move to bucket units (not compared).
    from logpipe_spark.operators.drift import drift_panel

    ints = [("k", v, v % 3 == 0) for v in range(1, 30)]
    raws = [("k", 2.0 + 0.37 * v, v % 3 == 0) for v in range(1, 30)]
    df_i = spark.createDataFrame(ints, "g string, v long, ia boolean")
    df_r = spark.createDataFrame(raws, "g string, v double, ia boolean")
    p_i = drift_panel(df_i, "g", F.col("v"), F.col("ia")).collect()[0]
    p_r = drift_panel(df_r, "g", F.col("v"), F.col("ia"),
                      pre_bucket=4096).collect()[0]
    assert (p_r.n_a, p_r.n_b) == (p_i.n_a, p_i.n_b)
    assert p_r.ks == p_i.ks
    assert p_r.kuiper == p_i.kuiper
    assert p_r.hellinger == p_i.hellinger
    assert p_r.cvm == p_i.cvm
    assert p_r.wasserstein is not None and p_r.energy is not None


def test_equi_depth_rebucket_bounds_support(spark):
    # 1000 distinct values -> at most B buckets, counts conserved,
    # bucket ids monotone in v.
    from logpipe_spark.operators.drift import equi_depth_rebucket

    per_v = spark.createDataFrame(
        [("k", v, 1, 2) for v in range(1000)],
        "g string, v long, ca long, cb long")
    out = equi_depth_rebucket(per_v, "g", 16).collect()
    assert len(out) <= 16
    assert sum(r.ca for r in out) == 1000
    assert sum(r.cb for r in out) == 2000
    ids = sorted(r.v for r in out)
    assert ids == list(range(len(ids)))


def test_bh_fdr_hand_case(spark):
    # p = k/20; alpha=1/10, m=10 -> reject iff k <= k* where
    # k*5 <= cnt_le(k). Six p=.05, two p=.1, one p=.5, one p=1.0:
    # classic BH gives i*=6 -> exactly the six k=1 tests reject.
    from logpipe_spark.operators.drift import bh_fdr

    rows = ([(f"k{i}", 0, 0.05) for i in range(6)]
            + [("k6", 1, 0.10), ("k7", 1, 0.10),
               ("k8", 9, 0.50), ("k9", 19, 1.00)])
    t = spark.createDataFrame(rows, "g string, n_ge long, p_value double")
    out = {r.g: r for r in bh_fdr(t, "g", n_perms=19,
                                  alpha_num=1, alpha_den=10).collect()}
    assert len(out) == 10
    assert all(out[f"k{i}"].reject for i in range(6))
    assert not any(out[k].reject for k in ("k6", "k7", "k8", "k9"))
    assert out["k0"].m_tests == 10 and out["k0"].k_star == 1
    # no k satisfies the bound -> zero rejections, NULL k_star
    t2 = spark.createDataFrame([("a", 9, 0.5), ("b", 19, 1.0)],
                               "g string, n_ge long, p_value double")
    out2 = bh_fdr(t2, "g", n_perms=19).collect()
    assert not any(r.reject for r in out2)
    assert all(r.k_star is None for r in out2)


def test_permutation_test_by_matches_unkeyed(spark):
    from logpipe_spark.operators.drift import (permutation_test,
                                               permutation_test_by)

    rows = [(f"u{i}", i % 3 == 0, (i * 7) % 11) for i in range(40)]
    df = spark.createDataFrame(rows, "u string, g boolean, y long") \
        .withColumn("k", F.lit("only"))
    one = permutation_test(df, "u", F.col("g"), "y").collect()[0]
    byk = permutation_test_by(df, "k", "u", F.col("g"), "y").collect()[0]
    assert (byk.n_a, byk.n_b, byk.diff_obs, byk.n_ge, byk.p_value) == \
        (one.n_a, one.n_b, one.diff_obs, one.n_ge, one.p_value)


def test_effect_size_hand_case(spark):
    # A=[1,2,3], B=[5,7]: varp = ((14-12)+(74-72))/3 = 4/3,
    # d = -4/sqrt(4/3), g = d*(1 - 3/11).
    from logpipe_spark.operators.drift import effect_size

    rows = [("k", 1, True), ("k", 2, True), ("k", 3, True),
            ("k", 5, False), ("k", 7, False)]
    df = spark.createDataFrame(rows, "g string, v long, ia boolean")
    r = effect_size(df, "g", F.col("v"), F.col("ia")).collect()[0]
    d = -4.0 / math.sqrt(4.0 / 3.0)
    assert r.n_a == 3 and r.n_b == 2
    assert r.mean_a == 2.0 and r.mean_b == 6.0
    assert abs(r.cohens_d - d) < 1e-12
    assert abs(r.hedges_g - d * (1.0 - 3.0 / 11.0)) < 1e-12
    # zero-variance arms -> NULL (ANSI guard)
    df2 = spark.createDataFrame(
        [("k", 2, True), ("k", 2, True), ("k", 2, False), ("k", 2, False)],
        "g string, v long, ia boolean")
    r2 = effect_size(df2, "g", F.col("v"), F.col("ia")).collect()[0]
    assert r2.cohens_d is None and r2.hedges_g is None


def test_good_turing_hand_case(spark):
    # tokens: a x3, b x2, c x2, d x1 -> N1=1, N2=2, N3=1, N=8.
    from logpipe_spark.trainprep.textqual import good_turing

    docs = spark.createDataFrame(
        [(1, "a a a b b c", "s"), (2, "c d", "s")],
        "doc_id long, text string, source string")
    out = {r.r: r for r in good_turing(docs).collect()}
    assert out[1].n_types == 1 and out[1].total_tokens == 8
    assert out[1].r_star == 4.0          # 2 * N2 / N1
    assert out[1].p_mass == 1.0 / 8.0    # unseen-mass estimate P0
    assert out[2].n_types == 2 and out[2].r_star == 1.5
    assert out[3].n_types == 1 and out[3].r_star is None
    assert out[3].p_mass == 3.0 / 8.0


def test_zipf_slope_hand_case(spark):
    # freqs 4,2,2,1,1,1 -> log2 points (2,0)x1 (1,1)x2 (0,2)x3:
    # exact OLS slope = -1.0 (a perfect dyadic Zipf).
    from logpipe_spark.trainprep.textqual import zipf_slope

    text = " ".join(["a"] * 4 + ["b"] * 2 + ["c"] * 2 + ["d", "e", "f"])
    docs = spark.createDataFrame([(1, text, "s")],
                                 "doc_id long, text string, source string")
    r = zipf_slope(docs).collect()[0]
    assert r.n_types == 6
    assert r.slope == -1.0
    assert r.sxx == 20.0


def test_t_closeness_hand_case(spark):
    # A = [0,0,10], B = [10,10,0]; global {0:3, 10:3}, range 10.
    # W1(A, global) = 10*|2*6 - 3*3| / (3*6) = 5/3 -> t = 1/6 (both).
    from logpipe_spark.trainprep.curate import t_closeness

    rows = [("A", 0), ("A", 0), ("A", 10),
            ("B", 10), ("B", 10), ("B", 0)]
    df = spark.createDataFrame(rows, "cls string, v long")
    out = {r.cls: r for r in t_closeness(df, ["cls"],
                                         F.col("v")).collect()}
    for c in ("A", "B"):
        assert out[c].class_size == 3 and out[c].n_total == 6
        assert out[c].value_range == 10
        assert abs(out[c].w1 - 5.0 / 3.0) < 1e-12
        assert abs(out[c].t - 1.0 / 6.0) < 1e-12


def test_conformal_interval_hand_case(spark):
    # residuals 1..10 -> target rank ceil(11*0.9) = 10 -> radius 10;
    # n=5 cannot certify 90% (target 6 > 5) -> NULL radius.
    from logpipe_spark.operators.aggregate import conformal_interval

    rows = [("k", 100 + i, 100) for i in range(1, 11)] + \
           [("s", 200 + i, 200) for i in range(1, 6)]
    df = spark.createDataFrame(rows, "g string, y long, yh long")
    out = {r.g: r for r in conformal_interval(
        df, "g", "y", "yh", alpha_num=1, alpha_den=10).collect()}
    assert out["k"].n_cal == 10 and out["k"].target_rank == 10
    assert out["k"].radius == 10
    assert out["s"].n_cal == 5 and out["s"].target_rank == 6
    assert out["s"].radius is None


def test_heaps_slope_hand_case(spark):
    # A dyadic corpus: doc k introduces 2^k - 2^(k-1) new unique words
    # and contains 2^k total... simpler: engineer prefix points where
    # V doubles whenever N doubles -> beta exactly 1.0.
    from logpipe_spark.trainprep.textqual import heaps_slope

    # 8 docs, each with 4 UNIQUE tokens never seen before:
    # after d docs N = 4d, V = 4d -> x == y at every grid point.
    rows = [(i, " ".join(f"w{i}_{j}" for j in range(4)), "s")
            for i in range(8)]
    docs = spark.createDataFrame(rows,
                                 "doc_id long, text string, source string")
    r = heaps_slope(docs).collect()[0]
    assert r.beta == 1.0


def test_jackknife_ratio_hand_case(spark):
    from logpipe_spark.operators.aggregate import jackknife_ratio

    # 3 groups, per-group (sum, count): (10,2) (20,2) (30,2)
    # Sx=60, Sy=6; r_g = (60-10)/4, (60-20)/4, (60-30)/4 = 12.5,10,7.5
    # mean 10, ss = 6.25+0+6.25 = 12.5; var = (2/3)*12.5 = 25/3.
    rows = [("k", 1, 4), ("k", 1, 6), ("k", 2, 9), ("k", 2, 11),
            ("k", 3, 14), ("k", 3, 16)]
    df = spark.createDataFrame(rows, "g string, grp int, x long") \
        .withColumn("one", F.lit(1).cast("bigint"))
    r = jackknife_ratio(df, "g", "grp", "x", "one").collect()[0]
    assert r.n_groups == 3 and r.ratio == 10.0
    assert abs(r.se_jack - math.sqrt(25.0 / 3.0)) < 1e-12
    # guard: group count over the bound raises loudly
    import pytest as _pt
    wide = spark.createDataFrame(
        [("k", i, i, 1) for i in range(40)],
        "g string, grp int, x long, one long")
    with _pt.raises(Exception, match="max_groups"):
        jackknife_ratio(wide, "g", "grp", "x", "one",
                        max_groups=8).collect()


def test_mcnemar_hand_case(spark):
    # b = 4 (A right, B wrong), c = 1 -> chi2 = (|3|-1)^2/5 = 0.8.
    from logpipe_spark.operators.drift import mcnemar_test

    rows = ([("k", 1, 0, 1)] * 4      # A right, B wrong
            + [("k", 0, 1, 1)] * 1    # A wrong, B right
            + [("k", 1, 1, 1)] * 3    # both right
            + [("k", 0, 0, 1)] * 2)   # both wrong
    df = spark.createDataFrame(rows, "g string, a int, b int, y int")
    r = mcnemar_test(df, "g", F.col("a") == 1, F.col("b") == 1,
                     F.col("y") == 1).collect()[0]
    assert (r.n_pairs, r.both_right, r.both_wrong, r.a_only, r.b_only) \
        == (10, 3, 2, 4, 1)
    assert r.chi2 == (3 - 1) ** 2 / 5.0
    # no discordant pairs -> NULL
    df2 = spark.createDataFrame([("k", 1, 1, 1)] * 3,
                                "g string, a int, b int, y int")
    assert mcnemar_test(df2, "g", F.col("a") == 1, F.col("b") == 1,
                        F.col("y") == 1).collect()[0].chi2 is None


def test_brier_score_hand_case(spark):
    # forecasts 80,80,20,20 with outcomes 1,0,1,0:
    # ss = 400+6400+6400+400 = 13600 -> brier 0.34; base 0.5.
    from logpipe_spark.operators.aggregate import brier_score

    rows = [("k", 80, 1), ("k", 80, 0), ("k", 20, 1), ("k", 20, 0)]
    df = spark.createDataFrame(rows, "g string, p long, y int")
    r = brier_score(df, "g", F.col("p"), F.col("y")).collect()[0]
    assert r.n == 4 and r.brier == 0.34
    assert r.base_rate == 0.5 and r.brier_base == 0.25


def test_ece_hand_case(spark):
    # bin 8 (p=80x2): k=1, sp=160 -> |100-160| = 60
    # bin 2 (p=20x2): k=1, sp=40  -> |100-40|  = 60
    # ECE = 120/(100*4) = 0.3; MCE = 60/(100*2) = 0.3.
    from logpipe_spark.operators.aggregate import \
        expected_calibration_error

    rows = [("k", 80, 1), ("k", 80, 0), ("k", 20, 1), ("k", 20, 0)]
    df = spark.createDataFrame(rows, "g string, p long, y int")
    r = expected_calibration_error(df, "g", F.col("p"),
                                   F.col("y")).collect()[0]
    assert r.n == 4 and r.n_bins_used == 2
    assert r.ece == 0.3 and r.mce == 0.3
    # perfectly calibrated bins -> 0
    rows2 = [("k", 50, 1), ("k", 50, 0)]
    df2 = spark.createDataFrame(rows2, "g string, p long, y int")
    r2 = expected_calibration_error(df2, "g", F.col("p"),
                                    F.col("y")).collect()[0]
    assert r2.ece == 0.0 and r2.mce == 0.0
