"""Round-2 continuation batch 10: two-sample / k-sample statistics
(Welch t, ANOVA F, CUSUM change detection, Mann–Whitney AUC), Gini-gain
association, quantile normalization, vocabulary rarity, 2-D heatmap.

Oracle parity runs in the driver gate; here we assert ENGINE invariants
the oracle can't see: brute-force recurrence/pairwise equivalence,
known-answer hand cases, degenerate-group filtering, plan shape.
"""

from __future__ import annotations

import math

import pyspark.sql.functions as F

from logpipe_spark.operators.aggregate import anova_f, gini_gain
from logpipe_spark.operators.drift import auc_rank, cusum_scan, welch_ttest
from logpipe_spark.operators.profile import hist2d
from logpipe_spark.trainprep.curate import quantile_normalize
from logpipe_spark.trainprep.textqual import doc_rarity


# ----------------------------------------------------------------- CUSUM

def _cusum_brute(xs, k):
    s, smax = 0, 0
    for x in xs:
        s = max(0, s + (x - k))
        smax = max(smax, s)
    return s, smax


def test_cusum_matches_brute_force_recurrence(spark):
    xs = [5, 5, 9, 1, 2, 14, 14, 3, 0, 8, 8, 8]
    rows = [("a", i, x) for i, x in enumerate(xs)]
    df = spark.createDataFrame(rows, "k string, i int, x int")
    out = cusum_scan(df, "k", F.col("x"), ["i"], target=5,
                     threshold=10).collect()
    assert len(out) == 1
    final, smax = _cusum_brute(xs, 5)
    r = out[0]
    assert (r.final_cusum, r.max_cusum) == (final, smax)
    assert r.n == len(xs)
    assert r.alert == (smax >= 10)


def test_cusum_resets_after_dips_and_per_key(spark):
    # key a: spike then long dip — final resets to 0, max remembers spike
    # key b: monotone drift — final == max
    rows = ([("a", i, v) for i, v in enumerate([9, 9, 0, 0, 0, 0])]
            + [("b", i, 7) for i in range(4)])
    df = spark.createDataFrame(rows, "k string, i int, x int")
    out = {r.k: r for r in
           cusum_scan(df, "k", F.col("x"), ["i"], target=5,
                      threshold=8).collect()}
    assert (out["a"].final_cusum, out["a"].max_cusum) == (0, 8)
    assert out["a"].alert
    assert (out["b"].final_cusum, out["b"].max_cusum) == (8, 8)


def test_cusum_single_sort_plan(spark):
    df = spark.createDataFrame([("a", 1, 1)], "k string, i int, x int")
    plan = (cusum_scan(df, "k", F.col("x"), ["i"], target=0, threshold=1)
            ._jdf.queryExecution().executedPlan().toString())
    # running-sum and running-min-of-sum share the (k)-partitioned order:
    # one Sort, one window exchange — the naive per-row fold can't even
    # be expressed without a UDF
    assert plan.count("+- Sort ") == 1, plan


# --------------------------------------------------------------- Welch t

def _welch_brute(a, b):
    na, nb = len(a), len(b)
    ma, mb = sum(a) / na, sum(b) / nb
    va = sum((x - ma) ** 2 for x in a) / (na - 1)
    vb = sum((x - mb) ** 2 for x in b) / (nb - 1)
    se2 = va / na + vb / nb
    t = (ma - mb) / math.sqrt(se2)
    dfw = se2 ** 2 / ((va / na) ** 2 / (na - 1) + (vb / nb) ** 2 / (nb - 1))
    return t, dfw


def test_welch_known_samples(spark):
    a = [10, 12, 14, 16, 18, 20]
    b = [11, 11, 12, 12]
    rows = [("g", x, True) for x in a] + [("g", x, False) for x in b]
    df = spark.createDataFrame(rows, "k string, x int, ia boolean")
    r = welch_ttest(df, "k", F.col("x"), F.col("ia")).collect()[0]
    t, dfw = _welch_brute(a, b)
    assert (r.n_a, r.n_b) == (6, 4)
    assert abs(r.t_stat - t) < 1e-12
    assert abs(r.df_welch - dfw) < 1e-9
    assert r.mean_a == sum(a) / 6 and r.mean_b == sum(b) / 4


def test_welch_drops_degenerate_groups(spark):
    rows = (
        # both samples constant → zero pooled variance: dropped
        [("const", 5, True)] * 3 + [("const", 5, False)] * 3
        # one side too small (n_b = 1): dropped
        + [("tiny", x, True) for x in (1, 2, 3)] + [("tiny", 9, False)]
        # NULL predicate rows belong to neither sample
        + [("ok", x, True) for x in (1, 2, 3)]
        + [("ok", x, False) for x in (7, 9)]
        + [("ok", 1000, None)]
    )
    df = spark.createDataFrame(rows, "k string, x int, ia boolean")
    out = {r.k: r for r in welch_ttest(df, "k", F.col("x"),
                                       F.col("ia")).collect()}
    assert set(out) == {"ok"}
    assert (out["ok"].n_a, out["ok"].n_b) == (3, 2)  # null row excluded
    assert out["ok"].t_stat < 0  # sample A clearly below B


# --------------------------------------------------------------- ANOVA F

def test_anova_known_decomposition(spark):
    groups = {"a": [1, 2, 3], "b": [4, 5, 6], "c": [7, 8, 9]}
    rows = [(g, x) for g, xs in groups.items() for x in xs]
    df = spark.createDataFrame(rows, "g string, x int")
    r = anova_f(df, "g", F.col("x")).collect()[0]
    # hand decomposition: grand mean 5, SSB = 3*(16+0+16) ... over means
    all_x = [x for xs in groups.values() for x in xs]
    gm = sum(all_x) / len(all_x)
    ssb = sum(len(xs) * (sum(xs) / len(xs) - gm) ** 2
              for xs in groups.values())
    ssw = sum((x - sum(xs) / len(xs)) ** 2
              for xs in groups.values() for x in xs)
    assert (r.n, r.k) == (9, 3)
    assert abs(r.ss_between - ssb) < 1e-9
    assert abs(r.ss_within - ssw) < 1e-9
    assert abs(r.f_stat - (ssb / 2) / (ssw / 6)) < 1e-9


def test_anova_all_constant_filtered(spark):
    df = spark.createDataFrame(
        [("a", 5)] * 3 + [("b", 5)] * 3, "g string, x int")
    assert anova_f(df, "g", F.col("x")).count() == 0


# ------------------------------------------------------ Mann–Whitney AUC

def _auc_brute(pos, neg):
    wins = sum(1.0 if p > n else 0.5 if p == n else 0.0
               for p in pos for n in neg)
    return wins / (len(pos) * len(neg))


def test_auc_brute_force_with_ties(spark):
    pos = [3, 5, 5, 8, 10]
    neg = [1, 3, 5, 6]
    rows = ([("g", x, True) for x in pos] + [("g", x, False) for x in neg])
    df = spark.createDataFrame(rows, "k string, x int, y boolean")
    r = auc_rank(df, "k", F.col("x"), F.col("y")).collect()[0]
    assert (r.n_pos, r.n_neg) == (5, 4)
    assert r.auc == _auc_brute(pos, neg)


def test_auc_extremes_and_bucket_carry(spark):
    # perfect separation across bucket boundaries (values straddle the
    # 1024-wide prefix-scan buckets) → exactly 1.0; reversed → 0.0
    pos = [5000, 6000, 7000]
    neg = [10, 2000, 3000]
    rows = [("sep", x, True) for x in pos] + [("sep", x, False) for x in neg]
    rows += [("rev", x, False) for x in pos] + [("rev", x, True) for x in neg]
    rows += [("coin", 7, True), ("coin", 7, False)]  # all tied → 0.5
    df = spark.createDataFrame(rows, "k string, x int, y boolean")
    out = {r.k: r.auc for r in
           auc_rank(df, "k", F.col("x"), F.col("y")).collect()}
    assert out == {"sep": 1.0, "rev": 0.0, "coin": 0.5}


# --------------------------------------------------------------- Gini gain

def test_gini_gain_pure_and_independent(spark):
    # feature p: pure targets (each value → one lang): child gini 0,
    # gain == parent gini. feature rows are built so the parent mix is
    # 6 en / 6 fr → parent gini = 0.5 exactly.
    rows = ([("p1", "en")] * 3 + [("p2", "fr")] * 3
            + [("m", "en")] * 3 + [("m", "fr")] * 3)
    df = spark.createDataFrame(rows, "source string, lang string")
    out = {r.source: r for r in gini_gain(df, "source", "lang").collect()}
    assert out["p1"].gini == 0.0 and out["p1"].gain == 0.5
    assert out["p2"].gini == 0.0 and out["p2"].gain == 0.5
    # the mixed value mirrors the parent mix exactly → zero gain
    assert out["m"].gini == 0.5 and out["m"].gain == 0.0
    assert all(r.parent_gini == 0.5 for r in out.values())


# ------------------------------------------------------ quantile normalize

def test_quantile_normalize_equalizes_group_distributions(spark):
    # two equal-size groups with shifted scales: after normalization the
    # multiset of values per group must be IDENTICAL (that's the point)
    a = [10, 20, 30, 40]
    b = [1000, 2000, 3000, 4000]
    rows = ([("a", i, v) for i, v in enumerate(a)]
            + [("b", 100 + i, v) for i, v in enumerate(b)])
    df = spark.createDataFrame(rows, "source string, doc_id int, n_chars int")
    out = quantile_normalize(df, "source", "n_chars", "doc_id").collect()
    by_group = {}
    for r in out:
        by_group.setdefault(r.source, []).append(r.norm_value)
    assert sorted(by_group["a"]) == sorted(by_group["b"])
    # rank order is preserved within each group
    ranked = sorted((r for r in out if r.source == "a"),
                    key=lambda r: r.rank_in_group)
    assert [r.n_chars for r in ranked] == a
    assert all(x <= y for x, y in
               zip([r.norm_value for r in ranked],
                   [r.norm_value for r in ranked][1:]))


def test_quantile_normalize_row_preserving(spark):
    rows = [("a", i, v) for i, v in enumerate([5, 5, 7])] + [
        ("b", 10, 100), ("b", 11, None)]
    df = spark.createDataFrame(rows, "source string, doc_id int, n_chars int")
    out = quantile_normalize(df, "source", "n_chars", "doc_id")
    assert out.count() == 4  # null value dropped, ties kept
    assert out.select("doc_id").distinct().count() == 4


# ------------------------------------------------------------- doc rarity

def test_doc_rarity_hand_counts(spark):
    df = spark.createDataFrame(
        [(1, "the cat sat"), (2, "the dog sat"), (3, "the the unique")],
        "doc_id int, text string")
    out = {r.doc_id: r for r in doc_rarity(df).collect()}
    # df: the=3, sat=2, cat=1, dog=1, unique=1 (distinct per doc)
    assert (out[1].n_terms, out[1].sum_df, out[1].max_df) == (3, 6, 3)
    assert out[1].mean_df == 2.0
    assert (out[3].n_terms, out[3].sum_df) == (2, 4)  # 'the' counted once
    assert out[3].mean_df == 2.0


# ----------------------------------------------------------------- hist2d

def test_hist2d_marginals_and_independence(spark):
    # independent 2x2 grid, 4 rows each → every lift exactly 1.0
    rows = [(a, b) for a in ("x", "y") for b in (0, 1) for _ in range(4)]
    df = spark.createDataFrame(rows, "t string, h int")
    out = hist2d(df, "t", "h").collect()
    assert len(out) == 4
    assert all(r.lift == 1.0 and r.frac == 0.25 for r in out)
    assert all(r.n_x == 8 and r.n_y == 8 for r in out)


def test_hist2d_hot_cell_lift(spark):
    rows = [("x", 0)] * 6 + [("x", 1)] * 2 + [("y", 0)] * 2 + [("y", 1)] * 6
    df = spark.createDataFrame(rows, "t string, h int")
    out = {(r.t, r.h): r for r in hist2d(df, "t", "h").collect()}
    assert out[("x", 0)].lift == (6 * 16) / (8 * 8)  # 1.5, diagonal hot
    assert out[("x", 1)].lift == (2 * 16) / (8 * 8)  # 0.5
    assert sum(r.n for r in out.values()) == 16


# ---------------------------------------------------- CUSUM monoid merge

def test_cusum_merge_equals_full_scan(spark):
    from logpipe_spark.operators.drift import cusum_merge, cusum_partials

    # deterministic pseudo-random stream, 3 keys, epochs of 5 rows
    rows = [("k%d" % (i % 3), i, (i * 2654435761) % 17) for i in range(90)]
    df = spark.createDataFrame(rows, "k string, i int, x int")
    full = {r.k: r for r in
            cusum_scan(df, "k", F.col("x"), ["i"], target=8,
                       threshold=10).collect()}
    p = cusum_partials(df, "k", (F.col("i") / 5).cast("bigint"),
                       F.col("x"), ["i"], target=8)
    merged = {r.k: r for r in cusum_merge(p, "k", threshold=10).collect()}
    assert set(full) == set(merged)
    for k in full:
        a, b = full[k], merged[k]
        assert (a.n, a.final_cusum, a.max_cusum, a.alert) == \
            (b.n, b.final_cusum, b.max_cusum, b.alert), k


def test_cusum_merge_single_and_unbalanced_epochs(spark):
    from logpipe_spark.operators.drift import cusum_merge, cusum_partials

    # one epoch only (fold over a 1-element list) and a key whose
    # epochs are wildly unbalanced — both must equal the plain scan
    rows = ([("one", i, v) for i, v in enumerate([9, 0, 9])]
            + [("skew", 0, 12)]
            + [("skew", i, (i % 4)) for i in range(1, 40)])
    df = spark.createDataFrame(rows, "k string, i int, x int")
    epoch = F.when(F.col("k") == "one", F.lit(0)).otherwise(
        F.least(F.col("i"), F.lit(1)))  # skew: epoch0 = 1 row, epoch1 = rest
    full = {r.k: r for r in cusum_scan(df, "k", F.col("x"), ["i"],
                                       target=5, threshold=7).collect()}
    merged = {r.k: r for r in cusum_merge(
        cusum_partials(df, "k", epoch, F.col("x"), ["i"], target=5),
        "k", threshold=7).collect()}
    for k in full:
        a, b = full[k], merged[k]
        assert (a.n, a.final_cusum, a.max_cusum, a.alert) == \
            (b.n, b.final_cusum, b.max_cusum, b.alert), k


# ---------------------------------------------------------- log templates

def test_log_templates_masks_numbers(spark):
    from logpipe_spark.operators.parse import log_templates

    df = spark.createDataFrame(
        [("GET /api/v2/users/123 took 45ms",),
         ("GET /api/v2/users/999 took 7ms",),
         ("POST /login failed",),
         (None,)],
        "msg string")
    out = {r.skeleton: r for r in log_templates(df, "msg").collect()}
    assert set(out) == {"GET /api/v#/users/# took #ms", "POST /login failed"}
    t = out["GET /api/v#/users/# took #ms"]
    assert (t.n, t.n_variants) == (2, 2)
    assert t.example == "GET /api/v2/users/123 took 45ms"  # min raw
    assert out["POST /login failed"].n_variants == 1


# ---------------------------------------------------------- vocab overlap

def test_vocab_overlap_hand_case(spark):
    from logpipe_spark.trainprep.curate import vocab_overlap

    df = spark.createDataFrame(
        [("a", "x y z"), ("a", "x q"),          # vocab a = {x,y,z,q}
         ("b", "x y"),                          # vocab b = {x,y}
         ("c", "unique tokens only")],          # disjoint from a,b
        "source string, text string")
    out = {(r.group_a, r.group_b): r
           for r in vocab_overlap(df, "source", "text").collect()}
    assert set(out) == {("a", "b")}  # c shares nothing → no row
    r = out[("a", "b")]
    assert (r.vocab_a, r.vocab_b, r.shared) == (4, 2, 2)
    assert r.jaccard == 2 / 4


# ----------------------------------------------------------- holt smoothing

def test_holt_smooth_matches_python_fold(spark):
    from logpipe_spark.operators.aggregate import holt_smooth

    series = {"a": [1.0, 2.0, 4.0, 3.0], "b": [10.0]}
    rows = [(k, i, v) for k, xs in series.items()
            for i, v in enumerate(xs)]
    df = spark.createDataFrame(rows, "k string, i int, x double")
    out = {r.k: r for r in holt_smooth(
        df, "k", F.col("x"), ["i"], alpha=0.3, beta=0.1).collect()}
    for k, xs in series.items():
        l, t = xs[0], 0.0
        for x in xs[1:]:
            nl = 0.3 * x + 0.7 * (l + t)
            nt = 0.1 * (nl - l) + 0.9 * t
            l, t = nl, nt
        r = out[k]
        # exact equality: the fold replays the same float operand order
        assert (r.n, r.level, r.trend, r.forecast) == \
            (len(xs), l, t, l + t), k


# -------------------------------------------------------- seasonal anomaly

def test_seasonal_anomaly_hand_case(spark):
    from datetime import datetime

    from logpipe_spark.operators.aggregate import seasonal_anomaly

    # key k, slot 0 (hour 0) across 3 days: counts 2, 2, 5 -> day 2 is hot
    rows = []
    for day, cnt in enumerate([2, 2, 5]):
        for j in range(cnt):
            rows.append(("k", datetime(2024, 1, 1 + day, 0, 0, j)))
    # slot 1 seen on one day only -> z NULL (no evidence)
    rows.append(("k", datetime(2024, 1, 1, 1, 0, 0)))
    df = spark.createDataFrame(rows, "k string, ts timestamp")
    out = {(r.period, r.slot): r
           for r in seasonal_anomaly(df, "k", "ts").collect()}
    d, s, ss = 3.0, 9.0, 33.0          # slot-0 baseline: 2,2,5
    mean = s / d
    var = (d * ss - s * s) / (d * d)
    std = var ** 0.5
    # find the day with n=5 irrespective of absolute epoch numbering
    hot = next(r for r in out.values() if r.slot == 0 and r.n == 5)
    assert hot.n_periods == 3 and hot.mean == mean and hot.std == std
    assert hot.z == (5.0 - mean) / std
    cold = next(r for r in out.values() if r.slot == 0 and r.n == 2)
    assert cold.z == (2.0 - mean) / std
    lone = next(r for r in out.values() if r.slot == 1)
    assert lone.n_periods == 1 and lone.z is None


def test_quantile_normalize_keeps_null_group_rows(spark):
    """A NULL group is a real group (window partitions treat NULL as one
    key): the bucketed-rank rewrite must not drop its rows via a
    null-unsafe join — every input row with a non-null value appears in
    the output, ranked within the NULL group."""
    from logpipe_spark.trainprep.curate import quantile_normalize

    rows = [(1, "a", 10), (2, "a", 20), (3, None, 5), (4, None, 15)]
    df = spark.createDataFrame(rows, "id long, src string, v long")
    out = {r.id: r for r in
           quantile_normalize(df, "src", "v", "id").collect()}
    assert len(out) == 4                       # nothing dropped
    assert out[3].src is None and out[4].src is None
    assert (out[3].rank_in_group, out[4].rank_in_group) == (1, 2)
    assert (out[3].n_group, out[4].n_group) == (2, 2)
    # pooled = [5,10,15,20]; both groups map rank 1->5, rank 2->15
    assert (out[3].norm_value, out[4].norm_value) == (5, 15)
    assert (out[1].norm_value, out[2].norm_value) == (5, 15)


def test_ewma_merged_equals_scan(spark):
    """Segment-parallel EWMA == the single-task scan: EXACT when every
    key has one segment, exact again for dyadic α + small ints (every
    intermediate a representable dyadic rational — zero rounding, so the
    affine composition is bitwise associative), and ≤1e-12 relative on
    multi-segment float folds (the composition reorders float ops)."""
    from logpipe_spark.operators.aggregate import (ewma_merge,
                                                   ewma_partials,
                                                   ewma_smooth)

    rows = [("k1", i, e, v) for i, (e, v) in enumerate(
        [(0, 4), (0, 8), (1, 2), (1, 6), (2, 10)])]
    rows += [("k2", i, 0, v) for i, v in enumerate([3, 9, 27])]
    df = spark.createDataFrame(rows, "k string, i int, epoch int, v int")

    plain = {r.k: r for r in ewma_smooth(
        df, "k", F.col("v"), ["i"], alpha=0.5).collect()}
    merged = {r.k: r for r in ewma_merge(
        ewma_partials(df, "k", F.col("epoch"), F.col("v"), ["i"],
                      alpha=0.5), "k").collect()}
    assert set(plain) == set(merged)
    for k in plain:
        assert merged[k].n == plain[k].n
        assert merged[k].last_value == plain[k].last_value
        assert merged[k].ewma == plain[k].ewma, k  # dyadic → bit-exact

    # non-dyadic α, adversarial values: tolerance bound
    import random
    rnd = random.Random(7)
    rows2 = [("u%d" % (i % 5), i, i // 17, rnd.randint(1, 10**6))
             for i in range(400)]
    df2 = spark.createDataFrame(rows2, "k string, i int, epoch int, v int")
    p2 = {r.k: r.ewma for r in ewma_smooth(
        df2, "k", F.col("v"), ["i"], alpha=0.3).collect()}
    m2 = {r.k: r.ewma for r in ewma_merge(
        ewma_partials(df2, "k", F.col("epoch"), F.col("v"), ["i"],
                      alpha=0.3), "k").collect()}
    for k in p2:
        assert abs(m2[k] - p2[k]) <= 1e-12 * max(1.0, abs(p2[k])), k


def test_holt_merged_equals_scan(spark):
    """Segment-parallel Holt == the single-task scan within float
    tolerance; bit-exact when each key is a single segment."""
    from logpipe_spark.operators.aggregate import (holt_merge,
                                                   holt_partials,
                                                   holt_smooth)
    import random

    rnd = random.Random(11)
    rows = [("u%d" % (i % 4), i, i // 13, rnd.randint(1, 10**6))
            for i in range(300)]
    df = spark.createDataFrame(rows, "k string, i int, epoch int, v int")
    plain = {r.k: r for r in holt_smooth(
        df, "k", F.col("v"), ["i"], alpha=0.3, beta=0.1).collect()}

    single = {r.k: r for r in holt_merge(
        holt_partials(df, "k", F.lit(0), F.col("v"), ["i"],
                      alpha=0.3, beta=0.1), "k").collect()}
    for k in plain:  # one segment → identical op sequence → bit-exact
        assert single[k].level == plain[k].level, k
        assert single[k].trend == plain[k].trend, k

    merged = {r.k: r for r in holt_merge(
        holt_partials(df, "k", F.col("epoch"), F.col("v"), ["i"],
                      alpha=0.3, beta=0.1), "k").collect()}
    for k in plain:
        assert merged[k].n == plain[k].n
        for f in ("level", "trend", "forecast"):
            p, m = getattr(plain[k], f), getattr(merged[k], f)
            assert abs(m - p) <= 1e-9 * max(1.0, abs(p)), (k, f)


def test_slo_burn_multiwindow_gate(spark):
    """A one-minute spike must NOT alert (slow window dilutes it); a
    sustained burn must (both windows over threshold)."""
    from logpipe_spark.operators.aggregate import slo_burn

    rows = []
    # 120 quiet minutes: 10 requests/min, 0 errors
    for m in range(120):
        rows += [(m * 60, 200)] * 10
    # minute 120: spike 50% errors for ONE minute
    rows += [(120 * 60, 500)] * 7 + [(120 * 60, 200)] * 3
    # minutes 121-180 quiet again
    for m in range(121, 181):
        rows += [(m * 60, 200)] * 10
    # minutes 200-280: sustained 60% errors
    for m in range(200, 281):
        rows += [(m * 60, 500)] * 6 + [(m * 60, 200)] * 4
    df = spark.createDataFrame(
        [(float(e), s) for e, s in rows], "epoch double, status int"
    ).select(F.col("epoch").cast("timestamp").alias("ts"), "status")

    out = {r.bucket_epoch: r for r in slo_burn(df, "ts", "status").collect()}
    spike = out[120 * 60]
    assert spike.burn_fast > 2.0          # fast window sees the spike
    assert spike.alert == 0               # slow window (60m) dilutes it
    late = out[280 * 60]
    assert late.alert == 1                # sustained burn: both confirm
    assert out[60 * 60].alert == 0 and out[60 * 60].burn_fast == 0.0


def test_quantile_sketch_merge_idempotent(spark):
    """Re-merging a sketch with itself must be a no-op (the replay /
    double-read case) — and the merged two-half sketch equals the
    full-scan sketch."""
    from logpipe_spark.operators.aggregate import (quantile_sketch,
                                                   quantile_sketch_estimate,
                                                   quantile_sketch_merge)

    rows = [(i, "g", float(i * 37 % 1000)) for i in range(500)]
    df = spark.createDataFrame(rows, "id long, g string, v double")
    full = quantile_sketch(df, "g", "v", "id", k=32)
    est = lambda s: sorted(map(tuple,  # noqa: E731
                               quantile_sketch_estimate(s, "g").collect()))
    doubled = quantile_sketch_merge(full.unionByName(full), "g", k=32)
    assert est(doubled) == est(full)
    halves = quantile_sketch_merge(
        quantile_sketch(df.where("id % 2 = 0"), "g", "v", "id", k=32)
        .unionByName(
            quantile_sketch(df.where("id % 2 = 1"), "g", "v", "id", k=32)),
        "g", k=32)
    assert est(halves) == est(full)


# --------------------------------------------------------- funnel_latency

def test_funnel_latency_hand_case(spark):
    import datetime as dt
    from logpipe_spark.operators.funnel import funnel_latency

    t0 = dt.datetime(2024, 1, 1)

    def ts(sec):
        return t0 + dt.timedelta(seconds=sec)

    rows = [
        # u1 completes all three: view@0, click@10, purchase@70
        (1, "view", ts(0)), (1, "click", ts(10)), (1, "purchase", ts(70)),
        # u2 completes view->click only (purchase BEFORE click: strict order)
        (2, "view", ts(0)), (2, "purchase", ts(5)), (2, "click", ts(30)),
        # u3 never views: contributes nothing
        (3, "click", ts(0)), (3, "purchase", ts(1)),
        # u4 all three, equal-ts click is NOT strictly after view
        (4, "view", ts(0)), (4, "click", ts(0)), (4, "click", ts(40)),
        (4, "purchase", ts(100)),
    ]
    df = spark.createDataFrame(rows, ["user_id", "event_type", "ts"])
    out = {
        r.step_idx: r
        for r in funnel_latency(
            df, ["view", "click", "purchase"]
        ).collect()
    }
    # view->click latencies: u1=10s, u2=30s, u4=40s (micros)
    s2 = out[2]
    assert (s2.from_step, s2.to_step) == ("view", "click")
    assert s2.n_users == 3
    assert s2.min_us == 10_000_000 and s2.max_us == 40_000_000
    # discrete p50 = rank ceil(0.5*3)=2 -> 30s; p90 = rank 3 -> 40s
    assert s2.p50_us == 30_000_000 and s2.p90_us == 40_000_000
    # click->purchase: u1=60s, u4=60s (u2 has no qualifying purchase)
    s3 = out[3]
    assert s3.n_users == 2
    assert (s3.min_us, s3.p50_us, s3.p90_us, s3.max_us) == (
        60_000_000,) * 4


# ------------------------------------------------------------ rfm_scores

def test_rfm_closed_form_matches_spark_ntile(spark):
    """13 users / k=5 exercises the uneven split (q=2, r=3: tiles sized
    3,3,3,2,2): the closed-form tile-from-rank must equal Spark's own
    ntile() over the identical total order, for every metric."""
    import datetime as dt
    from pyspark.sql import Window
    from logpipe_spark.operators.segment import rfm_scores

    t0 = dt.datetime(2024, 1, 1)
    rows = []
    for u in range(13):
        # distinct recency/frequency/monetary profiles incl. freq ties
        for i in range(1 + (u % 3)):
            rows.append(
                (u, t0 + dt.timedelta(hours=u * 7 + i), float(u) + 0.25)
            )
    df = spark.createDataFrame(rows, ["user_id", "ts", "value"])
    got = rfm_scores(df).orderBy("user_id")

    per_user = got.select("user_id", "last_s", "freq", "cents")
    ref = per_user.select(
        "user_id",
        F.ntile(5).over(
            Window.orderBy("last_s", "user_id")).alias("r_score"),
        F.ntile(5).over(Window.orderBy("freq", "user_id")).alias("f_score"),
        F.ntile(5).over(
            Window.orderBy("cents", "user_id")).alias("m_score"),
    )
    g = {r.user_id: (r.r_score, r.f_score, r.m_score) for r in got.collect()}
    e = {r.user_id: (r.r_score, r.f_score, r.m_score) for r in ref.collect()}
    assert g == e
    # tile sizes: 3,3,3,2,2 over 13 users for each metric
    from collections import Counter
    sizes = Counter(v[0] for v in g.values())
    assert sorted(sizes.values(), reverse=True) == [3, 3, 3, 2, 2]


# -------------------------------------------------------------- peak_rate

def test_peak_rate_hand_case(spark):
    import datetime as dt
    from logpipe_spark.operators.sweep import peak_rate

    t0 = dt.datetime(2024, 1, 1)

    def ts(sec):
        return t0 + dt.timedelta(seconds=sec)

    rows = [
        # u1: burst of 3 within [100, 160] (inclusive 60s frame), then quiet
        (1, ts(0)), (1, ts(100)), (1, ts(130)), (1, ts(160)), (1, ts(400)),
        # u2: two events exactly 60s apart -> inclusive frame counts both
        (2, ts(0)), (2, ts(60)),
        # u3: duplicate instants — RANGE peers all share one frame
        (3, ts(10)), (3, ts(10)), (3, ts(10)),
    ]
    df = spark.createDataFrame(rows, ["user_id", "ts"])
    out = {r.user_id: r for r in peak_rate(df, window_seconds=60).collect()}
    us = lambda sec: int(
        (t0 + dt.timedelta(seconds=sec) - dt.datetime(1970, 1, 1))
        .total_seconds() * 1_000_000)
    # u1 peak: events at 100,130,160 all within [100,160] -> 3, first at 160
    assert (out[1].n_events, out[1].peak_n, out[1].peak_at_us) == (
        5, 3, us(160))
    # u2: frame [0,60] inclusive -> 2 at t=60
    assert (out[2].peak_n, out[2].peak_at_us) == (2, us(60))
    # u3: three peers of one instant each see count 3 at t=10
    assert (out[3].n_events, out[3].peak_n, out[3].peak_at_us) == (
        3, 3, us(10))


# -------------------------------------------------------------- theil_sen

def test_theil_sen_resists_outlier_where_ols_breaks(spark):
    from logpipe_spark.operators.aggregate import ols_trend, theil_sen

    # perfect slope-2 line with ONE wild outlier at x=5
    rows = [("a", x, 2 * x if x != 5 else 1000) for x in range(9)]
    df = spark.createDataFrame(rows, ["k", "x", "y"])
    ts = theil_sen(df, "k", F.col("x"), F.col("y")).collect()[0]
    assert ts.slope == 2.0 and ts.n_points == 9 and ts.n_pairs == 36
    ols = ols_trend(df, "k", F.col("x"), F.col("y")).collect()[0]
    assert abs(ols.slope - 2.0) > 5  # least squares is dragged away


def test_theil_sen_median_is_discrete_even_n_pairs(spark):
    from logpipe_spark.operators.aggregate import theil_sen

    # 3 points -> 3 pairs: slopes {1.0, 2.0, 3.0}? build x,y giving
    # distinct pairwise slopes; median = rank ceil(3/2)=2 -> middle one
    df = spark.createDataFrame(
        [("a", 0, 0), ("a", 1, 3), ("a", 3, 3)], ["k", "x", "y"])
    # slopes: (0,1)=3.0, (0,3)=1.0, (1,3)=0.0 -> sorted 0,1,3 -> median 1.0
    out = theil_sen(df, "k", F.col("x"), F.col("y")).collect()[0]
    assert out.slope == 1.0 and out.n_pairs == 3


# --------------------------------------------------------- context_growth

def test_context_growth_first_overflow_and_null_when_under(spark):
    from logpipe_spark.operators.spans import context_growth

    rows = [
        # conv A: tokens 100,100,100 -> cum 100,200,300; budget 250 ->
        # overflow at turn 2 with cum 300
        ("A", 0, 100), ("A", 1, 100), ("A", 2, 100),
        # conv B: never exceeds
        ("B", 0, 10), ("B", 1, 20),
        # conv C: zero-token turns don't advance cum; overflow exactly
        # when cum strictly exceeds (cum == budget is NOT overflow)
        ("C", 0, 250), ("C", 1, 0), ("C", 2, 1),
    ]
    df = spark.createDataFrame(rows, ["conv_id", "turn_idx", "n_tokens"])
    out = {r.conv_id: r for r in context_growth(df, budget=250).collect()}
    assert (out["A"].overflow_turn, out["A"].tokens_at_overflow) == (2, 300)
    assert out["A"].total_tokens == 300 and out["A"].n_turns == 3
    assert out["B"].overflow_turn is None
    assert out["B"].tokens_at_overflow is None
    assert (out["C"].overflow_turn, out["C"].tokens_at_overflow) == (2, 251)


# --------------------------------------------------- concentration_share

def test_concentration_share_hand_case(spark):
    from logpipe_spark.operators.segment import concentration_share

    # 5 keys, amounts 100,50,25,15,10 (total 200); top 20% = ceil(1) = 1
    # key -> 100/200 = 0.5
    rows = [(k, a) for k, a in
            [("a", 100), ("b", 50), ("c", 25), ("d", 15), ("e", 10)]]
    df = spark.createDataFrame(rows, ["k", "amt"])
    out = concentration_share(df, "k", F.col("amt"), 1, 5).collect()[0]
    assert (out.n_keys, out.k_top, out.amount_top, out.amount_total) == (
        5, 1, 100, 200)
    assert out.share == 0.5
    # 50% cut: ceil(5/2)=3 keys -> 175/200
    out2 = concentration_share(df, "k", F.col("amt"), 1, 2).collect()[0]
    assert (out2.k_top, out2.amount_top) == (3, 175)
    assert out2.share == 0.875


# --------------------------------------------------------- phrase_search

def test_phrase_search_hand_case(spark):
    from logpipe_spark.trainprep.index import phrase_search

    rows = [
        (1, "a b c a b c a b"),   # "a b c" at pos 0 and 3 -> 2 matches
        (2, "a b x a b"),         # phrase broken by x -> 0 matches
        (3, "c a b c"),           # one match at pos 1
        (4, None),                # null text -> no tokens, no crash
    ]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    out = {r.doc_id: r for r in phrase_search(df, "a b c", k=10).collect()}
    assert out[1].n_matches == 2 and out[1].rank == 1
    assert out[3].n_matches == 1 and out[3].rank == 2
    assert 2 not in out and 4 not in out


def test_phrase_search_single_word(spark):
    from logpipe_spark.trainprep.index import phrase_search

    df = spark.createDataFrame(
        [(1, "x y x"), (2, "y y")], ["doc_id", "text"])
    out = {r.doc_id: r.n_matches for r in
           phrase_search(df, "x", k=10).collect()}
    assert out == {1: 2}


# ------------------------------------------------------ density_outliers

def test_density_neighbor_counts_hand_case(spark):
    from logpipe_spark.operators.spatial import density_neighbor_counts

    # cluster of 3 points within eps=1 of each other; one far point;
    # one pair at EXACTLY eps (boundary counts as neighbor: d2 <= eps^2)
    rows = [
        (1, 0.0, 0.0), (2, 0.5, 0.0), (3, 0.0, 0.5),
        (4, 100.0, 100.0),
        (5, 10.0, 0.0), (6, 11.0, 0.0),   # exactly eps apart
        (7, None, 1.0),                   # null coordinate dropped
    ]
    df = spark.createDataFrame(rows, "pid long, x double, y double")
    out = {r.pid: r for r in density_neighbor_counts(
        df, eps=1.0, min_pts=2, x_col="x", y_col="y", id_col="pid"
    ).collect()}
    assert len(out) == 6 and 7 not in out
    assert out[1].n_neighbors == 2 and not out[1].is_outlier
    assert out[2].n_neighbors == 2 and out[3].n_neighbors == 2
    assert out[4].n_neighbors == 0 and out[4].is_outlier
    # boundary pair: exactly eps apart -> neighbors, but 1 < min_pts
    assert out[5].n_neighbors == 1 and out[5].is_outlier
    assert out[6].n_neighbors == 1


def test_density_cross_cell_neighbors(spark):
    from logpipe_spark.operators.spatial import density_neighbor_counts

    # points in DIFFERENT grid cells but within eps: the 3x3 probe
    # must find them (cells are floor(v/eps))
    df = spark.createDataFrame(
        [(1, 1.9, 0.0), (2, 2.1, 0.0)], "pid long, x double, y double")
    out = {r.pid: r.n_neighbors for r in density_neighbor_counts(
        df, eps=2.0, min_pts=1, x_col="x", y_col="y", id_col="pid"
    ).collect()}
    assert out == {1: 1, 2: 1}


# ------------------------------------------------------------ decile_lift

def test_decile_lift_hand_case(spark):
    from logpipe_spark.operators.segment import decile_lift

    # 20 rows, scores 20..1 (ids 1..20), positives = the top-4 scores
    # -> k=4 quintiles of 5 rows; tile 1 holds scores 20..16 (4 pos),
    # base rate 4/20 -> cum_lift tile1 = (4/5)/(4/20) = 4.0
    rows = [(i, float(21 - i), 1 if 21 - i >= 17 else 0)
            for i in range(1, 21)]
    df = spark.createDataFrame(rows, "event_id long, value double, pos int")
    out = {r.decile: r for r in decile_lift(
        df, score_col="value", label_col="pos", id_col="event_id", k=4
    ).collect()}
    assert [out[t].n for t in (1, 2, 3, 4)] == [5, 5, 5, 5]
    assert out[1].n_pos == 4 and out[2].n_pos == 0
    assert out[1].cum_lift == 4.0
    assert out[4].cum_lift == 1.0   # full corpus -> lift 1 by definition


def test_decile_lift_all_negative_labels_null_lift(spark):
    from logpipe_spark.operators.segment import decile_lift

    df = spark.createDataFrame(
        [(i, float(i), 0) for i in range(1, 9)],
        "event_id long, value double, pos int")
    out = decile_lift(df, score_col="value", label_col="pos",
                      id_col="event_id", k=2).collect()
    assert all(r.cum_lift is None for r in out)


def test_density_hot_cell_salting_identical_counts(spark):
    """r04 verdict item 6: salting only the oversized cells must not
    change a single neighbor count — each candidate pair is still
    generated exactly once (a build row owns one salt shard)."""
    from logpipe_spark.operators.spatial import density_neighbor_counts

    # one hot cluster (60% of points inside one eps-cell) + a sprinkle
    rows = [(i, 0.40 + (i % 7) * 0.01, 0.40 + (i % 5) * 0.01)
            for i in range(120)]
    rows += [(1000 + i, 3.0 + i * 0.9, 2.0 + i * 1.1) for i in range(80)]
    df = spark.createDataFrame(rows, "pid long, x double, y double")
    plain = {r.pid: (r.n_neighbors, r.is_outlier)
             for r in density_neighbor_counts(
                 df, 1.0, 3, hot_cell_threshold=None).collect()}
    salted = {r.pid: (r.n_neighbors, r.is_outlier)
              for r in density_neighbor_counts(
                  df, 1.0, 3, hot_cell_threshold=50,
                  salt_shards=4).collect()}
    assert salted == plain
    assert len(plain) == 200
