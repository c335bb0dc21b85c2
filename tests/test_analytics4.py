"""Round-2 continuation batch 5: association lift, weighted median,
Pareto skyline, interval-overlap join, KMV set algebra.

Oracle parity runs in the parametrized test_oracle_parity; here we
assert the ENGINE invariants the oracle can't see: brute-force
equivalence on adversarial inputs, per-basket capping, dedup-free pair
attribution, and sketch exactness below k.
"""

from __future__ import annotations

from itertools import combinations

import pyspark.sql.functions as F
import pytest

from logpipe_spark.operators.aggregate import kmv_set_ops, weighted_median
from logpipe_spark.operators.assoc import cooccurrence_lift
from logpipe_spark.operators.rangejoin import interval_overlap_join
from logpipe_spark.operators.skyline import pareto_front


# ------------------------------------------------------------------ assoc

def _baskets(spark):
    rows = [
        (1, "a"), (1, "b"), (1, "b"),          # repeat within basket: once
        (2, "a"), (2, "b"), (2, "c"),
        (3, "a"),
        (4, "c"), (4, "a"),
        (None, "a"), (5, None),                 # null basket/item dropped
    ]
    return spark.createDataFrame(rows, "basket int, item string")


def test_cooccurrence_counts_and_lift(spark):
    out = {(r.item_a, r.item_b): r
           for r in cooccurrence_lift(_baskets(spark), "basket", "item").collect()}
    # baskets: {1:ab, 2:abc, 3:a, 4:ac, 5:-} -> N=5 w/ basket 5 dropped? no:
    # (5, None) drops the item, so basket 5 contributes no rows at all -> N=4
    ab = out[("a", "b")]
    assert (ab.n_ab, ab.n_a, ab.n_b, ab.n_baskets) == (2, 4, 2, 4)
    assert ab.support == 2 / 4
    assert ab.lift == (2 * 4) / (4 * 2)
    ac = out[("a", "c")]
    assert (ac.n_ab, ac.n_a, ac.n_b) == (2, 4, 2)
    bc = out[("b", "c")]
    assert bc.n_ab == 1 and bc.lift == (1 * 4) / (2 * 2)
    assert set(out) == {("a", "b"), ("a", "c"), ("b", "c")}


def test_cooccurrence_max_items_caps_fanout(spark):
    # a degenerate basket holding the whole vocabulary must not produce
    # C(V,2) pairs when capped
    rows = [(1, f"w{i:02d}") for i in range(20)] + [(2, "w00"), (2, "w01")]
    df = spark.createDataFrame(rows, "basket int, item string")
    capped = cooccurrence_lift(df, "basket", "item", max_items=4)
    # basket 1 contributes C(4,2)=6 pairs, basket 2 at most 1
    assert capped.agg(F.sum("n_ab")).first()[0] <= 7
    # and the cap is deterministic: same answer twice
    a = sorted(map(tuple, capped.collect()))
    b = sorted(map(tuple, cooccurrence_lift(
        df, "basket", "item", max_items=4).collect()))
    assert a == b


# -------------------------------------------------------- weighted median

def test_weighted_median_brute_force(spark):
    import numpy as np

    rows = []
    rng = np.random.RandomState(7)
    for g in ("x", "y", "z"):
        for _ in range(50):
            rows.append((g, int(rng.randint(-100, 100)),
                         int(rng.randint(1, 10))))
    df = spark.createDataFrame(rows, "g string, v long, w long")
    got = {r.g: (r.median_value, r.total_weight)
           for r in weighted_median(df, "g", "v", "w").collect()}
    for g in ("x", "y", "z"):
        sub = sorted((v, w) for gg, v, w in rows if gg == g)
        total = sum(w for _, w in sub)
        cum = 0
        for v, w in sub:
            cum += w
            if 2 * cum >= total:
                expect = v
                break
        assert got[g] == (expect, total), g


def test_weighted_median_all_equal_weights_matches_lower_median(spark):
    df = spark.createDataFrame(
        [("g", v, 1) for v in [5, 1, 3, 2, 4]], "g string, v long, w long")
    assert weighted_median(df, "g", "v", "w").first().median_value == 3
    df2 = spark.createDataFrame(
        [("g", v, 1) for v in [4, 1, 3, 2]], "g string, v long, w long")
    # even count -> lower median
    assert weighted_median(df2, "g", "v", "w").first().median_value == 2


# ----------------------------------------------------------------- skyline

def _brute_skyline(pts):
    out = []
    for p in pts:
        dominated = any(
            q[0] >= p[0] and q[1] >= p[1] and (q[0] > p[0] or q[1] > p[1])
            for q in pts)
        if not dominated:
            out.append(p)
    return sorted(out)


@pytest.mark.parametrize("bucket_width", [1, 3, 1024])
def test_pareto_front_matches_brute_force(spark, bucket_width):
    import numpy as np

    rng = np.random.RandomState(11)
    pts = [(int(x), int(y)) for x, y in rng.randint(-20, 20, size=(200, 2))]
    pts += pts[:5]  # exact duplicates: both copies survive if frontier
    df = spark.createDataFrame(pts, "x long, y long")
    got = sorted((r.x, r.y) for r in
                 pareto_front(df, "x", "y", bucket_width=bucket_width).collect())
    assert got == _brute_skyline(pts)


def test_pareto_front_duplicates_both_kept(spark):
    df = spark.createDataFrame(
        [(10, 10), (10, 10), (5, 20), (1, 1)], "x long, y long")
    got = sorted((r.x, r.y) for r in pareto_front(df, "x", "y").collect())
    assert got == [(5, 20), (10, 10), (10, 10)]


# ------------------------------------------------------- interval overlap

def test_interval_overlap_matches_naive(spark):
    import numpy as np

    rng = np.random.RandomState(3)
    n = 60
    starts = rng.randint(0, 365, size=n)
    lens = rng.randint(0, 40, size=n)
    ivs = [(i, int(s), int(s + ln))
           for i, (s, ln) in enumerate(zip(starts, lens))]
    base = spark.createDataFrame(
        ivs, "key int, sd int, ed int"
    ).select(
        "key",
        F.expr("timestamp '2024-01-01 00:00:00' + make_interval(0,0,0,sd)")
        .alias("s"),
        F.expr("timestamp '2024-01-01 00:00:00' + make_interval(0,0,0,ed)")
        .alias("e"),
    )
    a = base.select(F.col("key").alias("ka"), F.col("s").alias("sa"),
                    F.col("e").alias("ea"))
    b = base.select(F.col("key").alias("kb"), F.col("s").alias("sb"),
                    F.col("e").alias("eb"))
    got = sorted(
        (r.ka, r.kb) for r in
        interval_overlap_join(a, b, "sa", "ea", "sb", "eb", bucket_days=20)
        .where(F.col("ka") < F.col("kb")).collect())
    expect = sorted(
        (i, j) for (i, s1, e1), (j, s2, e2)
        in combinations(ivs, 2) if s1 <= e2 and s2 <= e1)
    assert got == expect
    # attribution emits each pair exactly once (no dedup pass needed)
    assert len(got) == len(set(got))


# ------------------------------------------------------------ KMV set ops

def test_kmv_set_ops_exact_below_k(spark):
    # two sets smaller than k: every estimate is exact set algebra
    rows = [("A", i) for i in range(30)] + [("B", i) for i in range(20, 50)]
    df = spark.createDataFrame(rows, "s string, k long")
    r = kmv_set_ops(df, "s", "k", k=64).first()
    assert (r.set_a, r.set_b) == ("A", "B")
    assert r.union_k == 50 and r.est_union == 50
    assert r.shared_k == 10 and r.est_intersection == 10
    assert r.jaccard_k == 10 / 50


def test_kmv_set_ops_estimates_within_bound(spark):
    # large sets: estimates within the k-sketch's expected error band
    n = 3000
    rows = ([("A", i) for i in range(n)]
            + [("B", i) for i in range(n // 2, n + n // 2)])
    df = spark.createDataFrame(rows, "s string, k long")
    r = kmv_set_ops(df, "s", "k", k=256).first()
    true_union, true_inter = n + n // 2, n // 2
    assert abs(r.est_union - true_union) / true_union < 0.25
    assert abs(r.est_intersection - true_inter) / true_inter < 0.4
    assert abs(r.jaccard_k - true_inter / true_union) < 0.15


def test_kmv_set_ops_max_sets_caps_pair_frame(spark):
    # many-sources regime: the pair frame is quadratic in set labels —
    # max_sets keeps only the largest-estimate labels, so pairs shrink
    # from C(6,2)=15 to C(3,2)=3, and surviving pairs' values are
    # IDENTICAL to the uncapped run (the cap prunes labels, never skews
    # estimates)
    rows = [(f"S{j}", i) for j in range(6) for i in range(10 * (j + 1))]
    df = spark.createDataFrame(rows, "s string, k long")
    full = {(r.set_a, r.set_b): r for r in kmv_set_ops(df, "s", "k").collect()}
    capped = {(r.set_a, r.set_b): r
              for r in kmv_set_ops(df, "s", "k", max_sets=3).collect()}
    assert len(full) == 15 and len(capped) == 3
    # the 3 biggest sets are S3,S4,S5
    assert set(capped) == {("S3", "S4"), ("S3", "S5"), ("S4", "S5")}
    for key, r in capped.items():
        f = full[key]
        assert (r.est_union, r.est_intersection, r.jaccard_k) == \
            (f.est_union, f.est_intersection, f.jaccard_k)


# -------------------------------------------------------------- gini / MAD

def test_gini_impurity_known_distributions(spark):
    from logpipe_spark.operators.aggregate import gini_impurity

    rows = ([("uniform", c) for c in "abcd" * 5]          # 4 equal cats
            + [("pure", "x")] * 8                          # single cat
            + [("skew", "a")] * 9 + [("skew", "b")])       # 9:1
    df = spark.createDataFrame(rows, "g string, c string")
    got = {r.g: r for r in gini_impurity(df, "g", "c").collect()}
    assert got["pure"].gini == 0.0 and got["pure"].n_cats == 1
    assert got["uniform"].gini == (400 - 4 * 25) / 400     # 1 - 4*(5/20)^2
    assert got["skew"].gini == (100 - 81 - 1) / 100
    assert got["uniform"].n == 20


def test_median_mad_brute_force(spark):
    import numpy as np
    from logpipe_spark.operators.aggregate import median_mad

    rng = np.random.RandomState(5)
    rows = [(g, int(v)) for g in ("a", "b")
            for v in rng.randint(-50, 50, size=41)]
    df = spark.createDataFrame(rows, "g string, v long")
    got = {r.g: r for r in median_mad(df, "g", "v").collect()}
    for g in ("a", "b"):
        vals = sorted(v for gg, v in rows if gg == g)
        med = vals[(len(vals) - 1) // 2]  # lower median, odd n -> exact
        devs = sorted(abs(v - med) for v in vals)
        assert got[g].median_value == med
        assert got[g].mad == devs[(len(devs) - 1) // 2]
        assert got[g].n == 41


# ---------------------------------------------------------------- RRF fuse

def test_rrf_fuse_properties(spark):
    from logpipe_spark.trainprep.index import rrf_fuse

    a = spark.createDataFrame(
        [(1, 10, 1), (1, 11, 2), (1, 12, 3)], "query_id int, doc_id int, rank int")
    b = spark.createDataFrame(
        [(1, 11, 1), (1, 13, 2)], "query_id int, doc_id int, rank int")
    got = {r.doc_id: r for r in rrf_fuse([a, b], c=60).collect()}
    # doc 11 appears in both rankers, rest in one
    assert got[11].n_rankers == 2 and got[11].rrf == 1 / 62 + 1 / 61
    assert got[10].n_rankers == 1 and got[10].rrf == 1 / 61
    assert got[13].rrf == 1 / 62
    # fusion is ranker-order invariant (IEEE add is commutative)
    swapped = {r.doc_id: r.rrf for r in rrf_fuse([b, a], c=60).collect()}
    assert all(swapped[d] == got[d].rrf for d in got)
    # the doc present in both rankers outranks same-rank singles
    order = sorted(got.values(), key=lambda r: (-r.rrf, r.doc_id))
    assert order[0].doc_id == 11


def test_frequent_triples_hand_case(spark):
    from logpipe_spark.operators.assoc import frequent_triples
    out = {(r.item_a, r.item_b, r.item_c): r
           for r in frequent_triples(
               _baskets(spark), "basket", "item").collect()}
    # only basket 2 = {a,b,c} holds a triple; N=4, n_a=4 n_b=2 n_c=2
    assert set(out) == {("a", "b", "c")}
    r = out[("a", "b", "c")]
    assert (r.n_abc, r.n_a, r.n_b, r.n_c, r.n_baskets) == (1, 4, 2, 2, 4)
    assert r.support == 1 / 4
    assert r.lift3 == (1.0 * 4 * 4) / (4.0 * 2 * 2)


def test_frequent_triples_emits_each_triple_once(spark):
    from logpipe_spark.operators.assoc import frequent_triples
    rows = [(1, x) for x in "abcd"]  # C(4,3) = 4 triples, each count 1
    df = spark.createDataFrame(rows, "basket int, item string")
    got = frequent_triples(df, "basket", "item").collect()
    assert len(got) == 4 and all(r.n_abc == 1 for r in got)
    assert all(r.item_a < r.item_b < r.item_c for r in got)


def test_frequent_triples_cap_bounds_cube(spark):
    from logpipe_spark.operators.assoc import frequent_triples
    rows = [(1, f"w{i:02d}") for i in range(20)]
    df = spark.createDataFrame(rows, "basket int, item string")
    capped = frequent_triples(df, "basket", "item", max_items=5)
    assert capped.count() == 10  # C(5,3)
