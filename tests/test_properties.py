"""Property-based tests (hypothesis) for engine invariants that must hold
for ANY input, not just the synthetic corpora."""

from __future__ import annotations

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from logpipe_spark.operators.router import route_single_pass, standard_rules
from logpipe_spark.transcripts import ROLES, TOOLS

TEXT = st.text(
    alphabet=st.characters(codec="utf-8",
                           exclude_categories=("Cs",)),
    max_size=60)
ROW = st.tuples(
    st.sampled_from(["c1", "c2", "c3"]),
    st.one_of(st.none(), st.sampled_from(ROLES), st.just("alien")),
    TEXT,
    st.one_of(st.none(), st.sampled_from(TOOLS), st.just("widget")),
)

_SETTINGS = dict(max_examples=8, deadline=None,
                 suppress_health_check=[HealthCheck.too_slow])


@given(rows=st.lists(ROW, min_size=1, max_size=25))
@settings(**_SETTINGS)
def test_router_conservation(spark, rows):
    """Conservation law: every clean row lands in ≥1 sink, rows with a
    known tool land in exactly one tool_* sink, no row is ever lost."""
    # turn_idx = list index so every generated row is a unique key
    df = spark.createDataFrame(
        [(c, i, r, x, tl, None) for i, (c, r, x, tl) in enumerate(rows)],
        "conv_id string, turn_idx int, role string, text string, "
        "tool string, error_kind string")
    exploded = route_single_pass(df, standard_rules(list(TOOLS), list(ROLES)))
    per_row = (
        exploded.groupBy("conv_id", "turn_idx", "text")
        .agg(F.count(F.lit(1)).alias("n_sinks"),
             F.sum(F.when(F.col("sink").startswith("tool_"), 1)
                   .otherwise(0)).alias("n_tool"),
             F.sum(F.when(F.col("sink") == "overflow", 1)
                   .otherwise(0)).alias("n_overflow"))
        .collect())
    src_keys = {(c, i, x) for i, (c, _, x, _) in enumerate(rows)}
    assert {(r.conv_id, r.turn_idx, r.text) for r in per_row} == src_keys
    for r in per_row:
        assert r.n_sinks >= 1
        assert r.n_tool <= 1  # tool rules are mutually exclusive
        if r.n_overflow:
            assert r.n_sinks == r.n_overflow  # overflow rows match nothing else


@given(texts=st.lists(TEXT.filter(lambda s: s.strip()), min_size=1,
                      max_size=15, unique=True))
@settings(**_SETTINGS)
def test_quality_score_bounds_and_determinism(spark, texts):
    from logpipe_spark.trainprep.textqual import quality_score

    docs = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string")
    out = quality_score(docs).collect()
    assert len(out) == len(texts)
    for r in out:
        assert 0.0 <= r.quality <= 1.0
        assert r.n_tokens >= 1
    again = quality_score(docs).collect()
    assert sorted(map(tuple, out)) == sorted(map(tuple, again))


@given(texts=st.lists(st.text(alphabet="ab cd", min_size=0, max_size=30),
                      min_size=2, max_size=10))
@settings(**_SETTINGS)
def test_jaccard_symmetric_bounded(spark, texts):
    from logpipe_spark.trainprep.dedup import ngram_jaccard_pairs

    docs = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string")
    pairs = ngram_jaccard_pairs(docs, k=2, threshold=0.0).collect()
    for r in pairs:
        assert 0.0 < r.jaccard <= 1.0
        assert r.doc_a < r.doc_b  # canonical orientation, no mirror dupes
    seen = {(r.doc_a, r.doc_b) for r in pairs}
    assert len(seen) == len(pairs)


def test_salted_agg_equals_plain_on_adversarial_keys(spark):
    """All rows one key + empty-string keys + unicode keys."""
    from logpipe_spark.operators.skew import salted_count_by

    rows = ([("k", i) for i in range(500)]
            + [("", i) for i in range(50)]
            + [("émoji🙂", i) for i in range(3)])
    df = spark.createDataFrame(rows, "key string, v int")
    plain = {r.key: r["count"] for r in
             df.groupBy("key").agg(F.count(F.lit(1)).alias("count")).collect()}
    salted = {r.key: r["count"] for r in
              salted_count_by(df, "key", F.col("v"), buckets=7).collect()}
    assert plain == salted


ASOF_TS = st.integers(min_value=0, max_value=20)
ASOF_LEFT = st.lists(
    st.tuples(st.sampled_from(["u1", "u2"]), ASOF_TS), min_size=1, max_size=12)
ASOF_RIGHT = st.lists(
    st.tuples(st.sampled_from(["u1", "u2"]), ASOF_TS), min_size=0, max_size=12)


@given(left=ASOF_LEFT, right=ASOF_RIGHT)
@settings(**_SETTINGS)
def test_asof_join_matches_pandas_merge_asof(spark, left, right):
    """For ANY key/ts multiset (duplicate timestamps, empty right side,
    single-key pileups) the union+window as-of join agrees with pandas
    merge_asof(direction='backward', allow_exact_matches=True) on the
    matched timestamp."""
    import pandas as pd

    from logpipe_spark.operators.asof import asof_join

    ldf = spark.createDataFrame(
        [(k, i, float(t)) for i, (k, t) in enumerate(left)],
        "k string, lid int, ts double")
    rdf = spark.createDataFrame(
        [(k, float(t)) for (k, t) in right] or [("__none__", -1.0)],
        "k string, ts double")
    got = (
        asof_join(ldf, rdf, on=["k"], ts="ts", right_cols=[])
        .select("lid", "asof_ts").toPandas()
        .sort_values("lid").reset_index(drop=True)
    )
    lp = pd.DataFrame({"k": [k for k, _ in left],
                       "lid": range(len(left)),
                       "ts": [float(t) for _, t in left]}).sort_values("ts", kind="stable")
    rp = pd.DataFrame({"k": [k for k, _ in right] or ["__none__"],
                       "ts": [float(t) for _, t in right] or [-1.0]}).sort_values("ts", kind="stable")
    want = (
        pd.merge_asof(lp, rp, on="ts", by="k", direction="backward",
                      allow_exact_matches=True, suffixes=("", "_r"))
        .sort_values("lid").reset_index(drop=True)
    )
    # merge_asof keeps the left ts and exposes no matched-right-ts column
    # directly; with right_cols=[] our asof_ts IS the matched right ts, so
    # recompute it: the greatest right ts <= left ts per key.
    def expected_match(k, t):
        c = [rt for rk, rt in zip(rp["k"], rp["ts"]) if rk == k and rt <= t]
        return max(c) if c else None

    exp = [expected_match(k, float(t)) for k, t in left]
    got_vals = [None if pd.isna(v) else float(v) for v in got["asof_ts"]]
    assert got_vals == exp
    assert len(got) == len(want)


IV = st.tuples(st.integers(0, 30), st.integers(-2, 10))  # (start_day, len_days; negative => empty)
PT = st.integers(0, 40)


@given(ivs=st.lists(IV, min_size=1, max_size=8), pts=st.lists(PT, min_size=1, max_size=15))
@settings(**_SETTINGS)
def test_interval_join_matches_python_containment(spark, ivs, pts):
    """Bucketed interval join == brute-force containment for ANY interval
    set: zero-length, negative (start>end), duplicates, multi-bucket
    spans."""
    import datetime as dt

    from pyspark.sql import functions as F

    from logpipe_spark.operators.rangejoin import interval_join

    base = dt.datetime(2024, 1, 1)
    iv_rows = [
        (i, base + dt.timedelta(days=s), base + dt.timedelta(days=s + l))
        for i, (s, l) in enumerate(ivs)
    ]
    pt_rows = [(j, base + dt.timedelta(days=p)) for j, p in enumerate(pts)]
    iv_df = spark.createDataFrame(iv_rows, "iv_id int, start_ts timestamp, end_ts timestamp")
    pt_df = spark.createDataFrame(pt_rows, "pt_id int, p_ts timestamp")
    got = {
        (r.iv_id, r.pt_id)
        for r in interval_join(iv_df, pt_df, "start_ts", "end_ts", "p_ts",
                               bucket_days=2).collect()
    }
    want = {
        (i, j)
        for i, s, e in iv_rows
        for j, p in pt_rows
        if s <= p <= e
    }
    assert got == want


@given(vals=st.lists(st.integers(-50, 50), min_size=1, max_size=40),
       p=st.sampled_from([0.1, 0.5, 0.9, 0.99]))
@settings(**_SETTINGS)
def test_percentiles_disc_property(spark, vals, p):
    """percentile_disc(p) is the sorted element at rank ceil(p*n) for ANY
    multiset (duplicates, negatives, singletons)."""
    import math

    from logpipe_spark.operators.aggregate import percentiles_disc

    df = spark.createDataFrame(
        [("g", float(v), i) for i, v in enumerate(vals)],
        "k string, v double, i int")
    got = percentiles_disc(df, "k", "v", (p,), tiebreak="i").collect()[0]
    tag = f"p{int(round(p * 100))}"
    want = sorted(vals)[math.ceil(p * len(vals)) - 1]
    assert got["n"] == len(vals)
    assert got[tag] == float(want)


@given(vals=st.lists(st.integers(-40, 40), min_size=1, max_size=30),
       cuts=st.lists(st.integers(0, 29), max_size=5),
       target=st.integers(-5, 5))
@settings(**_SETTINGS)
def test_cusum_monoid_merge_equals_scan_any_segmentation(spark, vals, cuts,
                                                         target):
    """For ANY value stream and ANY epoch segmentation, the segment-monoid
    fold (cusum_partials + cusum_merge) must equal the global scan
    (cusum_scan) AND a plain Python reference fold — the associativity
    property the batch-11 merge==scan proof rests on."""
    from logpipe_spark.operators.drift import (cusum_merge, cusum_partials,
                                               cusum_scan)

    # epoch id = number of cut points at or before the row index:
    # monotone in row order, arbitrary segment sizes (empty cuts = 1 epoch)
    bounds = sorted(cuts)
    epochs = [sum(1 for b in bounds if b <= i) for i in range(len(vals))]
    rows = [("k", i, e, v) for i, (e, v) in enumerate(zip(epochs, vals))]
    df = spark.createDataFrame(rows, "k string, i int, e int, x int")

    # Python reference: prefix sums of deviations, expanding min, max gap
    s = m = big_m = g = 0
    run = 0
    for v in vals:
        run += v - target
        m = min(m, run)
        big_m = max(big_m, run)
        g = max(g, run - m)
    want = (len(vals), run - min(0, m), max(big_m, g))

    scan = cusum_scan(df, "k", F.col("x"), ["i"], target=target,
                      threshold=10**9).collect()[0]
    assert (scan.n, scan.final_cusum, scan.max_cusum) == want

    merged = cusum_merge(
        cusum_partials(df, "k", F.col("e"), F.col("x"), ["i"],
                       target=target),
        "k", threshold=10**9).collect()[0]
    assert (merged.n, merged.final_cusum, merged.max_cusum) == want


@given(rows=st.lists(
    st.tuples(st.one_of(st.none(), st.sampled_from(["s1", "s2", "s3"])),
              st.integers(0, 9)),
    min_size=1, max_size=25))
@settings(**_SETTINGS)
def test_quantile_normalize_invariants(spark, rows):
    """For ANY input (including NULL groups): every row survives, ranks
    are a 1..n_group bijection within each group, and every normalized
    value is an element of the pooled value multiset."""
    from logpipe_spark.trainprep.curate import quantile_normalize

    df = spark.createDataFrame(
        [(i, g, v) for i, (g, v) in enumerate(rows)],
        "id long, src string, v long")
    out = quantile_normalize(df, "src", "v", "id").collect()
    assert len(out) == len(rows)                     # row-preserving
    by_grp: dict = {}
    for r in out:
        by_grp.setdefault(r.src, []).append(r)
    pooled = sorted(v for _, v in rows)
    for g, rs in by_grp.items():
        n = len(rs)
        assert sorted(r.rank_in_group for r in rs) == list(range(1, n + 1))
        assert all(r.n_group == n for r in rs)
        assert all(r.norm_value in pooled for r in rs)
        # monotone: higher in-group rank never maps to a smaller pooled value
        srt = sorted(rs, key=lambda r: r.rank_in_group)
        assert all(a.norm_value <= b.norm_value
                   for a, b in zip(srt, srt[1:]))


# ----------------------------------------------- ntile closed form (pure)

@given(st.integers(1, 400), st.integers(1, 12))
def test_ntile_closed_form_matches_definition(n, k):
    """The closed form rfm_scores/segment.py evaluates in Spark SQL:
    with q = n div k, r = n mod k, the first r tiles hold q+1 rows.
    Cross-checked here against the constructive definition for every
    rank; the Spark-vs-DuckDB agreement is the driver gate's job."""
    q, r = divmod(n, k)

    def closed(x: int) -> int:
        big = r * (q + 1)
        if x <= big:
            return (x + q) // (q + 1)
        return r + (x - big + q - 1) // max(q, 1)

    # constructive: lay out tile sizes, assign ranks in order
    sizes = [q + 1] * r + [q] * (k - r)
    want = []
    for tile, sz in enumerate(sizes, start=1):
        want.extend([tile] * sz)
    assert [closed(x) for x in range(1, n + 1)] == want


@given(xs=st.lists(st.integers(min_value=0, max_value=1000),
                   min_size=1, max_size=40),
       period=st.sampled_from([2, 3, 7]))
@settings(**_SETTINGS)
def test_holt_winters_replays_python_fold(spark, xs, period):
    """holt_winters == a pure-Python float replay of the same fold for
    ANY integer series and period — the struct+array fold must never
    deviate from its specification (the same replay the DuckDB
    recursive-CTE oracle performs)."""
    from logpipe_spark.operators.aggregate import holt_winters

    a, b, g = 0.3, 0.1, 0.2
    vs = [float(x) for x in xs]
    l, tr, s = vs[0], 0.0, [0.0] * period
    for i in range(1, len(vs)):
        slot = i % period
        sp = s[slot]
        nl = a * (vs[i] - sp) + (1.0 - a) * (l + tr)
        tr = b * (nl - l) + (1.0 - b) * tr
        s[slot] = g * (vs[i] - nl) + (1.0 - g) * sp
        l = nl
    want = (l, tr, l + tr + s[len(vs) % period])

    df = spark.createDataFrame(
        [("k", t, v) for t, v in enumerate(xs)],
        "g string, t long, v long")
    row = holt_winters(df, "g", F.col("v"), ["t"],
                       alpha=a, beta=b, gamma=g, period=period).collect()[0]
    assert (row.level, row.trend, row.forecast) == want


@given(ds=st.lists(st.integers(min_value=-50, max_value=50),
                   min_size=1, max_size=30))
@settings(**_SETTINGS)
def test_wilcoxon_matches_python_ranks(spark, ds):
    """wilcoxon_signed == a pure-Python tie-averaged signed-rank
    computation for ANY integer diffs (zeros dropped, doubled ranks)."""
    from logpipe_spark.operators.drift import wilcoxon_signed

    dd = [d for d in ds if d != 0]
    df = spark.createDataFrame(
        [("k", d) for d in ds], "g string, d long")
    out = wilcoxon_signed(df, "g", F.col("d")).collect()
    if not dd:
        assert out == []
        return
    srt = sorted(abs(d) for d in dd)
    # doubled tie-averaged rank per |d| value
    r2 = {}
    i = 0
    while i < len(srt):
        j = i
        while j < len(srt) and srt[j] == srt[i]:
            j += 1
        r2[srt[i]] = (i + 1) + j  # 2 * avg of ranks i+1..j
        i = j
    w2p = float(sum(r2[abs(d)] for d in dd if d > 0))
    n = len(dd)
    tt = 0
    for v in set(abs(d) for d in dd):
        t = sum(1 for d in dd if abs(d) == v)
        tt += t ** 3 - t
    row = out[0]
    assert row.n_pairs == n and row.w2_plus == w2p
    var2 = (n * (n + 1.0) * (2.0 * n + 1.0) / 6.0 - tt / 12.0)
    if var2 > 0:
        assert abs(row.z - (w2p - n * (n + 1.0) / 2.0)
                   / var2 ** 0.5) < 1e-9
    else:
        assert row.z is None


@given(vals=st.lists(
    st.floats(allow_nan=False, allow_infinity=False, width=32),
    min_size=10, max_size=24, unique=True))
@settings(**_SETTINGS)
def test_edf_fold_guard_property(spark, vals):
    # ANY raw-double support wider than max_support must fail loudly
    # (r04 verdict item 2); at max_support == support it must succeed.
    from logpipe_spark.operators.drift import hellinger_from_counts

    per_v = spark.createDataFrame(
        [("k", float(v), 1, 1) for v in vals],
        "g string, v double, ca long, cb long")
    with pytest.raises(Exception, match="max_support"):
        hellinger_from_counts(
            per_v, "g", max_support=len(vals) - 1).collect()
    ok = hellinger_from_counts(
        per_v, "g", max_support=len(vals)).collect()
    assert len(ok) == 1 and ok[0].hellinger == 0.0
