"""Crafted-input semantics for the SCD2 / sweep / DQ / paths / postings /
chunk-dup operators — the cases oracle parity on generated data can't pin
down (null states, zero-length intervals, cap boundaries, tie-breaks)."""

from __future__ import annotations

import datetime as dt

import pytest
from pyspark.sql import functions as F

from logpipe_spark.operators.funnel import top_paths
from logpipe_spark.operators.profile import dq_fk_check, dq_suite, dq_table_checks
from logpipe_spark.operators.scd import scd2_intervals
from logpipe_spark.operators.sweep import interval_concurrency
from logpipe_spark.trainprep.dedup import chunk_dup_stats
from logpipe_spark.trainprep.index import build_postings


def _ts(s: str) -> dt.datetime:
    return dt.datetime.fromisoformat(s)


# ---------------------------------------------------------------------------
# scd2_intervals
# ---------------------------------------------------------------------------


def test_scd2_collapses_runs_and_flags_current(spark):
    rows = [
        # key A: a->a->b->a : 3 runs (consecutive dup collapses)
        ("A", _ts("2024-01-01T00:00:00"), "a", 1),
        ("A", _ts("2024-01-01T01:00:00"), "a", 2),
        ("A", _ts("2024-01-01T02:00:00"), "b", 3),
        ("A", _ts("2024-01-01T03:00:00"), "a", 4),
        # key B: single change -> one open interval
        ("B", _ts("2024-01-01T00:30:00"), "x", 5),
    ]
    df = spark.createDataFrame(rows, ["k", "ts", "v", "tb"])
    out = scd2_intervals(df, "k", "ts", "v", "tb").orderBy("k", "valid_from")
    got = [(r.k, r.state, r.valid_to is None, r.is_current) for r in out.collect()]
    assert got == [
        ("A", "a", False, 0),
        ("A", "b", False, 0),
        ("A", "a", True, 1),
        ("B", "x", True, 1),
    ]
    # intervals chain: each valid_to equals the next valid_from
    a = out.filter(F.col("k") == "A").collect()
    assert a[0].valid_to == a[1].valid_from and a[1].valid_to == a[2].valid_from


def test_scd2_null_state_is_a_run_and_ties_break_on_tiebreak(spark):
    rows = [
        ("A", _ts("2024-01-01T00:00:00"), None, 1),
        ("A", _ts("2024-01-01T01:00:00"), None, 2),  # null->null collapses
        ("A", _ts("2024-01-01T02:00:00"), "a", 3),
        # equal-ts changes: tiebreak orders b(4) before c(5)
        ("A", _ts("2024-01-01T03:00:00"), "b", 4),
        ("A", _ts("2024-01-01T03:00:00"), "c", 5),
    ]
    df = spark.createDataFrame(rows, "k string, ts timestamp, v string, tb int")
    out = scd2_intervals(df, "k", "ts", "v", "tb").orderBy("valid_from", "state")
    states = [r.state for r in out.collect()]
    assert states == [None, "a", "b", "c"]
    by_state = {r.state: r for r in out.collect()}
    # the equal-ts run 'b' closes at the same instant it opened (zero-length,
    # half-open) and 'c' is the live row
    assert by_state["b"].valid_to == by_state["b"].valid_from
    assert by_state["c"].is_current == 1 and by_state["c"].valid_to is None


# ---------------------------------------------------------------------------
# interval_concurrency
# ---------------------------------------------------------------------------


def _naive_concurrency(intervals):
    bounds = {}
    for s, e in intervals:
        bounds[s] = bounds.get(s, 0) + 1
        bounds[e] = bounds.get(e, 0) - 1
    out, run = {}, 0
    for t in sorted(bounds):
        run += bounds[t]
        out[t] = run
    return out


@pytest.mark.parametrize("bucket_seconds", [60, 3600, 86400])
def test_concurrency_matches_naive_sweep_at_any_bucket_width(
    spark, bucket_seconds
):
    intervals = [
        (_ts("2024-01-01T00:00:00"), _ts("2024-01-01T02:00:00")),
        (_ts("2024-01-01T01:00:00"), _ts("2024-01-01T03:00:00")),
        (_ts("2024-01-01T01:30:00"), _ts("2024-01-01T01:45:00")),
        # touching endpoints: half-open means no overlap at the boundary
        (_ts("2024-01-01T03:00:00"), _ts("2024-01-01T04:00:00")),
        (_ts("2024-01-02T10:00:00"), _ts("2024-01-02T11:00:00")),
    ]
    df = spark.createDataFrame(intervals, "t0 timestamp, t1 timestamp")
    out = interval_concurrency(df, "t0", "t1", bucket_seconds=bucket_seconds)
    got = {r.t: r.concurrent for r in out.collect()}
    assert got == _naive_concurrency(intervals)
    # the curve returns to zero after the last interval
    last = max(got)
    assert got[last] == 0


def test_concurrency_peak(spark):
    intervals = [
        (_ts("2024-01-01T00:00:00"), _ts("2024-01-01T10:00:00")),
        (_ts("2024-01-01T01:00:00"), _ts("2024-01-01T02:00:00")),
        (_ts("2024-01-01T01:30:00"), _ts("2024-01-01T02:30:00")),
    ]
    df = spark.createDataFrame(intervals, "t0 timestamp, t1 timestamp")
    out = interval_concurrency(df, "t0", "t1", bucket_seconds=3600)
    assert out.agg(F.max("concurrent")).first()[0] == 3


# ---------------------------------------------------------------------------
# dq checks
# ---------------------------------------------------------------------------


def test_dq_table_checks_counts(spark):
    df = spark.createDataFrame(
        [(1, "a", 5.0), (1, "b", -1.0), (2, None, 3.0), (3, "c", None)],
        "id int, name string, score double",
    )
    out = dq_table_checks(
        df,
        unique_cols=["id"],
        not_null_cols=["name"],
        range_checks=[("score_pos", F.col("score") > 0)],
        table="t",
    )
    got = {r.check: (r.violations, r.passed) for r in out.collect()}
    assert got["t.unique:id"] == (1, 0)       # one duplicate beyond first
    assert got["t.not_null:name"] == (1, 0)
    # NULL predicate counts as a violation (unknown != valid)
    assert got["t.range:score_pos"] == (2, 0)


def test_dq_fk_and_suite(spark):
    child = spark.createDataFrame([(1,), (2,), (9,), (None,)], "fk int")
    parent = spark.createDataFrame([(1,), (2,), (3,)], "pk int")
    fk = dq_fk_check(child, parent, "fk", "pk", table="c")
    r = fk.first()
    assert r.check == "c.fk:fk" and r.violations == 2 and r.passed == 0  # 9 + NULL
    ok = dq_table_checks(parent, unique_cols=["pk"], table="p")
    report = dq_suite([ok, fk])
    assert report.count() == 2
    assert {x.passed for x in report.collect()} == {0, 1}


# ---------------------------------------------------------------------------
# top_paths
# ---------------------------------------------------------------------------


def test_top_paths_order_truncation_and_ranking(spark):
    rows = [
        # user 1: 6 events, equal-ts pair ordered by tiebreak; path cut at 5
        (1, _ts("2024-01-01T00:00:00"), "a", 1),
        (1, _ts("2024-01-01T00:01:00"), "b", 2),
        (1, _ts("2024-01-01T00:02:00"), "c", 3),
        (1, _ts("2024-01-01T00:02:00"), "d", 4),   # same ts as c: c before d
        (1, _ts("2024-01-01T00:03:00"), "e", 5),
        (1, _ts("2024-01-01T00:04:00"), "f", 6),   # truncated away
        # users 2 and 3 share a path -> count 2 ranks first
        (2, _ts("2024-01-01T00:00:00"), "x", 7),
        (3, _ts("2024-01-01T00:00:00"), "x", 8),
    ]
    ev = spark.createDataFrame(rows, "user_id int, ts timestamp, event_type string, event_id int")
    out = top_paths(ev, n_events=5, k=10).orderBy("rank").collect()
    assert [(r.path, r.n_users, r.rank) for r in out] == [
        ("x", 2, 1),
        ("a>b>c>d>e", 1, 2),
    ]


# ---------------------------------------------------------------------------
# build_postings
# ---------------------------------------------------------------------------


def test_build_postings_cap_and_exact_df(spark):
    docs = spark.createDataFrame(
        [(i, "common " + ("rare" if i == 11 else "filler")) for i in range(12)],
        "doc_id long, text string",
    )
    out = {r.word: r for r in build_postings(docs, max_postings=10).collect()}
    # df stays EXACT beyond the cap; postings list is capped at 10
    assert out["common"].df == 12
    assert out["common"].postings == ",".join(str(i) for i in range(10))
    assert out["rare"].df == 1 and out["rare"].postings == "11"
    # numeric order, not lexicographic: doc 2 before doc 10
    assert out["filler"].postings.split(",")[:3] == ["0", "1", "2"]


def test_build_postings_counts_document_frequency_not_term_frequency(spark):
    docs = spark.createDataFrame([(1, "dup dup dup"), (2, "dup")],
                                 "doc_id long, text string")
    out = {r.word: r for r in build_postings(docs).collect()}
    assert out["dup"].df == 2 and out["dup"].postings == "1,2"


# ---------------------------------------------------------------------------
# chunk_dup_stats
# ---------------------------------------------------------------------------


def test_chunk_dup_stats_cross_doc_only(spark):
    shared = " ".join(f"s{i}" for i in range(8))     # one full shared chunk
    uniq_a = " ".join(f"a{i}" for i in range(8))
    uniq_b = " ".join(f"b{i}" for i in range(8))
    docs = spark.createDataFrame(
        [
            (1, shared + " " + uniq_a),              # 2 chunks, 1 shared
            (2, shared + " " + uniq_b),              # 2 chunks, 1 shared
            (3, uniq_a.replace("a", "z")),           # 1 chunk, unshared
        ],
        "doc_id long, text string",
    )
    out = {r.doc_id: r for r in chunk_dup_stats(docs, chunk_words=8).collect()}
    assert (out[1].n_chunks, out[1].n_dup_chunks) == (2, 1)
    assert out[1].dup_frac == 0.5
    assert (out[3].n_chunks, out[3].n_dup_chunks) == (1, 0)


def test_chunk_dup_stats_intra_doc_repeat_is_not_cross_dup(spark):
    block = " ".join(f"w{i}" for i in range(8))
    docs = spark.createDataFrame(
        [(1, block + " " + block), (2, "x0 x1 x2")],
        "doc_id long, text string",
    )
    out = {r.doc_id: r for r in chunk_dup_stats(docs, chunk_words=8).collect()}
    # the repeat lives in ONE doc: distinct-doc frequency is 1, so it is
    # repetition_score's signal, not cross-corpus duplication
    assert out[1].n_dup_chunks == 0
    # short doc: single tail chunk
    assert out[2].n_chunks == 1


# ---------------------------------------------------------------------------
# snapshot_diff / period_over_period
# ---------------------------------------------------------------------------


def test_snapshot_diff_classes_and_nullsafe_values(spark):
    from logpipe_spark.operators.diff import snapshot_diff

    old = spark.createDataFrame(
        [(1, "a", 10.0), (2, "b", None), (3, "c", 3.0), (4, None, 4.0)],
        "k long, s string, v double",
    )
    new = spark.createDataFrame(
        [(2, "b", None), (3, "c", 30.0), (4, "x", 4.0), (5, "e", 5.0)],
        "k long, s string, v double",
    )
    out = {r.k: r for r in snapshot_diff(old, new, ["k"]).collect()}
    assert out[1].change_type == "removed"
    assert out[5].change_type == "added" and out[5].new_s == "e"
    # NULL == NULL under eqNullSafe: row 2 is unchanged, so absent
    assert 2 not in out
    assert out[3].change_type == "changed" and out[3].new_v == 30.0
    # NULL -> value IS a change
    assert out[4].change_type == "changed"


def test_snapshot_diff_include_unchanged_and_compare_subset(spark):
    from logpipe_spark.operators.diff import snapshot_diff

    old = spark.createDataFrame([(1, "a", 1.0)], "k long, s string, v double")
    new = spark.createDataFrame([(1, "a", 9.0)], "k long, s string, v double")
    # compare only s: the v change is invisible -> unchanged
    full = snapshot_diff(old, new, ["k"], ["s"], include_unchanged=True).collect()
    assert len(full) == 1 and full[0].change_type == "unchanged"
    assert snapshot_diff(old, new, ["k"], ["s"]).count() == 0


def test_period_over_period_first_and_gap_periods(spark):
    from logpipe_spark.operators.aggregate import period_over_period

    rows = [
        ("a", _ts("2024-01-01T00:00:00")),  # week of Jan 1 (Mon)
        ("a", _ts("2024-01-02T00:00:00")),
        ("a", _ts("2024-01-08T00:00:00")),  # next week
        ("a", _ts("2024-01-22T00:00:00")),  # gap week skipped entirely
        ("b", _ts("2024-01-08T00:00:00")),
    ]
    df = spark.createDataFrame(rows, "g string, ts timestamp")
    out = period_over_period(df, "ts", ["g"], "week").collect()
    a = sorted([r for r in out if r.g == "a"], key=lambda r: r.period)
    assert [r.n for r in a] == [2, 1, 1]
    assert a[0].prev_n is None and a[0].pct_change is None
    assert a[1].delta == -1 and a[1].pct_change == -0.5
    # lag is over OBSERVED periods: the gap week's prev is week of Jan 8
    assert a[2].prev_n == 1 and a[2].delta == 0
    b = [r for r in out if r.g == "b"]
    assert len(b) == 1 and b[0].prev_n is None
