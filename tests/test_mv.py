"""Incremental MV maintenance (plans/mv.py): delta application over a
CDC changelog must equal a full rebuild of the new snapshot, including
the NULL group, group movement, and group disappearance."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from logpipe_spark.operators.diff import snapshot_diff
from logpipe_spark.plans.mv import mv_apply_changes, mv_build


def _rows(spark, rows):
    return spark.createDataFrame(rows, "id long, grp string, val long")


def _key(t):
    return tuple((x is None, x) for x in t)


def _refresh_equals_rebuild(old, new):
    ch = snapshot_diff(old, new, ["id"])
    mv = mv_build(old, ["grp"], "val")
    got = mv_apply_changes(mv, ch, ["grp"], "val")
    want = mv_build(new, ["grp"], "val")
    return (sorted(map(tuple, got.collect()), key=_key)
            == sorted(map(tuple, want.collect()), key=_key))


def test_mv_refresh_equals_rebuild(spark):
    old = _rows(spark, [(1, "a", 10), (2, "a", 20), (3, "b", 5),
                        (4, None, 7), (5, "c", 1)])
    new = _rows(spark, [
        (1, "a", 10),       # unchanged
        (2, "b", 20),       # group moved a -> b
        (3, "b", 50),       # value changed in place
        (4, None, 9),       # NULL group value change (null-safe join)
        # 5 removed -> group c disappears entirely (cnt hits 0)
        (6, "d", 3),        # brand-new group from the delta side
        (7, None, 1),       # NULL group gains a row
    ])
    assert _refresh_equals_rebuild(old, new)
    # group 'c' is gone, not present with cnt 0
    ch = snapshot_diff(old, new, ["id"])
    got = mv_apply_changes(mv_build(old, ["grp"], "val"), ch,
                           ["grp"], "val")
    assert got.where(F.col("grp") == "c").count() == 0


def test_mv_sequential_batches(spark):
    """Applying two changelogs in sequence == rebuilding from the final
    snapshot (the hourly-refresh loop)."""
    s0 = _rows(spark, [(i, "g" + str(i % 3), i * 10) for i in range(30)])
    s1 = _rows(spark, [(i, "g" + str(i % 3), i * 10 + (5 if i % 4 == 0
                                                       else 0))
                       for i in range(2, 32)])
    s2 = _rows(spark, [(i, "g" + str(i % 5), i * 10)
                       for i in range(2, 40)])
    mv = mv_build(s0, ["grp"], "val")
    mv = mv_apply_changes(mv, snapshot_diff(s0, s1, ["id"]),
                          ["grp"], "val").localCheckpoint(eager=True)
    mv = mv_apply_changes(mv, snapshot_diff(s1, s2, ["id"]),
                          ["grp"], "val")
    want = mv_build(s2, ["grp"], "val")
    assert (sorted(map(tuple, mv.collect()), key=_key)
            == sorted(map(tuple, want.collect()), key=_key))


def test_mv_rejects_non_compare_column(spark):
    old = _rows(spark, [(1, "a", 1)])
    new = _rows(spark, [(1, "a", 2)])
    ch = snapshot_diff(old, new, ["id"])
    with pytest.raises(ValueError, match="compare columns"):
        mv_apply_changes(mv_build(old, ["id"], "val"), ch, ["id"], "val")
