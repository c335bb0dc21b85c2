"""Keyed parquet upsert: MERGE semantics, bucket-pruned rewrites."""

from __future__ import annotations

import pathlib

import pytest
from pyspark.sql import functions as F

from logpipe_spark.plans.merge import merge_upsert, write_keyed


def _mk(spark, rows):
    return spark.createDataFrame(rows, "k bigint, v string")


def test_merge_upsert_replaces_and_inserts(spark, tmp_path):
    path = str(tmp_path / "tbl")
    base = _mk(spark, [(i, f"old{i}") for i in range(500)])
    write_keyed(base, path, "k", n_buckets=16)

    updates = _mk(
        spark,
        [(i, f"new{i}") for i in range(0, 50)]          # updates
        + [(i, f"ins{i}") for i in range(500, 520)],    # inserts
    )
    res = merge_upsert(spark, path, updates, "k", n_buckets=16)
    assert res["n_upserts"] == 70

    final = spark.read.parquet(path)
    assert final.count() == 520                          # no dup keys
    assert final.select("k").distinct().count() == 520
    got = {r.k: r.v for r in final.collect()}
    for i in range(50):
        assert got[i] == f"new{i}"
    for i in range(50, 500):
        assert got[i] == f"old{i}"
    for i in range(500, 520):
        assert got[i] == f"ins{i}"


def test_merge_upsert_rewrites_only_touched_buckets(spark, tmp_path):
    path = str(tmp_path / "tbl2")
    base = _mk(spark, [(i, f"old{i}") for i in range(500)])
    write_keyed(base, path, "k", n_buckets=16)

    def dir_files(p):
        return {
            d.name: sorted(f.name for f in d.glob("*.parquet"))
            for d in pathlib.Path(p).glob("_bucket=*")
        }

    before = dir_files(path)
    one_key = _mk(spark, [(3, "patched")])
    res = merge_upsert(spark, path, one_key, "k", n_buckets=16)
    after = dir_files(path)

    touched = {f"_bucket={b}" for b in res["touched_buckets"]}
    assert len(touched) == 1
    for d, files in after.items():
        if d in touched:
            assert files != before[d]                   # rewritten
        else:
            assert files == before[d]                   # untouched dirs keep
                                                        # their exact files
    got = {r.k: r.v for r in spark.read.parquet(path).collect()}
    assert got[3] == "patched" and got[4] == "old4"
    assert len(got) == 500


def test_merge_upsert_rejects_duplicate_and_null_keys(spark, tmp_path):
    import pytest
    from pyspark.sql import functions as F

    from logpipe_spark.plans.merge import merge_upsert, write_keyed

    path = str(tmp_path / "t")
    base = spark.createDataFrame([(i, "v%d" % i) for i in range(8)],
                                 "k long, v string")
    write_keyed(base, path, "k", n_buckets=4)

    dup = spark.createDataFrame([(3, "a"), (3, "b")], "k long, v string")
    with pytest.raises(ValueError, match="duplicate"):
        merge_upsert(spark, path, dup, "k", n_buckets=4)

    nulls = spark.createDataFrame([(None, "x")], "k long, v string")
    with pytest.raises(ValueError, match="NULL"):
        merge_upsert(spark, path, nulls, "k", n_buckets=4)
    # table untouched by the rejected batches
    assert spark.read.parquet(path).count() == 8


def test_compact_preserves_bucketed_layout_for_upsert(spark, tmp_path):
    """The reviewer's reproduction: compact a bucketed table, then upsert —
    every row must stay visible (flat compaction used to demote _bucket to
    a data column that partition discovery then ignored: 20 -> 6 rows)."""
    from pyspark.sql import functions as F

    from logpipe_spark.plans.layout import compact_small_files
    from logpipe_spark.plans.merge import merge_upsert, write_keyed

    path = str(tmp_path / "t")
    base = spark.createDataFrame([(i, "v%d" % i) for i in range(20)],
                                 "k long, v string")
    write_keyed(base, path, "k", n_buckets=4)
    stats = compact_small_files(spark, path, target_bytes=1 << 30)
    assert stats["partitions_compacted"] == 4
    assert spark.read.parquet(path).count() == 20

    up = spark.createDataFrame([(3, "NEW"), (100, "ins")], "k long, v string")
    merge_upsert(spark, path, up, "k", n_buckets=4)
    got = spark.read.parquet(path)
    assert got.count() == 21
    assert got.where(F.col("k") == 3).collect()[0].v == "NEW"


# --------------------------------------------------------- versioned CDC

def _mk_dim(spark, rows):
    return spark.createDataFrame(rows, "id long, val string, score long")


def test_cdc_snapshot_time_travel(spark, tmp_path):
    """Copy-on-write upsert: v0 stays readable byte-for-byte after two
    upserts; latest snapshot reflects both."""
    from logpipe_spark.plans.cdc import (read_snapshot, upsert_versioned,
                                         write_versioned)

    p = str(tmp_path / "dim")
    v0_rows = [(i, f"v{i}", i * 10) for i in range(20)]
    assert write_versioned(spark, _mk_dim(spark, v0_rows), p, "id",
                           n_buckets=4) == 0
    r1 = upsert_versioned(spark, p, _mk_dim(
        spark, [(3, "v3b", 999), (20, "new", 1)]), "id")
    assert r1["version"] == 1 and r1["n_upserts"] == 2
    r2 = upsert_versioned(spark, p, _mk_dim(spark, [(3, "v3c", 0)]), "id")
    assert r2["version"] == 2

    got_v0 = {(r.id, r.val, r.score)
              for r in read_snapshot(spark, p, 0).collect()}
    assert got_v0 == set(v0_rows)
    latest = {r.id: (r.val, r.score)
              for r in read_snapshot(spark, p).collect()}
    assert latest[3] == ("v3c", 0) and latest[20] == ("new", 1)
    assert len(latest) == 21


def test_cdc_read_changes_equals_full_diff(spark, tmp_path):
    """The bucket-pruned changelog == snapshot_diff of the two COMPLETE
    snapshots (the soundness contract for manifest pruning)."""
    from logpipe_spark.operators.diff import snapshot_diff
    from logpipe_spark.plans.cdc import (read_changes, read_snapshot,
                                         upsert_versioned, write_versioned)

    p = str(tmp_path / "dim")
    write_versioned(
        spark, _mk_dim(spark, [(i, f"v{i}", i) for i in range(50)]),
        p, "id", n_buckets=8)
    upsert_versioned(spark, p, _mk_dim(
        spark, [(7, "x", 1), (8, "v8", 8), (99, "new", 0)]), "id")

    cols = ["id", "val", "score"]
    full = snapshot_diff(
        read_snapshot(spark, p, 0).select(*cols),
        read_snapshot(spark, p, 1).select(*cols), ["id"])
    pruned = read_changes(spark, p, 0, 1)
    assert sorted(map(tuple, pruned.collect())) == \
        sorted(map(tuple, full.collect()))
    # the no-op row (8 -> identical values) must NOT appear as changed
    kinds = {r.id: r.change_type for r in pruned.collect()}
    assert kinds.get(7) == "changed" and kinds.get(99) == "added"
    assert 8 not in kinds


def test_cdc_changes_feed_scd2(spark, tmp_path):
    """Changelog rows append into scd2_intervals: the dimension-history
    maintenance loop the module docstring promises."""
    from logpipe_spark.operators.scd import scd2_intervals
    from logpipe_spark.plans.cdc import (read_changes, upsert_versioned,
                                         write_versioned)

    p = str(tmp_path / "dim")
    write_versioned(spark, _mk_dim(spark, [(1, "a", 0), (2, "b", 0)]),
                    p, "id", n_buckets=2)
    upsert_versioned(spark, p, _mk_dim(spark, [(1, "a2", 0)]), "id")
    upsert_versioned(spark, p, _mk_dim(spark, [(1, "a3", 0)]), "id")

    hist = []
    for v in (1, 2):
        ch = read_changes(spark, p, v - 1, v)
        hist.append(ch.select("id", F.lit(v).alias("v"),
                              F.col("new_val").alias("val")))
    base = _mk_dim(spark, [(1, "a", 0), (2, "b", 0)]).select(
        "id", F.lit(0).alias("v"), "val")
    events = base.unionByName(hist[0]).unionByName(hist[1])
    iv = scd2_intervals(events, "id", "v", "val", "v")
    runs = {(r.id, r.state): (r.valid_from, r.is_current)
            for r in iv.collect()}
    assert runs[(1, "a")] == (0, 0)
    assert runs[(1, "a2")] == (1, 0)
    assert runs[(1, "a3")] == (2, 1)
    assert runs[(2, "b")] == (0, 1)


def test_cdc_expire_snapshots(spark, tmp_path):
    """Expire keeps the newest snapshots readable and frees unreferenced
    version dirs; a second expire after another upsert keeps working
    (version numbering has gaps in the manifest dir afterwards)."""
    import os

    from logpipe_spark.plans.cdc import (expire_snapshots, read_snapshot,
                                         upsert_versioned, write_versioned)

    p = str(tmp_path / "dim")
    write_versioned(spark, _mk_dim(spark, [(i, f"v{i}", i) for i in range(8)]),
                    p, "id", n_buckets=2)
    for step in range(3):
        upsert_versioned(spark, p, _mk_dim(spark, [(0, f"s{step}", step)]),
                         "id")
    r = expire_snapshots(p, keep_last=2)
    assert r["kept_versions"] == [2, 3]
    assert r["deleted_manifests"] == 2 and r["deleted_dirs"] >= 1
    # kept snapshots still read correctly
    assert {x.id: x.val for x in read_snapshot(spark, p, 3).collect()}[0] \
        == "s2"
    assert {x.id: x.val for x in read_snapshot(spark, p, 2).collect()}[0] \
        == "s1"
    # a further upsert + expire handles the gapped manifest dir
    upsert_versioned(spark, p, _mk_dim(spark, [(1, "z", 9)]), "id")
    r2 = expire_snapshots(p, keep_last=1)
    assert r2["kept_versions"] == [4]
    assert {x.id: x.val for x in read_snapshot(spark, p).collect()}[1] == "z"
    assert not os.path.exists(os.path.join(p, "_manifests", "v2.json"))


def test_cdc_schema_evolution_add_column(spark, tmp_path):
    """An upsert batch may ADD a nullable column (Iceberg's core schema
    promise): untouched buckets keep their old files; read_snapshot and
    read_changes null-fill across the boundary, and the pruned changelog
    still equals the full-outer diff of the complete aligned snapshots."""
    from logpipe_spark.operators.diff import snapshot_diff
    from logpipe_spark.plans.cdc import (read_changes, read_snapshot,
                                         upsert_versioned, write_versioned)

    p = str(tmp_path / "dim")
    write_versioned(
        spark, _mk_dim(spark, [(i, f"v{i}", i) for i in range(40)]),
        p, "id", n_buckets=8)
    # v1 adds a 'tier' column; id=5 also changes val, id=6 is identical
    # in old columns but gains a non-null tier -> 'changed'
    up = spark.createDataFrame(
        [(5, "x", 5, "gold"), (6, "v6", 6, "silver"), (99, "new", 0, None)],
        "id long, val string, score long, tier string")
    r = upsert_versioned(spark, p, up, "id")
    assert r["version"] == 1

    latest = read_snapshot(spark, p, 1)
    assert "tier" in latest.columns
    rows = {x.id: (x.val, x.tier) for x in latest.collect()}
    assert rows[5] == ("x", "gold") and rows[6] == ("v6", "silver")
    assert rows[7] == ("v7", None)          # untouched bucket null-fills
    assert len(rows) == 41
    # v0 time-travel still reads with its ORIGINAL schema
    assert "tier" not in read_snapshot(spark, p, 0).columns

    cols = ["id", "val", "score", "tier"]
    full = snapshot_diff(
        read_snapshot(spark, p, 0)
        .withColumn("tier", F.lit(None).cast("string")).select(*cols),
        read_snapshot(spark, p, 1).select(*cols), ["id"])
    pruned = read_changes(spark, p, 0, 1)
    assert sorted(map(tuple, pruned.collect())) == \
        sorted(map(tuple, full.collect()))
    kinds = {x.id: x.change_type for x in pruned.collect()}
    assert kinds[5] == "changed" and kinds[6] == "changed" \
        and kinds[99] == "added"

    # a later upsert WITHOUT the new column keeps it (null-filled rows)
    r2 = upsert_versioned(spark, p, _mk_dim(spark, [(5, "y", 50)]), "id")
    v2 = {x.id: (x.val, x.tier)
          for x in read_snapshot(spark, p, r2["version"]).collect()}
    assert v2[5] == ("y", None) and v2[6] == ("v6", "silver")

    # changing an existing column's TYPE is rejected
    bad = spark.createDataFrame([(1, 2.5)], "id long, score double")
    with pytest.raises(ValueError, match="type change"):
        upsert_versioned(spark, p, bad, "id")


def test_cdc_concurrent_commit_cas(spark, tmp_path):
    """Two writers racing to the same version: the second commit fails
    with ConcurrentWriteError instead of silently overwriting the first
    winner's manifest (os.link CAS); the table still reads as the
    winner's snapshot, and a retry against the refreshed version wins."""
    from logpipe_spark.plans import cdc
    from logpipe_spark.plans.cdc import (ConcurrentWriteError,
                                         read_snapshot, upsert_versioned,
                                         write_versioned)

    p = str(tmp_path / "dim")
    write_versioned(spark, _mk_dim(spark, [(i, f"v{i}", i) for i in range(8)]),
                    p, "id", n_buckets=2)
    # writer A commits v1 normally
    upsert_versioned(spark, p, _mk_dim(spark, [(0, "A", 1)]), "id")
    # writer B staged against v0 and now tries to commit v1 as well
    m = cdc._read_manifest(p, 1)
    with pytest.raises(ConcurrentWriteError):
        cdc._write_manifest(p, {**m, "touched": [], "version": 1})
    assert {x.id: x.val for x in read_snapshot(spark, p, 1).collect()}[0] \
        == "A"
    # B retries against the refreshed current version and succeeds
    r = upsert_versioned(spark, p, _mk_dim(spark, [(0, "B", 2)]), "id")
    assert r["version"] == 2
    assert {x.id: x.val for x in read_snapshot(spark, p).collect()}[0] == "B"
