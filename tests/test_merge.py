"""Keyed parquet upsert: MERGE semantics, bucket-pruned rewrites."""

from __future__ import annotations

import pathlib

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
