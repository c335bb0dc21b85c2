"""Tests for per-partition metrics accumulators and the table-format shim."""

from __future__ import annotations

from pyspark.sql import functions as F

from logpipe_spark.metrics import (collect_metrics, skew_report,
                                   with_partition_metrics)
from logpipe_spark.sinks import iceberg_available, read_table, write_table
from logpipe_spark.synth import synth_transcripts


def test_partition_metrics_row_counts(spark):
    t = synth_transcripts(spark, n_turns=3000, n_convs=30, partitions=6)
    inst, acc = with_partition_metrics(spark, t)
    assert inst.count() == 3000
    m = collect_metrics(acc)
    assert sum(x.rows for x in m) == 3000
    assert len(m) == 6
    assert all(x.wall_s >= 0 for x in m)
    rep = skew_report(m)
    assert rep["rows_total"] == 3000 and rep["partitions"] == 6


def test_partition_metrics_detect_skew(spark):
    t = synth_transcripts(spark, n_turns=4000, n_convs=40,
                          hot_conv_fraction=0.5, partitions=8)
    # shuffle by conv_id: the hot conversation concentrates in one partition
    shuffled = t.repartition(8, "conv_id")
    inst, acc = with_partition_metrics(spark, shuffled)
    inst.write.format("noop").mode("overwrite").save()
    m = collect_metrics(acc)
    rep = skew_report(m)
    assert rep["rows_total"] == 4000
    assert rep["rows_max"] >= 2000  # hot conv visible in the row imbalance


def test_write_table_parquet_fallback(spark, tmp_path):
    assert not iceberg_available(spark)  # sandbox has no Iceberg runtime
    t = synth_transcripts(spark, n_turns=500, n_convs=10)
    p = str(tmp_path / "tbl")
    out = write_table(spark, t, "transcripts", p, mode="overwrite")
    assert out == p
    back = read_table(spark, "transcripts", p)
    assert back.count() == 500
    # append mode appends
    write_table(spark, t.limit(100), "transcripts", p, mode="append")
    assert read_table(spark, "transcripts", p).count() == 600


def test_checkpoint_with_compute_metrics(spark, tmp_path):
    from pyspark.sql import functions as F

    from logpipe_spark.plans.checkpoint import Stage, read_manifest, run_stages

    t = synth_transcripts(spark, n_turns=1000, n_convs=20, partitions=4)
    stages = [Stage("ident", lambda s, df: df)]
    base = str(tmp_path / "ck")
    run_stages(spark, stages, base, source=t, compute_metrics=True)
    m = read_manifest(base, "ident")
    assert m["rows"] == 1000
    assert sum(p["rows"] for p in m["compute_partitions"]) == 1000
    assert m["skew"]["rows_total"] == 1000
