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


def test_progress_reporter_captures_running_stages(spark):
    """During-run progress (≙ progressTracker.js 5s bytes/s): the poller
    snapshots active stages' task counts while a slow job runs."""
    import time as _time

    from logpipe_spark.plans.progress import ProgressReporter

    t = synth_transcripts(spark, n_turns=400, n_convs=10, partitions=8)

    def make_slow(delay_s):
        def slow(it):
            for pdf in it:
                _time.sleep(delay_s)
                yield pdf
        return slow

    # Co-tenant load can starve the poller thread so a short job slips
    # between ticks entirely; retry with a longer job rather than weaken
    # the assertions.
    lines = []
    flat = []
    for delay_s in (0.3, 1.0, 3.0, 8.0):
        with ProgressReporter(spark, interval_s=0.05,
                              printer=lines.append) as pr:
            t.mapInPandas(make_slow(delay_s), schema=t.schema) \
                .write.format("noop").mode("overwrite").save()
        flat = [s for smp in pr.samples() for s in smp["stages"]]
        if any(s["tasks_active"] > 0 or s["tasks_done"] > 0 for s in flat):
            break
    assert len(pr.samples()) >= 1
    assert all(s["tasks_total"] >= 1 for s in flat)
    # a tick can land between task waves; across the run some tick must
    # have seen work in flight or done
    assert any(s["tasks_active"] > 0 or s["tasks_done"] > 0 for s in flat)
    summ = pr.summary()
    assert summ["n_samples"] == len(pr.samples()) and summ["stages"]
    assert lines and "stage" in lines[0]
    # CPU/mem snapshot (≙ profiler.js 145-171): the JVM burned CPU and
    # holds a real heap while the job ran
    assert summ["proc"]["cpu_user_s"] + summ["proc"]["cpu_sys_s"] > 0
    assert summ["proc"]["rss_peak_mb"] > 50


def test_run_stages_manifest_carries_progress(spark, tmp_path):
    from logpipe_spark.plans.checkpoint import Stage, read_manifest, run_stages

    t = synth_transcripts(spark, n_turns=2000, n_convs=20, partitions=8)
    stages = [Stage("ident", lambda s, df: df)]
    run_stages(spark, stages, str(tmp_path / "ck"), source=t,
               progress_interval_s=0.02)
    m = read_manifest(str(tmp_path / "ck"), "ident")
    assert m["status"] == "committed"
    assert "progress" in m and m["progress"]["summary"]["n_samples"] >= 0
    # samples are JSON-clean (already round-tripped through the manifest)
    assert isinstance(m["progress"]["samples"], list)
    # manifest carries the CPU/mem rollup (verdict item 10)
    proc = m["progress"]["summary"]["proc"]
    assert proc["rss_peak_mb"] > 0 and proc["cpu_user_s"] >= 0


def test_observe_malformed_counter(spark, tmp_path):
    """Read-side malformed counter (≙ the reference's capped warn log):
    the Observation rides the consuming action, no extra job."""
    import json

    from logpipe_spark.schemas import TRANSCRIPT_SCHEMA
    from logpipe_spark.sources import observe_malformed, read_ndjson

    f = tmp_path / "in.ndjson"
    lines = [json.dumps({"conv_id": f"c{i}", "turn_idx": i, "role": "user",
                         "text": "hi", "tool": "none",
                         "ts": "2026-01-01T00:00:00"}) for i in range(8)]
    lines += ["{broken", "not json", "42"]
    f.write_text("\n".join(lines) + "\n")
    df, obs = observe_malformed(read_ndjson(spark, str(f), TRANSCRIPT_SCHEMA))
    n = df.count()                       # the action the metrics ride on
    got = obs.get
    assert n == 11
    assert got == {"rows_read": 11, "rows_malformed": 3}


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
