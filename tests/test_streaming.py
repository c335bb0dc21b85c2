"""Structured Streaming tests: windowed counts equal batch equivalents,
stateful sessionization, and foreachBatch fan-out parity."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from logpipe_spark.streaming import (conversation_sessions, run_stream_once,
                                     stream_route_fanout, stream_transcripts,
                                     windowed_turn_counts)
from logpipe_spark.synth import synth_transcripts


@pytest.fixture(scope="module")
def stream_dir(spark, tmp_path_factory):
    d = str(tmp_path_factory.mktemp("stream_src"))
    synth_transcripts(spark, n_turns=3000, n_convs=60,
                      error_every=25).write.mode("overwrite").parquet(d)
    return d


def test_windowed_counts_match_batch(spark, stream_dir, tmp_path):
    stream = stream_transcripts(spark, stream_dir)
    agg = windowed_turn_counts(stream, window="10 minutes",
                               watermark="5 minutes")
    # update mode ≙ the reference's periodic partial flush (A1): every
    # trigger emits the current partial; the final update per key is the
    # exact total, so max() over the flushes reconstructs the batch answer.
    q = (agg.writeStream.format("memory").queryName("win_counts")
         .outputMode("update").option(
             "checkpointLocation", str(tmp_path / "ck"))
         .trigger(availableNow=True).start())
    q.awaitTermination(120)

    got = spark.sql(
        "SELECT window_start, tool, max(turn_count) AS turn_count "
        "FROM win_counts GROUP BY window_start, tool").toPandas()
    batch = spark.read.parquet(stream_dir)
    want = (
        batch.groupBy(F.window("ts", "10 minutes").alias("win"), "tool")
        .agg(F.count(F.lit(1)).alias("turn_count"))
        .select(F.col("win.start").alias("window_start"), "tool", "turn_count")
        .toPandas()
    )
    got_map = {(r.window_start, r.tool): r.turn_count for r in got.itertuples()}
    want_map = {(r.window_start, r.tool): r.turn_count for r in want.itertuples()}
    assert got_map == want_map


def test_conversation_sessions_stateful(spark, stream_dir, tmp_path):
    stream = stream_transcripts(spark, stream_dir)
    sessions = conversation_sessions(stream)
    q = (sessions.writeStream.format("memory").queryName("sessions")
         .outputMode("append")
         .option("checkpointLocation", str(tmp_path / "ck2"))
         .trigger(processingTime="1 second").start())
    import time
    # wait for input drain + idle timeout to fire emissions
    deadline = time.time() + 90
    batch = spark.read.parquet(stream_dir)
    want_n = batch.select("conv_id").distinct().count()
    while time.time() < deadline:
        if spark.sql("SELECT * FROM sessions").count() >= want_n:
            break
        time.sleep(2)
    q.stop()
    got = spark.sql(
        "SELECT conv_id, n_turns, first_ts, last_ts FROM sessions").toPandas()
    assert len(got) == want_n
    want = (batch.groupBy("conv_id")
            .agg(F.count(F.lit(1)).alias("n_turns"),
                 F.min("ts").alias("first_ts"), F.max("ts").alias("last_ts"))
            .toPandas())
    g = got.sort_values("conv_id").reset_index(drop=True)
    w = want.sort_values("conv_id").reset_index(drop=True)
    assert (g.n_turns.values == w.n_turns.values).all()
    assert (g.first_ts.values == w.first_ts.values).all()
    assert (g.last_ts.values == w.last_ts.values).all()


def test_stream_fanout_matches_batch_router(spark, stream_dir, tmp_path):
    stream = stream_transcripts(spark, stream_dir, max_files_per_trigger=2)
    base = str(tmp_path / "sinks")
    writer = stream_route_fanout(spark, stream, base,
                                 str(tmp_path / "ck3"))
    run_stream_once(writer)

    from logpipe_spark.plans.pipeline import run_pipeline
    batch_out = run_pipeline(spark, spark.read.parquet(stream_dir))
    written = spark.read.parquet(base)
    for sink in ["tool_bash", "role_user", "error"]:
        got = written.filter(F.col("sink") == sink)
        want = batch_out[f"sink_{sink}"]
        assert got.count() == want.count(), sink
        gk = sorted(map(tuple, got.select("conv_id", "turn_idx").collect()))
        wk = sorted(map(tuple, want.select("conv_id", "turn_idx").collect()))
        assert gk == wk, sink


def test_stream_resume_from_checkpoint_no_duplicates(spark, tmp_path):
    """Kill/restart semantics: a second availableNow run over the SAME
    checkpoint processes only files added since the first run — routed
    output equals one batch pass over everything, no duplicates."""
    src = str(tmp_path / "src")
    base = str(tmp_path / "sinks")
    ck = str(tmp_path / "ck")

    first = synth_transcripts(spark, n_turns=1000, n_convs=20, error_every=25)
    first.write.mode("overwrite").parquet(src)
    writer = stream_route_fanout(spark, stream_transcripts(spark, src),
                                 base, ck)
    run_stream_once(writer)
    n_after_first = spark.read.parquet(base).count()

    # more data arrives; resume from the same checkpoint
    second = synth_transcripts(spark, n_turns=3000, n_convs=20,
                               error_every=25).filter("turn_idx >= 50")
    second.write.mode("append").parquet(src)
    writer2 = stream_route_fanout(spark, stream_transcripts(spark, src),
                                  base, ck)
    run_stream_once(writer2)

    got = spark.read.parquet(base)
    from logpipe_spark.operators.router import route_single_pass, standard_rules
    from logpipe_spark.plans.pipeline import (PipelineConfig, enrich_stage,
                                              parse_stage)
    from logpipe_spark.transcripts import ROLES, TOOLS

    cfg = PipelineConfig()
    want = route_single_pass(
        enrich_stage(spark, parse_stage(spark.read.parquet(src), cfg), cfg),
        standard_rules(list(TOOLS), list(ROLES)))
    assert got.count() == want.count() > n_after_first
    gk = sorted(map(tuple, got.select("sink", "conv_id", "turn_idx").collect()))
    wk = sorted(map(tuple, want.select("sink", "conv_id", "turn_idx").collect()))
    assert gk == wk


def test_stream_dedup_exact(spark, tmp_path):
    from logpipe_spark.streaming.stream import stream_dedup_exact

    src = str(tmp_path / "dupsrc")
    base = synth_transcripts(spark, n_turns=500, n_convs=10)
    base.write.mode("overwrite").parquet(src)
    base.limit(200).write.mode("append").parquet(src)  # duplicate turns

    deduped = stream_dedup_exact(stream_transcripts(spark, src))
    q = (deduped.writeStream.format("memory").queryName("dedup_out")
         .outputMode("append")
         .option("checkpointLocation", str(tmp_path / "ck"))
         .trigger(availableNow=True).start())
    q.awaitTermination(120)
    out = spark.sql("SELECT conv_id, turn_idx FROM dedup_out")
    assert out.count() == 500
    assert out.distinct().count() == 500
