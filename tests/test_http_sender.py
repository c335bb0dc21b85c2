"""HTTP batch sender tests against a local harness server (≙ the
reference's ``src/test/testServer.js``: validates JSON arrays, persists
batches, plus programmable failure for the retry path)."""

from __future__ import annotations

import json
import threading
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

import pytest

from logpipe_spark.operators.http_sender import send_http
from logpipe_spark.synth import synth_transcripts


class Harness:
    """Local test server: records every valid JSON-array batch; can be told
    to fail the first N requests with a 503 (retry/backoff exercise)."""

    def __init__(self):
        self.batches: list[list[dict]] = []
        self.fail_first = 0
        self.requests = 0
        self.delay_s = 0.0  # per-request latency (pipelining exercise)
        self.lock = threading.Lock()
        harness = self

        class Handler(BaseHTTPRequestHandler):
            def _handle(self):
                with harness.lock:
                    harness.requests += 1
                    fail = harness.requests <= harness.fail_first
                if harness.delay_s:
                    import time
                    time.sleep(harness.delay_s)
                if fail:
                    self.send_response(503)
                    self.end_headers()
                    return
                length = int(self.headers["Content-Length"])
                payload = json.loads(self.rfile.read(length))
                assert isinstance(payload, list)  # testServer.js:44-49
                with harness.lock:
                    harness.batches.append(payload)
                self.send_response(200)
                self.end_headers()
                self.wfile.write(b"{}")

            do_POST = _handle
            do_PUT = _handle

            def log_message(self, *a):  # quiet
                pass

        self.server = ThreadingHTTPServer(("127.0.0.1", 0), Handler)
        self.url = f"http://127.0.0.1:{self.server.server_port}/logs"
        self.thread = threading.Thread(target=self.server.serve_forever,
                                       daemon=True)
        self.thread.start()

    def stop(self):
        self.server.shutdown()


@pytest.fixture()
def harness():
    h = Harness()
    yield h
    h.stop()


def test_http_batching_and_counts(spark, harness):
    df = synth_transcripts(spark, n_turns=250, n_convs=10, partitions=2)
    stats = send_http(df.select("conv_id", "turn_idx", "role"),
                      harness.url, batch_size=100)
    assert stats["records_sent"] == 250
    sent = [r for b in harness.batches for r in b]
    assert len(sent) == 250
    assert {tuple(sorted(r)) for r in sent} == {("conv_id", "role", "turn_idx")}
    # per-partition batching: no batch exceeds batch_size; partial finals ok
    assert max(len(b) for b in harness.batches) <= 100
    assert stats["batches_sent"] == len(harness.batches)


def test_http_periodic_stats(spark, harness):
    """Periodic stats emission during the send (≙ httpSender.js:299-318's
    60s interval log): snapshots accumulate as tasks complete and the
    final return still carries exact totals."""
    df = synth_transcripts(spark, n_turns=400, n_convs=10, partitions=8)
    lines = []
    stats = send_http(df.select("conv_id", "turn_idx"), harness.url,
                      batch_size=10, stats_interval_s=0.05,
                      stats_printer=lines.append)
    assert stats["records_sent"] == 400
    assert isinstance(stats["snapshots"], list)
    if stats["snapshots"]:                # fast sends may finish in 1 tick
        last = stats["snapshots"][-1]
        assert last["records_sent"] <= 400 and last["t_s"] >= 0
        assert lines and "records" in lines[0]


def test_http_retry_with_backoff(spark, harness):
    harness.fail_first = 2  # first two requests 503 → retried
    df = synth_transcripts(spark, n_turns=50, n_convs=5, partitions=1)
    stats = send_http(df.select("conv_id", "turn_idx"), harness.url,
                      batch_size=1000, retries=3, retry_delay=0.05)
    assert stats["records_sent"] == 50
    assert stats["retries"] == 2
    assert len(harness.batches) == 1


def test_http_permanent_failure_aborts(spark, harness):
    harness.fail_first = 10**9
    df = synth_transcripts(spark, n_turns=10, n_convs=2, partitions=1)
    with pytest.raises(Exception, match="(?i)http|failed"):
        send_http(df.select("conv_id"), harness.url,
                  retries=1, retry_delay=0.01)


def test_http_pipelined_counts_and_overlap(spark, harness):
    """max_in_flight>1 keeps batches in flight concurrently: with 0.2 s
    receiver latency and 8 batches in ONE partition, the serial floor is
    1.6 s; a 4-deep pipeline must beat it."""
    import time

    harness.delay_s = 0.2
    df = synth_transcripts(spark, n_turns=80, n_convs=4, partitions=1)
    sel = df.select("conv_id", "turn_idx").coalesce(1)
    sel.count()  # warm the plan so timing measures the send, not codegen
    t0 = time.perf_counter()
    stats = send_http(sel, harness.url, batch_size=10, max_in_flight=4)
    wall = time.perf_counter() - t0
    assert stats["records_sent"] == 80 and stats["batches_sent"] == 8
    assert sum(len(b) for b in harness.batches) == 80
    assert wall < 1.4, f"pipelined send took {wall:.2f}s (serial floor 1.6s)"


def test_http_pipelined_retry_and_failure(spark, harness):
    harness.fail_first = 2
    df = synth_transcripts(spark, n_turns=60, n_convs=3, partitions=2)
    stats = send_http(df.select("conv_id"), harness.url, batch_size=10,
                      retry_delay=0.01, max_in_flight=3)
    assert stats["records_sent"] == 60
    assert stats["retries"] >= 2
    assert sum(len(b) for b in harness.batches) == 60
    # terminal failure still aborts the job through the pipelined path
    harness.fail_first = 10**9
    with pytest.raises(Exception, match="(?i)http|failed"):
        send_http(df.select("conv_id"), harness.url, retries=1,
                  retry_delay=0.01, max_in_flight=3)


def test_http_rejects_bad_method(spark):
    df = synth_transcripts(spark, n_turns=1, n_convs=1)
    with pytest.raises(ValueError, match="Unsupported HTTP method"):
        send_http(df, "http://127.0.0.1:1/x", method="DELETE")


def test_cli_http_sink(spark, harness, tmp_path):
    """CLI --http-endpoint path: records arrive at the harness server."""
    import json as _json
    import subprocess
    import sys as _sys

    src = tmp_path / "in.ndjson"
    rows = [{"conv_id": f"c{i}", "turn_idx": 0, "role": "user",
             "text": "GET /x -> 200: ok", "tool": "none",
             "ts": "2026-01-01T00:00:00Z"} for i in range(7)]
    src.write_text("\n".join(_json.dumps(r) for r in rows) + "\n")
    r = subprocess.run(
        [_sys.executable, "-m", "logpipe_spark.cli", "-i", str(src),
         "--select", "conv_id,role", "--http-endpoint", harness.url,
         "--http-batch-size", "3", "--parallel", "2",
         "--http-max-in-flight", "2"],
        capture_output=True, text=True, timeout=300, cwd="/root/repo")
    assert r.returncode == 0, r.stderr[-2000:]
    assert "sent 7 records" in r.stdout
    assert sum(len(b) for b in harness.batches) == 7
