"""HTTP batch sender (K1, ``src/senders/httpSender.js:10-319``) on Spark.

Executor-side delivery via ``foreachPartition``: each partition serializes
its rows to JSON-array batches of ``batch_size`` (reference default 100,
httpSender.js:31) and POST/PUTs them with at most ``retries`` TOTAL
attempts (the reference's `while attempt < this.retries`,
httpSender.js:178-186) and exponential backoff
``retry_delay · 2^(attempt-1)`` between attempts (httpSender.js:209-211).
A batch that exhausts its retries raises — failing the task and, after
Spark's own task retries, the job (≙ the reference aborting the pipeline,
httpSender.js:216-231). Delivery stats (records/batches/retries) accumulate
driver-side.

Semantics at scale: this is at-least-once (a task retry resends its
partition's batches — same as the reference rerunning a file). The
exactly-once path is the table sink (`sinks.py`); use HTTP for fire-and-
forget fan-out to collectors, idempotent receivers, or test harnesses.

``max_in_flight > 1`` pipelines batches per partition through a bounded
thread pool (the Spark analog of the reference's event-loop request
pipelining — Node keeps sends in flight while streaming,
httpSender.js:100-127): with a receiver latency of L seconds per request,
a partition's wall time drops from ``n_batches·L`` to
``~n_batches·L / max_in_flight``. Ordering across a partition's batches is
no longer guaranteed at the receiver (same trade the reference makes);
failures still propagate — the partition drains its in-flight window and
the task fails if any batch exhausted its retries.
"""

from __future__ import annotations

import json
import time
import urllib.error
import urllib.request

from pyspark import AccumulatorParam
from pyspark.sql import DataFrame


class _StatsParam(AccumulatorParam):
    def zero(self, value):
        return {"records_sent": 0, "batches_sent": 0, "retries": 0}

    def addInPlace(self, a, b):
        for k in a:
            a[k] += b.get(k, 0)
        return a


def send_http(
    df: DataFrame,
    endpoint: str,
    method: str = "POST",
    batch_size: int = 100,
    retries: int = 3,
    retry_delay: float = 1.0,
    timeout: float = 30.0,
    headers: dict[str, str] | None = None,
    stats_interval_s: float | None = None,
    stats_printer=None,
    max_in_flight: int = 1,
) -> dict[str, int]:
    """Send every row of ``df`` to ``endpoint`` in JSON-array batches.

    Returns the aggregated delivery stats. ``stats_interval_s`` turns on
    the reference's PERIODIC stats log (httpSender.js:299-318, 60 s
    interval): a driver-side daemon thread snapshots the accumulator while
    the send job runs (accumulators fold in as tasks finish — the Spark
    analog of the reference's per-batch counter), printing through
    ``stats_printer`` and returning the series under ``"snapshots"``.
    """
    method = method.upper()
    if method not in ("POST", "PUT"):
        raise ValueError(f"Unsupported HTTP method: {method}")  # :40-42
    hdrs = {"Content-Type": "application/json", **(headers or {})}
    sc = df.sparkSession.sparkContext
    acc = sc.accumulator(
        {"records_sent": 0, "batches_sent": 0, "retries": 0}, _StatsParam())
    json_rows = df.toJSON()  # one JSON object string per row

    def send_batch(batch: list[str]) -> int:
        body = ("[" + ",".join(batch) + "]").encode("utf-8")
        last_err: Exception | None = None
        for attempt in range(1, retries + 1):  # `retries` TOTAL attempts
            try:
                req = urllib.request.Request(
                    endpoint, data=body, headers=hdrs, method=method)
                # urlopen raises HTTPError for every non-2xx status, so a
                # returned response IS a success
                with urllib.request.urlopen(req, timeout=timeout):
                    return attempt - 1  # retries performed
            except urllib.error.HTTPError as ex:  # non-2xx
                last_err = ex
            except Exception as ex:  # timeout / connection error
                last_err = ex
            if attempt < retries:
                time.sleep(retry_delay * (2 ** (attempt - 1)))  # :209-211
        raise RuntimeError(
            f"HTTP send failed after {retries} attempts: {last_err}")

    def handle_partition(rows) -> None:
        stats = {"records_sent": 0, "batches_sent": 0, "retries": 0}
        if max_in_flight <= 1:
            batch: list[str] = []
            for row in rows:
                batch.append(row)
                if len(batch) >= batch_size:
                    stats["retries"] += send_batch(batch)
                    stats["batches_sent"] += 1
                    stats["records_sent"] += len(batch)
                    batch = []
            if batch:  # final partial batch (≙ _final flush, :129-145)
                stats["retries"] += send_batch(batch)
                stats["batches_sent"] += 1
                stats["records_sent"] += len(batch)
            acc.add(stats)
            return

        # Pipelined path: keep up to max_in_flight batches in flight; the
        # submit loop blocks on the OLDEST future once the window is full,
        # so memory stays bounded at max_in_flight batches. result() also
        # re-raises a batch's terminal failure, failing the task promptly
        # instead of after the whole partition is queued.
        from collections import deque
        from concurrent.futures import ThreadPoolExecutor

        pending: deque = deque()  # (future, n_rows)

        def reap(fut, n_rows: int) -> None:
            stats["retries"] += fut.result()
            stats["batches_sent"] += 1
            stats["records_sent"] += n_rows

        try:
            with ThreadPoolExecutor(max_workers=max_in_flight) as pool:
                batch = []
                for row in rows:
                    batch.append(row)
                    if len(batch) >= batch_size:
                        if len(pending) >= max_in_flight:
                            reap(*pending.popleft())
                        pending.append((pool.submit(send_batch, batch),
                                        len(batch)))
                        batch = []
                if batch:
                    pending.append((pool.submit(send_batch, batch),
                                    len(batch)))
                while pending:
                    reap(*pending.popleft())
        finally:
            # best-effort only: on task FAILURE the PySpark worker exits
            # after writing the exception, before flushing accumulator
            # updates — partial counts from failed tasks are discarded
            # by Spark (stats reflect successful tasks; a failed send
            # job reports the retries' totals, not the aborted
            # attempt's)
            acc.add(stats)

    if stats_interval_s is None:
        json_rows.foreachPartition(handle_partition)
        return dict(acc.value)

    import threading

    snapshots: list[dict] = []
    stop = threading.Event()
    t0 = time.perf_counter()

    def poll() -> None:
        while not stop.wait(stats_interval_s):
            snap = dict(acc.value)
            snap["t_s"] = round(time.perf_counter() - t0, 1)
            snapshots.append(snap)
            if stats_printer is not None:
                stats_printer(
                    f"[http {snap['t_s']}s] {snap['records_sent']} records "
                    f"in {snap['batches_sent']} batches "
                    f"({snap['retries']} retries)")

    poller = threading.Thread(target=poll, daemon=True)
    poller.start()
    try:
        json_rows.foreachPartition(handle_partition)
    finally:
        stop.set()
        poller.join(timeout=max(stats_interval_s * 2, 1.0))
    out = dict(acc.value)
    out["snapshots"] = snapshots
    return out
