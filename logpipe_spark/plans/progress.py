"""During-run progress instrumentation (closes VERDICT round-1 missing #1).

Replaces the reference's progressTracker — bytes/s logged every 5 s
(``src/utils/progressTracker.js:49-64``) — and its profiler snapshots
(``src/utils/profiler.js:145-226``) with a Spark-native poller: a daemon
thread samples ``SparkStatusTracker`` every ``interval_s`` while actions
run, recording each active stage's task progress (active / completed /
failed / total). Everything is public PySpark API; a Python SparkListener
would need the py4j callback server (off by default and flaky under
spark-submit), and at cluster scale the production route is a JVM listener
via ``spark.extraListeners`` + a metrics sink — this poller is the
dependency-free in-process analog, cheap enough to leave on for benches
(one py4j round-trip per active stage per tick, no executor work).

``plans.checkpoint.run_stages(progress_interval_s=...)`` threads it through
stage execution and lands the samples in the lineage manifest, so a bench
run's manifest carries during-run progress next to the post-hoc
rows/sec — the reference's two instrumentation surfaces in one record.
"""

from __future__ import annotations

import threading
import time
from typing import Callable

from pyspark.sql import SparkSession


class ProgressReporter:
    """Poll SparkStatusTracker on a daemon thread; collect task-progress
    snapshots while the wrapped block runs actions.

    Usage::

        with ProgressReporter(spark, interval_s=5.0) as pr:
            df.write.parquet(...)
        manifest["progress_samples"] = pr.samples()
    """

    def __init__(self, spark: SparkSession, interval_s: float = 5.0,
                 printer: Callable[[str], None] | None = None,
                 max_samples: int = 10_000):
        self._tracker = spark.sparkContext.statusTracker()
        self._interval = interval_s
        self._printer = printer
        self._max = max_samples
        self._stop = threading.Event()
        self._thread: threading.Thread | None = None
        self._t0 = 0.0
        self._samples: list[dict] = []

    def _poll(self) -> None:
        while not self._stop.wait(self._interval):
            stages = []
            try:
                for sid in self._tracker.getActiveStageIds():
                    info = self._tracker.getStageInfo(sid)
                    if info is None:
                        continue
                    stages.append({
                        "stage_id": sid,
                        "tasks_total": info.numTasks,
                        "tasks_active": info.numActiveTasks,
                        "tasks_done": info.numCompletedTasks,
                        "tasks_failed": info.numFailedTasks,
                    })
            except Exception:
                # A transient py4j/gateway hiccup must not kill the poller
                # thread — skip the tick and keep sampling.
                continue
            if not stages:
                continue
            sample = {"t_s": round(time.perf_counter() - self._t0, 3),
                      "stages": stages}
            if len(self._samples) < self._max:
                self._samples.append(sample)
            if self._printer:
                parts = ", ".join(
                    f"stage {s['stage_id']}: {s['tasks_done']}/"
                    f"{s['tasks_total']}" for s in stages)
                self._printer(f"[{sample['t_s']:8.1f}s] {parts}")

    def __enter__(self) -> "ProgressReporter":
        # re-enterable: clear the stop flag and stale samples from a
        # previous use (a set flag would make the poller exit instantly
        # and the second job would appear to have had no activity)
        self._stop.clear()
        self._samples = []
        self._t0 = time.perf_counter()
        self._thread = threading.Thread(target=self._poll, daemon=True)
        self._thread.start()
        return self

    def __exit__(self, *exc) -> None:
        self._stop.set()
        if self._thread is not None:
            self._thread.join(timeout=max(self._interval * 2, 1.0))

    def samples(self) -> list[dict]:
        return list(self._samples)

    def summary(self) -> dict:
        """Per-stage rollup: last observed task counts + observation span."""
        stages: dict[int, dict] = {}
        for sample in self._samples:
            for s in sample["stages"]:
                stages[s["stage_id"]] = {
                    "tasks_total": s["tasks_total"],
                    "tasks_done": s["tasks_done"],
                    "last_seen_s": sample["t_s"],
                }
        return {"n_samples": len(self._samples),
                "stages": {str(k): v for k, v in sorted(stages.items())}}
