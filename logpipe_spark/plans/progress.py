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

import os
import resource
import threading
import time
from typing import Callable

from pyspark.sql import SparkSession

_CLK_TCK = os.sysconf("SC_CLK_TCK")
_PAGE_MB = resource.getpagesize() / (1024 * 1024)


def _jvm_pid(spark: SparkSession) -> int | None:
    """PID of the py4j-launched JVM (local mode: driver AND executors live
    there, so that's the process whose CPU/RSS reflects the actual work —
    sampling the Python driver would show an idle process). None when the
    gateway was attached to an external JVM (spark-submit)."""
    try:
        proc = spark.sparkContext._gateway.proc  # Popen when we launched it
        return proc.pid if proc is not None else None
    except Exception:
        return None


def _proc_sample(pid: int | None) -> dict | None:
    """One /proc CPU+RSS snapshot (cumulative utime/stime seconds, RSS MB).
    The profiler.js analog (``src/utils/profiler.js:145-171``):
    process.cpuUsage()/memoryUsage() sampled alongside throughput."""
    if pid is None:
        return None
    try:
        with open(f"/proc/{pid}/stat") as f:
            # field 2 (comm) may contain spaces — split after the ')'
            rest = f.read().rsplit(")", 1)[1].split()
        # rest[0] is field 3 (state); utime/stime are fields 14/15
        utime, stime = int(rest[11]), int(rest[12])
        rss_pages = int(rest[21])
        return {
            "cpu_user_s": round(utime / _CLK_TCK, 2),
            "cpu_sys_s": round(stime / _CLK_TCK, 2),
            "rss_mb": round(rss_pages * _PAGE_MB, 1),
        }
    except Exception:
        return None


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
        self._pid = _jvm_pid(spark)
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
            proc = _proc_sample(self._pid)
            if proc is not None:
                sample["proc"] = proc
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
        self._proc0 = _proc_sample(self._pid)
        self._thread = threading.Thread(target=self._poll, daemon=True)
        self._thread.start()
        return self

    def __exit__(self, *exc) -> None:
        self._stop.set()
        if self._thread is not None:
            self._thread.join(timeout=max(self._interval * 2, 1.0))
        self._proc1 = _proc_sample(self._pid)

    def samples(self) -> list[dict]:
        return list(self._samples)

    def summary(self) -> dict:
        """Per-stage rollup: last observed task counts + observation span,
        plus the JVM's CPU seconds and peak observed RSS over the block
        (enter→exit /proc deltas, so short blocks between poll ticks still
        get a reading)."""
        stages: dict[int, dict] = {}
        for sample in self._samples:
            for s in sample["stages"]:
                stages[s["stage_id"]] = {
                    "tasks_total": s["tasks_total"],
                    "tasks_done": s["tasks_done"],
                    "last_seen_s": sample["t_s"],
                }
        out = {"n_samples": len(self._samples),
               "stages": {str(k): v for k, v in sorted(stages.items())}}
        p0, p1 = getattr(self, "_proc0", None), getattr(self, "_proc1", None)
        if p0 is not None and p1 is not None:
            rss_seen = [p1["rss_mb"]] + [
                s["proc"]["rss_mb"] for s in self._samples if "proc" in s]
            out["proc"] = {
                "cpu_user_s": round(p1["cpu_user_s"] - p0["cpu_user_s"], 2),
                "cpu_sys_s": round(p1["cpu_sys_s"] - p0["cpu_sys_s"], 2),
                "rss_peak_mb": max(rss_seen),
            }
        return out


class ProfileReport:
    """The CLI ``--profile`` report surface — the reference profiler's
    ``generateReport`` analog (``src/utils/profiler.js:194-226`` writes
    ``profile_<ts>.json`` with duration, system info, and per-mark
    stats; ``bin/logpipe.js:28,31-32`` wires the flags).

    Each named stage wraps one CLI phase in a :class:`ProgressReporter`
    (wall + JVM CPU/RSS deltas + Spark task-progress samples). In
    Spark's lazy model the plan-building phases are near-zero wall and
    the sink action carries the compute — the report makes that visible
    instead of pretending the reference's eager per-operator timings
    exist here.

    Usage::

        prof = ProfileReport(spark, out_dir, interval_s=5.0)
        with prof.stage("transform_plan"):
            out = apply_transforms(df, args)
        with prof.stage("sink_execute"):
            out.write.parquet(...)
        path = prof.write()
    """

    def __init__(self, spark: SparkSession, out_dir: str,
                 interval_s: float = 5.0):
        self._spark = spark
        self._out_dir = out_dir
        self._interval = interval_s
        self._t0 = time.time()
        self._stages: list[dict] = []

    def stage(self, name: str):
        from contextlib import contextmanager

        @contextmanager
        def _run():
            pr = ProgressReporter(self._spark, interval_s=self._interval)
            w0 = time.perf_counter()
            with pr:
                yield
            entry = {"name": name,
                     "wall_s": round(time.perf_counter() - w0, 3)}
            summary = pr.summary()
            entry.update({k: v for k, v in summary.get("proc", {}).items()})
            entry["n_samples"] = summary["n_samples"]
            if summary["stages"]:
                entry["spark_stages"] = summary["stages"]
            self._stages.append(entry)

        return _run()

    def report(self) -> dict:
        import platform

        return {
            "timestamp": time.strftime("%Y-%m-%dT%H:%M:%SZ",
                                       time.gmtime(self._t0)),
            "duration_s": round(time.time() - self._t0, 3),
            "system": {
                "platform": platform.system().lower(),
                "python_version": platform.python_version(),
                "spark_version": self._spark.version,
                "cpus": os.cpu_count(),
                "parallelism": self._spark.sparkContext.defaultParallelism,
            },
            "stages": self._stages,
        }

    def write(self) -> str:
        """Write ``profile_<unix_ms>.json`` under the output dir and
        return its path (same naming scheme as profiler.js:272)."""
        import json

        os.makedirs(self._out_dir, exist_ok=True)
        path = os.path.join(self._out_dir,
                            f"profile_{int(self._t0 * 1000)}.json")
        with open(path, "w") as f:
            json.dump(self.report(), f, indent=2)
        return path
