"""Per-stage checkpointing with lineage manifests and snapshot-style resume.

Re-expresses the reference's checkpoint manager
(``src/utils/checkpointManager.js:122-232``: atomic temp-file+rename,
resume decision, records/sec stats) at Spark granularity. The reference's
byte-offset resume is broken by design (offsets never populated, gzip-unsafe
seek — SURVEY.md §2.7); here resume is *stage*-granular and actually works:

- each stage writes its output table to ``{base}/{stage}.inprogress`` and
  atomically renames to ``{base}/{stage}`` on success (the parquet directory
  is the snapshot; on Iceberg this whole module collapses into
  ``writeTo(tbl).append()`` + snapshot IDs);
- a JSON manifest (atomic write-temp-then-rename,
  ≙ checkpointManager.js:146-152) records per-partition lineage: output
  file, row count, byte size, plus stage wall time and rows/sec
  (≙ the reference's records/sec stat, checkpointManager.js:137);
- a rerun skips every stage whose manifest is committed and whose data dir
  exists, reading the checkpoint instead of recomputing (≙ intended
  ``resumeFromCheckpoint`` semantics, checkpointManager.js:217-232);
- a killed run leaves only ``.inprogress`` dirs + no manifest → the stage
  reruns idempotently (partial output can never double-count).

At 100 TB: checkpoint I/O is sequential columnar write at full cluster
parallelism; lineage is read from parquet footers (driver-side metadata
only, no data scan). Stages that are cheap to recompute should opt out
(``checkpoint=False``) — writing 100 TB intermediates is itself the cost.
"""

from __future__ import annotations

import json
import os
import shutil
import time
from dataclasses import dataclass, field
from typing import Callable

from pyspark.sql import DataFrame, SparkSession

MANIFEST = "_manifest.json"


@dataclass
class Stage:
    name: str
    fn: Callable[[SparkSession, DataFrame | None], DataFrame]
    checkpoint: bool = True


@dataclass
class StageRun:
    name: str
    path: str | None
    skipped: bool
    rows: int
    wall_s: float
    df: DataFrame


def _partition_lineage(path: str) -> tuple[list[dict], int]:
    """Per-output-file lineage from parquet footers — no data scan."""
    import pyarrow.parquet as pq

    parts = []
    total = 0
    for name in sorted(os.listdir(path)):
        if not name.endswith(".parquet"):
            continue
        fp = os.path.join(path, name)
        meta = pq.ParquetFile(fp).metadata
        parts.append({
            "file": name,
            "rows": meta.num_rows,
            "bytes": os.path.getsize(fp),
        })
        total += meta.num_rows
    return parts, total


def _write_manifest(stage_dir: str, manifest: dict) -> None:
    tmp = os.path.join(stage_dir, MANIFEST + ".tmp")
    with open(tmp, "w") as f:
        json.dump(manifest, f, indent=1)
    os.replace(tmp, os.path.join(stage_dir, MANIFEST))  # atomic (≙ :146-152)


def read_manifest(base_dir: str, stage: str) -> dict | None:
    p = os.path.join(base_dir, stage, MANIFEST)
    if not os.path.exists(p):
        return None
    with open(p) as f:
        return json.load(f)


def is_committed(base_dir: str, stage: str) -> bool:
    m = read_manifest(base_dir, stage)
    return bool(m and m.get("status") == "committed")


def run_stages(
    spark: SparkSession,
    stages: list[Stage],
    base_dir: str,
    source: DataFrame | None = None,
    resume: bool = True,
    compute_metrics: bool = False,
    progress_interval_s: float | None = None,
) -> list[StageRun]:
    """Run a linear stage chain with checkpoint/skip semantics.

    Each stage's fn receives (spark, previous stage's DataFrame); the first
    receives ``source``. Committed stages are skipped on resume and their
    checkpoint is read back as the input to the next stage.
    ``progress_interval_s`` turns on during-run task-progress sampling
    (:class:`logpipe_spark.plans.progress.ProgressReporter`); the samples
    land in each stage's manifest under ``progress``.
    """
    os.makedirs(base_dir, exist_ok=True)
    runs: list[StageRun] = []
    prev: DataFrame | None = source
    for stage in stages:
        final_dir = os.path.join(base_dir, stage.name)
        if not stage.checkpoint:
            t0 = time.perf_counter()
            prev = stage.fn(spark, prev)
            runs.append(StageRun(stage.name, None, False, -1,
                                 time.perf_counter() - t0, prev))
            continue
        if resume and is_committed(base_dir, stage.name):
            df = spark.read.parquet(final_dir)
            m = read_manifest(base_dir, stage.name)
            runs.append(StageRun(stage.name, final_dir, True,
                                 m.get("rows", -1), 0.0, df))
            prev = df
            continue
        # stale partial output from a killed run → discard (idempotence)
        inprog = final_dir + ".inprogress"
        for d in (inprog, final_dir):
            if os.path.exists(d):
                shutil.rmtree(d)
        t0 = time.perf_counter()
        out = stage.fn(spark, prev)
        acc = None
        if compute_metrics:
            from logpipe_spark.metrics import with_partition_metrics
            out, acc = with_partition_metrics(spark, out)
        from contextlib import nullcontext

        reporter = None
        if progress_interval_s is not None:
            from logpipe_spark.plans.progress import ProgressReporter
            reporter = ProgressReporter(spark, interval_s=progress_interval_s)
        with reporter if reporter is not None else nullcontext():
            out.write.mode("overwrite").parquet(inprog)
        wall = time.perf_counter() - t0
        os.replace(inprog, final_dir)  # atomic commit of the snapshot dir
        parts, rows = _partition_lineage(final_dir)
        manifest = {
            "stage": stage.name,
            "status": "committed",
            "rows": rows,
            "wall_s": round(wall, 3),
            "rows_per_sec": round(rows / wall, 1) if wall > 0 else None,
            "partitions": parts,
            "input_stage": runs[-1].name if runs else "source",
        }
        if acc is not None:
            from logpipe_spark.metrics import collect_metrics, skew_report
            pm = collect_metrics(acc)
            manifest["compute_partitions"] = [
                {"pid": m.partition_id, "rows": m.rows,
                 "wall_s": m.wall_s, "rows_per_sec": m.rows_per_sec}
                for m in pm
            ]
            manifest["skew"] = skew_report(pm)
        if reporter is not None:
            manifest["progress"] = {"samples": reporter.samples(),
                                    "summary": reporter.summary()}
        _write_manifest(final_dir, manifest)
        df = spark.read.parquet(final_dir)
        runs.append(StageRun(stage.name, final_dir, False, rows, wall, df))
        prev = df
    return runs
