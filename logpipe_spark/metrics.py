"""Per-partition throughput / row-count metrics (north_star observability).

Replaces the reference's runtime instrumentation — bytes/s progress
(``src/utils/progressTracker.js:49-64``), records/s
(``src/utils/checkpointManager.js:137``), per-step profiler marks
(``src/utils/profiler.js:194-226``) — with Spark-native signals:

- :func:`with_partition_metrics` threads a ``mapInPandas`` pass-through
  that accumulates (partition_id → rows, batches, wall seconds) into Spark
  accumulators; zero data movement, one Arrow round-trip.
- :func:`collect_metrics` snapshots the accumulators after an action into
  the same shape the lineage manifests use, so a stage run records both
  its *output* lineage (parquet footers, checkpoint.py) and its *compute*
  distribution (this module) — straggler partitions show up as outliers in
  ``wall_s``.

At cluster scale prefer the SparkListener/metrics-sink route for continuous
monitoring; the accumulator pass is the dependency-free variant that works
in any PySpark environment and is cheap enough to leave on for benches.
"""

from __future__ import annotations

import time
from collections.abc import Iterator
from dataclasses import dataclass

import pandas as pd
from pyspark import AccumulatorParam
from pyspark.sql import DataFrame, SparkSession


class _DictMaxParam(AccumulatorParam):
    """Per-partition elementwise MAX merge. Accumulator updates inside a
    transformation are re-applied when a task is retried or speculated;
    max() is idempotent for the (identical) recomputed rows/batches and
    conservative for wall time, where sum() would double-count."""

    def zero(self, value):
        return {}

    def addInPlace(self, a, b):
        for k, v in b.items():
            if k in a:
                a[k] = tuple(max(x, y) for x, y in zip(a[k], v))
            else:
                a[k] = v
        return a


@dataclass
class PartitionMetrics:
    partition_id: int
    rows: int
    batches: int
    wall_s: float

    @property
    def rows_per_sec(self) -> float | None:
        return round(self.rows / self.wall_s, 1) if self.wall_s > 0 else None


def with_partition_metrics(spark: SparkSession, df: DataFrame):
    """Return (instrumented_df, accumulator). The instrumented frame is
    byte-identical to ``df``; consuming it fills the accumulator with
    per-partition (rows, batches, wall_s)."""
    acc = spark.sparkContext.accumulator({}, _DictMaxParam())
    schema = df.schema

    def passthrough(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from pyspark import TaskContext

        pid = TaskContext.get().partitionId()
        t0 = time.perf_counter()
        rows = batches = 0
        # finally: a limit/take/show consumer CLOSES the generator mid-
        # stream (GeneratorExit at the yield) — without it the partition
        # that streamed the rows would record NOTHING and skew_report
        # would silently total a partial partition set
        try:
            for pdf in it:
                rows += len(pdf)
                batches += 1
                yield pdf
        finally:
            acc.add({pid: (rows, batches, time.perf_counter() - t0)})

    return df.mapInPandas(passthrough, schema=schema), acc


def collect_metrics(acc) -> list[PartitionMetrics]:
    return [
        PartitionMetrics(pid, rows, batches, round(wall, 4))
        for pid, (rows, batches, wall) in sorted(acc.value.items())
    ]


def skew_report(metrics: list[PartitionMetrics]) -> dict:
    """Straggler summary: max/median partition wall + row imbalance."""
    if not metrics:
        return {"partitions": 0}
    walls = sorted(m.wall_s for m in metrics)
    rows = sorted(m.rows for m in metrics)
    mid = len(walls) // 2
    return {
        "partitions": len(metrics),
        "rows_total": sum(rows),
        "rows_max": rows[-1],
        "rows_median": rows[mid],
        "wall_max_s": walls[-1],
        "wall_median_s": walls[mid],
        "straggler_ratio": round(walls[-1] / walls[mid], 2)
        if walls[mid] > 0 else None,
    }
