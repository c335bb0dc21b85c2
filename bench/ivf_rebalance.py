"""IVF list maintenance under skewed appends: without rebalance the hot
list is ONE unbounded slot-0 partition (its scan parallelism and per-task
memory grow with every delta); rebalance_ivf_index keeps every physical
partition under the size bound while query results stay IDENTICAL
(asserted here — the same invariance the ann_rebalanced driver oracle
proves at value level).

Usage: python bench/ivf_rebalance.py [n_vectors] [n_deltas]
Prints one JSON line.
"""

from __future__ import annotations

import json
import shutil
import sys
import tempfile
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from pyspark.sql import functions as F  # noqa: E402

from logpipe_spark.session import build_session  # noqa: E402
from logpipe_spark.trainprep import similarity as sim  # noqa: E402


def synth_emb(spark, n: int, dims: int = 16, hot_frac: float = 0.5):
    """Deterministic embeddings; ~hot_frac of vectors land in label 0."""
    hot_mod = max(2, int(round(1.0 / hot_frac)))
    return spark.range(n).select(
        F.col("id").alias("vec_id"),
        F.transform(
            F.sequence(F.lit(0), F.lit(dims - 1)),
            lambda j: ((F.col("id") * 7 + j * 3) % 11 - 5).cast("float"),
        ).alias("embedding"),
        F.when(F.col("id") % hot_mod == 0, F.lit(0))
        .otherwise((F.col("id") % 97).cast("int") + 1).alias("label"),
    )


def max_slot_rows(spark, path: str) -> tuple[int, int]:
    sizes = (spark.read.parquet(f"{path}/lists")
             .groupBy("label", "slot").count().collect())
    return max(r["count"] for r in sizes), len(sizes)


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 500_000
    n_deltas = int(sys.argv[2]) if len(sys.argv) > 2 else 4
    bound = max(1000, n // 50)
    spark = build_session()
    emb = synth_emb(spark, n).localCheckpoint(eager=True)

    idx = tempfile.mkdtemp(prefix="ivf_rb_", dir="/dev/shm")
    shutil.rmtree(idx, ignore_errors=True)
    try:
        sim.write_ivf_index(spark, emb.where(F.col("vec_id") % (n_deltas + 1) == 0), idx)
        for d in range(1, n_deltas + 1):
            sim.append_ivf_index(
                spark, emb.where(F.col("vec_id") % (n_deltas + 1) == d), idx)
        before_max, before_slots = max_slot_rows(spark, idx)
        t0 = time.monotonic()
        q_before = sorted(map(tuple, sim.ann_query_index(
            spark, idx, query_mod=n // 20).collect()))
        q_wall_before = time.monotonic() - t0

        t0 = time.monotonic()
        stats = sim.rebalance_ivf_index(spark, idx, max_list_size=bound)
        rb_wall = time.monotonic() - t0
        after_max, after_slots = max_slot_rows(spark, idx)
        t0 = time.monotonic()
        q_after = sorted(map(tuple, sim.ann_query_index(
            spark, idx, query_mod=n // 20).collect()))
        q_wall_after = time.monotonic() - t0
        assert q_before == q_after, "rebalance moved query answers"
        assert after_max <= bound, (after_max, bound)
        print(json.dumps({
            "metric": "ivf_rebalance",
            "n_vectors": n,
            "n_deltas": n_deltas,
            "bound": bound,
            "hot_list_rows_before": before_max,
            "slots_before": before_slots,
            "hot_list_rows_after": after_max,
            "slots_after": after_slots,
            "rebalance_rounds": stats["rounds"],
            "rebalance_splits": stats["splits"],
            "rebalance_sec": round(rb_wall, 2),
            "query_sec_before": round(q_wall_before, 2),
            "query_sec_after": round(q_wall_after, 2),
            "results_identical": True,
        }))
    finally:
        shutil.rmtree(idx, ignore_errors=True)
        spark.stop()


if __name__ == "__main__":
    main()
