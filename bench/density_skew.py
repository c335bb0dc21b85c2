"""Hot-cell skew demo: plain vs selectively salted density cell join.

Corpus: N points where ONE eps-cell holds half of all points (a dense
cluster on an otherwise uniform plane) — the cell-key skew case the
spatial module documents. The plain 3x3 cell join funnels the hot
cell's entire candidate workload (O(m_probe * m_build) distance tests)
through ONE task; the salted form shards the hot cell's build side
into salt_shards and replicates only the probes that target it, so the
same pair set is tested across salt_shards tasks. Prints one JSON line
with both timings, the per-point count equality check, and the
speedup.

    SPARK_GRAFT_CPUS=32 python bench/density_skew.py [n_rows]
"""

from __future__ import annotations

import json
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from pyspark.sql import functions as F  # noqa: E402

from logpipe_spark.operators.spatial import density_neighbor_counts  # noqa: E402
from logpipe_spark.session import build_session  # noqa: E402

# The hot cell's candidate workload is QUADRATIC in its population
# (m^2 distance tests — that's exactly why the skew matters): size the
# demo by work, not rows. 100k points with 50k in one cell = 2.5e9
# tests in ONE task unsalted.
N = int(sys.argv[1]) if len(sys.argv) > 1 else 100_000
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
SRC = "/dev/shm/density_skew_pts"
EPS = 1.0


def main() -> None:
    import shutil

    spark = build_session(app_name="density_skew", cpus=CPUS,
                          shuffle_partitions=2 * CPUS)
    # half the points land inside ONE eps-cell (cell 0,0); the rest
    # spread over a 1000x1000-cell plane (cells of ~N/2e6 points each)
    (
        spark.range(N)
        .select(
            F.col("id").alias("pid"),
            F.when(F.col("id") % 2 == 0,
                   F.pmod(F.hash(F.col("id")), F.lit(1_000_000))
                   .cast("double") / F.lit(1_000_000.0))
            .otherwise(F.pmod(F.hash(F.col("id") + 1), F.lit(1_000))
                       .cast("double") + F.lit(1.5))
            .alias("x"),
            F.when(F.col("id") % 2 == 0,
                   F.pmod(F.hash(F.col("id") + 2), F.lit(1_000_000))
                   .cast("double") / F.lit(1_000_000.0))
            .otherwise(F.pmod(F.hash(F.col("id") + 3), F.lit(1_000))
                       .cast("double") + F.lit(1.5))
            .alias("y"),
        )
        .repartition(2 * CPUS)
        .write.mode("overwrite").parquet(SRC)
    )
    pts = spark.read.parquet(SRC)
    # Model the at-scale join regime: with a corpus-sized build side the
    # cell join is a SHUFFLE join (every hot-cell row lands in ONE
    # reducer task) — that is the skew the salting addresses. At demo
    # sizes Spark would broadcast the build side, which spreads the hot
    # cell's probe work across partitions and hides the skew entirely.
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")

    def run(threshold, tag):
        # warm the plan shape once on a slice, then time the full input
        density_neighbor_counts(
            pts.limit(50_000), EPS, 4,
            hot_cell_threshold=threshold).agg(
                F.sum("n_neighbors")).collect()
        t0 = time.perf_counter()
        row = density_neighbor_counts(
            pts, EPS, 4, hot_cell_threshold=threshold).agg(
                F.sum("n_neighbors").alias("s"),
                F.count(F.lit(1)).alias("n")).collect()[0]
        return time.perf_counter() - t0, int(row.s), int(row.n)

    wall_plain, s_plain, n_plain = run(None, "plain")
    wall_salt, s_salt, n_salt = run(N // 10, "salted")
    print(json.dumps({
        "metric": "density_neighbor_counts hot-cell salting "
                  "(one cell = 50% of points)",
        "n_points": N,
        "eps": EPS,
        "wall_s_plain": round(wall_plain, 2),
        "wall_s_salted": round(wall_salt, 2),
        "speedup": round(wall_plain / wall_salt, 2),
        "counts_equal": (s_plain, n_plain) == (s_salt, n_salt),
        "sum_neighbors": s_plain,
        "load_1m": float(open("/proc/loadavg").read().split()[0]),
    }))
    shutil.rmtree(SRC, ignore_errors=True)
    spark.stop()


if __name__ == "__main__":
    main()
