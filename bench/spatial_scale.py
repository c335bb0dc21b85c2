"""Grid-density + phrase-search scale evidence (operators/spatial.py,
trainprep/index.py:phrase_search).

Two claims, both on synthetic inputs sized N and 2N:

  - density_neighbor_counts: wall grows ~linearly when POINT DENSITY is
    held constant (the domain grows with N, so cell occupancy — and the
    9-cell candidate fan-in per point — stays fixed; that is the knob a
    100 TB deployment turns by shrinking eps as the corpus grows).
  - phrase_search: wall grows ~linearly in corpus size (the phrase-word
    filter reaches each scan, so join inputs are selectivity-sized).

Prints one JSON line with walls and the 2N/N ratios.

Usage:  SPARK_GRAFT_CPUS=32 python bench/spatial_scale.py [n_points]
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
from logpipe_spark.trainprep.index import phrase_search  # noqa: E402

N = int(sys.argv[1]) if len(sys.argv) > 1 else 5_000_000
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))


def synth_points(spark, n: int):
    """Deterministic points with CONSTANT density: the x-domain scales
    with n (fixed ~50 points per unit), y in [0, 100)."""
    return (
        spark.range(n)
        .select(
            F.col("id").alias("pid"),
            (F.pmod(F.hash(F.col("id") * 31 + 7), n // 50)
             + F.pmod(F.hash(F.col("id") * 17 + 3), 1000) / 1000.0
             ).cast("double").alias("x"),
            (F.pmod(F.hash(F.col("id") * 13 + 11), 100000) / 1000.0
             ).cast("double").alias("y"),
        )
    )


def synth_docs(spark, n: int):
    """24-word docs; ~1 in 8 contains the probe phrase."""
    words = ("transform(sequence(1, 24), "
             "i -> concat('w', pmod(hash(id * 31 + i), 5000)))")
    text = ("CASE WHEN id % 8 = 0 THEN "
            "concat(ws, ' big order scan') ELSE ws END")
    return (
        spark.range(n)
        .withColumn("ws", F.expr(f"concat_ws(' ', {words})"))
        .select(F.col("id").alias("doc_id"), F.expr(text).alias("text"))
    )


def bench_density(spark, n: int) -> tuple[float, int]:
    pts = synth_points(spark, n).localCheckpoint()
    t0 = time.monotonic()
    out = density_neighbor_counts(pts, eps=2.0, min_pts=3)
    n_out = out.where(~F.col("is_outlier")).count()
    return time.monotonic() - t0, n_out


def bench_phrase(spark, n: int) -> tuple[float, int]:
    docs = synth_docs(spark, n).localCheckpoint()
    t0 = time.monotonic()
    rows = phrase_search(docs, "big order scan", k=20).collect()
    return time.monotonic() - t0, len(rows)


def main() -> None:
    spark = build_session(cpus=CPUS)
    # warm up both plan shapes (JIT/codegen)
    bench_density(spark, 50_000)
    bench_phrase(spark, 50_000)

    d1, core1 = bench_density(spark, N)
    d2, core2 = bench_density(spark, 2 * N)
    p1, hits1 = bench_phrase(spark, N)
    p2, hits2 = bench_phrase(spark, 2 * N)
    print(json.dumps({
        "metric": "spatial+phrase scale (N vs 2N)",
        "n": N,
        "density_wall_n": round(d1, 2),
        "density_wall_2n": round(d2, 2),
        "density_ratio": round(d2 / d1, 2),
        "density_core_points": [core1, core2],
        "phrase_wall_n": round(p1, 2),
        "phrase_wall_2n": round(p2, 2),
        "phrase_ratio": round(p2 / p1, 2),
        "phrase_topk": [hits1, hits2],
        "cpus": CPUS,
        "load_1m": os.getloadavg()[0],
    }))
    spark.stop()


if __name__ == "__main__":
    main()
