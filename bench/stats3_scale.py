"""Scale check for the round-4 continuation stats ops: wilcoxon_signed,
runs_test, cliffs_delta, kuiper_drift at N and 2N synthetic rows
(hash-derived, no RNG) — near-linear wall growth is the pass signal,
mirroring bench/stats_scale.py.

Usage:  SPARK_GRAFT_CPUS=32 python bench/stats3_scale.py [n_rows]
Prints one JSON line with per-op seconds at N and 2N.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from pyspark.sql import functions as F  # noqa: E402

from logpipe_spark.operators.drift import (  # noqa: E402
    cliffs_delta,
    kuiper_drift,
    runs_test,
    wilcoxon_signed,
)
from logpipe_spark.session import build_session  # noqa: E402

N = int(sys.argv[1]) if len(sys.argv) > 1 else 10_000_000
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
SRC = "/dev/shm/stats3_scale"


def gen(spark, n, path):
    h = F.hash(F.col("id"))
    (spark.range(n)
     .select(
         F.col("id").alias("row_id"),
         F.pmod(h, F.lit(n // 100 or 1)).alias("user_id"),
         F.concat(F.lit("item_"),
                  F.pmod(F.hash(F.col("id") * 7), F.lit(8))).alias("item"),
         F.pmod(F.hash(F.col("id") * 13), F.lit(100_000)).alias("cents"),
         (F.pmod(F.hash(F.col("id") * 29), F.lit(2)) == 0).alias("label"),
         F.concat(F.lit("s"),
                  F.pmod(F.hash(F.col("id") * 19), F.lit(12))).alias("seg"),
         F.timestamp_seconds(
             F.lit(1704067200)
             + F.pmod(F.hash(F.col("id") * 23), F.lit(30 * 86400))
         ).alias("ts"),
     )
     .repartition(2 * CPUS)
     .write.mode("overwrite").parquet(path))


def t(fn) -> float:
    t0 = time.perf_counter()
    fn()
    return round(time.perf_counter() - t0, 2)


def noop(df):
    df.write.format("noop").mode("overwrite").save()


def run_suite(spark, path):
    ev = spark.read.parquet(path)
    first_half = F.col("ts").cast("long") - 1704067200 < 15 * 86400

    def wilcoxon_pairs():
        # one combinable shuffle corpus -> per-user pair frame (n/100
        # rows), then the per-(seg, |d|) distinct-value rank scan
        pairs = ev.groupBy("user_id", "seg").agg(
            (F.sum(F.when(F.col("label"), F.col("cents")).otherwise(0))
             - F.sum(F.when(F.col("label"), 0).otherwise(F.col("cents"))))
            .cast("bigint").alias("d"))
        return wilcoxon_signed(pairs, "seg", F.col("d"))

    ops = {
        "wilcoxon_signed": lambda: noop(wilcoxon_pairs()),
        # the sign extraction and discrete median are distinct-value
        # scans; the lag window is the inherently sequential per-key
        # part (8 keys here — real corpora key on high-cardinality
        # dimensions, or go segment-parallel: runs is a monoid over
        # (first_sign, last_sign, n_runs) per segment)
        "runs_test": lambda: noop(runs_test(
            ev, "item", ["ts", "row_id"], F.col("cents"))),
        # bucketed CDF prefix scan over 100k distinct values x 8 items,
        # DECIMAL pair products
        "cliffs_delta": lambda: noop(cliffs_delta(
            ev, "item", F.col("cents"), F.col("label"))),
        # same scan, signed maxima
        "kuiper_drift": lambda: noop(kuiper_drift(
            ev, "item", F.col("cents"), first_half, bucket_width=1024)),
    }
    out = {}
    for name, fn in ops.items():
        fn()  # warmup: JIT/codegen per plan shape
        out[name] = min(t(fn), t(fn))
        print(f"# {name}: {out[name]}s", file=sys.stderr, flush=True)
    return out


def main() -> None:
    spark = build_session(app_name="stats3_scale", cpus=CPUS,
                          shuffle_partitions=2 * CPUS)
    sizes = {"n": N, "2n": 2 * N}
    timings = {}
    for tag, n in sizes.items():
        path = f"{SRC}_{tag}"
        gen(spark, n, path)
        print(f"# --- {tag} = {n} rows ---", file=sys.stderr, flush=True)
        timings[tag] = run_suite(spark, path)
        shutil.rmtree(path, ignore_errors=True)
    ratios = {k: round(timings["2n"][k] / max(timings["n"][k], 1e-9), 2)
              for k in timings["n"]}
    print(json.dumps({
        "metric": "r4-continuation stats ops at N vs 2N rows (2.0 = linear)",
        "cpus": CPUS, "n": N,
        "sec_at_n": timings["n"], "sec_at_2n": timings["2n"],
        "wall_ratio_2n_over_n": ratios,
        "value": round(sum(timings["2n"].values()), 2), "unit": "sec",
    }))
    spark.stop()


if __name__ == "__main__":
    main()
