"""Scale check for the batch-5/6/8 analytics ops: pareto_front,
weighted_median, cooccurrence_lift, kmv_set_ops, median_mad,
chisq_contingency, sliding_distinct, ols_trend, ks_drift at N and 2N
synthetic rows (hash-derived, no RNG) — near-linear wall growth is the
pass signal, mirroring bench/timeseries_scale.py.

Usage:  SPARK_GRAFT_CPUS=32 python bench/analytics_scale.py [n_rows]
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

from logpipe_spark.operators.aggregate import (  # noqa: E402
    chisq_contingency,
    kmv_set_ops,
    median_mad,
    ols_trend,
    sliding_distinct,
    weighted_median,
)
from logpipe_spark.operators.assoc import cooccurrence_lift  # noqa: E402
from logpipe_spark.operators.drift import ks_drift  # noqa: E402
from logpipe_spark.operators.skyline import pareto_front  # noqa: E402
from logpipe_spark.session import build_session  # noqa: E402

N = int(sys.argv[1]) if len(sys.argv) > 1 else 10_000_000
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
SRC = "/dev/shm/analytics_scale"


def gen(spark, n, path):
    # hash-derived synthetic event rows: ~n/100 users, 8 item types
    h = F.hash(F.col("id"))
    (spark.range(n)
     .select(
         F.col("id").alias("row_id"),
         F.pmod(h, F.lit(n // 100 or 1)).alias("user_id"),
         F.concat(F.lit("item_"),
                  F.pmod(F.hash(F.col("id") * 7), F.lit(8))).alias("item"),
         F.pmod(F.hash(F.col("id") * 13), F.lit(100_000)).alias("cents"),
         (F.pmod(F.hash(F.col("id") * 17), F.lit(9)) + 1).alias("qty"),
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
    users = ev.groupBy("user_id").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_events"),
        F.sum("cents").cast("bigint").alias("total_cents"))
    ops = {
        "pareto_front": lambda: noop(
            pareto_front(users, "n_events", "total_cents",
                         bucket_width=16)),
        "weighted_median": lambda: noop(
            weighted_median(ev, "item", "cents", "qty")),
        "median_mad": lambda: noop(median_mad(ev, "item", "cents")),
        "cooccurrence_lift": lambda: noop(
            cooccurrence_lift(ev, "user_id", "item", max_items=8)),
        "kmv_set_ops": lambda: noop(
            kmv_set_ops(ev, "item", "user_id", k=256)),
        "chisq_assoc": lambda: noop(chisq_contingency(ev, "item", "seg")),
        "sliding_distinct": lambda: noop(
            sliding_distinct(ev, "ts", "user_id")),
        "ols_trend": lambda: noop(ols_trend(
            ev, "item",
            F.floor((F.col("ts").cast("long") - 1704067200) / 60),
            F.col("cents"))),
        "ks_drift": lambda: noop(ks_drift(
            ev, "item", F.col("cents"),
            F.col("ts").cast("long") - 1704067200 < 15 * 86400,
            bucket_width=1024)),
    }
    out = {}
    for name, fn in ops.items():
        fn()  # warmup: JIT/codegen per plan shape
        out[name] = min(t(fn), t(fn))
        print(f"# {name}: {out[name]}s", file=sys.stderr, flush=True)
    return out


def main() -> None:
    spark = build_session(app_name="analytics_scale", cpus=CPUS,
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
        "metric": f"analytics ops at N={N} vs 2N rows (2.0 = linear)",
        "cpus": CPUS, "n": N,
        "sec_at_n": timings["n"], "sec_at_2n": timings["2n"],
        "wall_ratio_2n_over_n": ratios,
        "value": round(sum(timings["2n"].values()), 2), "unit": "sec",
    }))
    spark.stop()


if __name__ == "__main__":
    main()
