"""Scale check for the batch-10 statistics ops: cusum_scan, welch_ttest,
anova_f, auc_rank, gini_gain, hist2d, quantile_normalize at N and 2N
synthetic rows (hash-derived, no RNG) — near-linear wall growth is the
pass signal, mirroring bench/analytics_scale.py.

Usage:  SPARK_GRAFT_CPUS=32 python bench/stats_scale.py [n_rows]
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

from logpipe_spark.operators.aggregate import anova_f, gini_gain  # noqa: E402
from logpipe_spark.operators.drift import (  # noqa: E402
    auc_rank,
    cusum_merge,
    cusum_partials,
    cusum_scan,
    kruskal_wallis,
    mann_whitney_u,
    welch_ttest,
)
from logpipe_spark.operators.profile import hist2d  # noqa: E402
from logpipe_spark.session import build_session  # noqa: E402
from logpipe_spark.trainprep.curate import quantile_normalize  # noqa: E402

N = int(sys.argv[1]) if len(sys.argv) > 1 else 10_000_000
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
SRC = "/dev/shm/stats_scale"


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
    ops = {
        # per-user expanding windows over ~100-row groups
        "cusum_scan": lambda: noop(cusum_scan(
            ev, "user_id", F.col("cents"), ["ts", "row_id"],
            target=50_000, threshold=5_000_000)),
        # the segment-parallel monoid path: per-(user, day) partial
        # scans + epoch-ordered merge — same answer, windows bounded
        # by a day instead of the whole key history
        "cusum_merged": lambda: noop(cusum_merge(
            cusum_partials(
                ev, "user_id",
                F.floor(F.col("ts").cast("long") / 86400),
                F.col("cents"), ["ts", "row_id"], target=50_000),
            "user_id", threshold=5_000_000)),
        # one combinable aggregate of six integer sums
        "welch_ttest": lambda: noop(welch_ttest(
            ev, "item", F.col("cents"), first_half)),
        # distinct-value frame (100k cents) through the bucketed prefix
        # scan; per-group DECIMAL rank sums — no global rank window
        "mann_whitney": lambda: noop(mann_whitney_u(
            ev, "item", F.col("cents"), bucket_width=1024)),
        # same distinct-value rank scan, k-group H with the 8-element
        # ordered term fold
        "kruskal_wallis": lambda: noop(kruskal_wallis(
            ev, "item", F.col("cents"), bucket_width=1024)),
        # one aggregate + an 8-element ordered fold
        "anova_f": lambda: noop(anova_f(ev, "item", F.col("cents"))),
        # bucketed CDF prefix scan over 100k distinct values x 8 items
        "auc_rank": lambda: noop(auc_rank(
            ev, "item", F.col("cents"), F.col("label"))),
        "gini_gain": lambda: noop(gini_gain(ev, "seg", "item")),
        "hist2d": lambda: noop(hist2d(
            ev.withColumn("hour", F.hour("ts")), "item", "hour")),
        # per-seg rank windows (12 segs x n/12 rows) + pooled interval join
        "quantile_normalize": lambda: noop(quantile_normalize(
            ev, "seg", "cents", "row_id")),
    }
    out = {}
    for name, fn in ops.items():
        fn()  # warmup: JIT/codegen per plan shape
        out[name] = min(t(fn), t(fn))
        print(f"# {name}: {out[name]}s", file=sys.stderr, flush=True)
    return out


def main() -> None:
    spark = build_session(app_name="stats_scale", cpus=CPUS,
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
        "metric": f"batch-10 stats ops at N={N} vs 2N rows (2.0 = linear)",
        "cpus": CPUS, "n": N,
        "sec_at_n": timings["n"], "sec_at_2n": timings["2n"],
        "wall_ratio_2n_over_n": ratios,
        "value": round(sum(timings["2n"].values()), 2), "unit": "sec",
    }))
    spark.stop()


if __name__ == "__main__":
    main()
