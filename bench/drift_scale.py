"""Scale check for the round-4 drift family additions: the order-free
integer statistics (wasserstein, energy) at N and 2N synthetic rows,
plus the drift_panel one-scan claim — all six statistics from one
persisted count collapse vs the six standalone calls (six corpus
scans). Hash-derived data, no RNG.

Usage:  SPARK_GRAFT_CPUS=32 python bench/drift_scale.py [n_rows]
Prints one JSON line.
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
    cvm_drift,
    drift_panel,
    energy_drift,
    hellinger_drift,
    ks_drift,
    kuiper_drift,
    wasserstein_drift,
)
from logpipe_spark.session import build_session  # noqa: E402

N = int(sys.argv[1]) if len(sys.argv) > 1 else 10_000_000
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
SRC = "/dev/shm/drift_scale"


def gen(spark, n, path):
    (spark.range(n)
     .select(
         F.concat(F.lit("item_"),
                  F.pmod(F.hash(F.col("id") * 7), F.lit(8))).alias("item"),
         F.pmod(F.hash(F.col("id") * 13), F.lit(100_000)).alias("cents"),
         (F.pmod(F.hash(F.col("id") * 29), F.lit(2)) == 0).alias("ia"),
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
    args = (ev, "item", F.col("cents"), F.col("ia"))

    def six_standalone():
        # six independent statistic calls = six corpus scans
        for op in (ks_drift, kuiper_drift, hellinger_drift, cvm_drift,
                   wasserstein_drift, energy_drift):
            noop(op(*args))

    ops = {
        # order-free int64 sums: one combinable collapse shuffle + a
        # support-sized lead window — the no-fold scale path
        "wasserstein": lambda: noop(wasserstein_drift(*args)),
        "energy": lambda: noop(energy_drift(*args)),
        # all six from ONE persisted collapse
        "panel_one_scan": lambda: noop(drift_panel(*args)),
        "six_standalone": six_standalone,
    }
    out = {}
    for name, fn in ops.items():
        fn()  # warmup: JIT/codegen per plan shape
        out[name] = min(t(fn), t(fn))
        spark.catalog.clearCache()
        print(f"# {name}: {out[name]}s", file=sys.stderr, flush=True)
    return out


def main() -> None:
    spark = build_session(app_name="drift_scale", cpus=CPUS,
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
        "metric": "drift family at N vs 2N rows (2.0 = linear)",
        "cpus": CPUS, "n": N,
        "sec_at_n": timings["n"], "sec_at_2n": timings["2n"],
        "wall_ratio_2n_over_n": ratios,
        "panel_speedup_vs_six": round(
            timings["2n"]["six_standalone"]
            / max(timings["2n"]["panel_one_scan"], 1e-9), 2),
        "value": round(sum(timings["2n"].values()), 2), "unit": "sec",
    }))
    spark.stop()


if __name__ == "__main__":
    main()
