"""Support-cardinality characterization for the drift family: at FIXED
corpus size, grow the distinct-value support and time a fold-based
member (hellinger: per-key collect_list fold) against an order-free one
(wasserstein: plain integer aggregate). The fold member's wall should
track support size; the order-free member should not care. This is the
measured basis for the bounded-support contract in the fold members'
docstrings ("bucket to <= ~100k values per key").

Usage:  SPARK_GRAFT_CPUS=32 python bench/drift_support.py [n_rows]
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
    hellinger_drift,
    wasserstein_drift,
)
from logpipe_spark.session import build_session  # noqa: E402

N = int(sys.argv[1]) if len(sys.argv) > 1 else 10_000_000
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
SRC = "/dev/shm/drift_support"
SUPPORTS = [1_000, 100_000, 1_000_000]


def gen(spark, n, support, path):
    (spark.range(n)
     .select(
         F.concat(F.lit("item_"),
                  F.pmod(F.hash(F.col("id") * 7), F.lit(8))).alias("item"),
         F.pmod(F.hash(F.col("id") * 13), F.lit(support)).alias("v"),
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


def main() -> None:
    spark = build_session(app_name="drift_support", cpus=CPUS,
                          shuffle_partitions=2 * CPUS)
    out = {}
    for support in SUPPORTS:
        path = f"{SRC}_{support}"
        gen(spark, N, support, path)
        ev = spark.read.parquet(path)
        args = (ev, "item", F.col("v"), F.col("ia"))
        row = {}
        for name, op in (("hellinger_fold", hellinger_drift),
                         ("wasserstein_orderfree", wasserstein_drift)):
            fn = lambda: noop(op(*args))  # noqa: E731
            fn()
            row[name] = min(t(fn), t(fn))
            print(f"# support={support} {name}: {row[name]}s",
                  file=sys.stderr, flush=True)
        out[str(support)] = row
        shutil.rmtree(path, ignore_errors=True)
    print(json.dumps({
        "metric": "drift statistic wall vs distinct-value support "
                  "(fixed corpus rows)",
        "cpus": CPUS, "rows": N, "sec_by_support": out, "unit": "sec",
    }))
    spark.stop()


if __name__ == "__main__":
    main()
