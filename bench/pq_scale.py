"""ANN strategy comparison at scale: brute-force cosine vs PQ/ADC.

Synthesizes N deterministic 64-dim float vectors (hash-derived, no RNG)
to /dev/shm parquet, then times (a) exact brute-force top-5 for Q query
vectors (broadcast-NLJ scoring + partition-top-k pre-prune) against
(b) PQ: one-time encode (m=16 sub-spaces, K=64 codebook) + ADC scan +
exact re-rank of the top-100 shortlist. The PQ claim at 100 TB is
memory/compute per scanned row (m table lookups vs D multiplies and 16 B
codes vs 256 B floats); the encode is a one-time indexing cost amortized
over every query batch. Prints one JSON line. Usage:

    SPARK_GRAFT_CPUS=32 python bench/pq_scale.py [n_rows] [n_queries]
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

from logpipe_spark.session import build_session  # noqa: E402
from logpipe_spark.trainprep.similarity import (  # noqa: E402
    ann_bruteforce_topk,
    ann_pq_topk,
)

N = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000
Q = int(sys.argv[2]) if len(sys.argv) > 2 else 20
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
SRC = "/dev/shm/pq_scale_emb"
DIM = 64


def gen(spark):
    dims = F.array(*[
        (F.pmod(F.hash(F.col("id") * DIM + d), F.lit(2001)) - F.lit(1000))
        .cast("float") / F.lit(1000.0)
        for d in range(DIM)
    ])
    (spark.range(N)
     .select(F.col("id").alias("vec_id"), dims.alias("embedding"))
     .repartition(2 * CPUS)
     .write.mode("overwrite").parquet(SRC))


def t(fn) -> float:
    t0 = time.perf_counter()
    fn()
    return round(time.perf_counter() - t0, 2)


def main() -> None:
    spark = build_session(app_name="pq_scale", cpus=CPUS,
                          shuffle_partitions=2 * CPUS)
    gen_s = t(lambda: gen(spark))
    emb = spark.read.parquet(SRC)
    qmod = max(N // Q, 1)

    def noop(df):
        df.write.format("noop").mode("overwrite").save()

    timings = {}
    for name, fn in [
        ("bruteforce_top5", lambda: noop(
            ann_bruteforce_topk(emb, k=5, query_mod=qmod))),
        ("pq_adc_rerank_top5", lambda: noop(
            ann_pq_topk(emb, k=5, m=16, codebook=64, query_mod=qmod,
                        rerank=100))),
    ]:
        fn()  # warmup (JIT + PQ plan)
        timings[name] = min(t(fn), t(fn))
        print(f"# {name}: {timings[name]}s", file=sys.stderr, flush=True)

    print(json.dumps({
        "metric": f"ANN strategies at {N} vectors x {Q} queries (64-dim)",
        "n_rows": N, "n_queries": Q, "cpus": CPUS, "gen_s": gen_s,
        "queries": timings,
        "value": round(sum(timings.values()), 2), "unit": "sec",
    }))
    shutil.rmtree(SRC, ignore_errors=True)
    spark.stop()


if __name__ == "__main__":
    main()
