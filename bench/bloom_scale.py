"""Bloom-pruned semi-join vs shuffle/broadcast semi-join at 20M fact rows.

The 100 TB scenario plans/bloom.py targets: fact ⋉ dim where the dim's key
set is selective (here 1%) but the dim itself may be too large to broadcast
as a hash relation. Three physical strategies over the same inputs:

- semi_shuffle: sort-merge left-semi (broadcast disabled) — the fact side
  pays a full shuffle on the key;
- semi_broadcast: broadcast left-semi — the best case when the dim fits;
- bloom_prune: build an m-bit word-array filter from the dim ONCE (one
  bounded shuffle of <= m/32 rows, cached — at scale the filter persists
  and is reused across fact passes), broadcast it as ONE row, prune the
  fact scan with a codegen xxhash64 double-hash filter — the fact never
  shuffles; survivors (~1% + FP) then pay an exact broadcast semi-join to
  drop false positives. (First measured run used k=3 separate md5 probes
  per fact row: 5.14 s — per-row md5 cost dominated; the double-hash
  xxhash64 probe is the fix. See BENCH.md.)

Prints one JSON line. Usage:

    SPARK_GRAFT_CPUS=32 python bench/bloom_scale.py [n_fact_rows]
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

from logpipe_spark.plans.bloom import bloom_prune  # noqa: E402
from logpipe_spark.session import build_session  # noqa: E402

N = int(sys.argv[1]) if len(sys.argv) > 1 else 20_000_000
N_KEYS = 2_000_000
DIM_EVERY = 100          # 1% of the key space is in the dim
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
M_BITS = 1 << 18         # 13 bits per dim key
K = 6                    # ~optimal for 13 bits/key -> FP ~1e-3
SRC = "/dev/shm/bloom_scale"


def t(fn) -> float:
    t0 = time.perf_counter()
    fn()
    return round(time.perf_counter() - t0, 2)


def main() -> None:
    spark = build_session(app_name="bloom_scale", cpus=CPUS,
                          shuffle_partitions=2 * CPUS)

    gen_s = t(lambda: (
        spark.range(N)
        .select(F.col("id"),
                F.pmod(F.hash(F.col("id")), F.lit(N_KEYS)).alias("key"),
                (F.col("id") % 1000).alias("v"))
        .repartition(2 * CPUS)
        .write.mode("overwrite").parquet(f"{SRC}/fact"),
        spark.range(0, N_KEYS, DIM_EVERY)
        .select(F.col("id").alias("dkey"),
                F.md5(F.col("id").cast("string")).alias("attr"))
        .write.mode("overwrite").parquet(f"{SRC}/dim"),
    ))

    fact = spark.read.parquet(f"{SRC}/fact")
    dim = spark.read.parquet(f"{SRC}/dim")

    def noop(df):
        df.write.format("noop").mode("overwrite").save()

    def semi_shuffle():
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        try:
            noop(fact.join(dim, fact.key == dim.dkey, "left_semi"))
        finally:
            spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")

    def semi_broadcast():
        noop(fact.join(F.broadcast(dim), fact.key == dim.dkey, "left_semi"))

    from logpipe_spark.plans.bloom import bloom_as_array, bloom_build

    t0 = time.perf_counter()
    arr = bloom_as_array(
        bloom_build(dim, "dkey", M_BITS, K, hash_fn="xxhash64"),
        M_BITS).cache()
    arr.count()  # materialize the filter once (the reusable artifact)
    build_s = round(time.perf_counter() - t0, 2)

    def bloom():
        pruned = bloom_prune(fact, None, "key", m_bits=M_BITS, k=K,
                             hash_fn="xxhash64", prebuilt=arr)
        # exact verify on the ~1% sliver: broadcast semi drops the FPs
        noop(pruned.join(F.broadcast(dim), pruned.key == dim.dkey,
                         "left_semi"))

    timings = {}
    for name, fn in [("semi_shuffle", semi_shuffle),
                     ("semi_broadcast", semi_broadcast),
                     ("bloom_prune", bloom)]:
        fn()  # warmup (JIT/codegen)
        timings[name] = min(t(fn), t(fn))
        print(f"# {name}: {timings[name]}s", file=sys.stderr, flush=True)

    # row-count sanity: bloom+verify == exact semi
    n_exact = fact.join(F.broadcast(dim), fact.key == dim.dkey,
                        "left_semi").count()
    pruned = bloom_prune(fact, None, "key", m_bits=M_BITS, k=K,
                         hash_fn="xxhash64", prebuilt=arr)
    n_bloom_only = pruned.count()
    n_bloom_verified = pruned.join(
        F.broadcast(dim), pruned.key == dim.dkey, "left_semi").count()
    assert n_bloom_verified == n_exact, (n_bloom_verified, n_exact)

    print(json.dumps({
        "metric": f"semi-join strategies at {N} fact rows, 1% selective dim",
        "n_fact": N, "n_dim": N_KEYS // DIM_EVERY, "cpus": CPUS,
        "gen_s": gen_s, "build_s": build_s, "queries": timings,
        "value": timings["bloom_prune"], "unit": "sec",
        "exact_rows": n_exact, "bloom_rows": n_bloom_only,
        # per-NON-MATCHING-row false-positive probability (theory:
        # (1 - e^(-K*n/m))^K)
        "fp_prob": round((n_bloom_only - n_exact) / max(N - n_exact, 1), 6),
        "speedup_vs_shuffle": round(
            timings["semi_shuffle"] / timings["bloom_prune"], 2),
    }))
    shutil.rmtree(SRC, ignore_errors=True)
    spark.stop()


if __name__ == "__main__":
    main()
