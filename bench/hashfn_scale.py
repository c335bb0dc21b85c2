"""hash_fn cost at scale: md5 (cross-engine-deterministic oracle hash)
vs xxhash64 (JVM-native production default) on the two sketch probes that
evaluate a hash per FACT row — bloom_prune and cms_sketch.

Round-2 verdict item 7: md5 was the only hash; at 20M probed rows the
md5→hex→conv decode dominated the whole prune. The package default is now
xxhash64 with md5 kept opt-in for DuckDB-oracle parity (the driver
queries pin hash_fn="md5" explicitly). This harness records the gap.

Usage:  SPARK_GRAFT_CPUS=32 python bench/hashfn_scale.py [n_facts]
Prints one JSON line.
"""

from __future__ import annotations

import json
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from pyspark.sql import functions as F  # noqa: E402

from logpipe_spark.operators import skew as skw  # noqa: E402
from logpipe_spark.plans.bloom import bloom_prune  # noqa: E402
from logpipe_spark.session import build_session  # noqa: E402

N = int(sys.argv[1]) if len(sys.argv) > 1 else 20_000_000
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))


def t(fn) -> float:
    t0 = time.perf_counter()
    fn()
    return round(time.perf_counter() - t0, 2)


def main() -> None:
    spark = build_session(app_name="hashfn_scale", cpus=CPUS,
                          shuffle_partitions=2 * CPUS)
    fact = (
        spark.range(N).repartition(2 * CPUS)
        .select(F.pmod(F.col("id") * 2654435761, F.lit(N // 4))
                .alias("key"))
        .localCheckpoint(eager=True)
    )
    dim = (
        spark.range(N // 100)
        .select((F.col("id") * 7).alias("dkey"))
        .localCheckpoint(eager=True)
    )

    results: dict[str, float] = {}
    for hash_fn in ("xxhash64", "md5"):
        # warm the plan shape once, then best-of-2 (shared-host noise)
        bl = lambda: bloom_prune(fact, dim, "key", "dkey",  # noqa: E731
                                 m_bits=1 << 20, k=3,
                                 hash_fn=hash_fn).count()
        cm = lambda: skw.cms_sketch(fact, "key", depth=3, width=1024,  # noqa: E731
                                    hash_fn=hash_fn).count()
        bl()
        cm()
        results[f"bloom_{hash_fn}_s"] = min(t(bl), t(bl))
        results[f"cms_{hash_fn}_s"] = min(t(cm), t(cm))

    out = {
        "metric": "sketch probe hash cost, md5 vs xxhash64",
        "n_facts": N,
        **results,
        "bloom_speedup": round(
            results["bloom_md5_s"] / results["bloom_xxhash64_s"], 2),
        "cms_speedup": round(
            results["cms_md5_s"] / results["cms_xxhash64_s"], 2),
        "cpus": CPUS,
    }
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
