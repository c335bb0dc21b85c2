"""Versioned-CDC scale evidence: upsert + changelog cost ∝ TOUCHED
buckets (the delta), not table size.

Builds a keyed table of N rows at 64 buckets, then measures
(a) a small upsert (0.1% of keys → few buckets touched),
(b) read_changes for that version step,
(c) the naive alternative — full-outer snapshot_diff of the two
    complete snapshots — which scans the whole table twice.

Claim checked: (a)+(b) stay flat as N grows; (c) grows with N.
Prints one JSON line.

Usage:  SPARK_GRAFT_CPUS=32 python bench/cdc_scale.py [n_rows]
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

from logpipe_spark.operators.diff import snapshot_diff  # noqa: E402
from logpipe_spark.plans import cdc  # noqa: E402
from logpipe_spark.session import build_session  # noqa: E402

N = int(sys.argv[1]) if len(sys.argv) > 1 else 5_000_000
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
BASE = "/dev/shm/cdc_scale"


def synth(spark, n, bump=0):
    return (spark.range(n).repartition(2 * CPUS)
            .select(F.col("id").alias("k"),
                    (F.col("id") * 3 + bump).alias("v"),
                    F.concat(F.lit("row-"), F.col("id")).alias("payload")))


def t(fn) -> float:
    t0 = time.perf_counter()
    fn()
    return round(time.perf_counter() - t0, 2)


def main() -> None:
    spark = build_session(app_name="cdc_scale", cpus=CPUS,
                          shuffle_partitions=2 * CPUS)
    out = {"metric": "versioned CDC delta-proportional cost", "cpus": CPUS}
    for tag, n in (("1x", N), ("2x", 2 * N)):
        p = f"{BASE}/{tag}"
        shutil.rmtree(p, ignore_errors=True)
        load_s = t(lambda: cdc.write_versioned(
            spark, synth(spark, n), p, "k", n_buckets=64))
        # delta confined to TWO of the 64 buckets (hash-aligned with the
        # table layout) — the case manifest pruning exists for
        delta = synth(spark, n, bump=1).where(
            (F.col("k") % 1000 == 7)
            & F.pmod(F.hash(F.col("k")), F.lit(64)).isin(3, 7)
        ).localCheckpoint(eager=True)
        upsert_s = t(lambda: cdc.upsert_versioned(spark, p, delta, "k"))
        changes_s = t(lambda: cdc.read_changes(spark, p, 0, 1).count())
        naive_s = t(lambda: snapshot_diff(
            cdc.read_snapshot(spark, p, 0).drop("_bucket"),
            cdc.read_snapshot(spark, p, 1).drop("_bucket"),
            ["k"]).count())
        out.update({f"load_{tag}_s": load_s, f"upsert_{tag}_s": upsert_s,
                    f"changes_{tag}_s": changes_s,
                    f"naive_diff_{tag}_s": naive_s,
                    f"n_{tag}": n, f"delta_{tag}": delta.count()})
        shutil.rmtree(p, ignore_errors=True)
    out["changes_ratio_2x"] = round(
        out["changes_2x_s"] / out["changes_1x_s"], 2)
    out["naive_ratio_2x"] = round(
        out["naive_diff_2x_s"] / out["naive_diff_1x_s"], 2)
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
