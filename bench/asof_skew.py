"""Hot-key skew demo: plain vs segmented as-of join.

Corpus: N events, 100k users, except HALF of all rows belong to ONE user
(the 10^12-turn "hot conversation" case). The plain union+window funnels
that user's rows through one task; the segmented form splits them across
time segments. Prints one JSON line with both timings and the speedup.

    SPARK_GRAFT_CPUS=32 python bench/asof_skew.py [n_rows]
"""

from __future__ import annotations

import json
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from pyspark.sql import functions as F  # noqa: E402

from logpipe_spark.operators.asof import asof_join, asof_join_segmented  # noqa: E402
from logpipe_spark.session import build_session  # noqa: E402

N = int(sys.argv[1]) if len(sys.argv) > 1 else 10_000_000
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
SRC = "/dev/shm/asof_skew_events"


def main() -> None:
    import shutil

    spark = build_session(app_name="asof_skew", cpus=CPUS,
                          shuffle_partitions=2 * CPUS)
    base = 1_704_067_200
    (
        spark.range(N)
        .select(
            F.col("id").alias("event_id"),
            # half the rows hash to user 7, the rest spread over 100k users
            F.when(F.col("id") % 2 == 0, F.lit(7))
            .otherwise(F.pmod(F.hash(F.col("id")), F.lit(100_000)))
            .alias("user_id"),
            F.timestamp_seconds(
                F.lit(base) + F.pmod(F.hash(F.col("id") + 1), F.lit(30 * 86400))
            ).alias("ts"),
            (F.pmod(F.col("id"), F.lit(2)) == 0).alias("is_left"),
        )
        .repartition(2 * CPUS)
        .write.mode("overwrite").parquet(SRC)
    )
    ev = spark.read.parquet(SRC)
    lhs = ev.filter(F.col("is_left")).select("user_id", "event_id", "ts")
    rhs = ev.filter(~F.col("is_left")).select("user_id", "event_id", "ts")

    def run(fn):
        def go():
            fn().write.format("noop").mode("overwrite").save()
        go()  # warmup
        t0 = time.perf_counter(); go(); a = time.perf_counter() - t0
        t0 = time.perf_counter(); go(); b = time.perf_counter() - t0
        return round(min(a, b), 2)

    kw = dict(on=["user_id"], ts="ts", right_cols=["event_id"],
              tiebreak="event_id")
    plain_s = run(lambda: asof_join(lhs, rhs, **kw))
    seg_s = run(lambda: asof_join_segmented(lhs, rhs, segment_seconds=3600, **kw))
    print(json.dumps({
        "metric": "as-of join under hot-key skew (one key = 50% of rows)",
        "n_rows": N, "cpus": CPUS,
        "plain_s": plain_s, "segmented_s": seg_s,
        "speedup": round(plain_s / seg_s, 2) if seg_s else None,
        "unit": "sec",
    }))
    shutil.rmtree(SRC, ignore_errors=True)
    spark.stop()


if __name__ == "__main__":
    main()
