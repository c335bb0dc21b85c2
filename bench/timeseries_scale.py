"""Scale robustness for the time-series operators: 20M synthetic events.

Generates a deterministic 20M-row events corpus (100k users, 30-day span)
to /dev/shm parquet (repartitioned by user_id — see CLAUDE.md AQE note),
then times asof_join, sessionize, time_rollup and cms_sketch end-to-end
through noop sinks. Prints one JSON line. Usage:

    SPARK_GRAFT_CPUS=32 python bench/timeseries_scale.py [n_rows]
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

from logpipe_spark.operators.aggregate import time_rollup  # noqa: E402
from logpipe_spark.operators.asof import asof_join  # noqa: E402
from logpipe_spark.operators.gapfill import (  # noqa: E402
    time_gapfill_locf,
    time_weighted_avg,
)
from logpipe_spark.operators.skew import cms_sketch  # noqa: E402
from logpipe_spark.operators.spans import sessionize  # noqa: E402
from logpipe_spark.session import build_session  # noqa: E402

N = int(sys.argv[1]) if len(sys.argv) > 1 else 20_000_000
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
SRC = "/dev/shm/ts_scale_events"

TYPES = ["click", "error", "view", "purchase", "signup"]


def gen(spark):
    base = 1_704_067_200  # 2024-01-01
    df = (
        spark.range(N)
        .select(
            F.col("id").alias("event_id"),
            F.pmod(F.hash(F.col("id")), F.lit(100_000)).alias("user_id"),
            F.timestamp_seconds(
                F.lit(base) + F.pmod(F.hash(F.col("id") + 1), F.lit(30 * 86400))
            ).alias("ts"),
            F.element_at(
                F.array(*[F.lit(t) for t in TYPES]),
                (F.pmod(F.hash(F.col("id") + 2), F.lit(5)) + 1).cast("int"),
            ).alias("event_type"),
            (F.pmod(F.hash(F.col("id") + 3), F.lit(100_000)) / F.lit(100.0)).alias("value"),
        )
    )
    df.repartition(2 * CPUS, "user_id").write.mode("overwrite").parquet(SRC)


def t(fn) -> float:
    t0 = time.perf_counter()
    fn()
    return round(time.perf_counter() - t0, 2)


def main() -> None:
    spark = build_session(app_name="ts_scale", cpus=CPUS,
                          shuffle_partitions=2 * CPUS)
    gen_s = t(lambda: gen(spark))
    ev = spark.read.parquet(SRC)

    def noop(df):
        df.write.format("noop").mode("overwrite").save()

    clicks = ev.filter(F.col("event_type") == "click").select("user_id", "event_id", "ts")
    errors = ev.filter(F.col("event_type") == "error").select("user_id", "event_id", "ts")

    timings = {}
    # warm each plan shape once (JIT/codegen), then best-of-2 timed passes
    for name, fn in [
        ("asof_join", lambda: noop(asof_join(clicks, errors, on=["user_id"],
                                             ts="ts", right_cols=["event_id"]))),
        ("sessionize", lambda: noop(sessionize(ev, "user_id", "ts",
                                               gap_seconds=3600,
                                               tiebreak="event_id"))),
        ("time_rollup", lambda: noop(time_rollup(ev, "ts", ["event_type"],
                                                 "value"))),
        ("cms_sketch", lambda: noop(cms_sketch(ev, "user_id", depth=3,
                                               width=4096))),
        # gapfill output ≈ users × span-hours (~72M grid rows at 100k
        # users / 30 days) regardless of N — stresses the grid generate +
        # locf window, not the scan
        ("gapfill_locf", lambda: noop(time_gapfill_locf(
            ev, "ts", ["user_id"], "value", 3600))),
        ("time_weighted_avg", lambda: noop(time_weighted_avg(
            ev, "ts", ["user_id"], "value"))),
    ]:
        fn()  # warmup (JIT/codegen)
        timings[name] = min(t(fn), t(fn))
        print(f"# {name}: {timings[name]}s", file=sys.stderr, flush=True)

    total = round(sum(timings.values()), 2)
    print(json.dumps({
        "metric": f"time-series operators end-to-end at {N} events",
        "n_rows": N, "cpus": CPUS, "gen_s": gen_s,
        "queries": timings, "value": total, "unit": "sec",
        "rows_per_sec_asof": int((2 * N / 5) / timings["asof_join"]),
        "rows_per_sec_sessionize": int(N / timings["sessionize"]),
    }))
    shutil.rmtree(SRC, ignore_errors=True)
    spark.stop()


if __name__ == "__main__":
    main()
