"""Scale check for the round-4 continuation user-lifecycle ops —
hazard_curve, new_vs_returning, cohort_ltv, golden_record,
forecast_accuracy, mann_kendall — at N and 2N synthetic event rows
(hash-derived, no RNG). The structural claim under test: every op
reduces the corpus in ONE map-side-combinable pass to a frame keyed by
(user), (user, day), or (key, day) — so doubling rows roughly doubles
the scan and leaves the downstream (day-/cohort-cardinality) stages
flat.

Usage:  SPARK_GRAFT_CPUS=32 python bench/lifecycle_scale.py [n_rows]
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

from logpipe_spark.operators.drift import bucketed_cumsum, mann_kendall  # noqa: E402
from logpipe_spark.session import build_session  # noqa: E402

N = int(sys.argv[1]) if len(sys.argv) > 1 else 10_000_000
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
SRC = "/dev/shm/lifecycle_scale"
TYPES = ["view", "click", "signup", "purchase", "error"]


def gen(spark, n, path):
    h = F.hash(F.col("id"))
    type_expr = F.element_at(
        F.array(*[F.lit(t) for t in TYPES]),
        (F.pmod(F.hash(F.col("id") * 7), F.lit(5)) + 1).cast("int"))
    (spark.range(n)
     .select(
         F.col("id").alias("event_id"),
         F.pmod(h, F.lit(n // 50 or 1)).alias("user_id"),
         type_expr.alias("event_type"),
         (F.pmod(F.hash(F.col("id") * 13), F.lit(100_000)) / 100.0)
         .alias("value"),
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


def hazard(ev):
    # mirrors q_hazard_curve over the synthetic frame
    tsec = F.col("ts").cast("long")
    e = ev.select("user_id", "event_type", tsec.alias("t"))
    su = (e.where(F.col("event_type") == "signup")
          .groupBy("user_id").agg(F.min("t").alias("t0")))
    pu = (e.where(F.col("event_type") == "purchase")
          .select("user_id", F.col("t").alias("_tp")))
    conv = (pu.join(su, "user_id").where(F.col("_tp") >= F.col("t0"))
            .groupBy("user_id").agg(F.min("_tp").alias("tp")))
    tmax = e.agg(F.max("t").cast("bigint").alias("_tmax"))
    users = su.join(conv, "user_id", "left").crossJoin(F.broadcast(tmax))
    day = (F.when(F.col("tp").isNotNull(), F.expr("(tp - t0) div 86400"))
           .otherwise(F.expr("(_tmax - t0) div 86400")))
    base = users.select(day.cast("bigint").alias("day_off"),
                        F.when(F.col("tp").isNotNull(), 1).otherwise(0)
                        .alias("evf"))
    counts = (base.groupBy("day_off").agg(
        F.sum("evf").cast("bigint").alias("d"),
        F.sum(F.lit(1) - F.col("evf")).cast("bigint").alias("c"))
        .withColumn("w", F.col("d") + F.col("c")))
    cum = bucketed_cumsum(counts.withColumn("_all", F.lit(1)), "_all",
                          ["w"], value_col="day_off", bucket_width=32)
    tot = counts.agg(F.sum("w").cast("bigint").alias("_tot"))
    j = cum.crossJoin(F.broadcast(tot))
    return j.select("day_off",
                    (F.col("_tot") - (F.col("cum_w") - F.col("w")))
                    .alias("n_risk"), "d", "c")


def new_vs_returning(ev):
    du = ev.select("user_id", F.to_date("ts").alias("day")).distinct()
    first = du.groupBy("user_id").agg(F.min("day").alias("fd"))
    j = du.join(first, "user_id")
    return j.groupBy("day").agg(
        F.count(F.lit(1)).alias("n_active"),
        F.sum(F.when(F.col("day") == F.col("fd"), 1).otherwise(0))
        .alias("n_new"))


def cohort_ltv(ev):
    from pyspark.sql import Window
    wk = F.weekofyear(F.col("ts")).cast("int")
    first = ev.groupBy("user_id").agg(F.min(wk).alias("cw"))
    size = first.groupBy("cw").agg(F.count(F.lit(1)).alias("sz"))
    rev = (ev.select("user_id", wk.alias("aw"),
                     F.floor(F.col("value") * 100 + F.lit(0.5))
                     .cast("bigint").alias("vc"))
           .join(first, "user_id")
           .groupBy("cw", (F.col("aw") - F.col("cw")).alias("age"))
           .agg(F.sum("vc").alias("rev_c")))
    w = (Window.partitionBy("cw").orderBy("age")
         .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    return (rev.withColumn("cum_c", F.sum("rev_c").over(w))
            .join(size, "cw"))


def golden(ev):
    e = ev.select("user_id", "event_type", "event_id",
                  F.col("ts").cast("long").alias("t"),
                  F.floor(F.col("value") * 100 + F.lit(0.5))
                  .cast("bigint").alias("vc"))
    life = e.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n"),
        F.min("t").alias("first_s"), F.max("t").alias("last_s"),
        F.countDistinct("event_type").alias("n_types"))
    latest = e.groupBy("user_id").agg(
        F.max(F.struct("t", "event_id", "vc")).alias("m"))
    return life.join(latest, "user_id", "left")


def forecast(ev):
    from pyspark.sql import Window
    daily = (ev.select("event_type", F.to_date("ts").alias("day"),
                       F.floor(F.col("value") * 100 + F.lit(0.5))
                       .cast("bigint").alias("vc"))
             .groupBy("event_type", "day").agg(F.sum("vc").alias("v")))
    w = Window.partitionBy("event_type").orderBy("day")
    d = (daily.withColumn("e1", F.abs(F.col("v") - F.lag("v", 1).over(w)))
         .withColumn("e7", F.abs(F.col("v") - F.lag("v", 7).over(w))))
    return d.groupBy("event_type").agg(
        F.count("e1").alias("n1"), F.sum("e1").alias("s1"),
        F.count("e7").alias("n7"), F.sum("e7").alias("s7"))


def run_suite(spark, path):
    ev = spark.read.parquet(path)
    daily = (ev.select("event_type", F.to_date("ts").alias("day"),
                       F.floor(F.col("value") * 100 + F.lit(0.5))
                       .cast("bigint").alias("vc"))
             .groupBy("event_type", "day").agg(F.sum("vc").alias("v")))
    ops = {
        "hazard_curve": lambda: noop(hazard(ev)),
        "new_vs_returning": lambda: noop(new_vs_returning(ev)),
        "cohort_ltv": lambda: noop(cohort_ltv(ev)),
        "golden_record": lambda: noop(golden(ev)),
        "forecast_accuracy": lambda: noop(forecast(ev)),
        "mann_kendall": lambda: noop(mann_kendall(
            daily, "event_type", F.col("v"), F.col("day"))),
    }
    out = {}
    for name, fn in ops.items():
        fn()  # warmup: JIT/codegen per plan shape
        out[name] = min(t(fn), t(fn))
        print(f"# {name}: {out[name]}s", file=sys.stderr, flush=True)
    return out


def main() -> None:
    spark = build_session(app_name="lifecycle_scale", cpus=CPUS,
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
        "metric": f"lifecycle ops at N={N} vs 2N rows (2.0 = linear)",
        "cpus": CPUS, "n": N,
        "sec_at_n": timings["n"], "sec_at_2n": timings["2n"],
        "wall_ratio_2n_over_n": ratios,
        "value": round(sum(timings["2n"].values()), 2), "unit": "sec",
    }))
    spark.stop()


if __name__ == "__main__":
    main()
