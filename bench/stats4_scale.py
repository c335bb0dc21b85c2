"""Scale check for the session-5 ops: durbin_watson, kendall_tau
(capped), cross_corr, morans_i, sequence_match, yules_k, freshness_lag
at N and 2N synthetic rows (hash-derived, no RNG) — near-linear wall
growth is the pass signal, mirroring bench/stats3_scale.py.

Usage:  SPARK_GRAFT_CPUS=32 python bench/stats4_scale.py [n_rows]
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

from logpipe_spark.operators.aggregate import (  # noqa: E402
    cross_corr_from_counts,
    rate_counts,
)
from logpipe_spark.operators.drift import (  # noqa: E402
    durbin_watson,
    kendall_tau,
    kendalls_w,
    permutation_test,
)
from logpipe_spark.operators.funnel import (  # noqa: E402
    attribution_credits,
    sequence_match,
)
from logpipe_spark.operators.graph import bradley_terry  # noqa: E402
from logpipe_spark.operators.profile import freshness_lag  # noqa: E402
from logpipe_spark.operators.segment import growth_accounting  # noqa: E402
from logpipe_spark.trainprep.similarity import rbo_overlap  # noqa: E402
from logpipe_spark.operators.spans import topic_boundaries  # noqa: E402
from logpipe_spark.operators.spatial import morans_i  # noqa: E402
from logpipe_spark.session import build_session  # noqa: E402
from logpipe_spark.trainprep.textqual import (  # noqa: E402
    bigram_accuracy,
    watermark_score,
    yules_k,
)

N = int(sys.argv[1]) if len(sys.argv) > 1 else 10_000_000
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
SRC = "/dev/shm/stats4_scale"

SYMS = ("u", "a", "t", "s")


def gen(spark, n, path):
    h = F.hash(F.col("id"))
    tok = lambda m: F.concat(  # noqa: E731
        F.lit("w"), F.pmod(F.hash(F.col("id") * m), F.lit(5000)))
    (spark.range(n)
     .select(
         F.col("id").alias("row_id"),
         (F.col("id") / 20).cast("bigint").alias("conv_id"),
         F.pmod(F.col("id"), F.lit(20)).cast("int").alias("turn_idx"),
         F.pmod(h, F.lit(100_000)).cast("bigint").alias("cents"),
         F.pmod(F.hash(F.col("id") * 41), F.lit(10_000))
         .cast("bigint").alias("score"),
         (F.pmod(F.hash(F.col("id") * 29), F.lit(2)) == 0).alias("label"),
         F.concat(F.lit("s"),
                  F.pmod(F.hash(F.col("id") * 19), F.lit(12))).alias("seg"),
         F.element_at(F.array(*[F.lit(s) for s in SYMS]),
                      (F.pmod(F.hash(F.col("id") * 7), F.lit(4)) + 1)
                      .cast("int")).alias("sym"),
         (F.pmod(F.hash(F.col("id") * 11), F.lit(100_000)) / 10.0)
         .alias("x"),
         (F.pmod(F.hash(F.col("id") * 31), F.lit(100_000)) / 10.0)
         .alias("y"),
         F.concat_ws(" ", tok(3), tok(5), tok(13)).alias("text"),
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
    docs = ev.select(F.col("seg").alias("source"), "text")

    ops = {
        # one PARTITIONED lag window (n/20-conv parallelism) + a
        # combinable groupBy: the shuffle-bound baseline shape
        "durbin_watson": lambda: noop(durbin_watson(
            ev, "conv_id", "turn_idx", "cents", min_n=8)),
        # the md5 cap bounds the pairwise join at 12 x C(2000,2) pairs
        # REGARDLESS of corpus size — past the cap the wall is the scan
        "kendall_tau_capped": lambda: noop(kendall_tau(
            ev, "seg", "cents", "score", "row_id", max_rows=2000)),
        # bucket collapse is the only corpus-sized stage; the 7-lag
        # join runs on the ~720-bucket hourly frame
        "cross_corr": lambda: noop(cross_corr_from_counts(
            rate_counts(ev.where(F.col("label")), bucket_seconds=3600),
            rate_counts(ev.where(~F.col("label")), bucket_seconds=3600))),
        # corpus -> occupied 5.0-cells (bounded 2000x2000 grid here),
        # rook self-join on the cell frame only
        "morans_i": lambda: noop(morans_i(ev, cell=5.0)),
        # ordered conv fold + ONE pass of all 3 regexes on the
        # conv-cardinality frame
        "sequence_match": lambda: noop(sequence_match(ev, [
            ("uta", "u.*t.*a"), ("tt", "tt"), ("s_u", "^s.*u$")])),
        # (key, token) count shuffle, map-side combinable; DECIMAL c^2
        "yules_k": lambda: noop(yules_k(docs)),
        # per-key MIN/MAX/COUNT reduction + broadcast 1-row hwm
        "freshness_lag": lambda: noop(freshness_lag(ev, "seg")),
        # session-5 second wave: token-level and preference ops
        # (w1-partitioned model rank is the vocabulary-sized stage)
        "bigram_accuracy": lambda: noop(bigram_accuracy(docs)),
        # guarded gram projection + one (key) reduction
        "watermark_score": lambda: noop(watermark_score(docs)),
        # (conv, token) dot join between adjacent turns
        "topic_boundaries": lambda: noop(topic_boundaries(
            ev.select(F.col("conv_id"), F.col("turn_idx"), "text"))),
        # corpus-scale pair counting, then item-cardinality MM rounds
        "bradley_terry": lambda: noop(bradley_terry(
            ev.where(F.col("cents") % 7 != 0).select(
                F.concat(F.lit("i"), F.pmod(F.col("cents"), F.lit(40)))
                .alias("winner"),
                F.concat(F.lit("i"),
                         F.pmod(F.col("cents") * 3 + 1, F.lit(40)))
                .alias("loser"))
            .where(F.col("winner") != F.col("loser")))),
        # 19 md5 relabelings over the unit frame (n/100 users)
        "permutation_test": lambda: noop(permutation_test(
            ev.groupBy("row_id").agg(
                F.max("label").alias("g"),
                F.sum("cents").cast("bigint").alias("y")),
            "row_id", F.col("g"), "y")),
        # r04 verdict item 8 additions — the session-5 ops without a
        # harness. kendalls_w: three bucketed-prefix global rank scans
        # over the FULL corpus (the heaviest new shape)
        "kendalls_w": lambda: noop(kendalls_w(
            ev.select("row_id", F.col("cents").alias("r0"),
                      F.col("score").alias("r1"),
                      F.pmod(F.hash(F.col("row_id") * 53), F.lit(10_000))
                      .cast("bigint").alias("r2")),
            "row_id", ["r0", "r1", "r2"])),
        # distinct (unit, week) collapse + ONE partitioned lag/lead
        "growth_accounting": lambda: noop(growth_accounting(
            ev.select(F.pmod(F.hash(F.col("row_id") * 3),
                             F.lit(max(N // 200, 1000)))
                      .alias("unit"),
                      F.pmod(F.hash(F.col("row_id") * 23), F.lit(26))
                      .alias("week")),
            "unit", "week")),
        # user-keyed touch->conversion join + a bounded recency window
        "attribution_credits": lambda: noop(attribution_credits(
            ev.select(F.pmod(F.hash(F.col("row_id") * 3),
                             F.lit(max(N // 100, 1000)))
                      .alias("user_id"),
                      F.col("seg").alias("channel"),
                      F.unix_micros(F.col("ts")).alias("tsu"),
                      F.col("row_id").alias("event_id")),
            ev.where(F.col("label"))
            .groupBy(F.pmod(F.hash(F.col("row_id") * 3),
                            F.lit(max(N // 100, 1000)))
                     .alias("user_id"))
            .agg(F.max(F.unix_micros(F.col("ts"))).alias("conv_tsu")))),
        # bounded broadcast-depth join over n/5 top-5 rankings
        "rbo_eval": lambda: noop(rbo_overlap(
            ev.select((F.col("row_id") / 5).cast("bigint")
                      .alias("query_id"),
                      F.pmod(F.hash(F.col("row_id") * 61), F.lit(50))
                      .alias("neighbor_id"),
                      (F.pmod(F.col("row_id"), F.lit(5)) + 1)
                      .cast("int").alias("rank")),
            ev.select((F.col("row_id") / 5).cast("bigint")
                      .alias("query_id"),
                      F.pmod(F.hash(F.col("row_id") * 67), F.lit(50))
                      .alias("neighbor_id"),
                      (F.pmod(F.col("row_id"), F.lit(5)) + 1)
                      .cast("int").alias("rank")),
            k=5, p=0.9)),
    }
    out = {}
    for name, fn in ops.items():
        fn()  # warmup: JIT/codegen per plan shape
        out[name] = min(t(fn), t(fn))
        print(f"# {name}: {out[name]}s", file=sys.stderr, flush=True)
    return out


def main() -> None:
    spark = build_session(app_name="stats4_scale", cpus=CPUS,
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
        "metric": "session-5 stats/DQ ops at N vs 2N rows (2.0 = linear)",
        "cpus": CPUS, "n": N,
        "sec_n": timings["n"], "sec_2n": timings["2n"],
        "ratio_2n_over_n": ratios,
    }))
    spark.stop()


if __name__ == "__main__":
    main()
