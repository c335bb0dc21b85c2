"""Scale check for the session-4 text/conv ops: span_corruption_plan
(position explode + md5 coin + interval merge), readability (explode +
regexp_count) and turn_taking (one lag window per conv) at N and 2N
synthetic docs/turns. Hash-derived, no RNG.

Usage:  SPARK_GRAFT_CPUS=32 python bench/textops_scale.py [n_docs]
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

from logpipe_spark.operators.spans import turn_taking  # noqa: E402
from logpipe_spark.session import build_session  # noqa: E402
from logpipe_spark.trainprep.curate import span_corruption_plan  # noqa: E402
from logpipe_spark.trainprep.textqual import readability  # noqa: E402

N = int(sys.argv[1]) if len(sys.argv) > 1 else 500_000
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
SRC = "/dev/shm/textops_scale"
WORDS = ("the quick brown fox jumps over lazy dogs while seven "
         "banana engines replay ordered folds under spark").split()


def gen(spark, n, path):
    # ~60-word docs from a fixed vocab; doc_id-derived, deterministic
    w = F.array(*[F.lit(x) for x in WORDS])
    (spark.range(n)
     .select(
         F.col("id").alias("doc_id"),
         F.concat(F.lit("src_"),
                  F.pmod(F.hash(F.col("id") * 7), F.lit(6)).cast("string"))
         .alias("source"),
         F.array_join(
             F.transform(
                 F.sequence(F.lit(1), F.lit(60)),
                 lambda i: F.element_at(
                     w, (F.pmod(F.hash(F.col("id") * 31 + i), F.lit(16))
                         + 1).cast("int"))),
             " ").alias("text"),
         F.concat(F.lit("conv-"),
                  F.pmod(F.hash(F.col("id") * 13), F.lit(n // 20 or 1))
                  .cast("string")).alias("conv_id"),
         F.pmod(F.col("id"), F.lit(1000)).cast("int").alias("turn_idx"),
         F.element_at(
             F.array(F.lit("user"), F.lit("assistant"), F.lit("tool")),
             (F.pmod(F.hash(F.col("id") * 17), F.lit(3)) + 1).cast("int"))
         .alias("role"),
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
    docs = spark.read.parquet(path)
    ops = {
        "span_corruption": lambda: noop(span_corruption_plan(docs)),
        "readability": lambda: noop(readability(docs)),
        "turn_taking": lambda: noop(turn_taking(docs)),
    }
    out = {}
    for name, fn in ops.items():
        fn()
        out[name] = min(t(fn), t(fn))
        print(f"# {name}: {out[name]}s", file=sys.stderr, flush=True)
    return out


def main() -> None:
    spark = build_session(app_name="textops_scale", cpus=CPUS,
                          shuffle_partitions=2 * CPUS)
    timings = {}
    for tag, n in {"n": N, "2n": 2 * N}.items():
        path = f"{SRC}_{tag}"
        gen(spark, n, path)
        print(f"# --- {tag} = {n} docs ---", file=sys.stderr, flush=True)
        timings[tag] = run_suite(spark, path)
        shutil.rmtree(path, ignore_errors=True)
    ratios = {k: round(timings["2n"][k] / max(timings["n"][k], 1e-9), 2)
              for k in timings["n"]}
    print(json.dumps({
        "metric": "session-4 text/conv ops at N vs 2N docs (2.0 = linear)",
        "cpus": CPUS, "n": N,
        "sec_at_n": timings["n"], "sec_at_2n": timings["2n"],
        "wall_ratio_2n_over_n": ratios, "unit": "sec",
        "value": round(sum(timings["2n"].values()), 2),
    }))
    spark.stop()


if __name__ == "__main__":
    main()
