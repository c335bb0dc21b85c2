"""Scale evidence for the round-3 operators: dup_spans (position-level
substring dedup), chunk_documents, quantile_sketch (+merge), slo_burn.

Synthetic word-soup corpus at N docs (~24 words each) / N event rows,
run at N and 2N to show near-linear growth. Prints one JSON line.

Usage:  SPARK_GRAFT_CPUS=32 python bench/round3_scale.py [n_docs]
"""

from __future__ import annotations

import json
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from pyspark.sql import functions as F  # noqa: E402

from logpipe_spark.operators import aggregate as agg  # noqa: E402
from logpipe_spark.session import build_session  # noqa: E402
from logpipe_spark.trainprep import dedup as dd  # noqa: E402
from logpipe_spark.trainprep.curate import chunk_documents  # noqa: E402

N = int(sys.argv[1]) if len(sys.argv) > 1 else 2_000_000
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))


def synth_docs(spark, n):
    words = ("transform(sequence(1, 24), "
             "i -> concat('w', pmod(hash(id * 31 + i), 50000)))")
    return (spark.range(n).repartition(2 * CPUS)
            .select(F.col("id").alias("doc_id"),
                    F.expr(f"concat_ws(' ', {words})").alias("text"))
            .localCheckpoint(eager=True))


def synth_events(spark, n):
    return (spark.range(n).repartition(2 * CPUS)
            .select(F.col("id").alias("event_id"),
                    (F.col("id") % 600).cast("string").alias("event_type"),
                    (F.pmod(F.col("id") * 2654435761, F.lit(100000)) / 100.0)
                    .alias("value"))
            .localCheckpoint(eager=True))


def t(fn) -> float:
    t0 = time.perf_counter()
    fn()
    return round(time.perf_counter() - t0, 2)


def main() -> None:
    spark = build_session(app_name="round3_scale", cpus=CPUS,
                          shuffle_partitions=2 * CPUS)
    out = {"metric": "round-3 operator scale (N vs 2N)", "n": N,
           "cpus": CPUS}
    for tag, n in (("1x", N), ("2x", 2 * N)):
        docs = synth_docs(spark, n)
        ev = synth_events(spark, n)
        runs = {
            "dup_spans": lambda: dd.dup_spans(docs, k=3).agg(
                F.sum("covered_tokens")).collect(),
            "chunk_documents": lambda: chunk_documents(docs).agg(
                F.count(F.lit(1)), F.max("n_chunk_words")).collect(),
            "quantile_sketch": lambda: agg.quantile_sketch_estimate(
                agg.quantile_sketch(ev, "event_type", "value", "event_id"),
                "event_type").agg(F.max("p99")).collect(),
            "slo_burn": lambda: agg.slo_burn(
                ev.select((F.col("event_id") * 60).cast("timestamp")
                          .alias("ts"),
                          (200 + (F.col("event_id") % 400)).cast("int")
                          .alias("status")),
                "ts", "status").agg(F.max("burn_slow")).collect(),
        }
        for name, fn in runs.items():
            fn()  # warm the plan shape
            out[f"{name}_{tag}_s"] = min(t(fn), t(fn))
        docs.unpersist()
        ev.unpersist()
    for name in ("dup_spans", "chunk_documents", "quantile_sketch",
                 "slo_burn"):
        a, b = out[f"{name}_1x_s"], out[f"{name}_2x_s"]
        out[f"{name}_ratio"] = round(b / a, 2) if a else None
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
