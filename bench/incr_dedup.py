"""Incremental dedup scale evidence: delta cost ∝ delta size, not corpus.

The production dedup shape at 10^12 turns (trainprep/dedup.py:
write_band_index / dedup_incremental): the corpus is deduped once and its
MinHash band signatures persist as a hash-bucketed index; each new shard
probes that index (bucket-pruned read) + self-joins within itself, never
re-running the whole-corpus self-join. This harness measures, on one
synthetic corpus:

  - batch:        minhash_lsh_dedup over corpus ∪ delta (the naive rerun)
  - incr(D):      dedup_incremental of a delta of D docs
  - incr(2D):     dedup_incremental of a delta of 2D docs

Claims checked: incr(2D)/incr(D) ≈ 2 (delta-proportional), and both ≪
batch (corpus-size independence). Prints one JSON line.

Usage:  SPARK_GRAFT_CPUS=32 python bench/incr_dedup.py [n_corpus_docs]
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
from logpipe_spark.trainprep import dedup as dd  # noqa: E402

N = int(sys.argv[1]) if len(sys.argv) > 1 else 400_000
DELTA = N // 16
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
BASE = "/dev/shm/incr_dedup"


def synth_docs(spark, lo: int, hi: int):
    """Deterministic word-soup docs in id range [lo, hi); every 10th doc
    is a near-copy of its predecessor (one word swapped) so the dedup
    path has real work to verify."""
    base_id = (
        "CASE WHEN id % 10 = 0 AND id > 0 THEN id - 1 ELSE id END")
    words = (
        f"transform(sequence(1, 24), "
        f"i -> concat('w', pmod(hash(({base_id}) * 31 + i), 800)))"
    )
    mutate = (
        f"CASE WHEN id % 10 = 0 THEN concat(ws, ' w', pmod(id, 97)) "
        f"ELSE ws END")
    return (
        spark.range(lo, hi)
        .withColumn("ws", F.expr(f"concat_ws(' ', {words})"))
        .select(F.col("id").alias("doc_id"),
                F.expr(mutate).alias("text"))
    )


def t(fn) -> float:
    t0 = time.perf_counter()
    fn()
    return round(time.perf_counter() - t0, 2)


def main() -> None:
    spark = build_session(app_name="incr_dedup", cpus=CPUS,
                          shuffle_partitions=2 * CPUS)
    shutil.rmtree(BASE, ignore_errors=True)
    corpus_p, idx_p = f"{BASE}/corpus", f"{BASE}/index"
    synth_docs(spark, 0, N).repartition(2 * CPUS) \
        .write.mode("overwrite").parquet(corpus_p)
    corpus = spark.read.parquet(corpus_p)

    index_s = t(lambda: dd.write_band_index(spark, corpus, idx_p))

    def run_incr(lo: int, hi: int) -> tuple[float, int]:
        # independent runs: drop every persisted frame the previous
        # dedup_incremental left cached, or run N inherits run N-1's
        # blocks (and their eviction churn)
        spark.catalog.clearCache()
        delta = synth_docs(spark, lo, hi).localCheckpoint(eager=True)
        n_pairs = 0

        def go():
            nonlocal n_pairs
            n_pairs = dd.dedup_incremental(
                spark, delta, idx_p, corpus, update_index=False).count()

        return t(go), n_pairs

    # warm every plan shape once (JIT/codegen)
    run_incr(N, N + DELTA // 4)

    # best-of-2 each, alternating order — shared-host load arrives in
    # waves, and a fixed order folds the wave into one measurement
    incr_1, pairs_1 = run_incr(N, N + DELTA)
    incr_2, pairs_2 = run_incr(N, N + 2 * DELTA)
    incr_2 = min(incr_2, run_incr(N, N + 2 * DELTA)[0])
    incr_1 = min(incr_1, run_incr(N, N + DELTA)[0])

    spark.catalog.clearCache()
    both = corpus.unionByName(synth_docs(spark, N, N + DELTA))
    batch_s = t(lambda: dd.minhash_lsh_dedup(both).count())
    batch_s = min(batch_s, t(lambda: dd.minhash_lsh_dedup(both).count()))

    out = {
        "metric": "incremental dedup delta-proportional cost",
        "n_corpus": N,
        "delta": DELTA,
        "index_build_s": index_s,
        "incr_1x_s": incr_1,
        "incr_2x_s": incr_2,
        "pairs_1x": pairs_1,
        "pairs_2x": pairs_2,
        "batch_rerun_s": batch_s,
        "ratio_2x_over_1x": round(incr_2 / incr_1, 2) if incr_1 else None,
        "speedup_vs_batch": round(batch_s / incr_1, 2) if incr_1 else None,
        "cpus": CPUS,
    }
    print(json.dumps(out))
    shutil.rmtree(BASE, ignore_errors=True)
    spark.stop()


if __name__ == "__main__":
    main()
