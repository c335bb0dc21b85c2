"""Incremental postings-index scale evidence: merge cost ∝ delta
tokenize + touched-bucket vocabulary, never a corpus re-read.

The production retrieval shape at 10^12 turns (trainprep/index.py:
write_postings_index / append_postings_index): the corpus is indexed
once; each new shard computes its own (word, df, capped-postings)
partial and merges it into the bucket-partitioned index. The naive
alternative re-tokenizes corpus ∪ delta on every shard. This harness
measures, on one synthetic corpus:

  - batch:    build_postings over corpus ∪ delta (the naive rerun)
  - incr(D):  append_postings_index of a delta of D docs
  - incr(2D): append of 2D docs

Claims checked: incr ≪ batch (corpus-size independence of the merge),
and the merged read equals the batch build on a sampled vocabulary
(the full equality is the driver gate's job; here we sample to keep the
harness cheap). Prints one JSON line.

Usage:  SPARK_GRAFT_CPUS=32 python bench/incr_postings.py [n_corpus_docs]
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
from logpipe_spark.trainprep.index import (  # noqa: E402
    append_postings_index, build_postings, read_postings,
    write_postings_index)

N = int(sys.argv[1]) if len(sys.argv) > 1 else 400_000
DELTA = N // 16
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
BASE = "/dev/shm/incr_postings"


def synth_docs(spark, lo: int, hi: int):
    """Deterministic word-soup docs in id range [lo, hi): 24 words per
    doc from an 8k-word vocabulary (natural-language-ish df skew via
    the pmod hash)."""
    words = ("transform(sequence(1, 24), "
             "i -> concat('w', pmod(hash(id * 31 + i), 8000)))")
    return (
        spark.range(lo, hi)
        .withColumn("text", F.expr(f"concat_ws(' ', {words})"))
        .select(F.col("id").alias("doc_id"), "text")
    )


def t(fn) -> float:
    t0 = time.perf_counter()
    fn()
    return round(time.perf_counter() - t0, 2)


def main() -> None:
    spark = build_session(app_name="incr_postings", cpus=CPUS,
                          shuffle_partitions=2 * CPUS)
    shutil.rmtree(BASE, ignore_errors=True)
    corpus_p, idx_p = f"{BASE}/corpus", f"{BASE}/index"
    synth_docs(spark, 0, N).repartition(2 * CPUS) \
        .write.mode("overwrite").parquet(corpus_p)
    corpus = spark.read.parquet(corpus_p)

    index_s = t(lambda: write_postings_index(spark, corpus, idx_p,
                                             n_buckets=64))

    def run_incr(lo: int, hi: int) -> float:
        spark.catalog.clearCache()
        delta = synth_docs(spark, lo, hi).localCheckpoint(eager=True)
        return t(lambda: append_postings_index(spark, delta, idx_p,
                                               n_buckets=64))

    # warm the plan shapes (JIT/codegen) on a throwaway copy
    warm_p = f"{BASE}/warm"
    shutil.copytree(idx_p, warm_p)
    spark.catalog.clearCache()
    t(lambda: append_postings_index(
        spark, synth_docs(spark, N, N + DELTA // 4)
        .localCheckpoint(eager=True), warm_p, n_buckets=64))

    incr_1 = run_incr(N, N + DELTA)
    incr_2 = run_incr(N + DELTA, N + 3 * DELTA)

    spark.catalog.clearCache()
    both = corpus.unionByName(synth_docs(spark, N, N + 3 * DELTA))
    batch_s = t(lambda: build_postings(both).count())
    batch_s = min(batch_s, t(lambda: build_postings(both).count()))

    # sampled equality: merged index rows == batch build rows for a 1/64
    # vocabulary slice (full equality is the driver gate)
    merged = read_postings(spark, idx_p).where(
        F.pmod(F.hash("word"), F.lit(64)) == 0)
    batch = build_postings(both).select(
        "word", "df",
        F.col("postings")).where(F.pmod(F.hash("word"), F.lit(64)) == 0)
    n_diff = (merged.exceptAll(batch).count()
              + batch.exceptAll(merged).count())

    out = {
        "metric": "incremental postings merge cost vs batch rebuild",
        "n_corpus": N,
        "delta": DELTA,
        "index_build_s": index_s,
        "incr_1x_s": incr_1,
        "incr_2x_s": incr_2,
        "batch_rebuild_s": batch_s,
        "sampled_vocab_diff_rows": n_diff,
        "cpus": CPUS,
    }
    shutil.rmtree(BASE, ignore_errors=True)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
