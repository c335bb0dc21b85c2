"""Dedup-chain scale evidence: jaccard pairs → star CC → keep-list at
500k–1M synthetic documents (the sizes sf0.1's 5k docs can't speak to).

The chain under test is exactly the driver's `dedup_keep_list` shape
(`__spark_entry__.q_dedup_keep_list`): word-TRIGRAM shingles (the
BENCH.md width lesson — bigrams over a small vocabulary make every pair
collide), `ngram_jaccard_pairs` with the `max_df` stop-shingle cap (the
100 TB path), `dup_clusters` with the default large-star/small-star CC,
then the per-cluster quality argmax. Claims checked:

  - wall(N) / wall(N/2) ≈ 2 (near-linear in corpus size), and
  - CC rounds stay O(log n): rounds(N) ≤ rounds(N/2) + 1.

The corpus is the incr_dedup generator's word-soup (every 10th doc is a
near-copy of its predecessor, so near-dup pairs ∝ N and clusters are
small cliques — the realistic near-dup graph shape). Docs are written
to /dev/shm parquet first so the chain reads a real multi-file scan,
not an in-memory range.

Prints one JSON line. Usage:

    SPARK_GRAFT_CPUS=32 python bench/dedup_chain_scale.py [n_docs]
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from pyspark.sql import Window  # noqa: E402
from pyspark.sql import functions as F  # noqa: E402

from logpipe_spark.session import build_session  # noqa: E402
from logpipe_spark.trainprep import curate as cur  # noqa: E402
from logpipe_spark.trainprep import dedup as dd  # noqa: E402
from logpipe_spark.trainprep import textqual as tq  # noqa: E402

N = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
BASE = "/dev/shm/dedup_chain"
MAX_DF = 64


def synth_docs(spark, n: int):
    """Deterministic word-soup docs (see bench/incr_dedup.py): 24 words
    from an 800-word vocabulary; every 10th doc near-copies doc id-1
    (disjoint near-dup PAIRS — the common case), and every 10000-block's
    first 64 docs form a sliding-window CHAIN (stride 11 over a shared
    word stream: consecutive docs share 13 words → 11 trigrams →
    jaccard 0.33; distance ≥ 2 shares < 3 words → no trigram), the
    path-shaped component that makes CC round count non-trivial —
    star CC must halve a 64-hop diameter, not collapse a clique."""
    chain = (
        "concat_ws(' ', transform(sequence(0, 23), i -> concat("
        "'c', cast(id - id % 10000 AS string), '_', "
        "cast((id % 10000) * 11 + i AS string))))")
    base_id = "CASE WHEN id % 10 = 0 AND id > 0 THEN id - 1 ELSE id END"
    words = (f"concat_ws(' ', transform(sequence(1, 24), "
             f"i -> concat('w', pmod(hash(({base_id}) * 31 + i), 800))))")
    soup = (f"CASE WHEN id % 10 = 0 THEN concat({words}, ' w', "
            f"pmod(id, 97)) ELSE {words} END")
    return (
        spark.range(0, n)
        .select(F.col("id").alias("doc_id"),
                F.expr(f"CASE WHEN id % 10000 < 64 THEN {chain} "
                       f"ELSE {soup} END").alias("text"))
    )


def keep_list(docs, clusters):
    """The q_dedup_keep_list argmax: canonical doc per cluster by quality
    (cluster-partitioned window — near-dup cliques are tiny, so the rank
    frame never funnels)."""
    qual = tq.quality_score(docs).select("doc_id", "quality")
    j = clusters.join(qual, "doc_id")
    w = Window.partitionBy("cluster_id").orderBy(
        F.col("quality").desc(), "doc_id")
    wn = Window.partitionBy("cluster_id")
    r = j.select(
        "cluster_id", "doc_id", "quality",
        F.row_number().over(w).alias("_rn"),
        F.count(F.lit(1)).over(wn).alias("_n"),
    )
    return r.where(F.col("_rn") == 1)


def run_chain(spark, path: str) -> dict:
    docs = spark.read.parquet(path)
    t0 = time.perf_counter()
    pairs = dd.ngram_jaccard_pairs(docs, k=3, max_df=MAX_DF)
    pairs = pairs.localCheckpoint(eager=True)  # pair-sized; chain fan-out
    t_pairs = time.perf_counter() - t0

    stats: dict = {}
    t1 = time.perf_counter()
    comp = cur.connected_components_star(pairs, stats=stats)
    clusters = (
        docs.join(comp, docs.doc_id == comp.node, "left")
        .select("doc_id",
                F.coalesce("component", "doc_id").alias("cluster_id"))
        .localCheckpoint(eager=True)
    )
    t_cc = time.perf_counter() - t1

    t2 = time.perf_counter()
    kept = keep_list(docs, clusters)
    n_kept = kept.count()
    t_keep = time.perf_counter() - t2

    return {
        "wall_s": round(time.perf_counter() - t0, 2),
        "pairs_s": round(t_pairs, 2),
        "cc_s": round(t_cc, 2),
        "keep_s": round(t_keep, 2),
        "n_pairs": pairs.count(),
        "cc_rounds": stats.get("rounds"),
        "n_kept": n_kept,
    }


def main() -> None:
    spark = build_session(app_name="dedup-chain-scale", cpus=CPUS)
    shutil.rmtree(BASE, ignore_errors=True)
    try:
        # materialize both corpora (repartition: an under-split scan runs
        # every downstream expression single-core, CLAUDE.md lesson)
        sizes = {"half": N // 2, "full": N}
        for name, n in sizes.items():
            (synth_docs(spark, n).repartition(CPUS)
             .write.mode("overwrite").parquet(f"{BASE}/{name}"))
        # warm up every plan shape once at a small size (JIT/codegen)
        (synth_docs(spark, 20_000).repartition(CPUS)
         .write.mode("overwrite").parquet(f"{BASE}/warm"))
        run_chain(spark, f"{BASE}/warm")

        runs = {}
        for name, n in sizes.items():
            r = run_chain(spark, f"{BASE}/{name}")
            r["n_docs"] = n
            runs[name] = r
            print(f"# {name}: {r}", file=sys.stderr)

        ratio = runs["full"]["wall_s"] / max(runs["half"]["wall_s"], 1e-9)
        print(json.dumps({
            "metric": "dedup_chain_wall_ratio_2x_docs",
            "value": round(ratio, 3),
            "unit": "x (2.0 = perfectly linear)",
            "n_docs": N,
            "max_df": MAX_DF,
            "runs": runs,
            "cpus": CPUS,
            "loadavg": os.getloadavg()[0],
        }))
    finally:
        shutil.rmtree(BASE, ignore_errors=True)
        spark.stop()


if __name__ == "__main__":
    main()
