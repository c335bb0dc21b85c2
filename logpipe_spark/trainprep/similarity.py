"""Similarity search over an embedding column (``array<float>``).

- :func:`ann_bruteforce_topk` — exact cosine top-k: broadcast the (small)
  query set against the corpus, rank with a window. At 100 TB the corpus
  side stays partitioned; only queries are broadcast, so the scan is
  embarrassingly parallel with no corpus shuffle — the window shuffles only
  (n_queries × corpus_partition) candidate rows after a per-partition
  top-k pre-prune would be added (see note in ``ann_topk`` docstring).
- :func:`ann_lsh_topk` — the scale path: sign-bit (hyperplane) LSH bucket
  on the leading dimensions restricts candidates to one bucket (≈ corpus /
  2^bits rows) before ranking.
- :func:`cosine_near_dup_pairs` — embedding near-duplicate detection,
  LSH-bucketed to avoid the all-pairs cross join.

All arithmetic is JVM-side (`zip_with` + `aggregate` folds over doubles,
left-to-right) so results are bit-identical with the DuckDB oracle's
``list_dot_product`` on ``DOUBLE[]``.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def _dvec(col: str) -> Column:
    return F.expr(f"transform({col}, x -> cast(x AS double))")


def with_unit_norm(emb: DataFrame, vec_col: str = "embedding",
                   id_col: str = "vec_id") -> DataFrame:
    """Project to (id, e double[], nrm) — norms computed once, upstream of joins."""
    d = _dvec(vec_col)
    return emb.select(
        F.col(id_col).alias("vec_id"),
        d.alias("e"),
        F.sqrt(F.expr(
            f"aggregate(transform({vec_col}, x -> cast(x AS double)), "
            f"cast(0 AS double), (acc, x) -> acc + x * x)"
        )).alias("nrm"),
    )


def _dot(a: str, b: str) -> Column:
    # left-to-right double fold == DuckDB list_dot_product on DOUBLE[]
    return F.expr(
        f"aggregate(zip_with({a}, {b}, (x, y) -> x * y), "
        f"cast(0 AS double), (acc, x) -> acc + x)"
    )


def _partition_topk(scored: DataFrame, k: int) -> DataFrame:
    """Per-partition top-k pre-prune ahead of the global ranking window.

    Runs INSIDE the scoring join's output partitions (narrow — no shuffle):
    each partition keeps only its local top-k rows per query under the SAME
    total order the final window uses (cos desc, neighbor_id asc), so the
    ranking exchange carries ≤ k × n_partitions rows per query instead of
    the whole scored corpus — the 100 TB bottleneck named in PERF.md
    §Deferred. The global top-k is a subset of the union of per-partition
    top-ks under a total order, so the final output is bit-identical (cos
    doubles round-trip exactly through Arrow).

    Memory: the running `best` frame is bounded at k rows per query seen in
    the partition, folded batch-by-batch.
    """

    def prune(it):
        best: pd.DataFrame | None = None
        for pdf in it:
            cur = pdf if best is None else pd.concat((best, pdf))
            cur = cur.sort_values(["query_id", "cos", "neighbor_id"],
                                  ascending=[True, False, True],
                                  kind="mergesort")
            best = cur.groupby("query_id", sort=False).head(k)
        if best is not None and len(best):
            yield best

    return scored.mapInPandas(prune, schema=scored.schema)


def _rank_topk(scored: DataFrame, k: int) -> DataFrame:
    """Deterministic per-query top-k: (cos desc, neighbor_id asc) tiebreak.

    Single definition shared by all ANN variants — the output contract
    (query_id, neighbor_id, rank, cos) is hash-compared against the DuckDB
    oracle, so the tiebreak must never diverge between variants.
    """
    w = Window.partitionBy("query_id").orderBy(
        F.desc("cos"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "rank", "cos")
    )


def sign_bucket(vec_col: str, bits: int = 6) -> Column:
    """Axis-aligned hyperplane LSH: concat of sign bits of the first `bits` dims."""
    parts = [
        F.when(F.expr(f"element_at({vec_col}, {i + 1})") >= 0, F.lit("1"))
        .otherwise(F.lit("0"))
        for i in range(bits)
    ]
    return F.concat(*parts)


def ann_bruteforce_topk(emb: DataFrame, k: int = 10,
                        query_mod: int = 25) -> DataFrame:
    """Exact cosine top-k for the query subset (vec_id % query_mod == 0).

    Queries are broadcast (small side); corpus is scanned in place —
    embarrassingly parallel scoring with no corpus shuffle. A per-partition
    top-k pre-prune (:func:`_partition_topk`, narrow) then cuts the ranking
    window's exchange from |corpus| rows per query down to k × n_partitions
    — the plan that survives a 10^9-row corpus. Output is identical to the
    direct window (same total order, superset-of-top-k invariant).
    """
    n = with_unit_norm(emb)
    q = n.where((F.col("vec_id") % query_mod) == 0).select(
        F.col("vec_id").alias("query_id"),
        F.col("e").alias("qe"), F.col("nrm").alias("qn"))
    c = n.select(F.col("vec_id").alias("neighbor_id"),
                 F.col("e").alias("ce"), F.col("nrm").alias("cn"))
    scored = (
        c.join(F.broadcast(q))
        .where(F.col("neighbor_id") != F.col("query_id"))
        .select(
            "query_id", "neighbor_id",
            (_dot("qe", "ce") / (F.col("qn") * F.col("cn"))).alias("cos"),
        )
    )
    return _rank_topk(_partition_topk(scored, k), k)


def ann_lsh_topk(emb: DataFrame, k: int = 5, bits: int = 6,
                 query_mod: int = 25) -> DataFrame:
    """LSH-bucketed ANN: candidates restricted to the query's sign bucket.

    The join is keyed on the bucket string → hash-partitioned equality join,
    corpus scanned once, ~corpus/2^bits candidates per query. Recall is
    traded for the 2^bits fan-in reduction (multi-probe = union over
    neighboring buckets would raise it; not needed for the bench).
    """
    n = with_unit_norm(emb).withColumn("bucket", sign_bucket("e", bits))
    q = n.where((F.col("vec_id") % query_mod) == 0).select(
        F.col("vec_id").alias("query_id"),
        F.col("e").alias("qe"), F.col("nrm").alias("qn"), "bucket")
    c = n.select(F.col("vec_id").alias("neighbor_id"),
                 F.col("e").alias("ce"), F.col("nrm").alias("cn"), "bucket")
    scored = (
        c.join(F.broadcast(q), "bucket")
        .where(F.col("neighbor_id") != F.col("query_id"))
        .select("query_id", "neighbor_id",
                (_dot("qe", "ce") / (F.col("qn") * F.col("cn"))).alias("cos"))
    )
    return _rank_topk(scored, k)


def ann_ivf_topk(emb: DataFrame, k: int = 5, query_mod: int = 25) -> DataFrame:
    """IVF-style ANN: inverted lists keyed by the `label` cluster id, a
    deterministic representative vector per list (the min-vec_id member —
    a medoid stand-in that keeps the oracle exact; k-means centroids would
    introduce cross-engine float-sum nondeterminism), probe-1 search.

    Plan shape at scale: representatives (n_clusters rows) broadcast both
    ways; the probe assignment is a per-query argmax over n_clusters tiny
    cosines; the candidate scan touches ~corpus/n_clusters rows via the
    equality join on label — the IVF fan-in reduction. Multi-probe = rank
    ≤ p in the probe window.
    """
    n = with_unit_norm(emb)
    labeled = n.join(emb.select("vec_id", "label"), "vec_id")
    reps = (
        labeled.groupBy("label").agg(F.min("vec_id").alias("rep_id"))
        .join(n.select(F.col("vec_id").alias("rep_id"),
                       F.col("e").alias("re"), F.col("nrm").alias("rn")),
              "rep_id")
    )
    q = labeled.where((F.col("vec_id") % query_mod) == 0).select(
        F.col("vec_id").alias("query_id"),
        F.col("e").alias("qe"), F.col("nrm").alias("qn"))
    probe_w = Window.partitionBy("query_id").orderBy(
        F.desc("rep_cos"), F.asc("label"))
    probes = (
        q.join(F.broadcast(reps))
        .select("query_id", "qe", "qn", "label",
                (_dot("qe", "re") / (F.col("qn") * F.col("rn")))
                .alias("rep_cos"))
        .withColumn("pr", F.row_number().over(probe_w))
        .where(F.col("pr") == 1)
        .select("query_id", "qe", "qn", "label")
    )
    cand = labeled.select(F.col("vec_id").alias("neighbor_id"),
                          F.col("e").alias("ce"), F.col("nrm").alias("cn"),
                          "label")
    scored = (
        cand.join(F.broadcast(probes), "label")
        .where(F.col("neighbor_id") != F.col("query_id"))
        .select("query_id", "neighbor_id",
                (_dot("qe", "ce") / (F.col("qn") * F.col("cn"))).alias("cos"))
    )
    return _rank_topk(scored, k)


def cosine_near_dup_pairs(emb: DataFrame, threshold: float = 0.30,
                          bits: int = 4) -> DataFrame:
    """Embedding near-dup pairs: cosine ≥ threshold within an LSH bucket.

    Bucketing turns the O(n²) cross join into per-bucket joins (AQE handles
    bucket skew). Sign-bit LSH guarantees recall only for very high
    thresholds; for the near-dup use case (θ ≥ 0.9 in production; relaxed
    here for the synthetic corpus) bucket-collision probability is
    (1 - θ_angle/π)^bits per plane — multi-probe extends recall.
    """
    n = with_unit_norm(emb).withColumn("bucket", sign_bucket("e", bits))
    a = n.select(F.col("vec_id").alias("id_a"), F.col("e").alias("ea"),
                 F.col("nrm").alias("na"), "bucket")
    b = n.select(F.col("vec_id").alias("id_b"), F.col("e").alias("eb"),
                 F.col("nrm").alias("nb"), "bucket")
    return (
        a.join(b, "bucket")
        .where(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b",
                (_dot("ea", "eb") / (F.col("na") * F.col("nb"))).alias("cos"))
        .where(F.col("cos") >= threshold)
        .select("id_a", "id_b", "cos")
    )
