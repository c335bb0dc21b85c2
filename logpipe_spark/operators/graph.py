"""Iterative graph algorithms over edge DataFrames.

The near-dup pair sets (``trainprep/dedup.py``) form document graphs;
``curate.dup_clusters`` runs connected components over them and
``q_triangle_count`` counts triangles. This module adds damped PageRank —
the canonical *iterative* fixed-point computation (the round brief's
"iterative algorithms" category) — in FULLY INTEGER arithmetic so that a
fixed iteration count produces bit-identical ranks in any engine and the
driver's exact value-hash gate applies to an iterative algorithm.

Scale design: each iteration is one hash join (ranks ⋈ edges on src,
broadcastable while ranks stay metadata-sized relative to edges; at web
scale both sides pre-bucket on the node id so the per-iteration exchange
is elided) plus one map-side-combinable groupBy(dst). State between
iterations is one row per node. K iterations = K such rounds — the same
plan class as the large-star/small-star CC in ``curate.py``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def pagerank_int(
    pairs: DataFrame,
    src: str = "doc_a",
    dst: str = "doc_b",
    iterations: int = 3,
    scale: int = 1_000_000,
    damping_pct: int = 85,
) -> DataFrame:
    """Damped PageRank over an UNDIRECTED pair set, integer micro-ranks.

    Update rule (per node v, all integer ops — ``div`` truncates, operands
    are positive so truncation == floor in every engine):

        rank'(v) = (100-d)% · scale + d% · Σ_{u→v} (rank(u) div deg(u))

    Symmetrizing the pairs means every node in the graph has in-degree ≥ 1,
    so the dangling-node correction never applies. Floats never appear —
    the fixed point after K iterations is exactly reproducible and the
    DuckDB oracle unrolls the same K rounds as nested CTEs.

    Returns (node, rank_micro, degree).
    """
    from pyspark import StorageLevel

    # edges and degrees feed every iteration — persist once (at web scale
    # this is the checkpointed edge table every iterative graph system
    # keeps); per-iteration persist truncates the rank lineage so iteration
    # K's plan doesn't re-run iterations 1..K-1 per consumer. The upstream
    # pair-generation pipeline (e.g. simhash LSH) is thus evaluated ONCE.
    e = pairs.select(F.col(src).alias("src"), F.col(dst).alias("dst")).union(
        pairs.select(F.col(dst).alias("src"), F.col(src).alias("dst"))
    ).persist(StorageLevel.MEMORY_AND_DISK)
    deg = e.groupBy("src").agg(
        F.count(F.lit(1)).cast("bigint").alias("deg")
    ).persist(StorageLevel.MEMORY_AND_DISK)
    ranks = deg.select(
        F.col("src").alias("node"), F.lit(scale).cast("bigint").alias("rank")
    )
    base = (100 - damping_pct) * scale // 100
    for _ in range(iterations):
        contrib = (
            e.join(ranks, e.src == ranks.node)
            .join(deg, "src")
            .select("dst", F.expr("rank div deg").alias("c"))
        )
        ranks = contrib.groupBy("dst").agg(
            (F.lit(base) + F.expr(f"{damping_pct} * sum(c) div 100"))
            .cast("bigint")
            .alias("rank")
        ).select(F.col("dst").alias("node"), "rank")
        ranks = ranks.persist(StorageLevel.MEMORY_AND_DISK)
    return (
        ranks.join(deg, ranks.node == deg.src)
        .select("node", F.col("rank").alias("rank_micro"),
                F.col("deg").alias("degree"))
    )
