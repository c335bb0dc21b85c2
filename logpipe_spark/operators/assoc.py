"""Market-basket co-occurrence / association-rule mining.

Which items appear together in the same basket more often than chance —
support, confidence and lift per item pair. The classic counting pass
behind frequent-itemset mining (Agrawal & Srikant, VLDB'94): at pipeline
scale the pair-counting pass IS the workload (the apriori/FP-growth
lattice on top is driver-sized once pair counts exist).

Scale shape (three bounded passes, no all-pairs join over baskets):

1. ``distinct (basket, item)`` — one hash shuffle, map-side combinable.
2. pair generation: a self-join ON THE BASKET KEY (a plain hash join —
   every candidate pair shares a basket by construction, never a
   cartesian). Fan-out per basket is C(d, 2) with d = that basket's
   DISTINCT item count, bounded by ``max_items`` — the cap is applied
   deterministically (items hashed per basket, lowest-md5 kept) BEFORE
   the self-join so a degenerate basket containing the whole vocabulary
   cannot produce a quadratic row blow-up.
3. per-item counts and the basket total are metadata-sized
   (|vocabulary| rows / one scalar) and broadcast back onto the pair
   counts.

Determinism: support and lift are emitted as RAW doubles computed from
integer operands only — ``n_ab / N`` and ``(n_ab * N) / (n_a * n_b)`` —
single IEEE divisions of exact integers, bit-identical across engines
(see CLAUDE.md round() divergence note).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

__all__ = ["cooccurrence_lift"]


def cooccurrence_lift(
    df: DataFrame,
    basket_col: str,
    item_col: str,
    max_items: int | None = None,
    min_pair_count: int = 1,
) -> DataFrame:
    """Per item pair ``(item_a < item_b)``: co-occurrence counts and
    association metrics over baskets.

    Returns ``(item_a, item_b, n_a, n_b, n_ab, n_baskets, support,
    lift)`` where ``n_a`` counts baskets containing item_a, ``n_ab``
    baskets containing both, ``support = n_ab / n_baskets`` and
    ``lift = (n_ab * n_baskets) / (n_a * n_b)`` (> 1 ⇒ positive
    association). All counts are over DISTINCT basket membership —
    repeat occurrences within a basket count once.
    """
    baskets = (
        df.select(F.col(basket_col).alias("basket"),
                  F.col(item_col).alias("item"))
        .where(F.col(basket_col).isNotNull() & F.col(item_col).isNotNull())
        .distinct()
    )
    if max_items is not None:
        # deterministic per-basket cap: keep the max_items lowest-md5
        # items so a vocabulary-sized basket stays C(max_items, 2)
        w = Window.partitionBy("basket").orderBy(
            F.md5(F.col("item").cast("string")), "item")
        baskets = (
            baskets.withColumn("_rn", F.row_number().over(w))
            .where(F.col("_rn") <= max_items)
            .drop("_rn")
        )
    baskets = baskets.persist()

    total = baskets.select("basket").distinct().agg(
        F.count(F.lit(1)).cast("bigint").alias("n_baskets"))
    item_counts = baskets.groupBy("item").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_i"))

    a = baskets.select("basket", F.col("item").alias("item_a"))
    b = baskets.select("basket", F.col("item").alias("item_b"))
    pair_counts = (
        a.join(b, "basket")
        .where(F.col("item_a") < F.col("item_b"))
        .groupBy("item_a", "item_b")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_ab"))
        .where(F.col("n_ab") >= min_pair_count)
    )

    num = F.col("n_ab") * F.col("n_baskets")
    den = F.col("n_a") * F.col("n_b")
    return (
        pair_counts
        .join(F.broadcast(item_counts.select(
            F.col("item").alias("item_a"), F.col("n_i").alias("n_a"))),
            "item_a")
        .join(F.broadcast(item_counts.select(
            F.col("item").alias("item_b"), F.col("n_i").alias("n_b"))),
            "item_b")
        .crossJoin(F.broadcast(total))
        .select(
            "item_a", "item_b", "n_a", "n_b", "n_ab", "n_baskets",
            (F.col("n_ab") / F.col("n_baskets")).alias("support"),
            (num / den).alias("lift"),
        )
    )
