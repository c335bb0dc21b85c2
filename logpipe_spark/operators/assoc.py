"""Market-basket co-occurrence / association-rule mining.

Which items appear together in the same basket more often than chance —
support, confidence and lift per item pair. The classic counting pass
behind frequent-itemset mining (Agrawal & Srikant, VLDB'94): at pipeline
scale the pair-counting pass IS the workload (the apriori/FP-growth
lattice on top is driver-sized once pair counts exist).

Scale shape (no joins over baskets, two paths):

1. fast path (``max_items=None``, caller guarantees bounded baskets):
   ``groupBy(basket).collect_set(item)`` — ONE map-side-combinable
   shuffle turns each basket into its sorted distinct-item array.
   capped path (``max_items`` set): dedup groupBy, then a SPILL-SAFE
   row_number window keeps each basket's ``max_items`` lowest-md5 items
   BEFORE any array materializes — a vocabulary-sized degenerate basket
   never builds an unbounded aggregation buffer (the bounded-state
   discipline of build_postings); the collected array is ≤ max_items.
2. pair generation is a NARROW projection over the array (items[i] <
   items[j] for i < j, so each unordered pair is emitted exactly once —
   no self-join, no extra shuffle of the baskets frame). Fan-out per
   basket is C(d, 2), d capped by ``max_items``.
3. per-item counts and the basket total are metadata-sized
   (|vocabulary| rows / one scalar) and broadcast back onto the pair
   counts.

Determinism: support and lift are emitted as RAW doubles computed from
integer operands only — ``n_ab / N`` and ``(n_ab * N) / (n_a * n_b)`` —
single IEEE divisions of exact integers, bit-identical across engines
(see CLAUDE.md round() divergence note).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["cooccurrence_lift", "item_similarity", "frequent_triples"]


def _basket_arrays(df: DataFrame, basket_col: str, item_col: str,
                   max_items: int | None) -> DataFrame:
    """Shared basket materialization for the itemset miners: one row
    per basket with its sorted distinct-item array. Fast path is ONE
    map-side-combinable collect_set shuffle; the ``max_items`` cap
    path dedups via groupBy then caps with a spill-safe row_number
    window over (md5(item), item) BEFORE any array forms — a
    vocabulary-sized degenerate basket never builds an unbounded
    aggregation buffer (see module docstring)."""
    rows = (
        df.select(F.col(basket_col).alias("basket"),
                  F.col(item_col).alias("item"))
        .where(F.col(basket_col).isNotNull() & F.col(item_col).isNotNull())
    )
    if max_items is not None:
        from pyspark.sql import Window

        w = Window.partitionBy("basket").orderBy(
            F.md5(F.col("item").cast("string")), "item")
        return (
            rows.groupBy("basket", "item").agg(F.lit(1).alias("_one"))
            .withColumn("_rn", F.row_number().over(w))
            .where(F.col("_rn") <= int(max_items))
            .groupBy("basket")
            .agg(F.array_sort(F.collect_list("item")).alias("items"))
        )
    return (
        rows.groupBy("basket")
        .agg(F.array_sort(F.collect_set("item")).alias("items"))
    )


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
    baskets = _basket_arrays(df, basket_col, item_col, max_items).persist()

    total = baskets.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_baskets"))
    item_counts = (
        baskets.select(F.explode("items").alias("item"))
        .groupBy("item").agg(F.count(F.lit(1)).cast("bigint").alias("n_i"))
    )

    # pairs from the sorted array: items[i] < items[j] for i < j by
    # construction, so each unordered pair appears exactly once
    pairs_expr = F.expr(
        "flatten(transform(items, (x, i) -> "
        "transform(slice(items, i + 2, size(items)), y -> "
        "struct(x AS item_a, y AS item_b))))")
    pair_counts = (
        baskets.select(F.explode(pairs_expr).alias("p"))
        .select("p.item_a", "p.item_b")
        .groupBy("item_a", "item_b")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_ab"))
        .where(F.col("n_ab") >= min_pair_count)
    )

    # count products in DOUBLE: n_ab·n_baskets and n_a·n_b overflow int64
    # when basket counts reach ~1e10 (products of two corpus-scale counts);
    # casting the exact counts to double first keeps operands identical in
    # both engines with no overflow (same discipline as corr_from_sums).
    num = F.col("n_ab").cast("double") * F.col("n_baskets")
    den = F.col("n_a").cast("double") * F.col("n_b")
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


def item_similarity(
    df: DataFrame,
    basket_col: str,
    item_col: str,
    max_items: int | None = None,
    min_pair_count: int = 1,
) -> DataFrame:
    """Item-item set-similarity suite over distinct-basket co-occurrence
    — the neighborhood builder of item-item collaborative filtering
    (Sarwar et al., WWW'01) and the "which tools travel together"
    diagnostic run over routed conversation streams.

    Counts come from :func:`cooccurrence_lift` (ONE basket-keyed shuffle
    via collect_set + narrow in-array pair explode — never a self-join;
    the same ``max_items`` bounded-state cap applies). Each measure is a
    raw double from exact integer operands through one division —
    bit-identical cross-engine, never rounded:

    - ``cosine  = n_ab / sqrt(n_a * n_b)``
    - ``jaccard = n_ab / (n_a + n_b - n_ab)``
    - ``dice    = 2 * n_ab / (n_a + n_b)``
    - ``overlap = n_ab / min(n_a, n_b)``

    Integer counts cast to double BEFORE any cross product (``n_a * n_b``
    overflows int64 once both reach ~3e9 — the corpus-scale overflow
    discipline). Denominators are never zero: ``n_ab >= 1`` forces every
    marginal ``>= 1`` and ``n_a + n_b - n_ab >= n_ab``.
    """
    co = cooccurrence_lift(df, basket_col, item_col,
                           max_items=max_items,
                           min_pair_count=min_pair_count)
    nad = F.col("n_a").cast("double")
    nbd = F.col("n_b").cast("double")
    nab = F.col("n_ab").cast("double")
    return co.select(
        "item_a", "item_b", "n_a", "n_b", "n_ab",
        (nab / F.sqrt(nad * nbd)).alias("cosine"),
        (nab / (nad + nbd - nab)).alias("jaccard"),
        (F.lit(2.0) * nab / (nad + nbd)).alias("dice"),
        (nab / F.least(nad, nbd)).alias("overlap"),
    )


def frequent_triples(
    df: DataFrame,
    basket_col: str,
    item_col: str,
    max_items: int | None = None,
    min_count: int = 1,
) -> DataFrame:
    """Frequent 3-itemsets: per ordered triple ``item_a < item_b <
    item_c``, the baskets containing all three, with support and the
    three-way lift against full independence — one lattice level above
    :func:`cooccurrence_lift` (Agrawal & Srikant's counting pass at
    k=3; deeper levels are driver-sized once these counts exist).

    Same scale shape as the pair miner: baskets via
    :func:`_basket_arrays` (ONE shuffle, optional bounded-state cap),
    triples emitted NARROWLY from each sorted array (no self-joins;
    fan-out C(d,3) with d capped by ``max_items`` — cap aggressively,
    the cube grows fast). ``lift3 = n_abc·N² / (n_a·n_b·n_c)``
    composes in doubles cast from exact counts (two corpus-scale
    factors overflow int64; same discipline as the pair lift).

    Returns ``(item_a, item_b, item_c, n_a, n_b, n_c, n_abc,
    n_baskets, support, lift3)``.
    """
    baskets = _basket_arrays(df, basket_col, item_col, max_items).persist()

    total = baskets.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_baskets"))
    item_counts = (
        baskets.select(F.explode("items").alias("item"))
        .groupBy("item").agg(F.count(F.lit(1)).cast("bigint").alias("n_i"))
    )
    # triples from the sorted array: strictly increasing positions, so
    # each unordered triple is emitted exactly once, narrowly
    triples_expr = F.expr(
        "flatten(transform(items, (x, i) -> "
        "flatten(transform(slice(items, i + 2, size(items)), (y, j) -> "
        "transform(slice(items, i + j + 3, size(items)), z -> "
        "struct(x AS item_a, y AS item_b, z AS item_c))))))")
    triple_counts = (
        baskets.select(F.explode(triples_expr).alias("t"))
        .select("t.item_a", "t.item_b", "t.item_c")
        .groupBy("item_a", "item_b", "item_c")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_abc"))
        .where(F.col("n_abc") >= int(min_count))
    )
    num = (F.col("n_abc").cast("double") * F.col("n_baskets")
           * F.col("n_baskets"))
    den = (F.col("n_a").cast("double") * F.col("n_b") * F.col("n_c"))
    return (
        triple_counts
        .join(F.broadcast(item_counts.select(
            F.col("item").alias("item_a"), F.col("n_i").alias("n_a"))),
            "item_a")
        .join(F.broadcast(item_counts.select(
            F.col("item").alias("item_b"), F.col("n_i").alias("n_b"))),
            "item_b")
        .join(F.broadcast(item_counts.select(
            F.col("item").alias("item_c"), F.col("n_i").alias("n_c"))),
            "item_c")
        .crossJoin(F.broadcast(total))
        .select(
            "item_a", "item_b", "item_c", "n_a", "n_b", "n_c",
            "n_abc", "n_baskets",
            (F.col("n_abc") / F.col("n_baskets")).alias("support"),
            (num / den).alias("lift3"),
        )
    )


def goodman_kruskal_lambda(df: DataFrame, x_col: str,
                           y_col: str) -> DataFrame:
    """Goodman–Kruskal lambda (JASA 1954): the proportional reduction
    in error when predicting category ``y`` from category ``x`` —
    "knowing the role, how much better do we guess the tool than
    always guessing the mode?" The PRE companion to chi-square
    association (cramers_v measures departure from independence;
    lambda measures predictive usefulness, and is 0 whenever x adds
    nothing even if chi-square fires).

    ``λ = (Σ_x max_y n_xy − max_y n_y) / (n − max_y n_y)`` — every
    term an exact int64 max/sum over the contingency cells (ONE
    combinable shuffle, cell-cardinality frame after), so λ is a
    single division of exact integers. A degenerate marginal (the
    modal y IS every row) emits NULL under the ANSI guard.

    Returns ONE row: ``(n, n_modal, sum_conditional_modal, lambda_yx)``.
    """
    cells = (df.where(F.col(x_col).isNotNull() & F.col(y_col).isNotNull())
             .groupBy(F.col(x_col).alias("_x"), F.col(y_col).alias("_y"))
             .agg(F.count(F.lit(1)).cast("bigint").alias("_c")))
    per_x = cells.groupBy("_x").agg(F.max("_c").cast("bigint")
                                    .alias("_mx"))
    s = per_x.agg(F.sum("_mx").cast("bigint").alias("sum_conditional_modal"))
    col_tot = cells.groupBy("_y").agg(F.sum("_c").cast("bigint")
                                      .alias("_cy"))
    m = col_tot.agg(F.max("_cy").cast("bigint").alias("n_modal"))
    n = cells.agg(F.sum("_c").cast("bigint").alias("n"))
    out = n.crossJoin(F.broadcast(m)).crossJoin(F.broadcast(s))
    return out.select(
        "n", "n_modal", "sum_conditional_modal",
        F.when(F.col("n") > F.col("n_modal"),
               (F.col("sum_conditional_modal") - F.col("n_modal"))
               .cast("double")
               / (F.col("n") - F.col("n_modal")).cast("double"))
        .alias("lambda_yx"))
