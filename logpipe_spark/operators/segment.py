"""User segmentation: RFM (recency / frequency / monetary) scoring.

The classic marketing/abuse-triage segmentation a downstream consumer of
the reference pipeline runs over routed event streams (readme.md:1-40
positions logpipe as the ingest stage for exactly this reporting): each
user gets a 1..k quantile score per metric and a combined RFM code.

Scale design: scoring is a GLOBAL ranking problem (every user ranked
against every other), and the naive formulation — ``ntile(k) OVER
(ORDER BY metric)`` — funnels the entire user frame through ONE window
task. Here every global rank runs the two-level bucketed prefix scan
(operators/drift.py:bucketed_cumsum — parallelism scales with distinct
metric values, not 1), and tile membership is computed CLOSED-FORM from
the exact integer rank, reproducing SQL-standard ntile semantics
bit-for-bit (the first ``n mod k`` tiles take one extra row). The
oracle runs the plain ntile() window, so the closed form is
cross-validated against a second engine's ntile on every gate run.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

__all__ = ["rfm_scores", "concentration_share"]


def _global_rank(df: DataFrame, value: str, tiebreak: str,
                 out: str, bucket_width: int) -> DataFrame:
    """Total-order global rank of ``value`` (bigint, non-null) with ties
    broken by ``tiebreak`` — no global window: exclusive cumulative count
    of smaller values via the bucketed prefix scan + row_number inside
    the (value) tie cell. ``bucket_width`` is in VALUE units; pick it so
    value_range / width stays in the thousands (the summary frame the
    carry window scans is that many rows)."""
    from logpipe_spark.operators.drift import bucketed_cumsum

    per_v = df.groupBy(value).agg(
        F.count(F.lit(1)).cast("bigint").alias("_cnt"))
    starts = bucketed_cumsum(
        per_v.withColumn("_all", F.lit(1)), "_all", ["_cnt"],
        value_col=value, bucket_width=bucket_width,
    ).select(F.col(value).alias("_sv"),
             (F.col("cum__cnt") - F.col("_cnt")).alias("_start"))
    w_tie = Window.partitionBy(value).orderBy(tiebreak)
    return (
        df.join(starts, F.col(value) == F.col("_sv"))
        .withColumn(out, (F.col("_start")
                          + F.row_number().over(w_tie)).cast("bigint"))
        .drop("_sv", "_start")
    )


def rfm_scores(
    events: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
    value_col: str = "value",
    k: int = 5,
) -> DataFrame:
    """Per-user RFM segmentation over an event stream.

    Metrics (all exact integers): recency = last event time at SECOND
    grain (``unix_micros div 1e6`` — second grain keeps the prefix-scan
    summary frame small, see _global_rank), frequency = event count,
    monetary = sum of value-cents (``floor(value*100 + 0.5)``). Each is
    scored 1..k by SQL-standard ntile over (metric ASC, user_id ASC) —
    higher = more recent / more active / higher spend — plus the packed
    ``rfm = r*100 + f*10 + m`` code.

    ntile-from-rank closed form: with q = n div k and r = n mod k, the
    first r tiles hold q+1 rows, so
    tile(x) = (x + q) div (q + 1)                      if x <= r*(q+1)
            = r + (x - r*(q+1) + q - 1) div q          otherwise
    (the else branch implies q >= 1: q = 0 forces r = n and every rank
    into the first branch; the divisor is still guarded for ANSI mode).

    Returns (user_id, last_s, freq, cents, r_score, f_score, m_score,
    rfm). One event-scale shuffle (the per-user aggregate); the three
    rank passes run over the user-sized frame with bucketed prefix
    scans, never a global ntile window.
    """
    cents = F.floor(F.col(value_col) * 100 + F.lit(0.5)).cast("bigint")
    per_user = events.where(
        F.col(ts_col).isNotNull() & F.col(value_col).isNotNull()
    ).groupBy(F.col(user_col).alias("user_id")).agg(
        F.max(F.expr(
            f"unix_micros(cast({ts_col} as timestamp)) div 1000000"
        )).cast("bigint").alias("last_s"),
        F.count(F.lit(1)).cast("bigint").alias("freq"),
        F.sum(cents).cast("bigint").alias("cents"),
    )
    # widths in value units: last_s spans ~a month of seconds (~2.6e6 →
    # ~2.5k summary rows at 1024); freq/cents are corpus-bounded counts
    ranked = _global_rank(per_user, "last_s", "user_id", "_rr", 1024)
    ranked = _global_rank(ranked, "freq", "user_id", "_rf", 64)
    ranked = _global_rank(ranked, "cents", "user_id", "_rm", 4096)
    n = ranked.agg(F.count(F.lit(1)).cast("bigint").alias("_n"))
    ranked = (
        ranked.crossJoin(F.broadcast(n))
        .withColumn("_q", F.expr(f"_n div {k}").cast("bigint"))
        .withColumn("_r", (F.col("_n") - F.col("_q") * k).cast("bigint"))
        .withColumn("_big", F.col("_r") * (F.col("_q") + 1))
    )

    def tile(rank_col: str):
        return F.when(
            F.col(rank_col) <= F.col("_big"),
            F.expr(f"({rank_col} + _q) div (_q + 1)"),
        ).otherwise(
            F.col("_r") + F.expr(
                f"({rank_col} - _big + _q - 1) div greatest(_q, 1)"),
        ).cast("int")

    out = ranked.select(
        "user_id", "last_s", "freq", "cents",
        tile("_rr").alias("r_score"),
        tile("_rf").alias("f_score"),
        tile("_rm").alias("m_score"),
    )
    return out.withColumn(
        "rfm",
        (F.col("r_score") * 100 + F.col("f_score") * 10
         + F.col("m_score")).cast("int"),
    )


def concentration_share(
    df: DataFrame,
    key: str,
    amount,  # Column, exact integer units (cents)
    top_frac_num: int = 1,
    top_frac_den: int = 5,
) -> DataFrame:
    """Pareto concentration ("do 20% of the keys carry 80% of the
    volume?"): the share of total amount held by the top
    ``top_frac_num/top_frac_den`` of keys ranked by amount descending.

    Single-row output (n_keys, k_top, amount_top, amount_total, share):
    k_top = ceil(n * num / den) computed in INTEGER arithmetic; the
    membership cut uses the same bucketed-prefix global rank as
    :func:`rfm_scores` (never a global sort/window); share is one double
    division of two exact bigints.
    """
    per_key = df.groupBy(F.col(key).alias("_k")).agg(
        F.sum(amount).cast("bigint").alias("_amt"))
    # rank DESC == rank ASC of the negated amount (keeps _global_rank's
    # ascending prefix-scan orientation); tiebreak on the key
    ranked = _global_rank(
        per_key.withColumn("_neg", -F.col("_amt")),
        "_neg", "_k", "_rnk", 4096,
    )
    tot = ranked.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_keys"),
        F.sum("_amt").cast("bigint").alias("amount_total"),
    )
    j = ranked.crossJoin(F.broadcast(tot))
    # ceil(n*num/den) = (n*num + den - 1) div den — POSITIVE operands
    # only (Spark's div truncates toward zero, DuckDB's // floors; they
    # agree only on non-negative numerators)
    k_top = F.expr(
        f"cast((n_keys * {top_frac_num} + {top_frac_den} - 1)"
        f" div {top_frac_den} as bigint)")
    top = j.where(F.col("_rnk") <= k_top).agg(
        F.max(k_top).alias("k_top"),
        F.sum("_amt").cast("bigint").alias("amount_top"),
        F.max("n_keys").alias("n_keys"),
        F.max("amount_total").alias("amount_total"),
    )
    return top.select(
        "n_keys", "k_top", "amount_top", "amount_total",
        (F.col("amount_top").cast("double")
         / F.col("amount_total").cast("double")).alias("share"),
    )


def decile_lift(
    df: DataFrame,
    score_col: str = "value",
    label_col: str = "_pos",
    id_col: str = "event_id",
    k: int = 10,
) -> DataFrame:
    """Model-evaluation lift table: rank rows by score DESC, cut into
    ``k`` SQL-standard ntiles, and report per tile the size, positive
    count, and CUMULATIVE lift vs the base rate.

    No global ntile window: the ascending global rank comes from the
    bucketed prefix scan (:func:`_global_rank`, tie-broken by the
    NEGATED id so that the descending rank ``n + 1 - rank_asc`` equals
    ``row_number() OVER (ORDER BY score DESC, id ASC)`` — the oracle's
    plain ntile order), then the ntile-from-rank closed form assigns
    tiles. Only the k-row tile summary ever enters a window.

    ``label_col`` must be an integer 0/1 column. Lift is a ratio of two
    double divisions of exact bigints, mirrored order in the oracle.
    Returns (decile, n, n_pos, cum_lift).
    """
    cents = F.floor(F.col(score_col) * 100 + F.lit(0.5)).cast("bigint")
    base = df.where(F.col(score_col).isNotNull()).select(
        cents.alias("_sc"),
        (-F.col(id_col)).cast("bigint").alias("_tb"),
        F.col(label_col).cast("bigint").alias("_pos"),
    )
    ranked = _global_rank(base, "_sc", "_tb", "_ra", 1024)
    n = ranked.agg(F.count(F.lit(1)).cast("bigint").alias("_n"))
    ranked = (
        ranked.crossJoin(F.broadcast(n))
        .withColumn("_rd", (F.col("_n") + 1 - F.col("_ra")).cast("bigint"))
        .withColumn("_q", F.expr(f"_n div {k}").cast("bigint"))
        .withColumn("_r", (F.col("_n") - F.col("_q") * k).cast("bigint"))
        .withColumn("_big", F.col("_r") * (F.col("_q") + 1))
    )
    tile = F.when(
        F.col("_rd") <= F.col("_big"),
        F.expr("(_rd + _q) div (_q + 1)"),
    ).otherwise(
        F.col("_r") + F.expr("(_rd - _big + _q - 1) div greatest(_q, 1)"),
    ).cast("int")
    g = ranked.select(tile.alias("decile"), "_pos").groupBy("decile").agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum("_pos").cast("bigint").alias("n_pos"),
    )
    # k-row frame: the cumulative window scans k rows, never the corpus
    w_cum = Window.orderBy("decile").rowsBetween(
        Window.unboundedPreceding, Window.currentRow)
    tot = g.agg(F.sum("n").cast("bigint").alias("_tn"),
                F.sum("n_pos").cast("bigint").alias("_tp"))
    c = g.crossJoin(F.broadcast(tot)).select(
        "decile", "n", "n_pos",
        F.sum("n").over(w_cum).cast("bigint").alias("_cn"),
        F.sum("n_pos").over(w_cum).cast("bigint").alias("_cp"),
        "_tn", "_tp",
    )
    return c.select(
        "decile", "n", "n_pos",
        F.when(
            F.col("_tp") > 0,
            (F.col("_cp").cast("double") / F.col("_cn").cast("double"))
            / (F.col("_tp").cast("double") / F.col("_tn").cast("double")),
        ).alias("cum_lift"),
    )


def growth_accounting(df: DataFrame, unit_col: str,
                      week_col: str) -> DataFrame:
    """Weekly growth accounting: every active unit classified NEW
    (first week ever), RETAINED (active the week before), or
    RESURRECTED (returning after a gap), plus the CHURNED count (active
    last week, absent this week) — the standard DAU/MAU decomposition
    chart's data (new + retained + resurrected − churned = net change).

    One distinct (unit, week) collapse, then a single PARTITIONED
    lag/lead window per unit; class counts are conditional integer
    sums per week, and churn events key at ``last_active_week + 1``
    (a unit whose next activity is more than one week away churns
    exactly once, the week after it was last seen — the final horizon
    week appears with only churn). Full-outer week join stitches the
    activity and churn frames, zero-filled.

    Returns ``(week, n_new, n_retained, n_resurrected, n_churned)``.
    """
    uw = (df.where(F.col(unit_col).isNotNull()
                   & F.col(week_col).isNotNull())
          .select(F.col(unit_col).alias("_u"),
                  F.col(week_col).cast("bigint").alias("_w"))
          .distinct())
    w = Window.partitionBy("_u").orderBy("_w")
    f = uw.select(
        "_u", "_w",
        F.lag("_w").over(w).alias("_prev"),
        F.lead("_w").over(w).alias("_nxt"))
    act = f.groupBy(F.col("_w").alias("week")).agg(
        F.sum(F.when(F.col("_prev").isNull(), 1).otherwise(0))
        .cast("bigint").alias("n_new"),
        F.sum(F.when(F.col("_w") == F.col("_prev") + 1, 1).otherwise(0))
        .cast("bigint").alias("n_retained"),
        F.sum(F.when(F.col("_prev").isNotNull()
                     & (F.col("_w") > F.col("_prev") + 1), 1)
              .otherwise(0)).cast("bigint").alias("n_resurrected"))
    churn = (f.where(F.col("_nxt").isNull()
                     | (F.col("_nxt") > F.col("_w") + 1))
             .groupBy((F.col("_w") + 1).alias("week"))
             .agg(F.count(F.lit(1)).cast("bigint").alias("n_churned")))
    return (act.join(churn, "week", "full_outer")
            .select("week",
                    F.coalesce("n_new", F.lit(0)).cast("bigint")
                    .alias("n_new"),
                    F.coalesce("n_retained", F.lit(0)).cast("bigint")
                    .alias("n_retained"),
                    F.coalesce("n_resurrected", F.lit(0)).cast("bigint")
                    .alias("n_resurrected"),
                    F.coalesce("n_churned", F.lit(0)).cast("bigint")
                    .alias("n_churned")))
