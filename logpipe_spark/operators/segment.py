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

__all__ = ["rfm_scores"]


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
