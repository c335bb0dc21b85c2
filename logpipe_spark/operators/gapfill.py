"""Time-bucket gap filling with last-observation-carried-forward (LOCF).

TimescaleDB's ``time_bucket_gapfill`` + ``locf()`` is the public semantic
spec (the reference has no time-series surface; this extends the engine's
hypertable rollup family, SURVEY.md §2 round-2 continuation). Given an
event stream, produce one row per (key, bucket) for EVERY bucket between
each key's first and last observation — observed buckets carry their
aggregate, missing buckets are explicit rows whose value is carried
forward from the most recent observed bucket.

Scale design (100 TB):

- The only full-data exchange is the (key, bucket) aggregate — map-side
  combinable, output is one row per key·bucket (metadata-sized next to
  the raw events).
- The dense grid is generated FROM the aggregate (per-key min/max bucket
  → ``sequence()``), never by cross-joining a global calendar: a key
  active for one day never materializes the corpus' full date range.
- Grid ∪ observed rows meet in a groupBy — the union+max trick borrowed
  from :mod:`logpipe_spark.operators.asof` — so the plan contains ZERO
  join operators and the fill itself is one per-key window (the second,
  grid-sized exchange).
- All filled values are integers (cents), so results are bit-identical
  cross-engine (see CLAUDE.md round() divergence note).
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def time_gapfill_interp(
    df: DataFrame,
    ts: str,
    keys: Sequence[str],
    value: str,
    bucket_seconds: int = 3600,
) -> DataFrame:
    """Gap filling with LINEAR interpolation (TimescaleDB ``interpolate()``)
    — the companion to :func:`time_gapfill_locf`: a gap bucket gets the
    value linearly blended between the previous and next observed buckets.

    Fully integer: the blend is

        prev + (next − prev) · (t − t_prev)  FLOOR-DIV  (t_next − t_prev)

    where floor-division of the (possibly negative) numerator is expressed
    as ``(num − pmod(num, den)) div den`` — ``pmod`` is non-negative in
    both engines, the adjusted numerator divides exactly, and truncating
    ``div`` equals floor on an exact quotient. (Plain ``div`` truncates
    toward zero in Spark but DuckDB ``//`` floors — they disagree on
    negative slopes; the pmod form is the cross-engine floor.) Every gap
    bucket has both neighbors because each key's grid spans its own
    observed min..max.

    Same zero-join plan as LOCF with one extra window function pair
    (forward fills) over the SAME exchange and sort.
    """
    keys = list(keys)
    filled = time_gapfill_locf(df, ts, keys, value, bucket_seconds)
    epoch = F.col("bucket_ts").cast("long")
    w_back = (
        Window.partitionBy(*keys)
        .orderBy(epoch)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    # forward fill = last-non-null over the REVERSED order with an
    # expanding frame — Spark computes UNBOUNDED PRECEDING frames in
    # O(n); (current, UNBOUNDED FOLLOWING) re-aggregates per row (O(n²)
    # on a hot key; see operators/skyline.py). Costs one extra local
    # sort on the same exchange.
    w_fwd = (
        Window.partitionBy(*keys)
        .orderBy(epoch.desc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    # anchors must be VALUE-BEARING buckets: an observed bucket whose
    # events all carry NULL values has no sum — using it as a TIME anchor
    # while the VALUE anchors skip it blends a neighbor's value at the
    # wrong timestamp (and a trailing valueless bucket voids the
    # "both neighbors" guarantee). Valueless buckets are interpolation
    # TARGETS (TimescaleDB interpolate() fills NULL aggregate values,
    # observed or not), never anchors.
    obs_bkt = F.when((~F.col("is_gap")) & F.col("sum_cents").isNotNull(),
                     epoch)
    base = filled.select(
        *keys,
        "bucket_ts",
        "n_events",
        "sum_cents",
        "is_gap",
        F.col("locf_sum_cents").alias("_prev"),
        F.last(obs_bkt, ignorenulls=True).over(w_back).alias("_prev_t"),
        F.last("sum_cents", ignorenulls=True).over(w_fwd).alias("_next"),
        F.last(obs_bkt, ignorenulls=True).over(w_fwd).alias("_next_t"),
    )
    with_nd = base.select(
        *base.columns,
        ((F.col("_next") - F.col("_prev")) * (epoch - F.col("_prev_t")))
        .alias("_num"),
        (F.col("_next_t") - F.col("_prev_t")).alias("_den"),
    )
    blend = F.col("_prev") + F.expr("(_num - pmod(_num, _den)) div _den")
    return with_nd.select(
        *keys,
        "bucket_ts",
        "n_events",
        "sum_cents",
        F.when(F.col("sum_cents").isNotNull(), F.col("sum_cents"))
        .otherwise(blend)
        .cast("bigint")
        .alias("interp_cents"),
        "is_gap",
    )


def time_weighted_avg(
    df: DataFrame,
    ts: str,
    keys: Sequence[str],
    value: str,
    tiebreak: str = "event_id",
) -> DataFrame:
    """Time-weighted average per key (TimescaleDB ``time_weight('LOCF')``
    semantics, public spec): each observation's value holds until the next
    observation, so the average weights values by their holding duration —
    the correct mean for irregularly-sampled series (a plain avg
    over-weights bursts).

        twa = Σ value_i · Δt_i / Σ Δt_i   (Δt = seconds to next obs)

    Determinism: Δt is integer seconds (ties in ts totalized by
    ``tiebreak``, giving zero-width intervals — they drop out of both sums
    identically), values are integer cents, and both sums are exact
    integer aggregates — the final quotient is a raw double of identical
    operands (see CLAUDE.md round() note). Each key's LAST observation has
    no interval and is excluded (matching the closed-open integral).

    Plan: one lead() window + one hash aggregate, both on the same key
    exchange. Returns (keys..., n_intervals, total_seconds, twa_cents).
    """
    keys = list(keys)
    epoch = F.col(ts).cast("timestamp").cast("long")
    cents = F.floor(F.col(value) * 100 + F.lit(0.5)).cast("bigint")
    w = Window.partitionBy(*keys).orderBy(epoch, F.col(tiebreak))
    # a NULL-value row is NOT an observation under time_weight('LOCF'):
    # the previous value keeps holding through it. Filtering it here
    # extends the previous span to the next REAL observation; counting
    # its duration while dropping its (NULL) product would silently
    # deflate the average instead.
    df = df.where(F.col(value).isNotNull())
    spans = df.select(
        *keys,
        cents.alias("_c"),
        (F.lead(epoch).over(w) - epoch).alias("_dt"),
    ).where(F.col("_dt").isNotNull())
    return (
        spans.groupBy(*keys)
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_intervals"),
            F.sum("_dt").cast("bigint").alias("total_seconds"),
            F.sum(F.col("_c") * F.col("_dt")).cast("bigint").alias("_wsum"),
        )
        .where(F.col("total_seconds") > 0)
        .select(
            *keys,
            "n_intervals",
            "total_seconds",
            (F.col("_wsum") / F.col("total_seconds")).alias("twa_cents"),
        )
    )


def time_gapfill_locf(
    df: DataFrame,
    ts: str,
    keys: Sequence[str],
    value: str,
    bucket_seconds: int = 3600,
) -> DataFrame:
    """Gap-filled per-key bucket series with LOCF.

    Returns (keys..., bucket_ts, n_events, sum_cents, locf_sum_cents,
    is_gap): ``n_events``/``sum_cents`` are NULL-free integers (0 / NULL on
    gap rows → n_events=0, sum_cents NULL), ``locf_sum_cents`` carries the
    last observed bucket's sum forward (NULL before the first observation
    cannot occur — the grid starts at each key's first observed bucket).
    """
    keys = list(keys)
    epoch = F.col(ts).cast("timestamp").cast("long")
    bucket = (epoch - (epoch % bucket_seconds)).alias("_bkt")
    cents = F.floor(F.col(value) * 100 + F.lit(0.5)).cast("bigint")

    # observed feeds BOTH union branches (directly, and via span→grid);
    # persisting the key·bucket-sized aggregate keeps the raw-event scan
    # single-pass — without it each branch re-runs the full aggregate
    from pyspark import StorageLevel

    observed = df.groupBy(*keys, bucket).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_events"),
        F.sum(cents).cast("bigint").alias("sum_cents"),
    ).persist(StorageLevel.MEMORY_AND_DISK)

    # Per-key dense grid from that key's own observed span. The grid frame
    # has one row per key before the explode, so the sequence() is evaluated
    # once per key regardless of Catalyst projection collapse.
    span = observed.groupBy(*keys).agg(
        F.min("_bkt").alias("_lo"), F.max("_bkt").alias("_hi")
    )
    grid = span.select(
        *keys,
        F.explode(
            F.sequence(F.col("_lo"), F.col("_hi"), F.lit(int(bucket_seconds)))
        ).alias("_bkt"),
    ).select(
        *keys,
        "_bkt",
        F.lit(None).cast("bigint").alias("n_events"),
        F.lit(None).cast("bigint").alias("sum_cents"),
    )

    # Zero-join merge: at most one observed row per (key, bucket), so max()
    # over the union reproduces LEFT JOIN grid←observed without a join.
    merged = (
        observed.unionByName(grid)
        .groupBy(*keys, "_bkt")
        .agg(
            F.max("n_events").alias("_n"),
            F.max("sum_cents").alias("sum_cents"),
        )
    )

    w = (
        Window.partitionBy(*keys)
        .orderBy("_bkt")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return merged.select(
        *keys,
        F.timestamp_seconds(F.col("_bkt")).alias("bucket_ts"),
        F.coalesce(F.col("_n"), F.lit(0)).cast("bigint").alias("n_events"),
        "sum_cents",
        F.last("sum_cents", ignorenulls=True).over(w).alias("locf_sum_cents"),
        F.col("_n").isNull().alias("is_gap"),
    )
