"""Conversation spans + per-turn window analytics (north_star additions).

The reference has no window functions (SURVEY.md §2.4); the north_rule adds
conversation spans over ``conv_id`` ordered by ``turn_idx``. Two shapes:

- :func:`conv_spans` — per-conversation min/max ts + turn count. A plain
  groupBy (single shuffle on conv_id; no window needed — cheaper at scale).
- :func:`with_turn_latency` — per-turn ``lag`` over
  ``Window.partitionBy(conv_id).orderBy(turn_idx)`` for inter-turn latency.

Skew: one hot conversation holding 50% of turns makes the window partition a
straggler; :mod:`logpipe_spark.operators.skew` provides the salted two-phase
variant for the groupBy shape.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def _micros(c) -> "F.Column":
    # parquet timestamps arrive as TIMESTAMP_NTZ in Spark 4; unix_micros wants
    # TIMESTAMP — with session tz UTC the cast is wall-clock identity.
    return F.unix_micros(c.cast("timestamp"))


def conv_spans(df: DataFrame, round_dp: int = 3) -> DataFrame:
    return df.groupBy("conv_id").agg(
        F.count(F.lit(1)).alias("n_turns"),
        F.min("ts").alias("first_ts"),
        F.max("ts").alias("last_ts"),
        F.round(
            (_micros(F.max("ts")) - _micros(F.min("ts"))) / 1e6, round_dp
        ).alias("span_seconds"),
    )


def with_turn_latency(df: DataFrame) -> DataFrame:
    w = Window.partitionBy("conv_id").orderBy("turn_idx")
    prev_ts = F.lag("ts").over(w)
    return df.withColumn(
        "latency_seconds",
        F.round((_micros(F.col("ts")) - _micros(prev_ts)) / 1e6, 3),
    )


def turn_numbering(df: DataFrame) -> DataFrame:
    """row_number over (conv_id, ts) — recomputes turn order from timestamps."""
    w = Window.partitionBy("conv_id").orderBy("ts", "turn_idx")
    return df.withColumn("rn", F.row_number().over(w) - F.lit(1))
