"""Slowly-changing-dimension (type 2) interval construction from a changelog.

Turns an append-only change feed (key, ts, attribute value) into validity
intervals: one row per *state run* with ``valid_from`` / ``valid_to`` and a
current-row flag — the standard warehouse shape for "what was this key's
value at time T" lookups (which then serve as the right side of
:mod:`logpipe_spark.operators.asof`'s as-of join). The reference pipeline
is the ingest stage for exactly this kind of downstream modeling
(readme.md:1-40); the operator itself has no reference counterpart and is
built Spark-first.

Scale design: everything partitions on the key — the change-detection lag
and the interval-closing lead are both per-key windows over the SAME
partitioning, so Catalyst plans ONE exchange (the second window reuses the
first's hashpartitioning; only an intra-partition sort re-runs). Per-key
window state is one row (lag/lead), so a key with 10^8 changes streams
through its partition without materializing history. No global sort, no
join.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def scd2_intervals(
    df: DataFrame,
    key_col: str,
    ts_col: str,
    attr_col: str,
    tiebreak_col: str,
    out_state: str = "state",
) -> DataFrame:
    """Collapse consecutive same-value changes and emit validity intervals.

    Returns (key, state, valid_from, valid_to, is_current): one row per
    maximal run of equal ``attr_col`` values in the key's (ts, tiebreak)
    order. ``valid_to`` is the start of the NEXT run (half-open interval
    [valid_from, valid_to)); NULL for the key's live row, which also sets
    ``is_current`` = 1. The attribute compare is null-safe: a NULL value
    is a state of its own, and a NULL→NULL repeat collapses like any
    other run (``eqNullSafe``).

    Ties on ``ts_col`` are ordered by ``tiebreak_col`` so the run
    structure — and therefore every interval — is deterministic.
    """
    w = Window.partitionBy(key_col).orderBy(F.col(ts_col), F.col(tiebreak_col))
    prev = F.lag(attr_col).over(w)
    prev_seen = F.lag(F.lit(1)).over(w)  # NULL only on the first row
    changed = prev_seen.isNull() | ~F.col(attr_col).eqNullSafe(prev)
    runs = df.withColumn("_chg", changed).filter(F.col("_chg")).drop("_chg")
    # The kept rows preserve the tiebreak column, so equal-ts runs keep a
    # total order and lead() is deterministic.
    w2 = Window.partitionBy(key_col).orderBy(F.col(ts_col), F.col(tiebreak_col))
    nxt = F.lead(ts_col).over(w2)
    return runs.select(
        F.col(key_col),
        F.col(attr_col).alias(out_state),
        F.col(ts_col).alias("valid_from"),
        nxt.alias("valid_to"),
        F.when(nxt.isNull(), F.lit(1)).otherwise(F.lit(0))
        .cast("bigint")
        .alias("is_current"),
    )
