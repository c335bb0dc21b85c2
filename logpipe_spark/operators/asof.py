"""As-of (most-recent-prior) join — a time-series operator Spark lacks.

Semantics (reference point: the round brief's custom-operator list; DuckDB's
``ASOF JOIN`` is the public semantic spec we match): for every left row,
attach the right row with the greatest ``right_ts <= left_ts`` (backward
direction) sharing the same equality keys — e.g. "for each click, the latest
preceding error of the same user".

Scale design — the union+window formulation, NOT an inequality join:

* A naive ``l JOIN r ON l.key = r.key AND r.ts <= l.ts`` + keep-latest is a
  band join; Catalyst plans it as a per-key cross product (O(|l|·|r|) within
  each key) and a 10^12-turn hot conversation makes that quadratic.
* Instead we UNION the two sides with a ``side`` tag (right=0, left=1), hash
  -shuffle ONCE on the equality keys, sort each key's partition by
  ``(ts, side, tiebreak)``, and carry the right payload forward with
  ``last(col, ignorenulls=True)`` over ``rowsBetween(unboundedPreceding,
  currentRow)``. Cost: one shuffle + one sort, linear in |l|+|r| — the same
  shape as any windowed aggregate over conv_id, so every skew lever
  (salting via operators/skew.py, AQE skew split) applies unchanged.
* Ties: a right row at exactly ``left_ts`` MATCHES (<= contract). Right rows
  ordered before left rows at equal ts (side 0 < 1); among equal-ts right
  rows the greatest ``tiebreak`` wins, making the result deterministic —
  plain ASOF leaves equal-ts winners engine-defined.

``tolerance_seconds`` bounds the lookback (rows whose match is older come
back NULL), mirroring pandas ``merge_asof(tolerance=...)``.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

__all__ = ["asof_join"]


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: Sequence[str],
    ts: str = "ts",
    right_cols: Sequence[str] | None = None,
    prefix: str = "asof_",
    tiebreak: str | None = None,
    tolerance_seconds: float | None = None,
) -> DataFrame:
    """Backward as-of join: left rows + most recent right row at or before
    the left row's ``ts`` within the same ``on`` keys.

    Returns all left columns plus ``{prefix}{c}`` for each of ``right_cols``
    and ``{prefix}ts`` (the matched right timestamp; NULL when unmatched or
    outside ``tolerance_seconds``).
    """
    on = list(on)
    if right_cols is None:
        right_cols = [c for c in right.columns if c not in on and c != ts]
    right_cols = list(right_cols)
    left_payload = [c for c in left.columns if c not in on and c != ts]

    l_tag = left.select(
        *on,
        F.col(ts).alias("_ts"),
        F.lit(1).alias("_side"),
        *[F.col(c) for c in left_payload],
        F.col(ts).alias(ts),  # preserved verbatim in the output
        *[F.lit(None).cast(right.schema[c].dataType).alias(f"_r_{c}") for c in right_cols],
        F.lit(None).cast(right.schema[ts].dataType).alias("_r_ts"),
    )
    r_tag = right.select(
        *on,
        F.col(ts).alias("_ts"),
        F.lit(0).alias("_side"),
        *[F.lit(None).cast(left.schema[c].dataType).alias(c) for c in left_payload],
        F.lit(None).cast(left.schema[ts].dataType).alias(ts),
        *[F.col(c).alias(f"_r_{c}") for c in right_cols],
        F.col(ts).alias("_r_ts"),
    )
    order = [F.col("_ts").asc(), F.col("_side").asc()]
    if tiebreak is not None:
        # among equal-ts right rows the greatest tiebreak lands last → wins
        order.append(F.col(f"_r_{tiebreak}").asc_nulls_first())
    w = (
        Window.partitionBy(*on)
        .orderBy(*order)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = l_tag.unionByName(r_tag).select(
        *on,
        "_side",
        *left_payload,
        ts,
        *[F.last(f"_r_{c}", ignorenulls=True).over(w).alias(f"{prefix}{c}") for c in right_cols],
        F.last("_r_ts", ignorenulls=True).over(w).alias(f"{prefix}ts"),
    )
    out = carried.filter(F.col("_side") == 1).drop("_side")
    if tolerance_seconds is not None:
        stale = (
            F.col(ts).cast("double") - F.col(f"{prefix}ts").cast("double")
        ) > F.lit(float(tolerance_seconds))
        for c in [*right_cols, "ts"]:
            name = f"{prefix}{c}"
            out = out.withColumn(name, F.when(stale, F.lit(None)).otherwise(F.col(name)))
    return out
