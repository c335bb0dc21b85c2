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

**Hot-key skew** (:func:`asof_join_segmented`): one conversation holding a
large fraction of rows makes the single per-key window a straggler — and
order-sensitive windows cannot be salted the way commutative aggregates
can. The segmented variant is the prefix-scan decomposition instead:

1. bucket both sides by ``floor(ts / segment_seconds)`` and run the same
   union+window **per (key, bucket)** — the hot key now splits across its
   time buckets;
2. reduce each (key, bucket) to its LAST right row (a tiny summary frame,
   one row per key×bucket) and running-carry it across buckets per key —
   the only per-key-serial step, linear in #buckets, not #rows;
3. join the carry-in back on (key, bucket) and ``coalesce(within-bucket
   match, carry-in)``.

Identical output to :func:`asof_join` (asserted in tests at several
segment widths); use it when a key can exceed one task's worth of rows.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

__all__ = ["asof_join", "asof_join_segmented"]


def _tagged(left, right, on, ts, right_cols, left_payload):
    """Union-ready tagged frames: right rows side=0 carrying `_r_*` payload,
    left rows side=1 carrying their own columns; `_ts` is the sort key."""
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
    return l_tag, r_tag


def _order(tiebreak):
    order = [F.col("_ts").asc(), F.col("_side").asc()]
    if tiebreak is not None:
        # among equal-ts right rows the greatest tiebreak lands last → wins
        order.append(F.col(f"_r_{tiebreak}").asc_nulls_first())
    return order


def _apply_tolerance(out, ts, prefix, right_cols, tolerance_seconds):
    # abs() covers every direction: backward matches are at-or-before
    # (diff >= 0), forward at-or-after (diff <= 0), nearest either side
    # NTZ-safe: TIMESTAMP_NTZ (the parquet default here) cannot cast
    # straight to DOUBLE — hop through TIMESTAMP first (session tz UTC:
    # wall-clock identity), the CLAUDE.md epoch-math rule
    def _secs(c):
        return F.col(c).cast("timestamp").cast("double")

    stale = F.abs(
        _secs(ts) - _secs(f"{prefix}ts")
    ) > F.lit(float(tolerance_seconds))
    for c in [*right_cols, "ts"]:
        name = f"{prefix}{c}"
        out = out.withColumn(name, F.when(stale, F.lit(None)).otherwise(F.col(name)))
    return out


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: Sequence[str],
    ts: str = "ts",
    right_cols: Sequence[str] | None = None,
    prefix: str = "asof_",
    tiebreak: str | None = None,
    tolerance_seconds: float | None = None,
    direction: str = "backward",
) -> DataFrame:
    """As-of join: left rows + the right row nearest in time within the
    same ``on`` keys, in the given ``direction``:

    - ``backward`` (default): greatest ``right_ts <= left_ts``; equal-ts
      ties go to the greatest ``tiebreak``.
    - ``forward``: smallest ``right_ts >= left_ts`` (pandas
      ``merge_asof(direction='forward')``); equal-ts ties go to the
      SMALLEST ``tiebreak`` (the first match scanned).
    - ``nearest``: whichever of the two is closer in time; an exact
      distance tie prefers the backward match (pandas semantics).

    All three compile to the SAME single key exchange — forward is the
    mirrored window (``first ignorenulls`` over currentRow→following with
    right rows sorted after left at equal ts), and nearest evaluates both
    windows over one partitioning (two sorts, one shuffle) then picks
    per-column by time distance.

    Returns all left columns plus ``{prefix}{c}`` for each of ``right_cols``
    and ``{prefix}ts`` (the matched right timestamp; NULL when unmatched or
    outside ``tolerance_seconds``).
    """
    if direction not in ("backward", "forward", "nearest"):
        raise ValueError(f"direction={direction!r}")
    on = list(on)
    if right_cols is None:
        right_cols = [c for c in right.columns if c not in on and c != ts]
    right_cols = list(right_cols)
    left_payload = [c for c in left.columns if c not in on and c != ts]

    l_tag, r_tag = _tagged(left, right, on, ts, right_cols, left_payload)
    u = l_tag.unionByName(r_tag)
    wb = (
        Window.partitionBy(*on)
        .orderBy(*_order(tiebreak))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    # forward pick = last-non-null over the REVERSED order with an
    # EXPANDING frame: Spark evaluates UNBOUNDED PRECEDING frames
    # incrementally in O(n), while (current, UNBOUNDED FOLLOWING)
    # frames re-aggregate from scratch per row — O(n²) on a hot key
    # (measured in operators/skyline.py: 29 s vs 3 s at 10M rows)
    fwd_order = [F.col("_ts").desc(), F.col("_side").asc()]
    if tiebreak is not None:
        fwd_order.append(F.col(f"_r_{tiebreak}").desc_nulls_last())
    wf = (
        Window.partitionBy(*on)
        .orderBy(*fwd_order)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )

    def back(c):
        return F.last(f"_r_{c}", ignorenulls=True).over(wb)

    def fwd(c):
        return F.last(f"_r_{c}", ignorenulls=True).over(wf)

    if direction == "backward":
        picked = {c: back(c) for c in [*right_cols, "ts"]}
    elif direction == "forward":
        picked = {c: fwd(c) for c in [*right_cols, "ts"]}
    else:
        b_ts, f_ts = back("ts"), fwd("ts")
        # NTZ-safe double conversion (see _apply_tolerance)
        t = F.col("_ts").cast("timestamp").cast("double")
        use_b = b_ts.isNotNull() & (
            f_ts.isNull()
            | ((t - b_ts.cast("timestamp").cast("double"))
               <= (f_ts.cast("timestamp").cast("double") - t))
        )
        picked = {
            c: F.when(use_b, back(c)).otherwise(fwd(c))
            for c in [*right_cols, "ts"]
        }
    carried = u.select(
        *on,
        "_side",
        *left_payload,
        ts,
        *[picked[c].alias(f"{prefix}{c}") for c in right_cols],
        picked["ts"].alias(f"{prefix}ts"),
    )
    out = carried.filter(F.col("_side") == 1).drop("_side")
    if tolerance_seconds is not None:
        out = _apply_tolerance(out, ts, prefix, right_cols, tolerance_seconds)
    return out


def asof_join_segmented(
    left: DataFrame,
    right: DataFrame,
    on: Sequence[str],
    ts: str = "ts",
    right_cols: Sequence[str] | None = None,
    prefix: str = "asof_",
    tiebreak: str | None = None,
    segment_seconds: int = 3600,
    tolerance_seconds: float | None = None,
) -> DataFrame:
    """Skew-proof as-of join: identical output to :func:`asof_join`, but the
    per-key window runs per (key, time segment) so a hot key splits across
    its segments; only an O(#segments) per-key carry pass is serial.
    See the module docstring for the three phases.

    Assumes right payload columns are non-null (both formulations treat a
    NULL payload as "no value here" via ignorenulls; wrap nullable payloads
    in a struct before joining to carry them verbatim)."""
    on = list(on)
    if right_cols is None:
        right_cols = [c for c in right.columns if c not in on and c != ts]
    right_cols = list(right_cols)
    left_payload = [c for c in left.columns if c not in on and c != ts]

    l_tag, r_tag = _tagged(left, right, on, ts, right_cols, left_payload)
    bucket = F.floor(
        F.col("_ts").cast("timestamp").cast("double") / F.lit(float(segment_seconds))
    ).cast("long")
    u = l_tag.unionByName(r_tag).withColumn("_bucket", bucket)

    # phase 1: within-segment running match — hot keys split by segment
    w_in = (
        Window.partitionBy(*on, "_bucket")
        .orderBy(*_order(tiebreak))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    lrows = (
        u.select(
            *on,
            "_bucket",
            "_side",
            *left_payload,
            ts,
            *[F.last(f"_r_{c}", ignorenulls=True).over(w_in).alias(f"_in_{c}")
              for c in right_cols],
            F.last("_r_ts", ignorenulls=True).over(w_in).alias("_in_ts"),
        )
        .filter(F.col("_side") == 1)
        .drop("_side")
    )

    # phase 2: per-segment summary (the LAST right row of each segment) —
    # one row per key×segment — then running carry across segments per key
    ordcol = F.struct(
        F.col("_ts"),
        (F.col(f"_r_{tiebreak}") if tiebreak is not None else F.lit(0)).alias("_tb"),
    )
    summ = (
        r_tag.withColumn("_bucket", bucket)
        .groupBy(*on, "_bucket")
        .agg(
            F.max_by(
                F.struct(
                    *[F.col(f"_r_{c}").alias(c) for c in right_cols],
                    F.col("_r_ts").alias("_ts_v"),
                ),
                ordcol,
            ).alias("_lastrow")
        )
    )
    all_buckets = u.select(*on, "_bucket").distinct()
    w_carry = (
        Window.partitionBy(*on)
        .orderBy("_bucket")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    carry = all_buckets.join(summ, [*on, "_bucket"], "left").select(
        *on,
        "_bucket",
        *[F.last(F.col(f"_lastrow.{c}"), ignorenulls=True).over(w_carry)
          .alias(f"_carry_{c}") for c in right_cols],
        F.last(F.col("_lastrow._ts_v"), ignorenulls=True).over(w_carry)
        .alias("_carry_ts"),
    )

    # phase 3: resolve — within-segment match wins, else the carry-in
    out = lrows.join(carry, [*on, "_bucket"], "left").select(
        *on,
        *left_payload,
        ts,
        *[F.coalesce(F.col(f"_in_{c}"), F.col(f"_carry_{c}")).alias(f"{prefix}{c}")
          for c in right_cols],
        F.coalesce(F.col("_in_ts"), F.col("_carry_ts")).alias(f"{prefix}ts"),
    )
    if tolerance_seconds is not None:
        out = _apply_tolerance(out, ts, prefix, right_cols, tolerance_seconds)
    return out
