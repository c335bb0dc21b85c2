"""Snapshot diff: classify rows as added / removed / changed between two
table versions (the audit half of CDC — ``plans/merge.py`` APPLIES a
change batch, this operator DERIVES one from two full snapshots, e.g.
yesterday's and today's vendor dump).

Scale design: one full outer join on the key — the only shuffle, on the
natural key both snapshots are bucketed by if they came from
``plans/bucketing.py`` (then even that exchange elides). The value
compare is null-safe struct equality on the projected compare columns —
no row-serialization hash, so column pruning still reaches both scans.
``include_unchanged=False`` (default) drops the overwhelming unchanged
bulk BEFORE the result materializes: the output is change-sized, not
snapshot-sized.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def snapshot_diff(
    old: DataFrame,
    new: DataFrame,
    key_cols: Sequence[str],
    compare_cols: Sequence[str] | None = None,
    include_unchanged: bool = False,
) -> DataFrame:
    """Diff two snapshots on ``key_cols``.

    Returns (keys..., change_type, old_<c>, new_<c> for each compare
    column): ``added`` (key only in new), ``removed`` (key only in old),
    ``changed`` (key in both, any compare column differs null-safely),
    and — only with ``include_unchanged=True`` — ``unchanged``.
    Keys are assumed unique per snapshot (it is a snapshot); enforce
    upstream with ``profile.dq_table_checks`` when in doubt.
    """
    keys = list(key_cols)
    cmp_cols = list(compare_cols) if compare_cols is not None else [
        c for c in old.columns if c not in keys
    ]
    o = old.select(*keys, F.lit(True).alias("_present"),
                   *[F.col(c).alias(f"old_{c}") for c in cmp_cols])
    n = new.select(*keys, F.lit(True).alias("_present"),
                   *[F.col(c).alias(f"new_{c}") for c in cmp_cols])
    # join on the key equality expression so BOTH sides' key columns
    # survive (full outer + USING would null-coalesce them anyway, but the
    # presence test below wants them explicit)
    j = o.alias("o").join(
        n.alias("n"),
        [F.col(f"o.{k}").eqNullSafe(F.col(f"n.{k}")) for k in keys],
        "full_outer",
    )
    # presence = an explicit per-side marker column, NOT key.isNotNull():
    # the join is NULL-SAFE, so a row whose key is legitimately NULL in
    # BOTH snapshots matches — and a key-based test would misclassify the
    # matched pair as 'added'. The literal marker survives the outer pad
    # as NULL exactly when the side was absent.
    present_old = F.col("o._present").isNotNull()
    present_new = F.col("n._present").isNotNull()
    same = F.lit(True)
    for c in cmp_cols:
        same = same & F.col(f"o.old_{c}").eqNullSafe(F.col(f"n.new_{c}"))
    change = (
        F.when(~present_old, F.lit("added"))
        .when(~present_new, F.lit("removed"))
        .when(~same, F.lit("changed"))
        .otherwise(F.lit("unchanged"))
    )
    out = j.select(
        *[F.coalesce(F.col(f"o.{k}"), F.col(f"n.{k}")).alias(k) for k in keys],
        change.alias("change_type"),
        *[F.col(f"o.old_{c}").alias(f"old_{c}") for c in cmp_cols],
        *[F.col(f"n.new_{c}").alias(f"new_{c}") for c in cmp_cols],
    )
    if not include_unchanged:
        out = out.filter(F.col("change_type") != "unchanged")
    return out
