"""Rule-driven multi-sink router (generalizes K6 sender dispatch).

The reference picks exactly one sink by priority http > file > console
(``bin/logpipe.js:82-120``, ``src/senders/senderFactory.js:99-122``); the
north_rule upgrades this to declarative fan-out: one upstream DataFrame,
persisted once, then per-rule ``filter(...).write`` — per-tool, per-role,
error, and overflow sinks.

Scale notes:
- the upstream is persisted (MEMORY_AND_DISK) so N sinks = N cheap filtered
  scans of the cached plan, not N recomputations of parse+enrich;
- every rule predicate is a Catalyst ``Column``, so each sink's write gets
  pushdown/pruning on top of the cached plan;
- routes are non-exclusive by design (a turn can land in both its tool sink
  and its role sink), matching "overlapping routes behave like a multi-way
  union of filtered views" (SURVEY.md §2.4). ``overflow`` catches rows
  matching no rule, ``error`` catches parse failures first.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Callable

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.storagelevel import StorageLevel


@dataclass
class Rule:
    name: str
    predicate: Column  # evaluated against the enriched DataFrame


def standard_rules(tools: list[str], roles: list[str]) -> list[Rule]:
    """Per-tool + per-role sinks (north_rule's rule set)."""
    rules = [Rule(f"tool_{t}", F.col("tool") == F.lit(t)) for t in tools]
    rules += [Rule(f"role_{r}", F.col("role") == F.lit(r)) for r in roles]
    return rules


def route(
    df: DataFrame,
    rules: list[Rule],
    error_col: str = "error_kind",
    persist: bool = True,
) -> dict[str, DataFrame]:
    """Fan a DataFrame out into named sink views.

    Returns ``{rule.name: df, 'error': df, 'overflow': df}``. Error rows
    (``error_col`` non-null) are excluded from every regular rule and land
    only in the error sink (≙ NDJSONParser drop semantics, but routed instead
    of dropped). Overflow = clean rows matching no rule.
    """
    if persist:
        df = df.persist(StorageLevel.MEMORY_AND_DISK)
    is_error = F.col(error_col).isNotNull()
    clean = df.filter(~is_error)
    out: dict[str, DataFrame] = {}
    none_match: Column | None = None
    for rule in rules:
        # coalesce to false: a NULL rule column (e.g. missing role/tool)
        # must not silently drop the row from every sink - it falls through
        # to overflow instead (three-valued logic would make both the rule
        # filter AND ~none_match evaluate to NULL → row lost everywhere)
        pred = F.coalesce(rule.predicate, F.lit(False))
        out[rule.name] = clean.filter(pred)
        none_match = pred if none_match is None else (none_match | pred)
    out["error"] = df.filter(is_error)
    out["overflow"] = clean.filter(~none_match) if none_match is not None else clean
    return out


def route_single_pass(
    df: DataFrame,
    rules: list[Rule],
    error_col: str = "error_kind",
    sink_col: str = "sink",
) -> DataFrame:
    """Single-pass fan-out: tag each row with ALL matching sink names and
    explode — the scale path.

    ``route()`` + ``write_routed()`` issue one Spark job per sink (N filtered
    scans); fine for a handful of sinks, but at 10^12 turns × ~20 sinks the
    fixed per-job cost and N passes dominate. This variant computes the
    matching-sink array in one narrow projection and explodes, so the entire
    fan-out is ONE pass over the data and one write job
    (``write_fanout_single_pass``). Routed-row equality with route() is
    tested; overlapping rules duplicate rows by design (a turn lands in both
    its tool and its role sink).
    """
    is_error = F.col(error_col).isNotNull()
    preds = [F.coalesce(rule.predicate, F.lit(False)) for rule in rules]
    tags = [F.when(~is_error & pred, F.lit(rule.name))
            for rule, pred in zip(rules, preds)]
    none_match = None
    for pred in preds:
        none_match = pred if none_match is None else (none_match | pred)
    tags.append(F.when(is_error, F.lit("error")))
    # rules=[] -> every clean row is overflow (matches route(); without this
    # the empty sink array + explode would silently DROP all clean rows)
    no_match = (~none_match) if none_match is not None else F.lit(True)
    tags.append(F.when(~is_error & no_match, F.lit("overflow")))
    sinks = F.array_compact(F.array(*tags))
    return df.withColumn(sink_col, F.explode(sinks))


def apply_sink_quotas(
    exploded: DataFrame,
    quotas: dict[str, int],
    sink_col: str = "sink",
    order_cols: tuple[str, ...] = ("conv_id", "turn_idx"),
) -> DataFrame:
    """Per-sink quota enforcement (north_star overflow semantics): rows
    beyond a sink's quota are re-routed to ``overflow``.

    Deterministic: rank within each sink under (conv_id, turn_idx) ordering,
    keep the first `quota` rows, retag the rest. One window over the sink
    key — at scale the quota'd sinks are the small ones (error/debug taps);
    unlimited sinks (absent from `quotas`) skip the window entirely via the
    union split below.

    ``overflow`` is the uncapped catch-all BY CONTRACT: retagged over-quota
    rows land there after the quota window has run, so a quota on it would
    be silently bypassed by the retags — rejected loudly instead.
    """
    from pyspark.sql import Window

    if not quotas:
        return exploded
    if "overflow" in quotas:
        raise ValueError(
            "the 'overflow' sink is the uncapped catch-all (over-quota rows "
            "are retagged into it after the quota window); quota it upstream "
            "by quota'ing the sinks that feed it")
    limited = exploded.where(F.col(sink_col).isin(*quotas.keys()))
    unlimited = exploded.where(~F.col(sink_col).isin(*quotas.keys()))
    w = Window.partitionBy(sink_col).orderBy(*[F.asc(c) for c in order_cols])
    quota_expr = F.coalesce(
        *[F.when(F.col(sink_col) == k, F.lit(v)) for k, v in quotas.items()])
    retagged = (
        limited.withColumn("_rn", F.row_number().over(w))
        .withColumn(
            sink_col,
            F.when(F.col("_rn") <= quota_expr, F.col(sink_col))
            .otherwise(F.lit("overflow")))
        .drop("_rn")
    )
    return unlimited.unionByName(retagged)


def write_fanout_single_pass(
    exploded: DataFrame,
    base_dir: str,
    sink_col: str = "sink",
    fmt: str = "parquet",
    mode: str = "overwrite",
) -> str:
    """One write job for every sink: ``partitionBy(sink)`` → per-sink
    subdirectories ``{base_dir}/sink=<name>/``. On Iceberg this is an
    identity-partitioned table; the atomic commit covers all sinks at once
    (the reference's per-sink send+retry collapses into one snapshot)."""
    exploded.write.mode(mode).partitionBy(sink_col).format(fmt).save(base_dir)
    return base_dir


def write_routed(
    routed: dict[str, DataFrame],
    base_dir: str,
    fmt: str = "parquet",
    mode: str = "overwrite",
    post: Callable[[str, DataFrame], DataFrame] | None = None,
) -> dict[str, str]:
    """Write each routed view to ``{base_dir}/{sink_name}``.

    On a real deployment each sink is an Iceberg table append (atomic snapshot
    commit subsumes the reference HTTP sender's batch+retry,
    ``src/senders/httpSender.js:178-214``); the sandbox fallback is parquet.
    """
    paths = {}
    for name, sdf in routed.items():
        if post is not None:
            sdf = post(name, sdf)
        path = f"{base_dir}/sink_{name}"
        sdf.write.mode(mode).format(fmt).save(path)
        paths[name] = path
    return paths
