"""The flagship parse → enrich → route → aggregate pipeline.

This is the Spark re-expression of the reference's transformer-array program
(``bin/logpipe.js:339-359``: [progress, parser, checkpoint, filter, select,
hash, enrich, count, stats, stringifier, sink]) as ONE declarative DataFrame
plan per stage. Catalyst replaces the manual stage ordering (pushdown,
pruning, folding are free — SURVEY.md §4.1); the explicit engineering left to
us is partitioning, broadcast, persist-for-fanout, and skew (SURVEY.md §4.2).

Scale design (100 TB / 10^12 turns):
- input is read with partition-level parallelism and repartitioned by
  ``hash(conv_id)`` ONCE (`north_rule`): every downstream conv-level
  aggregate/window then reuses that single exchange;
- the lookup join is broadcast (zero shuffle of the fact table);
- the routed fan-out persists the enriched frame once; each sink write is a
  narrow filtered scan of the cached plan;
- per-sink aggregates are map-side-combining hash aggregates on low-card
  keys (tool/role) — tiny shuffles;
- AQE coalesces the post-shuffle partitions and handles residual skew.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from logpipe_spark.operators.aggregate import stats_by
from logpipe_spark.operators.enrich import add_processing_metadata, enrich_with_lookup
from logpipe_spark.operators.parse import TRANSCRIPT_COMPILED, parse_grok
from logpipe_spark.operators.router import Rule, route, standard_rules
from logpipe_spark.operators.spans import conv_spans
from logpipe_spark.functions.textfn import token_count
from logpipe_spark.transcripts import ROLES, TOOLS, lookup_df


@dataclass
class PipelineConfig:
    tools: list[str] = field(default_factory=lambda: list(TOOLS))
    roles: list[str] = field(default_factory=lambda: list(ROLES))
    conv_partitions: int | None = None  # None → spark.sql.shuffle.partitions
    deterministic_metadata: bool = True
    single_pass_parse: bool = False
    persist_fanout: bool = True


def parse_stage(df: DataFrame, cfg: PipelineConfig | None = None) -> DataFrame:
    cfg = cfg or PipelineConfig()
    return parse_grok(df, "text", TRANSCRIPT_COMPILED, single_pass=cfg.single_pass_parse)


def enrich_stage(spark: SparkSession, parsed: DataFrame, cfg: PipelineConfig | None = None) -> DataFrame:
    cfg = cfg or PipelineConfig()
    enriched = enrich_with_lookup(parsed, lookup_df(spark))
    enriched = add_processing_metadata(enriched, deterministic=cfg.deterministic_metadata)
    return enriched.withColumn("n_tokens", token_count(F.col("text")))


def route_stage(enriched: DataFrame, cfg: PipelineConfig | None = None) -> dict[str, DataFrame]:
    cfg = cfg or PipelineConfig()
    rules: list[Rule] = standard_rules(cfg.tools, cfg.roles)
    return route(enriched, rules, persist=cfg.persist_fanout)


def aggregate_stage(routed: dict[str, DataFrame]) -> dict[str, DataFrame]:
    """Per-sink aggregates (FIXTURES.md §5): counts, token-length stats,
    conversation spans (computed over the union of clean rows = overlap-free
    via the role sinks, which partition the clean set)."""
    aggs: dict[str, DataFrame] = {}
    for name, sdf in routed.items():
        key = "tool" if name.startswith("tool_") else "role"
        aggs[f"{name}_counts"] = sdf.groupBy(key).agg(F.count(F.lit(1)).alias("turn_count"))
        aggs[f"{name}_textstats"] = stats_by(sdf, key, F.col("n_tokens"), round_dp=4)
    return aggs


def run_pipeline(
    spark: SparkSession,
    transcripts: DataFrame,
    cfg: PipelineConfig | None = None,
) -> dict[str, DataFrame]:
    """Full pipeline; returns all routed sinks + aggregate frames (lazy)."""
    cfg = cfg or PipelineConfig()
    df = transcripts
    if cfg.conv_partitions:
        df = df.repartition(cfg.conv_partitions, "conv_id")
    parsed = parse_stage(df, cfg)
    enriched = enrich_stage(spark, parsed, cfg)
    routed = route_stage(enriched, cfg)
    out: dict[str, DataFrame] = {f"sink_{k}": v for k, v in routed.items()}
    out.update({f"agg_{k}": v for k, v in aggregate_stage(routed).items()})
    clean = enriched.filter(F.col("error_kind").isNull())
    out["agg_conv_spans"] = conv_spans(clean)
    return out


def flagship_summary(spark: SparkSession, transcripts: DataFrame) -> DataFrame:
    """One-frame rollup used by the driver smoke check: per-(role, tool)
    turn counts + token stats over clean rows, ordered deterministically."""
    parsed = parse_stage(transcripts)
    enriched = enrich_stage(spark, parsed)
    clean = enriched.filter(F.col("error_kind").isNull())
    return (
        clean.groupBy("role", "tool", "team")
        .agg(
            F.count(F.lit(1)).alias("turn_count"),
            F.round(F.sum("n_tokens").cast("double"), 2).alias("sum_tokens"),
            F.round(F.avg("n_tokens"), 4).alias("avg_tokens"),
            F.countDistinct("conv_id").alias("n_convs"),
        )
        .orderBy("role", "tool")
    )
