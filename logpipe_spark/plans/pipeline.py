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
    # "[^ ]+" matches the DuckDB oracle exactly (the WS_TOKEN_RE default
    # also strips tab/newline, which would diverge on such text)
    return enriched.withColumn("n_tokens", token_count(F.col("text"), "[^ ]+"))


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


def run_pipeline_fanout(
    spark: SparkSession,
    transcripts: DataFrame,
    sink_base_dir: str,
    cfg: PipelineConfig | None = None,
) -> dict[str, DataFrame]:
    """Scale-path pipeline: single-pass routed write + consolidated aggregates.

    Three jobs total regardless of sink count:
      1. fan-out write — one pass, ``partitionBy(sink)``;
      2. per-sink counts + token stats — ONE groupBy over the exploded frame;
      3. conversation spans over clean rows.
    The enriched frame is persisted once and feeds all three. This is the
    plan shape that scales: job count is O(1) in the number of sinks, every
    shuffle is a map-side-combining hash aggregate, and the only wide
    exchange is on the (low-cardinality) sink key and conv_id.
    """
    from logpipe_spark.operators.router import (route_single_pass,
                                                 write_fanout_single_pass)
    from pyspark.storagelevel import StorageLevel

    cfg = cfg or PipelineConfig()
    parsed = parse_stage(transcripts, cfg)
    enriched = enrich_stage(spark, parsed, cfg)
    if cfg.persist_fanout:
        enriched = enriched.persist(StorageLevel.MEMORY_AND_DISK)
    rules = standard_rules(cfg.tools, cfg.roles)
    exploded = route_single_pass(enriched, rules)
    write_fanout_single_pass(exploded, sink_base_dir)
    sink_aggs = (
        exploded
        .groupBy("sink")
        .agg(
            F.count(F.lit(1)).alias("turn_count"),
            F.sum("n_tokens").alias("sum_tokens"),
            F.min("n_tokens").alias("min_tokens"),
            F.max("n_tokens").alias("max_tokens"),
            F.avg("n_tokens").alias("avg_tokens"),
        )
    )
    clean = enriched.filter(F.col("error_kind").isNull())
    return {
        "sink_dir": sink_base_dir,
        "agg_per_sink": sink_aggs,
        "agg_conv_spans": conv_spans(clean),
        "_enriched": enriched,
    }


def flagship_summary(spark: SparkSession, transcripts: DataFrame,
                     approx_distinct: bool = False) -> DataFrame:
    """One-frame rollup used by the driver smoke check: per-(role, tool)
    turn counts + token stats over clean rows, ordered deterministically.

    ``approx_distinct=True`` is the 100 TB default: ``countDistinct`` plans
    an Expand + second exchange (every row duplicated per aggregate), while
    the md5-register HLL (operators/hll.py) caps the distinct-count shuffle
    at 2**p rows per group regardless of conversation cardinality — and,
    unlike the engine-private ``approx_count_distinct`` HLL++, the estimate
    reproduces bit-for-bit in DuckDB, so the approximate flagship passes
    the EXACT value-hash gate (the estimate's join back onto the stats
    frame is group-cardinality-sized)."""
    parsed = parse_stage(transcripts)
    enriched = enrich_stage(spark, parsed)
    clean = enriched.filter(F.col("error_kind").isNull())
    stats = clean.groupBy("role", "tool", "team").agg(
        F.count(F.lit(1)).alias("turn_count"),
        F.round(F.sum("n_tokens").cast("double"), 2).alias("sum_tokens"),
        F.round(F.avg("n_tokens"), 4).alias("avg_tokens"),
    )
    if approx_distinct:
        from logpipe_spark.operators.hll import hll_distinct
        est = hll_distinct(clean, "conv_id", ["role", "tool", "team"],
                           p=9, alias="n_convs")
        out = stats.join(est, ["role", "tool", "team"], "left").select(
            "role", "tool", "team", "turn_count", "sum_tokens",
            "avg_tokens", F.coalesce("n_convs", F.lit(0)).alias("n_convs"))
    else:
        out = clean.groupBy("role", "tool", "team").agg(
            F.count(F.lit(1)).alias("turn_count"),
            F.round(F.sum("n_tokens").cast("double"), 2).alias("sum_tokens"),
            F.round(F.avg("n_tokens"), 4).alias("avg_tokens"),
            F.countDistinct("conv_id").alias("n_convs"),
        )
    return out.orderBy("role", "tool", "team")
