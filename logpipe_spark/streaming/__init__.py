"""Structured Streaming surface (SURVEY.md §2.7).

The reference's 'streaming' is Node I/O over a bounded file; its two
genuinely streaming behaviors — periodic partial aggregate flush
(``aggregateTransformer.js:92-96``) and checkpoint/resume — map to
Structured Streaming update-mode aggregation and the streaming checkpoint
location. This package provides the unbounded-input variant of the
parse→enrich→route→aggregate pipeline.
"""

from logpipe_spark.streaming.stream import (  # noqa: F401
    conversation_sessions,
    stream_dedup_exact,
    stream_interval_join,
    stream_asof_enrich,
    stream_kmv_distinct,
    stream_rollup_incremental,
    read_rollup,
    stream_drift_monitor,
    read_cvm,
    read_drift,
    read_energy,
    read_hellinger,
    read_kuiper,
    read_l_moments,
    read_wasserstein,
    stream_apdex,
    apdex_report,
    stream_cms_incremental,
    read_cms,
    stream_dedup_incremental,
    read_dedup_pairs,
    stream_postings_incremental,
    read_stream_postings,
    stream_context_overflow,
    stream_quantile_incremental,
    read_quantiles,
    stream_rate_incremental,
    read_rate_autocorr,
    health_partials,
    health_report,
    stream_partition_health,
    read_partition_health,
    golden_partials,
    golden_report,
    stream_golden_record,
    read_golden_record,
    stream_slo_incremental,
    stream_freshness,
    read_freshness,
    stream_growth_accounting,
    read_growth_accounting,
    stream_conformal_monitor,
    read_conformal,
    read_slo_burn,
    run_stream_once,
    stream_route_fanout,
    stream_transcripts,
    windowed_turn_counts,
)
