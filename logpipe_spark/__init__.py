"""logpipe_spark — a PySpark-native parse → enrich → route → aggregate engine.

A brand-new, Spark-first analytics engine with the query and data-processing
capabilities of the reference ``vellascogabriel/logpipe`` (a Node.js streaming
log-ETL CLI), re-expressed over the public PySpark DataFrame/SQL API:

- declarative logical plans (Catalyst does pushdown/pruning/folding),
- vectorized regex parsing and Arrow-batched pandas UDFs (never per-row Python),
- broadcast-join enrichment, rule-driven multi-sink routing,
- exact hash aggregation (Spark's partial→final ≙ the reference's periodic
  partial flushes merged),
- per-stage checkpoints with per-partition lineage manifests and resume,
- salting + AQE for skew, explicit hash(conv_id) partitioning.

Reference parity map: SURVEY.md §2 (every operator cites the reference
file:line it re-expresses).
"""

__version__ = "0.1.0"
ENGINE_NAME = "logpipe_spark"
