"""Bucketed-table co-location: shuffle-free conv-level aggregation.

The north_rule's Iceberg layout is ``bucket(N, conv_id)``; the Spark-native
sandbox analog is a bucketed managed table
(``bucketBy(N, conv_id).sortBy(conv_id, turn_idx)``). Once the corpus is
stored this way, every ``groupBy("conv_id")`` / conv-window consumer reads
pre-partitioned buckets and Catalyst elides the Exchange entirely — the
single biggest shuffle in the pipeline (10^12 rows keyed by conv_id)
happens once at ingest instead of once per query. ``tests/test_bucketing.py``
asserts the Exchange really disappears from the physical plan.

At 100 TB choose N so each bucket ≈ one task's worth of data
(rows/bucket × row width ≤ a few hundred MB); bucket count is fixed at
write time, so size for the largest consumer.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def save_bucketed(
    df: DataFrame,
    table: str,
    buckets: int = 16,
    bucket_col: str = "conv_id",
    sort_cols: tuple[str, ...] = ("conv_id", "turn_idx"),
    mode: str = "overwrite",
) -> str:
    """Persist as a bucketed+sorted managed table; returns the table name."""
    (
        df.write.mode(mode)
        .bucketBy(buckets, bucket_col)
        .sortBy(*sort_cols)
        .format("parquet")
        .saveAsTable(table)
    )
    return table


def read_bucketed(spark: SparkSession, table: str) -> DataFrame:
    return spark.table(table)


def plan_has_exchange(df: DataFrame) -> bool:
    """True if the physical plan contains a SHUFFLE Exchange (test helper).

    Matches only shuffle exchanges ("Exchange hashpartitioning/
    rangepartitioning/SinglePartition") — a BroadcastExchange is not a
    shuffle and must not trip the bucketing assertion."""
    plan = df._jdf.queryExecution().executedPlan().toString()  # noqa: SLF001
    return any(m in plan for m in (
        "Exchange hashpartitioning", "Exchange rangepartitioning",
        "Exchange SinglePartition"))
