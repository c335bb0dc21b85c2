"""Keyed upsert (MERGE INTO semantics) on hash-bucketed parquet.

The north_star's tables are Iceberg, where upsert is `MERGE INTO` with
snapshot isolation. Without Iceberg jars (sinks.py fallback), the same
capability on plain parquet: the table is laid out as
``_bucket = pmod(hash(key), n_buckets)`` partition directories, and an
upsert batch

1. computes the AFFECTED buckets from the updates (tiny distinct —
   collected driver-side to prune the read),
2. reads ONLY those bucket dirs, anti-joins the stale versions of the
   updated keys, unions the new rows,
3. rewrites just those partition dirs via dynamic partition overwrite.

Cost scales with the touched buckets (|updates| spread over n_buckets),
not the table — the property that makes continuous ingest at 10^12 turns
feasible. The merged frame is materialized (localCheckpoint) before the
overwrite because the write would otherwise lazily re-read the very
directories it is replacing; Iceberg's snapshot commit does this
atomically, and checkpoint.py's manifests provide the recovery story here.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

__all__ = ["write_keyed", "merge_upsert"]


def _bucket(key: str, n_buckets: int):
    return F.pmod(F.hash(F.col(key)), F.lit(n_buckets))


def write_keyed(df: DataFrame, path: str, key: str, n_buckets: int = 64) -> None:
    """Initial load: hash-bucketed partition layout (`_bucket=<i>/` dirs)."""
    (
        df.withColumn("_bucket", _bucket(key, n_buckets))
        .repartition("_bucket")
        .write.partitionBy("_bucket")
        .mode("overwrite")
        .parquet(path)
    )


def merge_upsert(
    spark: SparkSession,
    path: str,
    updates: DataFrame,
    key: str,
    n_buckets: int = 64,
) -> dict:
    """Upsert ``updates`` into the keyed table at ``path``: matching keys
    are replaced, new keys inserted; only affected bucket dirs rewrite.
    Returns {"touched_buckets": [...], "n_upserts": int}.

    MERGE INTO source discipline: the updates batch must carry at most
    ONE row per key and no NULL keys — duplicates would both insert
    (breaking the table's one-row-per-key invariant) and a NULL key can
    never anti-join its stale row (every batch would append another).
    Violations raise, mirroring Iceberg's "multiple source rows matched"
    error rather than silently corrupting the table."""
    # Materialize the updates lineage ONCE (it may be an expensive derived
    # frame), then run BOTH source-discipline probes + the affected-bucket
    # discovery + the row count as a single aggregate over the
    # checkpointed batch — previously each probe was its own action and
    # the lineage recomputed three times per upsert.
    up = (
        updates.withColumn("_bucket", _bucket(key, n_buckets))
        .localCheckpoint(eager=True)
    )
    probe = up.agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.count(key).alias("n_keys"),
        F.countDistinct(key).alias("n_distinct"),
        F.collect_set("_bucket").alias("buckets"),  # ≤ n_buckets elements
    ).collect()[0]
    if probe["n_keys"] < probe["n_rows"]:
        raise ValueError(
            f"merge_upsert: updates contain NULL '{key}' keys — a NULL "
            "key can never match its target row")
    if probe["n_distinct"] < probe["n_keys"]:
        raise ValueError(
            f"merge_upsert: updates contain duplicate '{key}' keys — "
            "dedupe the batch (latest version per key) before upserting")
    buckets = sorted(probe["buckets"])
    target = spark.read.parquet(path).filter(F.col("_bucket").isin(buckets))
    keep = target.join(up.select(key).distinct(), key, "left_anti")
    merged = keep.unionByName(up).localCheckpoint(eager=True)
    prev = spark.conf.get("spark.sql.sources.partitionOverwriteMode", "static")
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    try:
        (
            merged.repartition("_bucket")
            .write.partitionBy("_bucket")
            .mode("overwrite")
            .parquet(path)
        )
    finally:
        spark.conf.set("spark.sql.sources.partitionOverwriteMode", prev)
    return {"touched_buckets": buckets, "n_upserts": int(probe["n_rows"])}
