"""Table-format abstraction: Iceberg-first, parquet fallback.

The north_rule's sinks are Iceberg table appends — atomic snapshot commits
subsume the reference HTTP sender's batch+retry machinery
(``src/senders/httpSender.js:178-214``) and give snapshot-based resume.
This sandbox ships no Iceberg runtime jars and has no network to fetch
them, so :func:`iceberg_available` gates the real path and everything falls
back to parquet directories + the JSON lineage manifests of
:mod:`logpipe_spark.plans.checkpoint` (same commit-then-rename atomicity at
directory granularity).

On a real deployment, configure the catalog once::

    spark.sql.catalog.lp = org.apache.iceberg.spark.SparkCatalog
    spark.sql.catalog.lp.type = hive   # or rest/glue/hadoop

and every ``write_table`` below becomes ``df.writeTo("lp.db.tbl").append()``
with partitioning ``bucket(N, conv_id)`` (schemas.py documents the DDL).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

ICEBERG_CATALOG_CONF = "spark.sql.catalog.lp"


def iceberg_available(spark: SparkSession) -> bool:
    """True when an Iceberg catalog named ``lp`` is configured AND the
    Iceberg Spark runtime is on the classpath."""
    if spark.conf.get(ICEBERG_CATALOG_CONF, None) is None:
        return False
    try:
        # py4j returns a JavaPackage (not an error) for missing classes;
        # Class.forName is the reliable classpath probe
        spark._jvm.java.lang.Class.forName(  # noqa: SLF001
            "org.apache.iceberg.spark.SparkCatalog")
        return True
    except Exception:
        return False


def write_table(
    spark: SparkSession,
    df: DataFrame,
    name: str,
    path: str,
    mode: str = "append",
    partition_by: list[str] | None = None,
) -> str:
    """Write to the Iceberg table ``lp.<name>`` when available, else to
    ``{path}`` as parquet. Returns the identifier/path written."""
    if iceberg_available(spark):
        ident = f"lp.{name}"
        writer = df.writeTo(ident)
        if partition_by:
            from pyspark.sql.functions import col
            writer = writer.partitionedBy(*[col(c) for c in partition_by])
        if mode == "overwrite":
            writer.createOrReplace()
        elif not spark.catalog.tableExists(ident):
            writer.create()  # first append on a fresh deployment
        else:
            writer.append()
        return ident
    w = df.write.mode("overwrite" if mode == "overwrite" else "append")
    if partition_by:
        w = w.partitionBy(*partition_by)
    w.parquet(path)
    return path


def read_table(spark: SparkSession, name: str, path: str) -> DataFrame:
    if iceberg_available(spark):
        return spark.read.table(f"lp.{name}")
    return spark.read.parquet(path)
