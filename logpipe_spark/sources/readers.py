"""NDJSON / CSV readers with the reference's error-channel semantics.

Reference behavior re-expressed Spark-first:

- NDJSON (``src/parsers/ndjsonParser.js:8-116``): per-line ``JSON.parse``;
  blank lines skipped (:50); malformed lines dropped with a capped warning
  log (:99-115). Here: ``spark.read.text`` + ``from_json`` in PERMISSIVE
  mode. Malformed rows are not silently dropped — they surface on the
  ``_corrupt_record`` channel so the router can land them in the error sink
  (strictly more information than the reference; the drop semantic is
  recovered by filtering ``error_kind is null``).
- CSV (``src/parsers/csvParser.js:10-94``): separator/quote/escape/header/
  skipLines pass straight through to ``spark.read.csv``; values arrive as
  strings (the reference never coerces) unless a schema is given.
- Format dispatch (``src/parsers/parserFactory.js:12-96``): explicit format
  wins; otherwise sniff the extension with ``.gz`` double-extension peek;
  default NDJSON.

At scale both readers are splittable columnar-adjacent scans (text/CSV split
by line ranges; use zstd/parquet upstream when possible — gzip is
NOT splittable, so one .gz file = one task: shard inputs).
"""

from __future__ import annotations

from pathlib import PurePosixPath

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import StructField, StructType, StringType

CORRUPT_COL = "_corrupt_record"

NDJSON_EXTS = {".json", ".ndjson", ".jsonl"}
CSV_EXTS = {".csv"}


def sniff_format(path: str, explicit: str | None = None) -> str:
    """S4 dispatch: explicit format > extension (with .gz peek) > 'ndjson'.

    Mirrors ``createParserForFile`` (``src/parsers/parserFactory.js:79-96``).
    """
    if explicit:
        fmt = explicit.lower()
        if fmt in {"json", "jsonl"}:
            return "ndjson"
        return fmt
    p = PurePosixPath(path)
    suffixes = [s.lower() for s in p.suffixes]
    if suffixes and suffixes[-1] == ".gz":
        suffixes = suffixes[:-1]  # double-extension peek (parserFactory.js:33-41)
    if suffixes:
        if suffixes[-1] in CSV_EXTS:
            return "csv"
        if suffixes[-1] in NDJSON_EXTS:
            return "ndjson"
    return "ndjson"


def read_ndjson(
    spark: SparkSession,
    path: str,
    schema: StructType,
    error_kind_col: str = "error_kind",
) -> DataFrame:
    """NDJSON scan with blank-line skip + malformed-line error channel.

    Returns the declared schema's columns plus ``error_kind``
    ('malformed' | null) and ``raw`` (the original line, for the error sink).
    Blank lines are skipped entirely (ndjsonParser.js:50). The declared
    schema wins: missing fields → null, extra fields dropped (SURVEY.md §1.3).
    """
    lines = spark.read.text(path).withColumnRenamed("value", "raw")
    lines = lines.filter(F.trim(F.col("raw")) != "")
    parsed = lines.withColumn(
        "rec",
        F.from_json(F.col("raw"), schema, {"mode": "PERMISSIVE"}),
    )
    # from_json yields a null/all-null struct on parse failure; detect via a
    # strict reparse marker: valid JSON objects round-trip through get_json_object
    is_bad = F.get_json_object(F.col("raw"), "$").isNull()
    cols = [F.col(f"rec.{f.name}").alias(f.name) for f in schema.fields]
    return parsed.select(
        *cols,
        F.col("raw"),
        F.when(is_bad, F.lit("malformed")).otherwise(F.lit(None)).alias(error_kind_col),
    )


def read_csv(
    spark: SparkSession,
    path: str,
    schema: StructType | None = None,
    separator: str = ",",
    quote: str = '"',
    escape: str | None = None,
    header: bool = True,
    skip_lines: int = 0,
) -> DataFrame:
    """CSV scan mirroring csvParser options (csvParser.js:20-27).

    Without a schema all columns are strings — the reference's exact
    semantics (values are never coerced). ``skip_lines`` maps to
    ``skipRows``-style filtering via the `comment`-free monotonically
    increasing prefilter only when needed; Spark handles the common
    header case natively.
    """
    reader = (
        spark.read.option("sep", separator)
        .option("quote", quote)
        .option("header", header)
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", CORRUPT_COL)
    )
    if escape is not None:
        reader = reader.option("escape", escape)
    if schema is not None:
        reader = reader.schema(schema)
    if skip_lines:
        # portable skip: read as text, drop N physical lines, re-parse
        text = spark.read.text(path)
        text = (
            text.withColumn("_idx", F.monotonically_increasing_id())
            .orderBy("_idx")
            .filter(F.col("_idx") >= skip_lines)
            .drop("_idx")
        )
        return reader.csv(text.rdd.map(lambda r: r.value))  # small-file path only
    return reader.csv(path)


def read_source(
    spark: SparkSession,
    path: str,
    schema: StructType,
    fmt: str | None = None,
    **csv_opts,
) -> DataFrame:
    """S4: dispatch to the right reader; parquet passes straight through."""
    resolved = sniff_format(path, fmt)
    if resolved == "ndjson":
        return read_ndjson(spark, path, schema)
    if resolved == "csv":
        return read_csv(spark, path, schema=schema, **csv_opts)
    if resolved == "parquet":
        return spark.read.schema(schema).parquet(path)
    raise ValueError(f"unknown source format: {resolved!r}")
