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
PARQUET_EXTS = {".parquet"}
ORC_EXTS = {".orc"}


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
        if suffixes[-1] in PARQUET_EXTS:
            return "parquet"
        if suffixes[-1] in ORC_EXTS:
            return "orc"
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
    # whitespace-blank skip: F.trim strips ASCII SPACES only, so a
    # tab-only line would survive as a malformed all-null row — match
    # any non-whitespace char instead (JSON.parse's skippable set)
    lines = lines.filter(F.col("raw").rlike(r"\S"))
    parsed = lines.withColumn(
        "rec",
        F.from_json(F.col("raw"), schema, {"mode": "PERMISSIVE"}),
    )
    # from_json yields a null/all-null struct on parse failure; detect
    # OBJECTS explicitly: the trimmed line must start with '{' AND survive a
    # get_json_object reparse. Scalar-line policy (documented divergence):
    # the reference's JSON.parse accepts bare scalars (5, "x", true, null)
    # as records; here a non-object line routes to the error channel instead
    # of becoming an all-null row silently marked clean — the object check
    # is what keeps 'malformed' meaning "not a usable record".
    # first NON-WHITESPACE char must be '{' (trim() leaves tabs, and
    # Jackson itself skips any leading JSON whitespace — a tab-indented
    # object is a valid record, not a malformed row)
    first_ch = F.regexp_extract(F.col("raw"), r"^\s*(\S)", 1)
    is_bad = (
        (first_ch != "{")
        | F.get_json_object(F.col("raw"), "$").isNull()
    )
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
    semantics (values are never coerced). ``skip_lines`` drops the first N
    physical lines of EACH file (the reference is single-stream; per-file is
    the faithful multi-file generalization) — see :func:`_read_csv_skipping`.
    """
    if skip_lines:
        return _read_csv_skipping(spark, path, schema, separator, quote,
                                  escape, header, skip_lines)
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
    return reader.csv(path)


def _read_csv_skipping(
    spark: SparkSession,
    path: str,
    schema: StructType | None,
    separator: str,
    quote: str,
    escape: str | None,
    header: bool,
    skip_lines: int,
) -> DataFrame:
    """skip_lines path: per-file line numbering + JVM-side ``from_csv``.

    ``wholetext`` loads each file as ONE row, so ``posexplode`` over the
    line split yields EXACT per-file line numbers. (The previous
    ``monotonically_increasing_id`` + global ``orderBy`` + ``.rdd`` shape
    numbered lines wrongly on any multi-file or split read — ids only track
    physical line order inside the first partition — and paid a full sort.)

    Scale contract: parallelism is one task per file — the same unit gzip
    compression already imposes on text sources. A single huge *splittable*
    file materializes as one string here; strip its preamble upstream
    instead of using skip_lines (documented guard, not a silent wrong-rows
    path). Quoted fields containing raw newlines do not survive the line
    split (same limitation as the reference's line-based csvParser).
    """
    whole = spark.read.text(path, wholetext=True).select(
        F.input_file_name().alias("_f"), "value")
    lines = (
        whole.select(
            "_f",
            F.posexplode(F.split("value", "\r\n|\r|\n")).alias("_idx", "_line"))
        .filter(F.col("_idx") >= skip_lines)
        .filter(F.col("_line") != "")          # CSV readers skip empty lines
    )
    # the header is the first NON-BLANK line after the skip, PER FILE —
    # assuming it sits literally at _idx == skip_lines breaks when a
    # blank line follows the preamble (the probe would find nothing, or
    # the real header would survive as a garbage data row)
    hdr_idx = lines.groupBy("_f").agg(F.min("_idx").alias("_h"))
    data = (
        lines.join(hdr_idx, "_f").filter(F.col("_idx") > F.col("_h"))
        if header else lines
    )
    if schema is None:
        # all-strings schema; names from the (per-file) header line, else c0..cN
        import csv as _csv
        import io as _io

        probe = (lines.join(hdr_idx, "_f")
                 .filter(F.col("_idx") == F.col("_h")).limit(1).collect())
        if not probe:
            raise ValueError(f"no lines left after skip_lines={skip_lines}")
        fields = next(_csv.reader(
            _io.StringIO(probe[0]._line), delimiter=separator,
            quotechar=quote, escapechar=escape))
        names = fields if header else [f"c{i}" for i in range(len(fields))]
        schema = StructType([StructField(n, StringType()) for n in names])
    opts = {"sep": separator, "quote": quote, "mode": "PERMISSIVE"}
    if escape is not None:
        opts["escape"] = escape
    return (
        data.select(F.from_csv(F.col("_line"), schema.toDDL(), opts).alias("_r"))
        .select("_r.*")
    )


def observe_malformed(df: DataFrame, name: str = "read",
                      error_kind_col: str = "error_kind"):
    """Read-side malformed-row counter — the Spark-native analog of the
    reference's capped warning log (``ndjsonParser.js:24-25,99-115``: warn
    on the first 10 parse errors, count the rest).

    Attaches an ``Observation`` to the frame: metrics ride whatever action
    consumes it (zero extra pass, zero data movement). Returns
    ``(df, observation)``; after the first action ``observation.get`` is
    ``{"rows_read": n, "rows_malformed": m}``. The rows themselves still
    route to the error sink — the counter is the operator-level signal the
    error *sink* alone doesn't surface at read time.
    """
    from pyspark.sql import Observation

    obs = Observation(name)
    instrumented = df.observe(
        obs,
        F.count(F.lit(1)).alias("rows_read"),
        F.sum(F.when(F.col(error_kind_col).isNotNull(), 1).otherwise(0))
        .cast("long").alias("rows_malformed"),
    )
    return instrumented, obs


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
    if resolved == "orc":
        # Columnar like parquet (predicate pushdown + column pruning reach
        # the scan identically); same straight-through dispatch.
        return spark.read.schema(schema).orc(path)
    raise ValueError(f"unknown source format: {resolved!r}")
