"""Dataset profiling: per-column null/distinct statistics in long form.

The data-quality pass a pipeline runs before trusting a new feed — the
reference surfaces per-sink counters and parse-error tallies at the edge
(src/utils/progressTracker.js, src/parsers/ndjsonParser.js warning cap);
this is the batch analog over an already-landed table.

Scale design: ONE aggregate pass over the table computes every column's
count/null-count/approx-or-exact distinct simultaneously (Spark fuses
the 2N aggregate expressions into a single partial+final pair — one scan,
one 1-row exchange), then the 1-row wide frame pivots to long form with
an explode that never touches the data again. The naive per-column loop
runs N scans; profiling 100 TB must not.

count(DISTINCT a), count(DISTINCT b), ... in one agg triggers Spark's
Expand operator (one duplicated stream per distinct aggregate) — an
N-fold input blowup. For wide tables pass exact=False to use HLL
(approx_count_distinct) which keeps the single-pass, no-Expand shape.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def profile_columns(
    df: DataFrame, cols: Sequence[str] | None = None, exact: bool = True
) -> DataFrame:
    """Profile ``cols`` (default: all) → (column_name, n_rows, n_null,
    n_distinct) one row per column. n_distinct excludes NULL (SQL
    count-distinct semantics, identical in DuckDB).
    """
    cols = list(cols) if cols is not None else list(df.columns)
    distinct_fn = F.count_distinct if exact else F.approx_count_distinct
    aggs = [F.count(F.lit(1)).cast("bigint").alias("_rows")]
    for c in cols:
        aggs.append(
            F.sum(F.when(F.col(c).isNull(), 1).otherwise(0))
            .cast("bigint")
            .alias(f"_null_{c}")
        )
        aggs.append(distinct_fn(F.col(c)).cast("bigint").alias(f"_nd_{c}"))
    wide = df.agg(*aggs)
    rows = F.array(
        *[
            F.struct(
                F.lit(c).alias("column_name"),
                F.col("_rows").alias("n_rows"),
                F.col(f"_null_{c}").alias("n_null"),
                F.col(f"_nd_{c}").alias("n_distinct"),
            )
            for c in cols
        ]
    )
    return wide.select(F.explode(rows).alias("r")).select(
        "r.column_name", "r.n_rows", "r.n_null", "r.n_distinct"
    )
