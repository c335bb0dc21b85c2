"""Scalar text functions used by the transcript pipeline: token counting
and hashing (T7).

Corpus-level text analysis — language-ID, quality scoring, fingerprinting —
lives in :mod:`logpipe_spark.trainprep.textqual`, where each operator is
oracle-checked against DuckDB; this module deliberately holds only the
per-column helpers the pipeline stages consume (an earlier draft duplicated
the textqual operators here with divergent constants — removed).
"""

from __future__ import annotations

import hashlib

import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F

# --- token counting ---------------------------------------------------------

WS_TOKEN_RE = "[^ \\t\\n]+"
# BPE-ish pre-tokenizer: words / numbers / single punctuation (GPT-2-style
# pre-tokenization shape, public knowledge). The documents-table variant is
# trainprep.textqual.bpe_ish_token_count.
BPE_TOKEN_RE = "[A-Za-z]+|[0-9]+|[^A-Za-z0-9 \\t\\n]"


def token_count(text: Column, pattern: str = WS_TOKEN_RE) -> Column:
    """Whitespace token count — JVM-side regexp_count.

    Pass ``"[^ ]+"`` to match the DuckDB oracle's space-only splitting
    (the default also breaks on tab/newline).
    """
    return F.regexp_count(text, F.lit(pattern))


# --- hashing (T7) -----------------------------------------------------------


def sha256_once(col: Column) -> Column:
    """Single-round sha256 — builtin ``sha2`` (T7 fast path)."""
    return F.sha2(col.cast("string"), 256)


def iterated_sha256(iterations: int = 10_000):
    """T7 Hasher intended semantics (``transformerFactory.js:153-163`` +
    worker kernel ``src/workers/worker.js:182-202``; the reference wiring is
    bugged — SURVEY.md §7.4.2): sha256 iterated N times, each round hashing
    the previous round's HEX string (``.update(hash).digest('hex')`` feeds
    the hex back in — reference parity, and what makes the DuckDB oracle
    expressible as N nested ``sha256()`` calls on VARCHAR).
    Irreducibly procedural → Arrow-batched pandas UDF (≙ the reference's
    CPU-bound worker-pool offload, replaced by Spark task parallelism)."""

    @F.pandas_udf("string")
    def hash_iter(s: pd.Series) -> pd.Series:
        def run(v) -> str | None:
            if v is None:
                return None
            h = str(v)
            for _ in range(iterations):
                h = hashlib.sha256(h.encode("utf-8")).hexdigest()
            return h

        return s.map(run)

    return hash_iter
