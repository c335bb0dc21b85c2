"""Text-analysis functions for the training-data pipeline (round brief):
token counting, quality scoring, language ID, fingerprinting, iterated
hashing. Everything is a Catalyst expression unless noted; the only pandas
UDF here is the iterated-sha256 hasher (irreducibly procedural).
"""

from __future__ import annotations

import hashlib

import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F

# --- token counting ---------------------------------------------------------

WS_TOKEN_RE = "[^ \\t\\n]+"
# BPE-ish pre-tokenizer: words / numbers / single punctuation (GPT-2-style
# pre-tokenization shape, public knowledge).
BPE_TOKEN_RE = "[A-Za-z]+|[0-9]+|[^A-Za-z0-9 \\t\\n]"


def token_count(text: Column, pattern: str = WS_TOKEN_RE) -> Column:
    """Whitespace token count — JVM-side regexp_count."""
    return F.regexp_count(text, F.lit(pattern))


def bpe_token_count(text: Column) -> Column:
    return F.regexp_count(text, F.lit(BPE_TOKEN_RE))


# --- quality scoring --------------------------------------------------------

STOPWORDS = ["the", "a", "and", "or", "of", "to", "in", "is", "it", "that"]
_STOP_RE = "(?i)\\b(" + "|".join(STOPWORDS) + ")\\b"


def quality_score(text: Column, round_dp: int = 4) -> Column:
    """Composite [0,1] quality heuristic: length band + punctuation ratio +
    stopword ratio (the standard public web-corpus filters, e.g. C4/Gopher
    rules). Deterministic, pure Catalyst expressions."""
    n_chars = F.length(text)
    n_tokens = token_count(text)
    n_punct = F.regexp_count(text, F.lit("[.,;:!?]"))
    n_stop = F.regexp_count(text, F.lit(_STOP_RE))
    len_score = F.least(n_chars / F.lit(500.0), F.lit(1.0))
    punct_ratio = n_punct / F.greatest(n_tokens, F.lit(1))
    punct_score = F.lit(1.0) - F.least(punct_ratio, F.lit(1.0))
    stop_score = F.least(
        n_stop / F.greatest(n_tokens, F.lit(1)) * F.lit(5.0), F.lit(1.0)
    )
    score = (len_score + punct_score + stop_score) / F.lit(3.0)
    return F.round(F.when(n_tokens == 0, F.lit(0.0)).otherwise(score), round_dp)


# --- language ID ------------------------------------------------------------

# Tiny deterministic stopword-hit heuristic (public n-gram/stopword LID
# approach); tie-break by fixed language order.
LANG_MARKERS: dict[str, list[str]] = {
    "en": ["the", "and", "is", "of", "to"],
    "de": ["der", "die", "und", "ist", "nicht"],
    "fr": ["le", "la", "et", "est", "les"],
    "es": ["el", "los", "es", "una", "como"],
}


def lang_id(text: Column) -> Column:
    """argmax over per-language stopword hit counts; 'und' (undetermined)
    when no marker hits. Expressed as nested CASE — fully JVM-side."""
    counts = {
        lang: F.regexp_count(
            F.lower(text), F.lit("\\b(" + "|".join(words) + ")\\b")
        )
        for lang, words in LANG_MARKERS.items()
    }
    langs = list(LANG_MARKERS)
    # stable preference: first language in LANG_MARKERS wins ties
    result = F.lit("und")
    max_c = F.greatest(*counts.values())
    for lang in reversed(langs):
        result = F.when((counts[lang] == max_c) & (max_c > 0), F.lit(lang)).otherwise(result)
    return result


# --- fingerprinting ---------------------------------------------------------

FP_MOD = 1_000_000_007
FP_BASE = 131


def fingerprint(text: Column) -> Column:
    """Polynomial rolling hash over the normalized character stream:
    ``h = (h*131 + ascii(c)) mod 1e9+7``. Pure Catalyst: split → aggregate
    (a sequential fold — deterministic and oracle-reproducible, unlike
    murmur3 ``hash()`` which differs across engines)."""
    norm = F.lower(F.regexp_replace(text, "[ \\t\\n]+", " "))
    chars = F.split(norm, "")
    return F.aggregate(
        chars,
        F.lit(0).cast("long"),
        lambda acc, c: (acc * F.lit(FP_BASE) + F.ascii(c)) % F.lit(FP_MOD),
    )


def md5_fingerprint(text: Column) -> Column:
    """Content hash for exact dedup: md5 of whitespace-normalized lowercase."""
    return F.md5(F.lower(F.regexp_replace(text, "[ \\t\\n]+", " ")))


# --- hashing (T7) -----------------------------------------------------------


def sha256_once(col: Column) -> Column:
    """Single-round sha256 — builtin ``sha2`` (T7 fast path)."""
    return F.sha2(col.cast("string"), 256)


def iterated_sha256(iterations: int = 10_000):
    """T7 Hasher intended semantics (``transformerFactory.js:153-163`` +
    worker kernel ``src/workers/worker.js:182-202``; the reference wiring is
    bugged — SURVEY.md §7.4.2): sha256 iterated N times over the value.
    Irreducibly procedural → Arrow-batched pandas UDF (≙ the reference's
    CPU-bound worker-pool offload, replaced by Spark task parallelism)."""

    @F.pandas_udf("string")
    def hash_iter(s: pd.Series) -> pd.Series:
        def run(v) -> str | None:
            if v is None:
                return None
            h = str(v).encode("utf-8")
            for _ in range(iterations):
                h = hashlib.sha256(h).digest()
            return h.hex()

        return s.map(run)

    return hash_iter
