"""Inverted-index construction: term -> document-frequency + postings.

The original MapReduce workload, Spark-first: tokenize, distinct
(term, doc) pairs, and build each term's posting list. The index feeds
retrieval and the df side of keyword/boilerplate scoring
(``trainprep/textqual.py``).

Scale design — the hazard is the stop-word term whose posting list IS the
corpus: a naive ``collect_list`` per term materializes an O(n_docs) array
in one aggregation buffer. Here the postings are capped BEFORE any
collection: a per-term ``row_number`` window keeps only the first
``max_postings`` doc ids (bounded window state: one counter), and the
term's TRUE document frequency rides the same partitioning as a
``count(*) over (partition by term)`` — so ``df`` is exact while the
materialized list is bounded. The cap is explicit in the output contract
(``postings`` holds min(df, max_postings) ids), not a silent truncation.

Two shuffles total: the (term, doc) distinct and the term window; the
final per-term aggregate reuses the window's hashpartitioning(term).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def build_postings(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    max_postings: int = 10,
) -> DataFrame:
    """Build the inverted index: (word, df, postings).

    ``df`` = exact distinct-document frequency; ``postings`` = the first
    ``max_postings`` doc ids in ascending order, comma-joined (ascending
    ids make the cap deterministic and keep delta-encodable order, the
    standard postings layout). Tokenization is whitespace split — the
    same convention as the rest of ``trainprep`` so df values agree with
    ``doc_keywords``/``strip_boilerplate``.
    """
    # explode_outer + isNotNull instead of explode: InferFiltersFromGenerate
    # otherwise clones the split() into a pushed-down filter (see BENCH.md
    # round-2 notes — a silent 2x on the tokenize pass).
    words = (
        docs.select(
            F.col(id_col).alias("doc_id"),
            F.explode_outer(F.split(F.col(text_col), " ")).alias("word"),
        )
        .filter(F.col("word").isNotNull())
        .distinct()
    )
    w = Window.partitionBy("word").orderBy("doc_id")
    ranked = words.select(
        "word",
        "doc_id",
        F.row_number().over(w).alias("_rn"),
        F.count(F.lit(1)).over(Window.partitionBy("word")).alias("_df"),
    )
    return (
        ranked.filter(F.col("_rn") <= max_postings)
        .groupBy("word")
        .agg(
            F.max("_df").cast("bigint").alias("df"),
            # sort NUMERICALLY first, cast after — a string sort would put
            # doc 10 before doc 2 and diverge from the oracle's list order.
            F.array_join(
                F.transform(
                    F.sort_array(F.collect_list("doc_id")),
                    lambda x: x.cast("string"),
                ),
                ",",
            ).alias("postings"),
        )
    )
