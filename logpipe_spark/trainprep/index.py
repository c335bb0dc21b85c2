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


def bm25_topk(
    docs: DataFrame,
    terms: list[str],
    k: int = 10,
    k1: float = 1.2,
    b: float = 0.75,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """BM25 ranked retrieval: top-k docs for a bag of query terms.

    Robertson/Sparck-Jones BM25 with the standard +1 idf smoothing:

        score(d) = sum_t idf(t) * tf * (k1+1) / (tf + k1*(1 - b + b*dl/avgdl))
        idf(t)   = ln((N - df + 0.5) / (df + 0.5) + 1)

    Scale shape: doc length rides THROUGH the tokenize explode as
    ``size(split(text))`` (narrow — no separate dl aggregation or join on
    doc_id); the query-term filter prunes the exploded stream before the
    only per-doc shuffle (groupBy doc_id,term); df and the corpus stats
    are tiny frames broadcast onto the tf rows; the final top-k is a
    global TakeOrdered (k rows per partition shuffle, not a full sort).

    Cross-engine determinism: per-term contributions are floored to
    INTEGER micros before the per-doc sum, so the sum is order-independent
    (float addition order differs between engines; integer addition
    doesn't) and DuckDB reproduces the score exactly — the 1-ulp ln()
    divergence (39/512 inputs, see operators/hll.py) is absorbed by
    floor(x+0.5). Ties broken by ascending doc id.

    Returns (doc_id, n_terms_hit, score_micro) — score in micro-units.
    """
    k1p1 = k1 + 1.0
    toks = (
        docs.select(
            F.col(id_col).alias("doc_id"),
            F.split(F.col(text_col), " ").alias("_toks"),
        )
        .select(
            "doc_id",
            F.size("_toks").alias("dl"),
            F.explode_outer("_toks").alias("term"),
        )
        .filter(F.col("term").isNotNull() & F.col("term").isin(list(terms)))
    )
    tf = toks.groupBy("doc_id", "dl", "term").agg(
        F.count(F.lit(1)).cast("bigint").alias("tf"))
    dfreq = toks.groupBy("term").agg(
        F.countDistinct("doc_id").cast("bigint").alias("df"))
    stats = docs.select(
        F.size(F.split(F.col(text_col), " ")).cast("bigint").alias("_dl")
    ).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_docs"),
        (F.sum("_dl").cast("double") / F.count(F.lit(1))).alias("avgdl"),
    )
    idf = F.log(
        (F.col("n_docs").cast("double") - F.col("df") + F.lit(0.5))
        / (F.col("df").cast("double") + F.lit(0.5))
        + F.lit(1.0)
    )
    denom = (
        F.col("tf").cast("double")
        + F.lit(k1) * (F.lit(1.0) - F.lit(b)
                       + F.lit(b) * (F.col("dl").cast("double")
                                     / F.col("avgdl")))
    )
    contrib = idf * ((F.col("tf").cast("double") * F.lit(k1p1)) / denom)
    scored = (
        tf.join(F.broadcast(dfreq), "term")
        .crossJoin(F.broadcast(stats))
        .select(
            "doc_id",
            F.floor(contrib * F.lit(1000000.0) + F.lit(0.5))
            .cast("bigint").alias("_sm"),
        )
    )
    return (
        scored.groupBy("doc_id")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_terms_hit"),
             F.sum("_sm").cast("bigint").alias("score_micro"))
        .orderBy(F.col("score_micro").desc(), F.col("doc_id"))
        .limit(k)
    )


def phrase_search(docs: DataFrame, phrase: str,
                  text_col: str = "text", id_col: str = "doc_id",
                  k: int = 20) -> DataFrame:
    """Exact phrase match via positional postings adjacency: per document,
    the number of token positions where the whole whitespace ``phrase``
    occurs, top-``k`` by match count.

    The standard IR positional-index plan: tokenize WITH positions, keep
    only the phrase's words (a selective filter that reaches each scan),
    then chain equi-joins on (doc, pos + offset) — one join per extra
    phrase word, each on a well-distributed composite key. No window
    touches more than the ``k`` survivors (TakeOrderedAndProject funnel).

    posexplode_outer + isNotNull dodges InferFiltersFromGenerate
    re-evaluating the split inside a pushed-down filter (the 12x lesson,
    see trainprep/dedup.py).
    """
    from pyspark.sql import Window

    words = phrase.split(" ")
    toks = docs.select(
        F.col(id_col).alias("doc_id"),
        F.posexplode_outer(F.split(F.col(text_col), " "))
         .alias("pos0", "word"),
    ).where(F.col("word").isNotNull())
    base = toks.where(F.col("word") == words[0]).select(
        "doc_id", F.col("pos0").alias("pos"))
    for i, wd in enumerate(words[1:], 1):
        nxt = toks.where(F.col("word") == wd).select(
            F.col("doc_id").alias("_d"), (F.col("pos0") - i).alias("_p"))
        base = base.join(
            nxt,
            (F.col("doc_id") == F.col("_d")) & (F.col("pos") == F.col("_p")),
        ).select("doc_id", "pos")
    m = base.groupBy("doc_id").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_matches"))
    top = m.orderBy(F.col("n_matches").desc(), F.col("doc_id")).limit(k)
    w = Window.orderBy(F.col("n_matches").desc(), F.col("doc_id"))
    return top.select(
        "doc_id", "n_matches",
        F.row_number().over(w).cast("int").alias("rank"))


def rrf_fuse(rankings, c: int = 60,
             query_col: str = "query_id", doc_col: str = "doc_id",
             rank_col: str = "rank") -> DataFrame:
    """Reciprocal-rank fusion (Cormack et al., SIGIR'09): combine ranked
    lists from heterogeneous retrievers — each (query, doc, rank) frame
    contributes ``1 / (c + rank)`` and fused docs are ordered by the sum.
    RRF is the standard hybrid-search combiner (lexical BM25 + semantic
    ANN + priors) because it needs no score calibration, only ranks.

    Scale shape: a unionAll of candidate-sized frames (each retriever
    already returned top-k per query) and ONE hash aggregate on
    (query, doc) — never corpus-sized. Determinism: each contribution is
    ``1.0 / (c + rank)`` — one IEEE division of exact integers — and
    IEEE addition is commutative, so with ≤ 2 rankers the fused sum is
    bit-identical cross-engine regardless of aggregation order (3+
    rankers can associate differently under partial aggregation; rank
    outputs stay stable, but the raw sum may differ in the last ulp —
    pass integer-scaled contributions if exactness matters there).

    Returns (query, doc, rrf, n_rankers).
    """
    parts = [
        r.select(
            F.col(query_col), F.col(doc_col),
            (F.lit(1.0) / (F.lit(c) + F.col(rank_col))).alias("_contrib"))
        for r in rankings
    ]
    u = parts[0]
    for p in parts[1:]:
        u = u.unionByName(p)
    return (
        u.groupBy(query_col, doc_col)
        .agg(F.sum("_contrib").alias("rrf"),
             F.count(F.lit(1)).cast("bigint").alias("n_rankers"))
    )


# --- persisted incremental postings index -----------------------------------
#
# The production retrieval shape at 10^12 turns: the corpus is indexed
# once, and every new shard MERGES into the persisted index instead of
# re-tokenizing the whole corpus. Correctness rests on two monoids:
#   df:       shards have disjoint doc_ids, so per-word distinct-doc
#             counts ADD across shards;
#   postings: the capped list keeps the ``max_postings`` SMALLEST doc
#             ids, and the k smallest of a union are always contained in
#             (k smallest of A) ∪ (k smallest of B) — so merging two
#             capped lists and re-capping equals capping the union.
# The driver query (``postings_incremental``) loads the corpus in two
# halves and must match build_postings' batch SQL VERBATIM.


def _postings_partial(docs: DataFrame, text_col: str, id_col: str,
                      max_postings: int) -> DataFrame:
    """One shard's mergeable state: (word, df, post_ids) with post_ids =
    the shard's ``max_postings`` smallest doc ids, ascending."""
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
        "word", "doc_id",
        F.row_number().over(w).alias("_rn"),
        F.count(F.lit(1)).over(Window.partitionBy("word")).alias("_df"),
    )
    return (
        ranked.filter(F.col("_rn") <= max_postings)
        .groupBy("word")
        .agg(
            F.max("_df").cast("bigint").alias("df"),
            F.sort_array(
                F.collect_list(F.col("doc_id").cast("bigint"))
            ).alias("post_ids"),
        )
    )


def write_postings_index(spark, docs: DataFrame, path: str,
                         text_col: str = "text", id_col: str = "doc_id",
                         max_postings: int = 10,
                         n_buckets: int = 16) -> None:
    """Initial load: vocabulary rows laid out as
    ``_bucket = pmod(hash(word), n_buckets)`` partition dirs so a merge
    can rewrite buckets, not the whole index."""
    part = _postings_partial(docs, text_col, id_col, max_postings)
    (
        part.withColumn(
            "_bucket", F.pmod(F.hash(F.col("word")), F.lit(n_buckets)))
        # explicit partition count: AQE sizes exchanges by BYTES and
        # would coalesce the small vocab frame under n_buckets tasks
        .repartition(n_buckets, "_bucket")
        .write.partitionBy("_bucket")
        .mode("overwrite")
        .parquet(path)
    )


def append_postings_index(spark, new_docs: DataFrame, path: str,
                          text_col: str = "text", id_col: str = "doc_id",
                          max_postings: int = 10,
                          n_buckets: int = 16) -> None:
    """Merge one shard into the persisted index. Cost is
    delta-tokenize + vocabulary-of-touched-buckets merge — the corpus
    text is NEVER re-read (that is the whole point; a natural-language
    delta touches most buckets, so the rewrite is vocab-sized, not
    corpus-sized). Contract: delta doc_ids are fresh (Iceberg-append
    discipline, same as dedup_incremental).
    """
    delta = _postings_partial(
        new_docs, text_col, id_col, max_postings
    ).withColumn(
        "_bucket", F.pmod(F.hash(F.col("word")), F.lit(n_buckets))
    ).localCheckpoint(eager=True)
    touched = sorted(
        r["_bucket"] for r in delta.select("_bucket").distinct().collect())
    old = (
        spark.read.parquet(path)
        .filter(F.col("_bucket").isin(touched))
        .select("word", "df", "post_ids", "_bucket")
    )
    merged = (
        old.unionByName(delta.select("word", "df", "post_ids", "_bucket"))
        .groupBy("word")
        .agg(
            F.sum("df").cast("bigint").alias("df"),
            # k-smallest of the union == re-capped merge of capped lists
            F.slice(
                F.array_sort(F.flatten(F.collect_list("post_ids"))),
                1, max_postings,
            ).alias("post_ids"),
            F.max("_bucket").alias("_bucket"),
        )
        .localCheckpoint(eager=True)  # materialize before overwriting input
    )
    (
        merged.repartition(len(touched), "_bucket")
        .write.partitionBy("_bucket")
        .option("partitionOverwriteMode", "dynamic")
        .mode("overwrite")
        .parquet(path)
    )


def read_postings(spark, path: str) -> DataFrame:
    """Load the persisted index in build_postings' output contract:
    (word, df, postings comma-joined ascending)."""
    idx = spark.read.parquet(path)
    return idx.select(
        "word",
        F.col("df").cast("bigint").alias("df"),
        F.array_join(
            F.transform(F.col("post_ids"), lambda x: x.cast("string")),
            ",",
        ).alias("postings"),
    )
