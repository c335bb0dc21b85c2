"""Deduplication operators: exact, MinHash+LSH, SimHash, n-gram Jaccard.

Scale notes (100 TB corpus, 1000 executors):
- Exact dedup is one hash-shuffle on ``md5(text)`` — the canonical
  map-side-combinable groupBy; AQE coalesces the post-agg partitions.
- MinHash+LSH shuffles on (band_idx, band_hash) — candidate generation is
  linear in corpus size (each doc lands in ``n_bands`` buckets), never the
  O(n²) all-pairs join. Only the verified candidate pairs (tiny) touch the
  quadratic Jaccard join, and that join is keyed on shingle so Spark
  hash-partitions it; skewed mega-buckets (boilerplate shingles) are
  handled by AQE skew-join plus the ``max_bucket`` cap.
- SimHash is a single Arrow-batched pandas UDF pass (no shuffle) followed
  by a groupBy on the 63-bit signature.

Everything here is deterministic (md5-based hashing, fixed seeds) so the
DuckDB oracle in ``__spark_entry__.oracle_sql`` reproduces results exactly.
Reference parity: the reference has no dedup operators (SURVEY.md §2.4);
these are the round-brief training-data extensions built on the same
parse/aggregate machinery.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# ---------------------------------------------------------------------------
# Exact dedup
# ---------------------------------------------------------------------------


def exact_dedup_groups(docs: DataFrame, text_col: str = "text",
                       id_col: str = "doc_id") -> DataFrame:
    """Group documents by md5(text); keeper = min id per group.

    Returns (text_hash, n_copies, keeper_doc_id). A downstream
    ``docs.join(groups, ...)`` filtered to ``id == keeper`` materializes the
    deduplicated corpus; we expose the group table because it is the
    shuffle-bearing part.
    """
    return (
        docs.groupBy(F.md5(F.col(text_col)).alias("text_hash"))
        .agg(
            F.count(F.lit(1)).alias("n_copies"),
            F.min(F.col(id_col)).alias("keeper_doc_id"),
        )
    )


# ---------------------------------------------------------------------------
# Shingling (word n-grams) — pure built-ins, no UDF
# ---------------------------------------------------------------------------


def word_shingles(docs: DataFrame, text_col: str = "text",
                  id_col: str = "doc_id", k: int = 2) -> DataFrame:
    """Distinct word-k-gram shingles per document: (doc_id, shingle).

    Entirely JVM-side: split → sequence → transform → array_distinct →
    explode, all inside whole-stage codegen. 1-based indexing mirrors the
    DuckDB oracle's list semantics.
    """
    w = docs.select(F.col(id_col).alias("doc_id"),
                    F.split(F.col(text_col), " ").alias("w"))
    parts = ", ".join(f"element_at(w, i + {j})" for j in range(k))
    gram_expr = (
        f"CASE WHEN size(w) >= {k} THEN array_distinct("
        f"transform(sequence(1, size(w) - {k - 1}), "
        f"i -> concat_ws(' ', {parts}))) "
        f"ELSE array() END"
    )
    return w.select("doc_id", F.explode(F.expr(gram_expr)).alias("shingle"))


def cap_shingles(shingles: DataFrame, max_df: int) -> DataFrame:
    """Stop-shingle removal: drop shingles appearing in more than ``max_df``
    documents before candidate generation.

    A boilerplate shingle shared by M documents creates an O(M²) hot bucket
    in any shingle-keyed self-join — at 100 TB a single license header makes
    the join quadratic. Capping document frequency bounds every posting list
    at ``max_df``, so candidate generation is ≤ max_df × n_postings pairs.
    The hot-shingle set itself is small (≤ n_postings / max_df entries) —
    AQE broadcasts the anti-join side.

    Used for CANDIDATE GENERATION only: the exact-Jaccard verify still runs
    on full shingle sets, so surviving pairs' scores are unchanged (a pair
    connected only by boilerplate is the one class this de-recalls, by
    design — boilerplate similarity is the noise being removed).
    """
    df_counts = shingles.groupBy("shingle").agg(
        F.count(F.lit(1)).alias("_df"))
    hot = df_counts.filter(F.col("_df") > max_df).select("shingle")
    return shingles.join(hot, "shingle", "left_anti")


# ---------------------------------------------------------------------------
# MinHash + LSH
# ---------------------------------------------------------------------------


def minhash_signatures(shingles: DataFrame, n_hashes: int = 12) -> DataFrame:
    """Per-doc MinHash signature: h_s = min(md5(shingle || '#s')) for each seed.

    One groupBy (single shuffle on doc_id) computes all seeds at once —
    map-side partial min keeps shuffle volume at n_hashes × 32 bytes per doc
    regardless of document length.
    """
    aggs = [
        F.min(F.md5(F.concat(F.col("shingle"), F.lit(f"#{s}")))).alias(f"h{s}")
        for s in range(n_hashes)
    ]
    return shingles.groupBy("doc_id").agg(*aggs)


def band_rows(sigs: DataFrame, n_hashes: int = 12,
              band_size: int = 3) -> DataFrame:
    """Explode MinHash signatures into LSH band rows
    (doc_id, band_idx, band_hash) — the unit both the in-corpus self-join
    (:func:`lsh_candidate_pairs`) and the persisted signature index
    (:func:`write_band_index`) are built from."""
    n_bands = n_hashes // band_size
    bands = F.array(*[
        F.struct(
            F.lit(b).alias("band_idx"),
            F.md5(F.concat_ws("|", *[
                F.col(f"h{b * band_size + j}") for j in range(band_size)
            ])).alias("band_hash"),
        )
        for b in range(n_bands)
    ])
    return sigs.select("doc_id", F.explode(bands).alias("b")).select(
        "doc_id", F.col("b.band_idx").alias("band_idx"),
        F.col("b.band_hash").alias("band_hash"))


def lsh_candidate_pairs(sigs: DataFrame, n_hashes: int = 12,
                        band_size: int = 3) -> DataFrame:
    """LSH banding: band_hash = md5(h_i||…||h_{i+band_size-1}); docs sharing a
    (band_idx, band_hash) bucket become candidate pairs (doc_a < doc_b).

    The self-join is keyed on the band hash → hash-partitioned, linear
    candidate generation. Returns distinct (doc_a, doc_b).
    """
    if n_hashes % band_size != 0:
        raise ValueError(
            f"n_hashes={n_hashes} not divisible by band_size={band_size}: "
            f"the leftover hashes would be silently ignored, weakening recall")
    buckets = band_rows(sigs, n_hashes=n_hashes, band_size=band_size)
    a = buckets.alias("a")
    b = buckets.alias("b")
    return (
        a.join(b, ["band_idx", "band_hash"])
        .where(F.col("a.doc_id") < F.col("b.doc_id"))
        .select(F.col("a.doc_id").alias("doc_a"),
                F.col("b.doc_id").alias("doc_b"))
        .distinct()
    )


def jaccard_on_pairs(pairs: DataFrame, shingles: DataFrame) -> DataFrame:
    """Exact Jaccard similarity for given candidate (doc_a, doc_b) pairs.

    |A∩B| via a shingle-keyed join restricted to candidates; |A|,|B| from a
    per-doc count. Only candidate pairs (tiny after LSH) reach this stage.
    Returns (doc_a, doc_b, jaccard).
    """
    sizes = shingles.groupBy("doc_id").agg(F.count(F.lit(1)).alias("sz"))
    ea = shingles.select(F.col("doc_id").alias("doc_a"), "shingle")
    eb = shingles.select(F.col("doc_id").alias("doc_b"), "shingle")
    inter = (
        pairs.join(ea, "doc_a")
        .join(eb, ["doc_b", "shingle"])
        .groupBy("doc_a", "doc_b")
        .agg(F.count(F.lit(1)).alias("i"))
    )
    return (
        inter
        .join(sizes.select(F.col("doc_id").alias("doc_a"),
                           F.col("sz").alias("sza")), "doc_a")
        .join(sizes.select(F.col("doc_id").alias("doc_b"),
                           F.col("sz").alias("szb")), "doc_b")
        .select(
            "doc_a", "doc_b",
            (F.col("i") / (F.col("sza") + F.col("szb") - F.col("i")))
            .alias("jaccard"),
        )
    )


def minhash_lsh_dedup(docs: DataFrame, k: int = 2, n_hashes: int = 12,
                      band_size: int = 3, threshold: float = 0.4,
                      max_df: int | None = None,
                      reuse: str | None = "persist") -> DataFrame:
    """Full MinHash→LSH→verify pipeline: near-dup pairs with Jaccard ≥ threshold.

    ``max_df`` (the 100 TB default; None keeps exact oracle parity) drops
    stop-shingles (:func:`cap_shingles`) before signatures + banding, so no
    boilerplate shingle can dominate every band bucket; the exact-Jaccard
    verify still runs on FULL shingle sets — surviving pairs keep their
    uncapped scores.

    The shingle table feeds FOUR consumers (signatures + both sides of the
    intersection join + sizes) and the signature table both sides of the
    band self-join — without reuse Spark re-runs the explode/groupBy per
    consumer (measured 2.3× steady-state, 8× cold at sf0.1).
    ``reuse='persist'`` caches both (MEMORY_AND_DISK); at 100 TB make the
    shingle/signature tables explicit checkpointed stages instead
    (`plans/checkpoint.py`) — same single-evaluation shape, spillable to
    the cluster's disks. ``reuse=None`` keeps the pure-lazy plan.
    """
    sh = word_shingles(docs, k=k)
    if reuse == "persist":
        from pyspark.storagelevel import StorageLevel
        sh = sh.persist(StorageLevel.MEMORY_AND_DISK)
    sh_cand = cap_shingles(sh, max_df) if max_df is not None else sh
    sigs = minhash_signatures(sh_cand, n_hashes=n_hashes)
    if reuse == "persist":
        from pyspark.storagelevel import StorageLevel
        sigs = sigs.persist(StorageLevel.MEMORY_AND_DISK)
    cand = lsh_candidate_pairs(sigs, n_hashes=n_hashes, band_size=band_size)
    j = jaccard_on_pairs(cand, sh)
    return j.where(F.col("jaccard") >= threshold)


def ngram_jaccard_pairs(docs: DataFrame, k: int = 3,
                        threshold: float = 0.12,
                        max_df: int | None = None,
                        reuse: str | None = "persist") -> DataFrame:
    """All-pairs n-gram Jaccard ≥ threshold, candidates = docs sharing ≥1 shingle.

    The shingle-keyed self-join bounds the quadratic blowup to co-occurring
    shingles (inverted-index join). Shingle width is THE density lever:
    word bigrams over this corpus's small vocabulary made every doc pair
    collide (10.3M intersecting pairs at sf0.1, 24 s); trigrams cut it to
    1.1M (2.5 s) with the same near-dup pairs surviving the threshold.

    ``max_df`` (the 100 TB default; None keeps the single-join oracle-parity
    plan) removes stop-shingles before the inverted-index join — a
    boilerplate shingle shared by M docs is an O(M²) hot bucket otherwise.
    With the cap, candidates come from rare shingles only and the exact
    Jaccard is then computed on FULL shingle sets via
    :func:`jaccard_on_pairs`, so surviving pairs score identically to the
    uncapped path.

    ``reuse='persist'`` caches the shingle table, which feeds three
    consumers (both join sides + sizes) — see :func:`minhash_lsh_dedup`'s
    note; checkpoint it instead at 100 TB.
    """
    sh = word_shingles(docs, k=k)
    if reuse == "persist":
        from pyspark.storagelevel import StorageLevel
        sh = sh.persist(StorageLevel.MEMORY_AND_DISK)
    if max_df is not None:
        sh_rare = cap_shingles(sh, max_df)
        ra = sh_rare.select(F.col("doc_id").alias("doc_a"), "shingle")
        rb = sh_rare.select(F.col("doc_id").alias("doc_b"), "shingle")
        cand = (
            ra.join(rb, "shingle")
            .where(F.col("doc_a") < F.col("doc_b"))
            .select("doc_a", "doc_b")
            .distinct()
        )
        j = jaccard_on_pairs(cand, sh)
        return j.where(F.col("jaccard") >= threshold)
    sizes = sh.groupBy("doc_id").agg(F.count(F.lit(1)).alias("sz"))
    ea = sh.select(F.col("doc_id").alias("doc_a"), "shingle")
    eb = sh.select(F.col("doc_id").alias("doc_b"), "shingle")
    # inverted-index join: |A∩B| comes straight out of the shingle-keyed
    # self-join with a groupBy — no candidate materialization + re-join
    # (that shape re-derives the shingle explosion per branch and was 40×
    # slower). One shuffle on shingle, one on the pair key.
    inter = (
        ea.join(eb, "shingle")
        .where(F.col("doc_a") < F.col("doc_b"))
        .groupBy("doc_a", "doc_b")
        .agg(F.count(F.lit(1)).alias("i"))
    )
    # no broadcast hint on sizes: it is corpus-sized (one row per doc) -
    # AQE broadcasts it when small; at scale these stay shuffled joins
    j = (
        inter
        .join(sizes.select(F.col("doc_id").alias("doc_a"),
                           F.col("sz").alias("sza")), "doc_a")
        .join(sizes.select(F.col("doc_id").alias("doc_b"),
                           F.col("sz").alias("szb")), "doc_b")
        .select("doc_a", "doc_b",
                (F.col("i") / (F.col("sza") + F.col("szb") - F.col("i")))
                .alias("jaccard"))
    )
    return j.where(F.col("jaccard") >= threshold)


# ---------------------------------------------------------------------------
# SimHash (63-bit, md5-token based) — Arrow-batched pandas UDF
# ---------------------------------------------------------------------------

_BITS = 63
_POWS = (1 << np.arange(_BITS, dtype=np.uint64))


def _simhash_batch(texts: pd.Series) -> pd.Series:
    """Vectorized 63-bit SimHash of whitespace tokens (md5-derived bit planes).

    Token multiplicity counts. Works on the exploded token frame with a
    per-unique-token md5 (vocabulary-sized, not corpus-sized), then a
    groupby-sum back to rows — no per-row Python loop over documents.
    """
    ex = texts.fillna("").str.split(" ").explode()
    uniq = ex.dropna().unique()
    vecs = np.empty((len(uniq), _BITS), dtype=np.int32)
    for i, tok in enumerate(uniq):  # vocabulary loop, not row loop
        v = int(hashlib.md5(tok.encode("utf-8")).hexdigest()[:16], 16)
        vecs[i] = [1 if (v >> j) & 1 else -1 for j in range(_BITS)]
    idx = pd.Series(np.arange(len(uniq)), index=uniq)
    tok_rows = ex.index.to_numpy()
    tok_vecs = vecs[idx[ex.values].to_numpy()]
    sums = np.zeros((len(texts), _BITS), dtype=np.int64)
    np.add.at(sums, tok_rows, tok_vecs)
    bits = (sums > 0).astype(np.uint64)
    out = (bits * _POWS).sum(axis=1).astype(np.int64)
    return pd.Series(out, index=texts.index)


from pyspark.sql.types import LongType  # noqa: E402 (after batch kernel)

simhash63 = F.pandas_udf(_simhash_batch, LongType())


def simhash_signatures(docs: DataFrame, text_col: str = "text",
                       id_col: str = "doc_id") -> DataFrame:
    """(doc_id, simhash) — near-dup docs share low-Hamming-distance signatures.

    Banding the 63 bits into 4×15-bit keys (the top 3 bits do not
    participate) turns low-Hamming search into equality joins (same LSH
    trick as MinHash); exposed via :func:`simhash_bands`.
    """
    return docs.select(
        F.col(id_col).alias("doc_id"),
        simhash63(F.col(text_col)).alias("simhash"),
    )


def simhash_bands(sigs: DataFrame, n_bands: int = 4,
                  keep_signature: bool = False) -> DataFrame:
    """Split the 63-bit signature into n_bands equality-joinable keys.

    ``keep_signature=True`` carries the simhash column through the explode
    so the Hamming verify can ride the band join directly — without it the
    caller re-joins ``sigs``, which re-evaluates the (pandas-UDF) signature
    computation a second time per join side.
    """
    width = _BITS // n_bands
    bands = F.array(*[
        F.struct(
            F.lit(b).alias("band_idx"),
            F.shiftrightunsigned(F.col("simhash"), b * width)
            .bitwiseAND(F.lit((1 << width) - 1)).alias("band_key"),
        )
        for b in range(n_bands)
    ])
    cols = ["doc_id"] + (["simhash"] if keep_signature else [])
    return sigs.select(*cols, F.explode(bands).alias("b")).select(
        *cols, "b.band_idx", "b.band_key")


# ---------------------------------------------------------------------------
# Cross-document duplicated-chunk fraction (RefinedWeb/FineWeb-style signal)
# ---------------------------------------------------------------------------


def chunk_dup_stats(docs: DataFrame, text_col: str = "text",
                    id_col: str = "doc_id", chunk_words: int = 8) -> DataFrame:
    """Per-document fraction of text duplicated ACROSS the corpus, at
    fixed-width word-chunk granularity: (doc_id, n_chunks, n_dup_chunks,
    dup_frac). A chunk is "duplicated" when its hash occurs in more than
    one distinct document — the cross-corpus complement of the intra-doc
    ``textqual.repetition_score`` (Gopher) signal; high dup_frac marks
    near-template documents that survive doc-level exact dedup.

    Chunks are consecutive ``chunk_words``-word windows (non-overlapping;
    the tail chunk may be short), built array-side with sequence/slice —
    no per-word explode, one chunk row per ~``chunk_words`` words. The
    per-chunk document frequency is a groupBy on the md5 chunk hash (the
    natural shuffle key, fixed 32 B regardless of chunk text) joined back
    on the same key; the per-doc rollup combines map-side. A boilerplate
    chunk's hash group carries one COUNT per doc, never the texts — the
    hot-key cost is a count aggregation, not a quadratic join.

    dup_frac is the raw double quotient of the two integer counts —
    bit-identical cross-engine, never rounded.
    """
    base = docs.select(F.col(id_col).alias("doc_id"),
                       F.split(F.col(text_col), " ").alias("ws"))
    # ws materialized above: the chunk lambda references it many times, and
    # CollapseProject would otherwise inline one split() call per reference
    # (the 25x re-split trap — BENCH.md round-2 notes).
    n_chunks = F.floor((F.size("ws") + F.lit(chunk_words - 1)) / F.lit(chunk_words))
    chunks = base.select(
        "doc_id",
        F.explode_outer(
            F.transform(
                F.sequence(F.lit(0), (n_chunks - 1).cast("int")),
                lambda i: F.md5(F.array_join(
                    F.slice("ws", i * chunk_words + 1, chunk_words), " ")),
            )
        ).alias("chunk_hash"),
    ).filter(F.col("chunk_hash").isNotNull())
    dfc = chunks.groupBy("chunk_hash").agg(
        F.count_distinct("doc_id").alias("_docs"))
    per_doc = (
        chunks.join(dfc, "chunk_hash")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_chunks"),
            F.sum(F.when(F.col("_docs") > 1, 1).otherwise(0))
            .cast("bigint").alias("n_dup_chunks"),
        )
    )
    return per_doc.select(
        "doc_id", "n_chunks", "n_dup_chunks",
        (F.col("n_dup_chunks") / F.col("n_chunks")).alias("dup_frac"),
    )


def jaccard_prefix_pairs(docs: DataFrame, k: int = 3,
                         threshold: float = 0.4,
                         reuse: str | None = "persist") -> DataFrame:
    """Prefix-filtering set-similarity self-join (the PPJoin family:
    Chaudhuri et al. ICDE'06 prefix filter + the length filter of Xiao
    et al. WWW'08) — the published scale path for high-threshold Jaccard
    joins, LOSSLESS vs the plain inverted-index join.

    Two prunes, both safe for Jaccard ≥ t:

    * **prefix filter**: order every doc's shingles by ascending document
      frequency (rarest first, (df, shingle) as the canonical total
      order); two sets with Jaccard ≥ t MUST collide inside each other's
      first ``|S| − ⌈t·|S|⌉ + 1`` shingles, so only that prefix is indexed —
      the join density drops from "docs sharing ANY shingle" to "docs
      sharing a RARE shingle", and hot boilerplate shingles fall out of
      the index automatically (they sort last).
    * **length filter**: Jaccard ≥ t ⟹ min(|A|,|B|) ≥ t·max(|A|,|B|);
      applied inside the candidate join.

    Both float comparisons carry a 1e-9 slack toward MORE candidates, so
    rounding can only widen the candidate set — the exact verify
    (:func:`jaccard_on_pairs` on FULL shingle sets) makes the final pair
    set identical to :func:`ngram_jaccard_pairs` at the same threshold
    (asserted in tests).

    Plan: df counts are one combinable shuffle; the per-doc rank window
    partitions by doc_id (bounded by document length); the candidate
    join touches only prefix postings. Output (doc_a, doc_b, jaccard).
    """
    from pyspark.sql import Window

    sh = word_shingles(docs, k=k)
    if reuse == "persist":
        from pyspark.storagelevel import StorageLevel
        sh = sh.persist(StorageLevel.MEMORY_AND_DISK)
    dfreq = sh.groupBy("shingle").agg(F.count(F.lit(1)).alias("_df"))
    w_rank = Window.partitionBy("doc_id").orderBy("_df", "shingle")
    w_doc = Window.partitionBy("doc_id")
    ranked = (
        sh.join(dfreq, "shingle")
        .select(
            "doc_id", "shingle",
            F.row_number().over(w_rank).alias("_rn"),
            F.count(F.lit(1)).over(w_doc).alias("_sz"),
        )
    )
    # prefix length |S| - ceil(t*|S|) + 1; the 1e-9 slack errs toward a
    # LONGER prefix when t*|S| lands on an integer boundary
    prefix_len = (F.col("_sz")
                  - F.ceil(F.lit(threshold) * F.col("_sz") - F.lit(1e-9))
                  + 1)
    prefix = ranked.where(F.col("_rn") <= prefix_len)
    pa = prefix.select(F.col("doc_id").alias("doc_a"), "shingle",
                       F.col("_sz").alias("_sza"))
    pb = prefix.select(F.col("doc_id").alias("doc_b"), "shingle",
                       F.col("_sz").alias("_szb"))
    cand = (
        pa.join(pb, "shingle")
        .where(
            (F.col("doc_a") < F.col("doc_b"))
            & (F.least("_sza", "_szb")
               >= F.lit(threshold) * F.greatest("_sza", "_szb") - F.lit(1e-9))
        )
        .select("doc_a", "doc_b")
        .distinct()
    )
    j = jaccard_on_pairs(cand, sh)
    return j.where(F.col("jaccard") >= threshold)


# ---------------------------------------------------------------------------
# Incremental cross-corpus dedup (delta vs persisted signature index)
# ---------------------------------------------------------------------------


def write_band_index(spark, docs: DataFrame, path: str, k: int = 2,
                     n_hashes: int = 12, band_size: int = 3,
                     n_buckets: int = 64,
                     max_df: int | None = None) -> None:
    """Initial load of the persisted MinHash signature index: one row per
    (doc_id, band_idx, band_hash), laid out as
    ``_bucket = pmod(hash(band_hash), n_buckets)`` partition dirs — the
    same keyed layout as ``plans/merge.write_keyed`` — so a delta probe
    reads ONLY the bucket dirs its own band hashes fall in, never the
    whole index. This is the production dedup shape at 10^12 turns: the
    corpus is deduped once, and every new shard joins against this table
    instead of re-running the whole-corpus self-join (the reference's
    resume-by-offset intent, ``src/utils/checkpointManager.js:217-232``,
    applied to dedup).
    """
    sigs = minhash_signatures(
        cap_shingles(word_shingles(docs, k=k), max_df)
        if max_df is not None else word_shingles(docs, k=k),
        n_hashes=n_hashes)
    rows = band_rows(sigs, n_hashes=n_hashes, band_size=band_size)
    (
        rows.withColumn(
            "_bucket", F.pmod(F.hash(F.col("band_hash")), F.lit(n_buckets)))
        # explicit partition count: AQE would size the exchange by BYTES
        # and coalesce the md5-dense band projection into too few tasks
        .repartition(n_buckets, "_bucket")
        .write.partitionBy("_bucket")
        .mode("overwrite")
        .parquet(path)
    )


def dedup_incremental(spark, new_docs: DataFrame, index_path: str,
                      corpus_docs: DataFrame, k: int = 2,
                      n_hashes: int = 12, band_size: int = 3,
                      threshold: float = 0.4, n_buckets: int = 64,
                      update_index: bool = True) -> DataFrame:
    """Incremental MinHash+LSH dedup: near-dup pairs INVOLVING the delta —
    new-vs-corpus (via the persisted band index at ``index_path``) plus
    new-vs-new (self-join within the delta). Appends the delta's band
    rows into the index afterwards, so the next shard sees this one.

    Equivalence contract (driver-gated): running the corpus in two
    halves — batch on half A, then ``dedup_incremental`` of half B
    against A's index — yields EXACTLY the union's
    :func:`minhash_lsh_dedup` pairs, because candidate generation is the
    same bucket-equality condition (shared (band_idx, band_hash)) whether
    the other side comes from the live self-join or the persisted index,
    and the verify recomputes exact Jaccard on full shingle sets both
    ways. The driver query's oracle IS the batch SQL.

    Scale shape: delta cost ∝ delta size — the delta's shingles/bands are
    delta-sized; the index read is bucket-pruned to the delta's band
    hashes; ``corpus_docs`` is touched ONLY via a candidate-id semi-join
    (point lookups — bucket/Iceberg-partition prunable when the corpus is
    laid out by doc_id). Never a corpus-wide self-join. Measured in
    ``bench/incr_dedup.py``.

    Contracts: ``new_docs`` doc_ids must be disjoint from the corpus
    (Iceberg-append discipline); ``update_index=True`` appends — re-running
    the same delta would double its rows (make the append part of the same
    commit as the shard itself on Iceberg). ``max_df`` capping is NOT
    applied here: a delta-local document frequency diverges from the
    corpus-wide one (keep a persisted global df table if capping is
    needed at scale). Every delta appends one file per touched bucket,
    so the index fragments over time — ``plans.layout.compact_small_files``
    on the index path is the maintenance op (partition-aware; results
    unchanged, asserted in tests).

    Returns (doc_a, doc_b, jaccard) with doc_a < doc_b.

    Lineage discipline: the fan-out frames (delta shingles, band rows,
    candidates, verify shingles) are cut with ``localCheckpoint``, not
    ``persist`` — a persist caches DATA but Catalyst still re-optimizes
    the full accumulated tree on EVERY downstream action (here ~400
    plan nodes × 3 verify consumers × AQE re-planning: measured 13 s of
    pure driver-side planning per action at delta=25k, vs <1 s after
    truncation). All four frames are delta/candidate-sized. On a real
    cluster swap localCheckpoint for reliable checkpoint() if executor
    loss during the (short) verify must be survivable.
    """
    sh_new = word_shingles(new_docs, k=k).localCheckpoint(eager=True)
    sigs_new = minhash_signatures(sh_new, n_hashes=n_hashes)
    bands_new = band_rows(sigs_new, n_hashes=n_hashes, band_size=band_size) \
        .localCheckpoint(eager=True)

    # bucket-pruned index probe: the delta's distinct buckets are
    # metadata-sized (≤ n_buckets) — same collect-to-prune as merge_upsert
    probe_buckets = sorted(
        r["_b"] for r in bands_new.select(
            F.pmod(F.hash(F.col("band_hash")), F.lit(n_buckets)).alias("_b"))
        .distinct().collect())
    index = (
        spark.read.parquet(index_path)
        .filter(F.col("_bucket").isin(probe_buckets))
        .select("doc_id", "band_idx", "band_hash")
    )

    cross = (
        bands_new.alias("n")
        .join(index.alias("o"), ["band_idx", "band_hash"])
        .select(
            F.least(F.col("n.doc_id"), F.col("o.doc_id")).alias("doc_a"),
            F.greatest(F.col("n.doc_id"), F.col("o.doc_id")).alias("doc_b"),
        )
    )
    a, b = bands_new.alias("a"), bands_new.alias("b")
    within = (
        a.join(b, ["band_idx", "band_hash"])
        .where(F.col("a.doc_id") < F.col("b.doc_id"))
        .select(F.col("a.doc_id").alias("doc_a"),
                F.col("b.doc_id").alias("doc_b"))
    )
    # cand feeds THREE consumers (the broadcast id list, and both join
    # keys of the verify) — checkpoint so the index probe runs once AND
    # the probe's plan stops growing the verify's tree
    cand = cross.unionByName(within).distinct().localCheckpoint(eager=True)

    # verify on FULL shingle sets: corpus texts fetched by candidate id
    # only (semi-join — point reads, not a scan, on a doc_id-keyed corpus).
    # jaccard_on_pairs reads its shingle frame THREE times (sizes + both
    # join sides) — checkpoint the candidate-restricted shingles so the
    # corpus is scanned once, not three times.
    cand_ids = cand.select(F.col("doc_a").alias("doc_id")).unionByName(
        cand.select(F.col("doc_b").alias("doc_id"))).distinct()
    corpus_hit = corpus_docs.join(F.broadcast(cand_ids), "doc_id", "semi")
    sh_all = sh_new.unionByName(word_shingles(corpus_hit, k=k)) \
        .localCheckpoint(eager=True)
    pairs = jaccard_on_pairs(cand, sh_all).where(
        F.col("jaccard") >= threshold)

    if update_index:
        # materialize results BEFORE mutating the index the plan reads
        pairs = pairs.localCheckpoint(eager=True)
        (
            bands_new.withColumn(
                "_bucket",
                F.pmod(F.hash(F.col("band_hash")), F.lit(n_buckets)))
            .repartition(n_buckets, "_bucket")
            .write.partitionBy("_bucket")
            .mode("append")
            .parquet(index_path)
        )
    return pairs


# ---------------------------------------------------------------------------
# Position-level exact substring dedup (dup spans)
# ---------------------------------------------------------------------------


def dup_spans(docs: DataFrame, text_col: str = "text",
              id_col: str = "doc_id", k: int = 3,
              min_count: int = 2) -> DataFrame:
    """Per-document duplicated-SPAN coverage: the fraction of a doc's
    token positions covered by word k-grams that occur ≥ ``min_count``
    times in the whole corpus (the practical Spark form of Lee et al.
    2022, "Deduplicating Training Data Makes Language Models Better" —
    repeated substrings matter at POSITION granularity, not just
    chunk/doc granularity like ``chunk_dup_frac``/``dedup_exact``).

    Plan (3 shuffles, all key-partitioned, no self-join anywhere):
      1. positional grams (doc_id, pos, gram) via posexplode — positions
         kept, so overlapping hits merge as intervals, not counts;
      2. corpus gram occurrence counts (one groupBy gram, map-side
         combinable) filtered to hot grams;
      3. membership join on gram + per-doc interval union via ONE lead()
         window: a dup gram at pos covers [pos, pos+k-1]; overlapping
         covers collapse because each position contributes
         min(k, next_pos - pos).

    dup_span_frac is the RAW double of two exact integers
    (covered / n_tokens) — bit-identical cross-engine. Returns
    (doc_id, n_tokens, covered_tokens, dup_span_frac) for EVERY doc
    (zero coverage included).

    Reference seam: the reference dedupes nothing; this is training-
    pipeline capability beyond it (SURVEY.md training-data ops).
    """
    from pyspark.sql import Window

    from logpipe_spark.trainprep.curate import with_word_grams

    d = docs.withColumnRenamed(id_col, "doc_id")
    g = with_word_grams(d, text_col, k, keep=["doc_id"])
    # posexplode_outer + isNotNull: same InferFiltersFromGenerate dodge
    # as _word_shingle_sets (an inner explode re-evaluates the gram
    # transform inside an inferred pushed-down filter)
    pg = (
        g.select("doc_id", F.posexplode_outer("grams").alias("pos0", "gram"))
        .filter(F.col("gram").isNotNull())
        .select("doc_id", (F.col("pos0") + 1).alias("pos"), "gram")
    )
    hot = (pg.groupBy("gram").agg(F.count(F.lit(1)).alias("_n"))
           .filter(F.col("_n") >= min_count).select("gram"))
    dup_pos = pg.join(hot, "gram").select("doc_id", "pos")
    w = Window.partitionBy("doc_id").orderBy("pos")
    iv = dup_pos.withColumn("nxt", F.lead("pos").over(w))
    covered = (
        iv.select(
            "doc_id",
            F.when(F.col("nxt").isNull() | (F.col("nxt") - F.col("pos") >= k),
                   F.lit(k))
            .otherwise(F.col("nxt") - F.col("pos")).alias("c"))
        .groupBy("doc_id")
        .agg(F.sum("c").alias("covered"))
    )
    n = d.select("doc_id",
                 F.size(F.split(F.col(text_col), " ")).alias("n_tokens"))
    return (
        n.join(covered, "doc_id", "left")
        .select(
            "doc_id",
            F.col("n_tokens").cast("int").alias("n_tokens"),
            F.coalesce(F.col("covered"), F.lit(0)).cast("int")
            .alias("covered_tokens"),
            (F.coalesce(F.col("covered"), F.lit(0)).cast("double")
             / F.col("n_tokens")).alias("dup_span_frac"),
        )
    )


def strip_dup_spans(docs: DataFrame, text_col: str = "text",
                    id_col: str = "doc_id", k: int = 3,
                    min_count: int = 2) -> DataFrame:
    """The ACTION step to :func:`dup_spans`'s metric: rewrite each doc
    with its corpus-duplicated spans REMOVED (Lee et al. 2022 apply
    repeated-substring deletion before training; dup_spans only scores
    it). A position is removed iff some hot gram (≥ ``min_count``
    occurrences corpus-wide) covers it — the same interval semantics,
    realized as an explode of each dup gram's covered range + one
    anti-join against the positional words.

    Row-preserving: every input doc comes back (a fully-duplicated doc
    yields ``clean_text = ''``). Reassembly is
    sort_array(collect_list(struct(pos, word))) — deterministic, and
    mirrored by the oracle's ``string_agg(... ORDER BY pos)``.
    Returns (doc_id, clean_text, n_tokens, n_removed).
    """
    from pyspark.sql import Window

    from logpipe_spark.trainprep.curate import with_word_grams

    d = docs.select(F.col(id_col).alias("doc_id"), F.col(text_col))
    g = with_word_grams(d, text_col, k, keep=["doc_id"])
    pg = (
        g.select("doc_id", F.posexplode_outer("grams").alias("pos0", "gram"))
        .filter(F.col("gram").isNotNull())
        .select("doc_id", (F.col("pos0") + 1).alias("pos"), "gram")
    )
    hot = (pg.groupBy("gram").agg(F.count(F.lit(1)).alias("_n"))
           .filter(F.col("_n") >= min_count).select("gram"))
    dup_pos = pg.join(hot, "gram").select("doc_id", "pos")
    w = Window.partitionBy("doc_id").orderBy("pos")
    iv = dup_pos.withColumn("nxt", F.lead("pos").over(w)).select(
        "doc_id", "pos",
        F.when(F.col("nxt").isNull() | (F.col("nxt") - F.col("pos") >= k),
               F.lit(k)).otherwise(F.col("nxt") - F.col("pos")).alias("c"))
    covered = iv.select(
        "doc_id",
        F.explode(F.expr("sequence(pos, pos + c - 1)")).alias("pos"))
    words = (
        d.select("doc_id", F.split(F.col(text_col), " ").alias("_w"))
        .select("doc_id", F.posexplode_outer("_w").alias("pos0", "word"))
        .filter(F.col("word").isNotNull())
        .select("doc_id", (F.col("pos0") + 1).alias("pos"), "word")
    )
    kept = words.join(covered, ["doc_id", "pos"], "left_anti")
    rebuilt = kept.groupBy("doc_id").agg(
        F.concat_ws(" ", F.expr(
            "transform(sort_array(collect_list(struct(pos, word))), "
            "x -> x.word)")).alias("clean_text"),
        F.count(F.lit(1)).alias("_n_kept"))
    n = d.select("doc_id",
                 F.size(F.split(F.col(text_col), " ")).alias("n_tokens"))
    return (
        n.join(rebuilt, "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce(F.col("clean_text"), F.lit("")).alias("clean_text"),
            F.col("n_tokens").cast("int").alias("n_tokens"),
            (F.col("n_tokens") - F.coalesce(F.col("_n_kept"), F.lit(0)))
            .cast("int").alias("n_removed"),
        )
    )


def containment_pairs(docs: DataFrame, k: int = 3,
                      max_df: int | None = None, top_k: int = 20,
                      reuse: str | None = "persist") -> DataFrame:
    """Asymmetric near-dup detection: Broder containment
    ``C(A→B) = |shingles(A) ∩ shingles(B)| / |shingles(A)|`` — catches
    a short doc swallowed WHOLE by a longer one (quote expansions,
    concatenated dumps), where symmetric Jaccard dilutes below any
    threshold as the container grows. The directional complement to
    :func:`minhash_lsh_dedup` / :func:`jaccard_pairs`.

    Candidates come from the (optionally df-capped, see
    :func:`cap_shingles`) inverted shingle index as ORDERED pairs —
    the metric is directional, so both orientations of an overlapping
    pair are scored; the exact intersection and |A| run on FULL
    shingle sets, candidates only. Top-k by
    ``(containment DESC, doc_a, doc_b)`` — a total order, so the limit
    is deterministic — via orderBy+limit: TakeOrderedAndProject,
    distributed partial top-k, never a global rank window.

    Returns ``(doc_a, doc_b, inter, size_a, containment)``: doc_a's
    shingles are ``containment``-covered by doc_b's.
    """
    sh = word_shingles(docs, k=k)
    if reuse == "persist":
        from pyspark.storagelevel import StorageLevel
        sh = sh.persist(StorageLevel.MEMORY_AND_DISK)
    cand_src = cap_shingles(sh, max_df) if max_df is not None else sh
    a = cand_src.select(F.col("doc_id").alias("doc_a"), "shingle")
    b = cand_src.select(F.col("doc_id").alias("doc_b"), "shingle")
    cand = (a.join(b, "shingle")
            .where(F.col("doc_a") != F.col("doc_b"))
            .select("doc_a", "doc_b").distinct())
    ea = sh.select(F.col("doc_id").alias("doc_a"), "shingle")
    eb = sh.select(F.col("doc_id").alias("doc_b"), "shingle")
    inter = (cand.join(ea, "doc_a")
             .join(eb, ["doc_b", "shingle"])
             .groupBy("doc_a", "doc_b")
             .agg(F.count(F.lit(1)).cast("bigint").alias("inter")))
    sizes = sh.groupBy("doc_id").agg(
        F.count(F.lit(1)).cast("bigint").alias("size_a"))
    return (inter
            .join(sizes.withColumnRenamed("doc_id", "doc_a"), "doc_a")
            .select("doc_a", "doc_b", "inter", "size_a",
                    (F.col("inter").cast("double")
                     / F.col("size_a").cast("double")).alias("containment"))
            .orderBy(F.col("containment").desc(), "doc_a", "doc_b")
            .limit(int(top_k)))
