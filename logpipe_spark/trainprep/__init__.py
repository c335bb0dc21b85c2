"""Training-data preparation operators over the ``documents`` / ``embeddings``
tables: deduplication (exact, MinHash+LSH, SimHash, n-gram Jaccard,
embedding-cosine), similarity search (brute-force + LSH-bucketed ANN),
text analysis (language-ID, quality scoring, fingerprinting), and
multimodal binary-column plumbing.

These generalize the reference's single-stream transform surface
(``src/transformers/*`` in vellascogabriel/logpipe) to the corpus-level
operations a 100 TB training-data pipeline needs. All hot paths are
JVM-side built-ins; the only Python is Arrow-batched pandas UDFs
(SimHash, image decode) — never per-row Python.
"""
