"""Tests for corpus-curation operators (trainprep.curate)."""

from __future__ import annotations

from pyspark.sql import functions as F

from logpipe_spark.trainprep.curate import (
    connected_components,
    decontaminate,
    dup_clusters,
    pack_sequences,
    pii_scrub,
    stratified_sample,
)


def _pairs(spark, edges):
    return spark.createDataFrame(edges, "doc_a bigint, doc_b bigint")


def test_connected_components_merges_transitive(spark):
    # A~B, B~C must collapse even though A~C was never a pair;
    # the 4-hop chain exercises multiple propagation rounds.
    pairs = _pairs(spark, [(1, 2), (2, 3), (5, 6), (10, 11), (11, 12),
                           (12, 13), (13, 14)])
    comp = {r.node: r.component
            for r in connected_components(pairs).collect()}
    assert comp == {1: 1, 2: 1, 3: 1, 5: 5, 6: 5,
                    10: 10, 11: 10, 12: 10, 13: 10, 14: 10}


def test_connected_components_edge_direction_irrelevant(spark):
    a = connected_components(_pairs(spark, [(2, 1), (3, 2)]))
    b = connected_components(_pairs(spark, [(1, 2), (2, 3)]))
    assert sorted(map(tuple, a.collect())) == sorted(map(tuple, b.collect()))


def test_dup_clusters_keeper_per_cluster(spark):
    docs = spark.range(10).withColumnRenamed("id", "doc_id")
    pairs = _pairs(spark, [(1, 2), (2, 3), (7, 8)])
    out = dup_clusters(docs, pairs).collect()
    by_id = {r.doc_id: r for r in out}
    assert len(by_id) == 10
    # cluster minima keep, the rest drop
    keepers = sorted(r.doc_id for r in out if r.is_keeper)
    assert keepers == [0, 1, 4, 5, 6, 7, 9]
    assert by_id[3].cluster_id == 1 and by_id[8].cluster_id == 7
    # singletons are their own cluster
    assert by_id[0].cluster_id == 0 and by_id[0].is_keeper


def test_decontaminate_planted_overlap(spark):
    mk = lambda rows: spark.createDataFrame(rows, "doc_id bigint, text string")
    secret = "alpha beta gamma delta epsilon"  # a 5-gram both sides share
    docs = mk([
        (1, f"x y {secret} z w"),
        (2, "totally unrelated words only here now"),
        (3, f"{secret} trailing tail words"),
    ])
    bench = mk([(100, f"prefix {secret} suffix words")])
    out = {(r.doc_id, r.bench_id): r.n_overlap
           for r in decontaminate(docs, bench, k=5).collect()}
    assert set(out) == {(1, 100), (3, 100)}
    assert all(v >= 1 for v in out.values())


def test_decontaminate_max_df_drops_boilerplate(spark):
    mk = lambda rows: spark.createDataFrame(rows, "doc_id bigint, text string")
    boiler = "this document is auto generated"
    docs = mk([(i, f"{boiler} body {i} unique words here") for i in range(6)])
    bench = mk([(100, f"{boiler} eval question text")])
    # every training doc shares only the boilerplate 5-gram with bench;
    # capping its document frequency at 3 kills the stop-gram entirely
    assert decontaminate(docs, bench, k=5).count() == 6
    assert decontaminate(docs, bench, k=5, max_df=3).count() == 0


def test_stratified_sample_counts_and_determinism(spark):
    docs = spark.range(100).select(
        F.col("id").alias("doc_id"),
        F.when(F.col("id") < 80, "big").otherwise("small").alias("source"))
    out = stratified_sample(docs, "source", n_per_stratum=15)
    counts = {r.source: r.c for r in
              out.groupBy("source").agg(F.count("*").alias("c")).collect()}
    assert counts == {"big": 15, "small": 15}
    # smaller stratum than n -> whole stratum
    out2 = stratified_sample(docs, "source", n_per_stratum=30)
    counts2 = {r.source: r.c for r in
               out2.groupBy("source").agg(F.count("*").alias("c")).collect()}
    assert counts2 == {"big": 30, "small": 20}
    # deterministic across runs
    assert sorted(map(tuple, out.collect())) == \
        sorted(map(tuple, stratified_sample(docs, "source", 15).collect()))


def test_pack_sequences_offsets_and_bins(spark):
    rows = [(i, "s", "a b c d e f g h") for i in range(5)]  # 8 tokens each
    docs = spark.createDataFrame(rows, "doc_id bigint, source string, text string")
    out = sorted(map(tuple, pack_sequences(docs, budget=20).collect()))
    # offsets: 0,8,16,24,32 ; bins at floor(offset/20): 0,0,0,1,1
    assert out == [(0, "s", 8, 0, 0), (1, "s", 8, 8, 0), (2, "s", 8, 16, 0),
                   (3, "s", 8, 24, 1), (4, "s", 8, 32, 1)]


def test_pack_sequences_per_shard_independent(spark):
    rows = [(0, "a", "x y"), (1, "b", "x y z"), (2, "a", "x"), (3, "b", "x")]
    docs = spark.createDataFrame(rows, "doc_id bigint, source string, text string")
    out = {r.doc_id: (r.pack_offset, r.bin_id)
           for r in pack_sequences(docs, budget=3).collect()}
    assert out[0] == (0, 0) and out[2] == (2, 0)   # shard a: 2 then 1 tokens
    assert out[1] == (0, 0) and out[3] == (3, 1)   # shard b restarts at 0


def test_pii_scrub_redacts_and_counts(spark):
    rows = [
        (0, "mail me at jane.doe+x@corp.example.com or call 415-555-0133"),
        (1, "no pii in this row at all"),
        (2, "two mails a@b.io c@d.org and 212-555-0101 650-555-022"),
    ]
    df = spark.createDataFrame(rows, "doc_id bigint, text string")
    out = {r.doc_id: r for r in pii_scrub(df).collect()}
    assert out[0].n_emails == 1 and out[0].n_phones == 1
    assert "<EMAIL>" in out[0].clean_text and "<PHONE>" in out[0].clean_text
    assert "jane.doe" not in out[0].clean_text
    assert "415-555-0133" not in out[0].clean_text
    assert out[1].n_emails == 0 and out[1].n_phones == 0
    assert out[1].clean_text == out[1].text
    # 650-555-022 is NOT a full phone (3-3-4) -> untouched
    assert out[2].n_emails == 2 and out[2].n_phones == 1
    assert "650-555-022" in out[2].clean_text


def test_mix_budget_sample_caps_tokens(spark):
    from logpipe_spark.trainprep.curate import mix_budget_sample
    rows = [(i, "a" if i < 20 else "b", "w " * 9 + "w") for i in range(30)]
    docs = spark.createDataFrame(
        [(i, s, t.strip()) for i, s, t in rows],
        "doc_id bigint, source string, text string")  # 10 tokens/doc
    out = mix_budget_sample(docs, budget_tokens=35).collect()
    per = {}
    for r in out:
        per.setdefault(r.stratum, []).append(r)
    # 10-token docs, budget 35 -> 4 docs kept per stratum (cum_before 0,10,20,30)
    assert {s: len(v) for s, v in per.items()} == {"a": 4, "b": 4}
    assert all(r.cum_before < 35 for r in out)
    # tiny budget still keeps >=1 doc per stratum
    out1 = mix_budget_sample(docs, budget_tokens=1).collect()
    assert sorted(r.stratum for r in out1) == ["a", "b"]
    # deterministic across runs
    assert sorted(map(tuple, out)) == sorted(
        map(tuple, mix_budget_sample(docs, budget_tokens=35).collect()))


def test_repetition_score_flags_loops(spark):
    from logpipe_spark.trainprep.textqual import repetition_score
    docs = spark.createDataFrame(
        [(0, "spam ham eggs spam ham eggs spam ham eggs"),
         (1, "all words here are fully distinct tokens")],
        "doc_id bigint, text string")
    out = {r.doc_id: r for r in repetition_score(docs).collect()}
    # doc 0: 7 trigrams, 3 distinct -> ratio 4/7
    assert out[0].n_grams == 7 and out[0].n_distinct == 3
    assert abs(out[0].rep_ratio - 4 / 7) < 1e-12
    assert out[1].rep_ratio == 0.0


def test_top_ngrams_rank_and_ties(spark):
    from logpipe_spark.trainprep.textqual import top_ngrams
    docs = spark.createDataFrame(
        [(0, "a b a b a b"), (1, "z z z z")],
        "doc_id bigint, text string")
    out = top_ngrams(docs, k=2, top=3).collect()
    assert [(r.ngram, r.n, r.rank) for r in out] == [
        ("a b", 3, 1), ("z z", 3, 2), ("b a", 2, 3)]  # lexical tie-break


def _physical_plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_curation_plan_shapes(spark):
    """Assert the scale-critical plan properties PERF.md claims: bench side
    of decontaminate broadcasts; packing windows are per-shard (no global
    single-partition window); pii_scrub stays shuffle-free."""
    import __spark_entry__ as E
    from tests.conftest import SF_TINY

    decon = _physical_plan(E.queries()["decontaminate"](spark, SF_TINY))
    assert "BroadcastHashJoin" in decon
    assert "SortMergeJoin" not in decon

    pack = _physical_plan(E.queries()["pack_sequences"](spark, SF_TINY))
    # per-shard window: the Window's partition spec must not be empty
    assert "Window" in pack
    assert "windowspecdefinition(source" in pack or \
        "windowspecdefinition(shard" in pack

    scrub = _physical_plan(E.queries()["pii_scrub"](spark, SF_TINY))
    assert "Exchange" not in scrub  # narrow codegen pass, zero shuffle


def test_star_cc_matches_label_propagation(spark):
    """large-star/small-star (O(log n) rounds) must produce exactly the
    label-propagation components on adversarial and random graphs."""
    import random

    from logpipe_spark.trainprep.curate import connected_components_star

    def ref_components(edges):
        # union-find ground truth
        parent = {}
        def find(x):
            parent.setdefault(x, x)
            while parent[x] != x:
                parent[x] = parent[parent[x]]
                x = parent[x]
            return x
        for a, b in edges:
            ra, rb = find(a), find(b)
            if ra != rb:
                parent[max(ra, rb)] = min(ra, rb)
        return {n: find(n) for n in parent}

    cases = [
        [(1, 2), (2, 3), (5, 6)],                      # cliques
        [(i, i + 1) for i in range(1, 40)],            # 40-node chain
        [(2 * i, 2 * i + 1) for i in range(10)],       # disjoint pairs
    ]
    rng = random.Random(7)
    for _ in range(3):                                  # random graphs
        n = 60
        cases.append([(rng.randrange(n), rng.randrange(n))
                      for _ in range(45)])
    for edges in cases:
        edges = [(a, b) for a, b in edges if a != b]
        got = {r.node: r.component
               for r in connected_components_star(_pairs(spark, edges)).collect()}
        want = ref_components(edges)
        assert got == want, f"mismatch on {edges[:5]}..."


def test_dup_clusters_algorithms_agree(spark):
    from logpipe_spark.trainprep.curate import dup_clusters as dc
    docs = spark.range(12).withColumnRenamed("id", "doc_id")
    pairs = _pairs(spark, [(1, 2), (2, 3), (3, 4), (8, 9)])
    a = sorted(map(tuple, dc(docs, pairs, algorithm="label").collect()))
    b = sorted(map(tuple, dc(docs, pairs, algorithm="star").collect()))
    assert a == b


def test_star_cc_round_count_on_chain(spark):
    """The point of star CC: a D-hop chain must converge in far fewer than
    D rounds (label propagation needs D)."""
    from logpipe_spark.trainprep.curate import connected_components_star
    chain = [(i, i + 1) for i in range(1, 64)]
    out = connected_components_star(_pairs(spark, chain), max_iter=12)
    comp = {r.node: r.component for r in out.collect()}
    assert set(comp.values()) == {1} and len(comp) == 64


def test_decontaminate_independent_id_spaces_keep_collisions(spark):
    """docs and bench with independently-keyed ids: a colliding id must
    NOT hide real contamination (the old unconditional doc_id != bench_id
    filter silently deleted the pair); shared_id_space=True restores the
    carve-out semantics the driver query uses."""
    mk = lambda rows: spark.createDataFrame(rows, "doc_id bigint, text string")
    secret = "alpha beta gamma delta epsilon"
    docs = mk([(7, f"x {secret} y")])
    bench = mk([(7, f"q {secret} r")])       # SAME id, different table
    assert decontaminate(docs, bench, k=5).count() == 1
    assert decontaminate(docs, bench, k=5, shared_id_space=True).count() == 0


def test_connected_components_raises_on_nonconvergence(spark):
    import pytest

    from logpipe_spark.trainprep.curate import connected_components

    chain = spark.createDataFrame(
        [(i, i + 1) for i in range(6)], "doc_a long, doc_b long")
    with pytest.raises(RuntimeError, match="not converged"):
        connected_components(chain, max_iter=2)
    # enough rounds: one component labeled 0
    out = connected_components(chain, max_iter=10)
    assert {r.component for r in out.collect()} == {0}


def test_chunk_documents_overlap_and_tail(spark):
    from logpipe_spark.trainprep.curate import chunk_documents

    words = " ".join(f"w{i}" for i in range(1, 41))  # 40 words
    docs = spark.createDataFrame([(1, words), (2, "short doc")],
                                 "doc_id long, text string")
    out = [r for r in chunk_documents(docs, chunk_words=16, stride=8)
           .orderBy("doc_id", "chunk_idx").collect()]
    d1 = [r for r in out if r.doc_id == 1]
    # starts 1,9,17,25,33 -> 5 chunks; last is the clamped tail (8 words)
    assert [r.start_word for r in d1] == [1, 9, 17, 25, 33]
    assert [r.n_chunk_words for r in d1] == [16, 16, 16, 16, 8]
    # 8-word overlap: chunk 1 ends at w16, chunk 2 starts at w9
    assert d1[0].chunk_text.split()[-1] == "w16"
    assert d1[1].chunk_text.split()[0] == "w9"
    # every word appears in at least one chunk
    covered = {w for r in d1 for w in r.chunk_text.split()}
    assert covered == {f"w{i}" for i in range(1, 41)}
    d2 = [r for r in out if r.doc_id == 2]
    assert len(d2) == 1 and d2[0].chunk_text == "short doc"


def test_k_anonymity_classes(spark):
    from logpipe_spark.trainprep.curate import k_anonymity

    df = spark.createDataFrame(
        [("a", 1, "u1"), ("a", 1, "u2"), ("a", 1, "u1"),
         ("b", 2, "u3"), (None, 1, "u4"), (None, 1, "u4")],
        "q1 string, q2 int, uid string")
    out = {(r.q1, r.q2): (r.class_size, r.n_sensitive, r.at_risk)
           for r in k_anonymity(df, ["q1", "q2"], k=3,
                                sensitive_col="uid").collect()}
    assert out[("a", 1)] == (3, 2, False)
    assert out[("b", 2)] == (1, 1, True)      # singleton: re-identifiable
    assert out[(None, 1)] == (2, 1, True)     # NULL is a quasi-value
    # without a sensitive column the diversity column is absent
    from logpipe_spark.trainprep.curate import k_anonymity as ka
    cols = ka(df, ["q1"], k=2).columns
    assert cols == ["q1", "class_size", "at_risk"]


def test_span_corruption_plan_invariants(spark):
    """Merged-mask accounting invariants on real docs: every span >= 1
    token, spans never over-count (masked <= min(n_starts*L, n_tokens)),
    a span contributes at least one token (n_spans <= masked), and the
    plan is deterministic across runs (hash coin, no RNG)."""
    from logpipe_spark.trainprep.curate import span_corruption_plan

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    out = span_corruption_plan(docs, span_len=3, start_den=20).collect()
    assert len(out) == docs.count()
    tot_tok = tot_mask = 0
    for r in out:
        assert 0 <= r.masked_tokens <= r.n_tokens
        assert r.n_spans <= r.n_starts
        assert r.n_spans <= r.masked_tokens or r.n_starts == 0
        assert r.masked_tokens <= 3 * r.n_starts
        assert 0.0 <= r.mask_ratio <= 1.0
        tot_tok += r.n_tokens
        tot_mask += r.masked_tokens
    # corpus noise density ~ L/start_den = 15%, loosely bracketed
    assert 0.10 < tot_mask / tot_tok < 0.20

    again = {r.doc_id: (r.n_starts, r.masked_tokens)
             for r in span_corruption_plan(docs).collect()}
    for r in out:
        assert again[r.doc_id] == (r.n_starts, r.masked_tokens)


def test_span_corruption_plan_merges_overlaps(spark):
    """A doc where EVERY position starts a span (start_den=1) must be
    one single merged interval covering the whole doc."""
    from logpipe_spark.trainprep.curate import span_corruption_plan

    df = spark.createDataFrame(
        [(1, "a b c d e f", "s")], "doc_id long, text string, source string")
    row = span_corruption_plan(df, span_len=3, start_den=1).collect()[0]
    assert row.n_tokens == 6 and row.n_starts == 6
    assert row.n_spans == 1 and row.masked_tokens == 6
    assert row.mask_ratio == 1.0
