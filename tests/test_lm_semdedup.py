"""Unit tests for the CCNet-style bigram LM (operators/lm.py) and SemDeDup
(operators/dedup.py::semantic_dedup)."""

import math

import pytest
from pyspark.sql import functions as F

from dataingestion_spark.operators import lm
from dataingestion_spark.operators.dedup import semantic_dedup


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_bigram_lm_hand_computed(spark):
    # reference corpus: one doc "a b a b" → bigrams (a,b)x2, (b,a)x1
    ref = _docs(spark, [(0, "a b a b")])
    model = lm.train_bigram_lm(ref)
    got = {(r.w1, r.w2): r.c2 for r in model.collect()}
    assert got == {("a", "b"): 2, ("b", "a"): 1}

    # vocab = {a, b} → V=2, k=0.5; c1(a)=2, c1(b)=1
    # score "a b": logp(b|a) = ln((2+.5)/(2+1)) = ln(2.5/3)
    scored = lm.lm_log_perplexity(_docs(spark, [(1, "a b")]), model)
    row = scored.collect()[0]
    assert row.n_bigrams == 1
    assert row.nll == pytest.approx(-math.log(2.5 / 3.0), abs=1e-12)

    # unseen context "z z": logp = ln(.5/(0+.5*2)) = ln(.5) → nll = ln 2
    row2 = lm.lm_log_perplexity(_docs(spark, [(2, "z z")]), model).collect()[0]
    assert row2.nll == pytest.approx(math.log(2.0), abs=1e-12)


def test_lm_reference_docs_score_lower(spark):
    ref = _docs(spark, [(i, "the quick brown fox jumps over the lazy dog")
                        for i in range(4)])
    model = lm.train_bigram_lm(ref)
    probe = _docs(spark, [(100, "the quick brown fox"),
                          (101, "zeppelin quartz vortex glyph")])
    out = {r.doc_id: r.nll for r in lm.lm_log_perplexity(probe, model).collect()}
    assert out[100] < out[101]


def test_perplexity_filter_threshold_and_broadcast_agree(spark):
    ref = _docs(spark, [(i, "alpha beta gamma delta alpha beta") for i in range(3)])
    probe = _docs(spark, [(10, "alpha beta gamma"), (11, "omega psi chi")])
    model = lm.train_bigram_lm(ref)
    # all-unseen text degrades to uniform 1/V → nll = ln(V) = ln 4 ≈ 1.386;
    # in-distribution text scores well below that
    plain = lm.perplexity_filter(probe, model, threshold=1.0)
    bcast = lm.perplexity_filter(probe, model, threshold=1.0,
                                 broadcast_model=True)
    p = {r.doc_id: (r.nll, r.keep) for r in plain.collect()}
    b = {r.doc_id: (r.nll, r.keep) for r in bcast.collect()}
    assert p == b  # broadcast is a physical hint, not a semantic change
    assert p[10][1] and not p[11][1]


def test_lm_docs_without_bigrams_are_absent(spark):
    ref = _docs(spark, [(0, "a b")])
    model = lm.train_bigram_lm(ref)
    out = lm.lm_log_perplexity(_docs(spark, [(1, "solo"), (2, "a b")]), model)
    assert [r.doc_id for r in out.collect()] == [2]


def _vec_df(spark, rows):
    return spark.createDataFrame(rows, "vec_id long, embedding array<double>")


def test_semantic_dedup_within_cluster_only(spark):
    # two well-separated clusters; explicit centroids pin the assignment.
    # cluster 1: ids 0,1 nearly parallel (dupes) + id 2 orthogonal-ish
    # cluster 2: ids 10,11 nearly parallel (dupes)
    rows = [
        (0, [1.0, 0.0, 0.0, 0.0]),
        (1, [0.999, 0.001, 0.0, 0.0]),
        (2, [0.1, 1.0, 0.0, 0.0]),
        (10, [0.0, 0.0, 1.0, 0.0]),
        (11, [0.0, 0.0, 0.999, 0.001]),
    ]
    cents = [(1, [1.0, 0.0, 0.0, 0.0]), (2, [0.0, 0.0, 1.0, 0.0])]
    out = semantic_dedup(_vec_df(spark, rows), threshold=0.95, centroids=cents)
    got = {r.vec_id: (r.cluster_id, r.keep) for r in out.collect()}
    assert got[0] == (1, True)    # min-id survivor
    assert got[1] == (1, False)   # near-dup of 0 in same cluster
    assert got[2] == (1, True)    # same cluster but below threshold
    assert got[10] == (2, True)
    assert got[11] == (2, False)


def test_semantic_dedup_misses_cross_cluster_pairs(spark):
    # the SemDeDup trade: near-identical vectors assigned to different
    # clusters are NOT compared (that's what buys Σ|cluster|² < n²)
    rows = [
        (0, [1.0, 0.05, 0.0, 0.0]),
        (1, [1.0, -0.05, 0.0, 0.0]),  # ~0.995 cosine to id 0
    ]
    cents = [(1, [1.0, 0.1, 0.0, 0.0]), (2, [1.0, -0.1, 0.0, 0.0])]
    out = semantic_dedup(_vec_df(spark, rows), threshold=0.9, centroids=cents)
    got = {r.vec_id: (r.cluster_id, r.keep) for r in out.collect()}
    assert got[0] == (1, True) and got[1] == (2, True)


def test_semantic_dedup_default_centroids(spark):
    # no explicit centroids: stride-init k-means (iters=0) still produces a
    # total partition of the ids with the min-id of each dup chain kept
    rows = [(i, [float(i % 3 == 0), float(i % 3 == 1), float(i % 3 == 2), 0.0])
            for i in range(9)]
    out = semantic_dedup(_vec_df(spark, rows), n_clusters=3, threshold=0.99)
    got = {r.vec_id: r.keep for r in out.collect()}
    assert len(got) == 9
    # ids 0,3,6 identical → only 0 kept; same for 1,4,7 and 2,5,8
    assert [i for i in sorted(got) if got[i]] == [0, 1, 2]


# ---------------------------------------------------------------------------
# line-level boilerplate removal
# ---------------------------------------------------------------------------

def test_remove_boilerplate_lines(spark):
    from dataingestion_spark.operators.dedup import remove_boilerplate_lines

    docs = _docs(spark, [
        (0, "COOKIES\nreal content zero\nFOOTER"),
        (1, "COOKIES\nreal content one\nFOOTER"),
        (2, "COOKIES\nreal content two"),
        (3, "COOKIES\nCOOKIES\nonly my line"),   # within-doc repeat: both go
        (4, "COOKIES\nFOOTER"),                  # everything is boilerplate
        (5, "solo line\n\nafter blank"),         # blank line survives
    ])
    out = {r.doc_id: (r.n_lines, r.n_removed, r.clean_text)
           for r in remove_boilerplate_lines(docs, min_docs=2).collect()}
    assert out[0] == (3, 2, "real content zero")
    assert out[1] == (3, 2, "real content one")
    assert out[2] == (2, 1, "real content two")
    assert out[3] == (3, 2, "only my line")
    assert out[4] == (2, 2, "")
    assert out[5] == (3, 0, "solo line\n\nafter blank")


def test_remove_boilerplate_lines_min_docs(spark):
    from dataingestion_spark.operators.dedup import remove_boilerplate_lines

    docs = _docs(spark, [(0, "dup\na"), (1, "dup\nb"), (2, "dup\nc")])
    loose = remove_boilerplate_lines(docs, min_docs=4)
    assert all(r.n_removed == 0 for r in loose.collect())
    tight = remove_boilerplate_lines(docs, min_docs=3)
    assert all(r.n_removed == 1 for r in tight.collect())


def test_char_entropy_extremes(spark):
    import math

    from dataingestion_spark.operators.text_analysis import char_entropy

    docs = _docs(spark, [
        (0, "aaaaaaaa"),          # degenerate: entropy 0
        (1, "abababab"),          # two symbols, uniform: ln 2
        (2, "abcd"),              # four symbols, uniform: ln 4
        (3, ""),                  # empty: defined as 0
    ])
    out = {r.doc_id: (r.n_chars, r.n_distinct_chars, r.entropy)
           for r in char_entropy(docs).collect()}
    assert out[0] == (8, 1, 0.0)
    assert out[1][2] == round(math.log(2), 6)
    assert out[2][2] == round(math.log(4), 6)
    assert out[3] == (0, 0, 0.0)


# ---------------------------------------------------------------------------
# OPQ balanced dimension permutation
# ---------------------------------------------------------------------------

def test_opq_permutation_balances_variance(spark):
    import numpy as np

    from dataingestion_spark.operators.pq import opq_permutation

    # variance concentrated in the first 4 of 8 dims
    rng = np.random.RandomState(7)
    mat = np.hstack([rng.randn(200, 4) * 10.0, rng.randn(200, 4) * 0.1])
    df = spark.createDataFrame(
        [(i, [float(x) for x in mat[i]]) for i in range(200)],
        "vec_id long, embedding array<double>",
    )
    perm = opq_permutation(df, m=4)
    assert sorted(perm) == list(range(8))
    # each of the 4 subspaces must get exactly one high-variance dim
    for j in range(4):
        sub = perm[2 * j: 2 * j + 2]
        assert sum(1 for d in sub if d < 4) == 1, perm


def test_opq_permuted_pq_beats_plain_on_skewed_data(spark):
    import numpy as np

    from dataingestion_spark.operators.pq import (
        opq_permutation, permute_vectors, pq_encode, pq_train, topk_pq_adc,
    )
    from dataingestion_spark.operators.similarity import topk_cosine

    rng = np.random.RandomState(11)
    # heavy variance skew: plain index-order slicing starves subspace 0
    scales = np.array([20.0, 15.0, 10.0, 8.0, 0.5, 0.4, 0.3, 0.2])
    mat = rng.randn(300, 8) * scales
    df = spark.createDataFrame(
        [(i, [float(x) for x in mat[i]]) for i in range(300)],
        "vec_id long, embedding array<double>",
    )
    queries = df.filter("vec_id < 8").selectExpr(
        "vec_id AS query_id", "embedding AS query_vec"
    )
    exact = {(r.query_id, r.vec_id) for r in topk_cosine(df, queries, k=5).collect()}

    def recall(corpus, qs):
        books = pq_train(corpus, m=4, k=8, iters=4)
        enc = pq_encode(corpus.select("vec_id", "embedding"), books)
        got = {(r.query_id, r.vec_id)
               for r in topk_pq_adc(enc, books, qs, k=5).collect()}
        return len(got & exact) / len(exact)

    plain = recall(df, queries)
    perm = opq_permutation(df, m=4)
    qp = queries.withColumnRenamed("query_vec", "embedding")
    qp = permute_vectors(qp, perm).withColumnRenamed("embedding", "query_vec")
    balanced = recall(permute_vectors(df, perm), qp)
    assert balanced >= plain


def test_dsir_weights_favor_target_like_docs(spark):
    from dataingestion_spark.operators.lm import (
        dsir_log_weights, dsir_select, train_bigram_lm,
    )

    target_ref = _docs(spark, [(i, "formal prose about science topics here")
                               for i in range(3)])
    raw_ref = _docs(spark, [
        (0, "formal prose about science topics here"),
        (1, "click here buy now free offer click here"),
        (2, "click here buy now free offer click here"),
        (3, "click now free buy offer now click buy"),
    ])
    probe = _docs(spark, [(10, "formal prose about science"),
                          (11, "click here buy now free")])
    w = dsir_log_weights(probe, train_bigram_lm(target_ref),
                         train_bigram_lm(raw_ref))
    got = {r.doc_id: r.log_weight for r in w.collect()}
    assert got[10] > got[11]  # target-like doc gets the higher weight
    sel = {r.doc_id: r.selected for r in dsir_select(w, n=1).collect()}
    assert sel == {10: True, 11: False}


def test_hard_negatives_excludes_same_label(spark):
    from pyspark.sql import Row
    from dataingestion_spark.operators.similarity import hard_negatives

    rows = [Row(vec_id=i, embedding=[1.0, float(i) / 10], label=i % 2)
            for i in range(10)]
    corpus = spark.createDataFrame(rows)
    anchors = spark.createDataFrame(
        [Row(query_id=0, query_vec=[1.0, 0.0], query_label=0)])
    out = hard_negatives(corpus, anchors, k=3).collect()
    assert len(out) == 3
    labels = {r.vec_id % 2 for r in out}
    assert labels == {1}                     # only the other class
    assert [r.rank for r in out] == [1, 2, 3]
    # nearest odd vector to [1, 0] is vec 1 ([1.0, 0.1])
    assert out[0].vec_id == 1
