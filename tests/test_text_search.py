"""BM25 + RRF unit semantics; cross-engine equivalence is pinned by the
driver oracles (search_bm25, search_hybrid_rrf)."""

import math

from pyspark.sql import functions as F

from dataingestion_spark.operators.text_search import bm25_topk, rrf_fuse


def _docs(spark):
    return spark.createDataFrame(
        [
            (1, "apple banana apple cherry"),
            (2, "apple banana"),
            (3, "banana banana banana durian"),
            (4, "elderberry fig grape"),
        ],
        "doc_id long, text string",
    )


def _queries(spark, *texts):
    return spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "query_id long, query_text string"
    )


def _bm25_ref(tf, df, n_docs, dl, avgdl, k1=1.2, b=0.75):
    idf = math.log(1.0 + (n_docs - df + 0.5) / (df + 0.5))
    return idf * ((tf * (k1 + 1.0)) / (tf + k1 * ((1.0 - b) + b * (dl / avgdl))))


def test_bm25_matches_hand_computation(spark):
    out = bm25_topk(_docs(spark), _queries(spark, "apple"), k=10).collect()
    got = {r.doc_id: r.score for r in out}
    avgdl = (4 + 2 + 4 + 3) / 4.0
    # 'apple' appears in docs 1 (tf 2, dl 4) and 2 (tf 1, dl 2); df=2, N=4
    assert got[1] == _bm25_ref(2, 2, 4, 4, avgdl)
    assert got[2] == _bm25_ref(1, 2, 4, 2, avgdl)
    assert set(got) == {1, 2}  # non-matching docs never appear


def test_bm25_rare_term_outranks_common(spark):
    # 'durian' (df=1) must outrank 'banana' (df=3) matches for this query
    out = bm25_topk(_docs(spark), _queries(spark, "banana durian"), k=10)
    ranks = {r.doc_id: r.rank for r in out.collect()}
    assert ranks[3] == 1  # has both terms, one of them rare


def test_rrf_two_list_agreement_wins(spark):
    a = spark.createDataFrame(
        [(0, 10, 1), (0, 11, 2), (0, 12, 3)], "query_id long, doc_id long, rank int"
    )
    b = spark.createDataFrame(
        [(0, 11, 1), (0, 13, 2)], "query_id long, doc_id long, rank int"
    )
    out = {r.doc_id: r for r in rrf_fuse(a, b, k=10).collect()}
    # doc 11 is in both lists → highest fused score
    assert out[11].rank == 1
    assert out[11].rrf_score == 1.0 / 62 + 1.0 / 61
    # one-sided docs still present with single-term scores
    assert out[10].rrf_score == 1.0 / 61
    assert out[13].rrf_score == 1.0 / 62


def test_phrase_search_overlaps_and_distinct_slots(spark):
    from dataingestion_spark.operators.text_search import phrase_search

    df = spark.createDataFrame(
        [(1, "a b a b a"), (2, "b a b"), (3, "x y z"), (4, "a a a")],
        "doc_id int, text string",
    )
    assert {tuple(r) for r in phrase_search(df, "a b a").collect()} == {(1, 2)}
    # overlapping matches count individually; 'a a' in 'a a a' = 2
    assert {tuple(r) for r in phrase_search(df, "a a").collect()} == {(4, 2)}
    # single-token phrase = plain term occurrence counting
    assert {tuple(r) for r in phrase_search(df, "b").collect()} == {(1, 2), (2, 2)}
    import pytest

    with pytest.raises(ValueError):
        phrase_search(df, "   ")


def test_tfidf_top_terms_ranks_group_specific_terms(spark):
    from dataingestion_spark.operators.text_search import tfidf_top_terms

    df = spark.createDataFrame(
        [(1, "g1", "apple apple banana shared"),
         (2, "g1", "apple shared"),
         (3, "g2", "cherry cherry shared"),
         (4, "g2", "shared")],
        "doc_id int, grp string, text string",
    )
    rows = tfidf_top_terms(df, "grp", k=2).collect()
    out = {(r.grp, r.rank): r.term for r in rows}
    # group-exclusive terms outrank the everywhere-term 'shared'
    assert out[("g1", 1)] == "apple" and out[("g2", 1)] == "cherry"
    # idf discount: 'shared' (in both groups) scores below the top term
    scores = {(r.grp, r.term): r.score for r in rows}
    assert scores[("g1", "shared")] < scores[("g1", "apple")]


def test_collocations_pmi_prefers_exclusive_pairs(spark):
    from dataingestion_spark.operators.text_search import collocations

    # 'new york' always adjacent and exclusive; 'the the' frequent but
    # from high-frequency unigrams -> low PMI
    rows = [(i, "new york " + "the cat " * 5) for i in range(10)]
    df = spark.createDataFrame(rows, "doc_id int, text string")
    top = collocations(df, min_count=5, k=3).collect()
    assert (top[0].w1, top[0].w2) == ("new", "york")
    assert top[0].pmi > top[-1].pmi or len(top) == 1


def test_rake_keywords_classic_example(spark):
    from dataingestion_spark.operators.text_search import rake_keywords

    df = spark.createDataFrame(
        [(1, "the quick brown fox and the lazy dog for a quick brown fox")],
        "doc_id int, text string",
    )
    got = [(r.rank, r.phrase, r.score)
           for r in rake_keywords(df, k=3).orderBy("rank").collect()]
    # 'quick brown fox' occurs twice: each word freq 2, degree 6 -> 3.0 each
    assert got == [(1, "quick brown fox", 9.0), (2, "lazy dog", 4.0)]
