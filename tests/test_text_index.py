"""Persisted inverted text index (sinks/text_index.py)."""

import re

from pyspark.sql import Row

from dataingestion_spark.operators.text_search import bm25_topk
from dataingestion_spark.sinks.text_index import (
    append_text_index,
    search_text_index,
    write_text_index,
)

DOCS = [
    (1, "spark shuffles data between stages during wide transformations"),
    (2, "parquet stores data in columnar row groups with statistics"),
    (3, "spark reads parquet with predicate pushdown and column pruning"),
    (4, "tokenizers split text into subword units for training"),
    (5, "spark spark spark repeated term document"),
]
QUERIES = [(10, "spark parquet"), (11, "tokenizers training"), (12, "data")]


def _docs(spark, rows=DOCS):
    return spark.createDataFrame([Row(doc_id=i, text=t) for i, t in rows])


def _queries(spark):
    return spark.createDataFrame(
        [Row(query_id=q, query_text=t) for q, t in QUERIES])


def _ranked(df):
    return sorted((r.query_id, r.rank, r.doc_id, round(r.score, 9))
                  for r in df.collect())


def test_index_search_equals_from_scratch_bm25(spark, tmp_path):
    path = str(tmp_path / "idx")
    write_text_index(_docs(spark), path)
    got = search_text_index(spark, path, _queries(spark), k=3)
    want = bm25_topk(_docs(spark), _queries(spark), k=3)
    assert _ranked(got) == _ranked(want)


def test_append_equals_rebuild(spark, tmp_path):
    a = str(tmp_path / "a")
    write_text_index(_docs(spark, DOCS[:3]), a)
    append_text_index(_docs(spark, DOCS[3:]), a)
    b = str(tmp_path / "b")
    write_text_index(_docs(spark), b)
    q = _queries(spark)
    assert _ranked(search_text_index(spark, a, q, k=5)) == \
           _ranked(search_text_index(spark, b, q, k=5))


def test_term_selection_prunes_partitions(spark, tmp_path):
    path = str(tmp_path / "p")
    write_text_index(_docs(spark), path)
    out = search_text_index(spark, path, _queries(spark).limit(1), k=3)
    plan = out._jdf.queryExecution().executedPlan().toString()
    m = re.search(r"PartitionFilters: \[([^\]]*)\]", plan)
    assert m and "tb" in m.group(1)  # bucket pruning reaches the scan


def test_unknown_terms_return_empty(spark, tmp_path):
    path = str(tmp_path / "u")
    write_text_index(_docs(spark), path)
    q = spark.createDataFrame([Row(query_id=1, query_text="zzz qqq")])
    assert search_text_index(spark, path, q, k=3).count() == 0


def test_hybrid_indexed_equals_from_scratch(spark, tmp_path):
    """Index-served hybrid (inverted index BM25 + exhaustive-probe IVF,
    RRF-fused) is bit-identical to the non-indexed composition."""
    from pyspark.sql import functions as F

    from dataingestion_spark.operators.similarity import topk_cosine
    from dataingestion_spark.operators.text_search import rrf_fuse
    from dataingestion_spark.sinks.text_index import hybrid_search_indexed
    from dataingestion_spark.sinks.vector_index import build_ivf_index

    docs = _docs(spark)
    # tiny deterministic embeddings keyed like the docs
    emb = spark.createDataFrame(
        [Row(vec_id=i, embedding=[float((i * 7 + j * 3) % 5) - 2.0
                                  for j in range(4)])
         for i, _ in DOCS])
    tpath = str(tmp_path / "tidx")
    vpath = str(tmp_path / "vidx")
    write_text_index(docs, tpath)
    cents = [(0, [1.0, 0.0, 0.0, 0.0]), (1, [-1.0, 0.5, 0.0, 0.0])]
    build_ivf_index(emb, vpath, centroids=cents)
    vq = emb.filter(F.col("vec_id") <= 2).select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding").alias("query_vec"))

    got = hybrid_search_indexed(spark, tpath, vpath, _queries(spark), vq,
                                k=5, per_side_k=4, n_probe=len(cents))
    bm = bm25_topk(docs, _queries(spark), k=4)
    cos = topk_cosine(emb, vq, k=4).select(
        "query_id", F.col("vec_id").alias("doc_id"), "rank")
    want = rrf_fuse(bm, cos, k=5)
    assert sorted(map(tuple, got.collect())) == \
        sorted(map(tuple, want.collect()))
