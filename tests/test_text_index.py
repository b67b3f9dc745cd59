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
