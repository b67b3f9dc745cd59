"""Sampling operators: determinism, stratum caps, token budgets — and
bit-parity with the DuckDB oracle SQL builders."""

import duckdb
import pytest
from pyspark.sql import functions as F

from dataingestion_spark.operators.sampling import (
    mixture_sample,
    mixture_sample_sql,
    stratified_sample,
    stratified_sample_sql,
)

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def docs(spark):
    return spark.read.parquet(f"{SF}/documents.parquet")


def _duck():
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM read_parquet('{SF}/documents.parquet')"
    )
    return con


def test_stratified_sample_caps_and_determinism(spark, docs):
    s1 = stratified_sample(docs, "source", 5)
    sizes = {r.source: r.c for r in
             s1.groupBy("source").agg(F.count("*").alias("c")).collect()}
    assert sizes and all(c <= 5 for c in sizes.values())
    ids1 = {r.doc_id for r in s1.select("doc_id").collect()}
    ids2 = {r.doc_id for r in
            stratified_sample(docs, "source", 5).select("doc_id").collect()}
    assert ids1 == ids2  # deterministic across runs
    ids3 = {r.doc_id for r in
            stratified_sample(docs, "source", 5, salt="other").select("doc_id").collect()}
    assert ids3 != ids1  # a new salt re-draws
    with pytest.raises(ValueError):
        stratified_sample(docs, "source", 0)


def test_stratified_sample_matches_oracle(spark, docs):
    got = sorted(
        (r.doc_id, r.sample_rank)
        for r in stratified_sample(docs, "source", 7)
        .select("doc_id", "sample_rank").collect()
    )
    want = sorted((d, rk) for d, rk in _duck().execute(
        stratified_sample_sql("documents", "source", 7, cols="doc_id")
    ).fetchall())
    assert got == want


def test_mixture_sample_budgets(spark, docs):
    d = docs.withColumn("n_tokens", F.size(F.split("text", r"\s+")))
    srcs = sorted(r.source for r in d.select("source").distinct().collect())
    assert len(srcs) >= 3
    budgets = {srcs[0]: 500, srcs[1]: 1}
    out = mixture_sample(d, "source", "n_tokens", budgets)
    per = {r.source: r for r in out.groupBy("source").agg(
        F.count("*").alias("c"),
        F.max(F.col("tokens_before")).alias("max_before"),
    ).collect()}
    # budget=1 keeps exactly the first doc (its exclusive sum 0 < 1)
    assert per[srcs[1]].c == 1
    # fixed-offset packing: every kept doc started under the budget
    assert per[srcs[0]].max_before < 500
    # sources without a budget and no default keep everything
    for s in srcs[2:]:
        assert per[s].c == d.filter(F.col("source") == s).count()
    # with a default budget, every source is bounded
    out2 = mixture_sample(d, "source", "n_tokens", {}, default_budget=1)
    assert out2.groupBy("source").count().agg(F.max("count")).first()[0] == 1
    with pytest.raises(ValueError):
        mixture_sample(d, "source", "n_tokens", {"a": 0})


def test_mixture_sample_matches_oracle(spark, docs):
    d = docs.withColumn("n_tokens", F.size(F.split("text", r"\s+")))
    srcs = sorted(r.source for r in d.select("source").distinct().collect())
    budgets = {srcs[0]: 400, srcs[1]: 1}
    got = sorted(
        (r.doc_id, r.tokens_before)
        for r in mixture_sample(d, "source", "n_tokens", budgets)
        .select("doc_id", "tokens_before").collect()
    )
    con = _duck()
    # identical token counts: the same regex split on both engines
    con.execute(
        "CREATE VIEW docs_t AS SELECT *,"
        " len(regexp_split_to_array(text, '\\s+')) AS n_tokens FROM documents"
    )
    want = sorted((d_, t) for d_, t in con.execute(mixture_sample_sql(
        "docs_t", "source", "n_tokens", budgets, cols="doc_id"
    )).fetchall())
    assert got == want


def test_contamination_check_semantics(spark):
    from dataingestion_spark.operators.dedup import contamination_check

    corpus = spark.createDataFrame(
        [(1, "the quick brown fox jumps over the lazy dog tonight"),
         (2, "completely unrelated words appear in this document here"),
         (3, "quick brown fox jumps somewhere else entirely today now")],
        "doc_id long, text string",
    )
    bench = spark.createDataFrame(
        [(100, "the quick brown fox jumps over a fence")],
        "doc_id long, text string",
    )
    # 4-gram overlap: doc 1 shares "the quick brown fox",
    # "quick brown fox jumps", "brown fox jumps over"; doc 3 only
    # "quick brown fox jumps"
    out = {(r.doc_id, r.bench_id): r.n_overlap for r in
           contamination_check(corpus, bench, shingle_n=4).collect()}
    assert out == {(1, 100): 3, (3, 100): 1}
    # min_overlap filters the single-shingle hit
    out2 = {r.doc_id for r in
            contamination_check(corpus, bench, shingle_n=4, min_overlap=2).collect()}
    assert out2 == {1}


def test_repetition_signals_semantics(spark):
    from dataingestion_spark.operators.text_analysis import repetition_signals

    df = spark.createDataFrame(
        [(1, "same line\nsame line\nother line"),
         (2, "buy now buy now buy now"),
         (3, "all words here are different tokens entirely")],
        "doc_id long, text string",
    )
    out = {r.doc_id: r for r in repetition_signals(df).collect()}
    # doc 1: 2 of 3 lines duplicated; 18 of 28 line-chars
    assert out[1].dup_line_ratio == pytest.approx(2 / 3, abs=1e-6)
    assert out[1].dup_line_char_ratio == pytest.approx(18 / 28, abs=1e-6)
    # doc 2: "buy now" is 3 of 5 bigrams, "buy now buy"/"now buy now" 2 of 4
    assert out[2].top_2gram_ratio == pytest.approx(0.6)
    assert out[2].top_3gram_ratio == pytest.approx(0.5)
    # doc 3: no repetition — line ratios 0, every bigram unique (1/6)
    assert out[3].dup_line_ratio == 0.0
    assert out[3].top_2gram_ratio == pytest.approx(1 / 6, abs=1e-6)


def test_temperature_budgets_flatten_tail(spark):
    from dataingestion_spark.operators.sampling import (
        temperature_budgets, temperature_mixture_sample,
    )

    rows = [(i, "big", 100) for i in range(90)] + [(i + 1000, "small", 100) for i in range(10)]
    df = spark.createDataFrame(rows, "doc_id long, source string, n_tok int")
    nat = temperature_budgets(df, "source", "n_tok", 1000, alpha=1.0)
    sq = temperature_budgets(df, "source", "n_tok", 1000, alpha=0.5)
    uni = temperature_budgets(df, "source", "n_tok", 1000, alpha=0.0)
    # alpha=1 keeps natural proportions; alpha=0.5 boosts the tail; alpha=0 is uniform
    assert nat == {"big": 900, "small": 100}
    assert uni == {"big": 500, "small": 500}
    assert nat["small"] < sq["small"] < uni["small"]
    assert sq["big"] + sq["small"] <= 1000  # floors never exceed the total
    # the sampled set respects the computed budgets exactly
    out = temperature_mixture_sample(df, "source", "n_tok", 1000, alpha=0.5)
    kept = {r[0]: r[1] for r in out.groupBy("source").count().collect()}
    import math
    assert kept["small"] == math.ceil(sq["small"] / 100)  # doc crossing budget kept


def test_uniform_sample_k_exact_and_planned_as_topk(spark):
    from dataingestion_spark.operators.sampling import uniform_sample_k

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    a = uniform_sample_k(docs, 37)
    b = uniform_sample_k(docs, 37)
    assert a.count() == 37
    assert {r.doc_id for r in a.collect()} == {r.doc_id for r in b.collect()}
    # different salt redraws
    c = uniform_sample_k(docs, 37, salt="redraw")
    assert {r.doc_id for r in c.collect()} != {r.doc_id for r in a.collect()}
    # distributed top-k, not a global sort
    plan = a._jdf.queryExecution().executedPlan().toString()
    assert "TakeOrderedAndProject" in plan


def test_weighted_sample_k_biases_to_weight(spark):
    from dataingestion_spark.operators.sampling import weighted_sample_k
    from pyspark.sql import functions as F

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    s = weighted_sample_k(docs, 100, "n_chars").collect()
    assert len(s) == 100 and len({r.doc_id for r in s}) == 100
    corpus_mean = docs.agg(F.avg("n_chars")).first()[0]
    sample_mean = sum(r.n_chars for r in s) / 100
    assert sample_mean > corpus_mean  # heavier docs overrepresented
    # zero/negative weights are never drawn
    z = docs.withColumn("w", F.when(F.col("doc_id") < 490, 0).otherwise(F.col("n_chars")))
    zs = weighted_sample_k(z, 5, "w").collect()
    assert all(r.doc_id >= 490 for r in zs)
