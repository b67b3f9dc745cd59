"""Linear classifier inference (operators/classifier.py)."""

import hashlib

from pyspark.sql import functions as F

from dataingestion_spark.operators.classifier import (
    feature_array,
    hashed_classifier_score,
    linear_classifier_score,
)


def _py_weight(feature: str, model_id: str = "w") -> int:
    h = hashlib.md5(f"{model_id}:{feature}".encode()).hexdigest()
    return int(h[:4], 16) % 2001 - 1000


def _py_features(text: str):
    import re

    words = [w for w in re.split(r"[^a-z0-9]+", text.lower()) if w]
    return words + [f"{a} {b}" for a, b in zip(words, words[1:])]


def test_hashed_score_matches_python_model(spark):
    texts = ["The quick brown fox", "hello", "", "a b a b"]
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], ["doc_id", "text"]
    )
    rows = {r.doc_id: r for r in hashed_classifier_score(df).collect()}
    for i, t in enumerate(texts):
        feats = _py_features(t)
        wsum = sum(_py_weight(f) for f in feats)
        assert rows[i].n_features == len(feats)
        assert rows[i].weight_sum == wsum
        if feats:
            assert abs(rows[i].score - wsum / (1000.0 * len(feats))) < 1e-12
        else:
            assert rows[i].score == 0.0
        assert rows[i].keep == (rows[i].score > 0.0)


def test_feature_array_shape(spark):
    df = spark.createDataFrame([("Héllo, wörld-1 2x",)], ["text"])
    (row,) = df.select(feature_array(F.col("text")).alias("f")).collect()
    # unicode letters and punctuation are separators; bigrams join survivors
    assert row.f == ["h", "llo", "w", "rld", "1", "2x",
                     "h llo", "llo w", "w rld", "rld 1", "1 2x"]


def test_explicit_weight_table_matches_hashed(spark):
    texts = ["the quick brown fox jumps", "pack my box", "duplicated words words"]
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], ["doc_id", "text"]
    )
    vocab = sorted({f for t in texts for f in _py_features(t)})
    weights = spark.createDataFrame(
        [(f, _py_weight(f)) for f in vocab], ["feature", "weight"]
    )
    got = {
        r.doc_id: r for r in linear_classifier_score(df, weights).collect()
    }
    want = {r.doc_id: r for r in hashed_classifier_score(df).collect()}
    for i in got:
        assert got[i].n_features == want[i].n_features
        assert got[i].weight_sum == want[i].weight_sum
        assert got[i].score == want[i].score


def test_unknown_features_score_zero(spark):
    df = spark.createDataFrame([(0, "totally novel words")], ["doc_id", "text"])
    weights = spark.createDataFrame([("irrelevant", 500)], ["feature", "weight"])
    (row,) = linear_classifier_score(df, weights).collect()
    assert row.weight_sum == 0 and row.score == 0.0 and not row.keep
    assert row.n_features == 5
