"""Hot-band skew guard for MinHash-LSH (operators/dedup.py::_prune_hot_bands):
boilerplate-degenerate band buckets must not explode quadratically."""

import pytest

from dataingestion_spark.operators.dedup import (
    minhash_lsh_pairs,
    minhash_lsh_pairs_fast,
)


def _boilerplate_corpus(spark, n_boiler=30, n_normal=10):
    """n_boiler documents sharing one exact boilerplate text (every band
    collides) + n_normal distinct documents + one genuine near-dup pair."""
    rows = [(i, "accept all cookies to continue reading this site today")
            for i in range(n_boiler)]
    rows += [(100 + i,
              f"unique document number {i} about topic {i} with words "
              f"alpha{i} beta{i} gamma{i} delta{i} epsilon{i}")
             for i in range(n_normal)]
    rows += [(900, "the quick brown fox jumps over the lazy dog again today"),
             (901, "the quick brown fox jumps over the lazy dog again today")]
    return spark.createDataFrame(rows, "doc_id long, text string")


@pytest.mark.parametrize("fn", [minhash_lsh_pairs, minhash_lsh_pairs_fast])
def test_hot_band_guard_bounds_pair_expansion(spark, fn):
    docs = _boilerplate_corpus(spark)
    unguarded = fn(docs).count()
    # 30 identical boilerplate docs alone give C(30,2)=435 pairs
    assert unguarded >= 435

    stats = {}
    guarded = fn(docs, max_band_size=10, skew_stats=stats)
    pairs = {(r.id_a, r.id_b) for r in guarded.collect()}
    # the boilerplate explosion is gone ...
    assert len(pairs) < 50
    assert all(not (a < 100 and b < 100) for a, b in pairs)
    # ... while the genuine near-dup pair survives (its bands are not hot)
    assert (900, 901) in pairs
    assert stats["skewed_bands"] >= 1
    assert stats["skipped_rows"] >= 30


@pytest.mark.parametrize("fn", [minhash_lsh_pairs, minhash_lsh_pairs_fast])
def test_guard_is_noop_on_normal_data(spark, fn):
    docs = _boilerplate_corpus(spark, n_boiler=0, n_normal=12)
    base = {(r.id_a, r.id_b) for r in fn(docs).collect()}
    stats = {}
    guarded = {(r.id_a, r.id_b)
               for r in fn(docs, max_band_size=10, skew_stats=stats).collect()}
    assert guarded == base
    assert stats == {"skewed_bands": 0, "skipped_rows": 0}


def test_guard_rejects_degenerate_cap(spark):
    docs = _boilerplate_corpus(spark, n_boiler=0, n_normal=3)
    with pytest.raises(ValueError, match="max_band_size"):
        minhash_lsh_pairs(docs, max_band_size=1).collect()


def test_select_representatives_keeps_best_quality(spark):
    from pyspark.sql import Row
    from dataingestion_spark.operators.dedup import select_representatives

    docs = spark.createDataFrame(
        [Row(doc_id=1, q=10), Row(doc_id=2, q=30), Row(doc_id=3, q=30),
         Row(doc_id=9, q=5)])  # 9 is a singleton
    clusters = spark.createDataFrame(
        [Row(doc_id=1, canonical_id=1), Row(doc_id=2, canonical_id=1),
         Row(doc_id=3, canonical_id=1)])
    out = {r.doc_id: r for r in
           select_representatives(docs, clusters, "q").collect()}
    # best quality 30 tie between 2 and 3 -> smaller id 2 wins
    assert out[2].keep is True
    assert out[1].keep is False and out[3].keep is False
    assert out[9].keep is True and out[9].cluster_id == 9
    assert all(out[i].cluster_id == 1 for i in (1, 2, 3))
