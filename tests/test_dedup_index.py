"""Persisted MinHash index: build / append / probe (operators/dedup_index.py)."""

import tempfile

import pytest

from pyspark.sql import Row

from dataingestion_spark.operators.dedup_index import (
    append_minhash_index,
    probe_minhash_index,
    write_minhash_index,
)

CORPUS = [
    (1, "the quick brown fox jumps over the lazy dog again and again today"),
    (2, "completely different text about spark partitions and shuffle behavior"),
    (3, "a third document discussing parquet row group statistics in detail"),
]


def _df(spark, rows):
    return spark.createDataFrame([Row(doc_id=i, text=t) for i, t in rows])


@pytest.fixture()
def index(spark, tmp_path):
    path = str(tmp_path / "idx")
    write_minhash_index(_df(spark, CORPUS), path, num_hashes=16, bands=4)
    return path


def test_exact_copy_matches_with_full_agreement(spark, index):
    batch = _df(spark, [(100, CORPUS[0][1])])
    out = probe_minhash_index(batch, index).collect()
    assert len(out) == 1
    m = out[0]
    assert (m.batch_id, m.corpus_id) == (100, 1)
    assert m.n_agree == 16 and m.est_jaccard == 1.0


def test_unrelated_batch_matches_nothing(spark, index):
    batch = _df(spark, [(200, "entirely novel content no overlap whatsoever "
                              "with anything indexed before now")])
    assert probe_minhash_index(batch, index).count() == 0


def test_same_id_does_not_self_match(spark, index):
    # re-crawl of doc 1 under the SAME id: candidate is filtered
    batch = _df(spark, [(1, CORPUS[0][1])])
    assert probe_minhash_index(batch, index).count() == 0


def test_threshold_filters_weak_candidates(spark, index):
    # near-copy: shares most shingles
    text = CORPUS[0][1].replace("lazy dog", "sleepy cat")
    batch = _df(spark, [(300, text)])
    all_m = probe_minhash_index(batch, index, min_est_jaccard=0.0).collect()
    strict = probe_minhash_index(batch, index, min_est_jaccard=0.99).collect()
    assert len(strict) <= len(all_m)
    for m in strict:
        assert m.est_jaccard >= 0.99


def test_append_equals_rebuild(spark, tmp_path):
    extra = [(4, "incrementally appended document about tokenizer training runs"),
             (5, CORPUS[1][1])]
    a = str(tmp_path / "appended")
    write_minhash_index(_df(spark, CORPUS), a, num_hashes=16, bands=4)
    append_minhash_index(_df(spark, extra), a)
    b = str(tmp_path / "rebuilt")
    write_minhash_index(_df(spark, CORPUS + extra), b, num_hashes=16, bands=4)
    batch = _df(spark, [(500, CORPUS[1][1])])
    ra = sorted((m.batch_id, m.corpus_id, m.n_agree)
                for m in probe_minhash_index(batch, a).collect())
    rb = sorted((m.batch_id, m.corpus_id, m.n_agree)
                for m in probe_minhash_index(batch, b).collect())
    assert ra == rb
    assert (500, 5, 16) in ra  # the appended exact copy is found


def test_probe_uses_stored_parameters(spark, tmp_path):
    # index built with 8 hashes / 2 bands: probe must follow suit
    path = str(tmp_path / "p8")
    write_minhash_index(_df(spark, CORPUS), path, num_hashes=8, bands=2)
    batch = _df(spark, [(100, CORPUS[2][1])])
    out = probe_minhash_index(batch, path).collect()
    assert len(out) == 1 and out[0].n_agree == 8 and out[0].est_jaccard == 1.0
