"""JSONL interchange source/sink (sources/jsonl.py)."""

import gzip
import os

from pyspark.sql import functions as F

from dataingestion_spark.sources import jsonl


def test_roundtrip_lossless_including_newlines(spark, tmp_path):
    docs = spark.createDataFrame(
        [(1, "line one\nline two", "en", "s", 17),
         (2, 'quotes " and \\ backslash', "de", "s", 24)],
        jsonl.DOCUMENTS_SCHEMA,
    )
    out = str(tmp_path / "shards")
    jsonl.write_jsonl(docs, out, compression=None, shards=1)
    back = jsonl.read_jsonl(spark, out)
    assert {tuple(r) for r in back.collect()} == {tuple(r) for r in docs.collect()}


def test_gzip_shards_and_shard_count(spark, tmp_path):
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    out = str(tmp_path / "gz")
    jsonl.write_jsonl(docs, out, shards=3)
    parts = [p for p in os.listdir(out) if p.endswith(".json.gz")]
    assert len(parts) == 3
    with gzip.open(os.path.join(out, parts[0]), "rt") as fh:
        assert fh.readline().startswith("{")
    back = jsonl.read_jsonl(spark, out)
    assert back.count() == docs.count()


def test_corrupt_lines_are_data_not_poison(spark, tmp_path):
    p = tmp_path / "bad"
    p.mkdir()
    (p / "shard0.jsonl").write_text(
        '{"doc_id": 1, "text": "ok", "lang": "en", "source": "s", "n_chars": 2}\n'
        'this is not json\n'
        '{"doc_id": 2, "text": "also ok", "lang": "en", "source": "s", "n_chars": 7}\n'
        '{"truncated": \n'
    )
    good = jsonl.read_jsonl(spark, str(p))
    assert sorted(r.doc_id for r in good.collect()) == [1, 2]
    assert jsonl.corrupt_count(spark, str(p)) == 2
    kept = jsonl.read_jsonl(spark, str(p), keep_corrupt=True)
    bad = kept.filter(F.col("_corrupt").isNotNull())
    assert {r._corrupt for r in bad.collect()} == {
        "this is not json", '{"truncated": '
    }
