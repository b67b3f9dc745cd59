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


def test_zst_roundtrip_determinism_and_corrupt_contract(spark, tmp_path):
    """zstd shards (DCLM / RedPajama-v2 shape): deterministic bytes,
    real zstd frames on disk, multi-frame files accepted, and the SAME
    corrupt-line contract as the plain reader (shared _parse_lines)."""
    import pyarrow as pa

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    out1, out2 = str(tmp_path / "z1"), str(tmp_path / "z2")
    names = jsonl.write_jsonl_zst(docs, out1, shards=3, order_by="doc_id")
    assert names == [f"part-{i:05d}-of-00003.jsonl.zst" for i in range(3)]
    raw = (tmp_path / "z1" / names[0]).read_bytes()
    assert raw[:4] == b"\x28\xb5\x2f\xfd"  # zstd frame magic
    jsonl.write_jsonl_zst(docs, out2, shards=3, order_by="doc_id")
    for n in names:  # byte-deterministic re-export
        assert (tmp_path / "z1" / n).read_bytes() == \
            (tmp_path / "z2" / n).read_bytes()

    back = jsonl.read_jsonl_zst(spark, out1)
    assert {tuple(r) for r in back.collect()} == \
        {tuple(r) for r in docs.collect()}

    # a MULTI-FRAME shard (two concatenated frames) + a corrupt line
    codec = pa.Codec("zstd")
    good = ('{"doc_id": 900000001, "text": "ok", "lang": "en", '
            '"source": "s", "n_chars": 2}\n')
    frame1 = codec.compress(good.encode()).to_pybytes()
    frame2 = codec.compress(b"not json at all\n").to_pybytes()
    extra = tmp_path / "z1" / "extra.jsonl.zst"
    extra.write_bytes(frame1 + frame2)
    with_extra = jsonl.read_jsonl_zst(spark, out1, keep_corrupt=True)
    corrupt = with_extra.filter(F.col("_corrupt").isNotNull()).count()
    assert corrupt == 1
    ok = jsonl.read_jsonl_zst(spark, out1)
    assert ok.count() == docs.count() + 1
    assert ok.filter(F.col("doc_id") == 900000001).count() == 1


def test_stream_jsonl_tails_a_landing_dir(spark, tmp_path):
    """availableNow drain of a shard directory == the batch read, with
    the same tolerant corrupt-line contract, paced one file per
    micro-batch; a shard landing AFTER the first drain is picked up by
    the next run on the same checkpoint, exactly once."""
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    land = str(tmp_path / "landing")
    jsonl.write_jsonl(docs, land, shards=3)
    (tmp_path / "landing" / "bad.jsonl").write_text(
        "definitely not json\n")
    ckpt = str(tmp_path / "ckpt")
    sink = str(tmp_path / "sink")

    def drain():
        before = spark.read.parquet(sink).count() \
            if (tmp_path / "sink").exists() else 0
        q = (jsonl.stream_jsonl(spark, land, max_files_per_trigger=1)
             .writeStream.format("parquet").option("path", sink)
             .option("checkpointLocation", ckpt)
             .outputMode("append").trigger(availableNow=True).start())
        q.awaitTermination()
        all_rows = spark.read.parquet(sink)
        return all_rows, all_rows.count() - before

    got, n_new = drain()
    assert n_new == docs.count()  # corrupt line excluded, rest in
    assert {tuple(r) for r in got.collect()} == \
        {tuple(r) for r in docs.collect()}

    # a late shard lands; the next availableNow run ingests ONLY it
    late = spark.createDataFrame(
        [(999000001, "late doc", "en", "s", 8)], jsonl.DOCUMENTS_SCHEMA)
    jsonl.write_jsonl(late, land + "_tmp", compression=None, shards=1)
    import os
    import shutil
    src = next(p for p in os.listdir(land + "_tmp")
               if p.endswith(".json"))
    shutil.move(os.path.join(land + "_tmp", src),
                os.path.join(land, "late.jsonl"))
    got2, n_new2 = drain()
    assert n_new2 == 1  # exactly the late shard, nothing replayed
    assert got2.filter(F.col("doc_id") == 999000001).count() == 1
    assert got2.count() == docs.count() + 1


def test_zst_roundtrip_property(spark, tmp_path):
    """Adversarial content survives the zst pipeline: newlines inside
    text (JSON-escaped), quotes/backslashes, unicode, empty strings,
    and NULL cells."""
    from pyspark.sql import types as T

    rows = [
        (1, "line one\nline two\nthree", "en"),
        (2, 'quote " backslash \\ tab\t', "de"),
        (3, "unicode: é中文 \U0001f600 ​", "zh"),
        (4, "", "fr"),
        (5, None, None),
        (6, "   leading/trailing   ", "en"),
        (7, "{}[]:,\"'", "en"),
    ]
    schema = T.StructType([
        T.StructField("doc_id", T.LongType()),
        T.StructField("text", T.StringType()),
        T.StructField("lang", T.StringType()),
    ])
    df = spark.createDataFrame(rows, schema)
    out = str(tmp_path / "adv")
    jsonl.write_jsonl_zst(df, out, shards=2, order_by="doc_id")
    back = jsonl.read_jsonl_zst(spark, out, schema=schema)
    assert {tuple(r) for r in back.collect()} == set(rows)


def test_zst_split_equals_whole_file(spark, tmp_path):
    """Multi-frame shards (frame_lines=N) read as byte ranges must
    yield exactly the whole-file rows — no frame lost or doubled at
    any split boundary; resync candidates are validated by the RFC
    8878 structural walk."""
    import hashlib
    import os

    from dataingestion_spark.sources import jsonl

    schema = jsonl.DOCUMENTS_SCHEMA
    rows = [(i, "".join(hashlib.sha256(f"{i}:{j}".encode()).hexdigest()
                        for j in range(12)),
             f"l{i % 5}", "s", i) for i in range(4000)]
    df = spark.createDataFrame(rows, schema)
    out = str(tmp_path / "zsplit")
    jsonl.write_jsonl_zst(df, out, shards=1, order_by="doc_id",
                          frame_lines=50)
    p = [os.path.join(out, n) for n in os.listdir(out)][0]
    assert os.path.getsize(p) > (1 << 20)  # >= 2 splits at 1 MB

    whole = jsonl.read_jsonl_zst(spark, out, schema=schema)
    split = jsonl.read_jsonl_zst_split(spark, out, schema,
                                       split_mb=1)
    a = {tuple(r) for r in whole.collect()}
    b = {tuple(r) for r in split.collect()}
    assert a == b and len(a) == 4000

    # single-frame shards degrade gracefully (split 0 owns the frame)
    out1 = str(tmp_path / "zone")
    jsonl.write_jsonl_zst(df.limit(100), out1, shards=1,
                          order_by="doc_id")
    one = jsonl.read_jsonl_zst_split(spark, out1, schema, split_mb=1)
    assert one.count() == 100


def test_zst_split_frame_walk_and_misaligned(tmp_path, spark):
    """The structural frame walk must land exactly on frame starts
    (incl. skippable frames), and a frame ending mid-line must raise
    rather than emit a torn JSON document."""
    import os

    import pyarrow as pa

    from dataingestion_spark.sources.jsonl import (
        _zstd_frame_end, read_jsonl_zst_split,
    )

    codec = pa.Codec("zstd")
    f1 = codec.compress(b'{"doc_id": 1}\n').to_pybytes()
    skip = b"\x50\x2a\x4d\x18" + (4).to_bytes(4, "little") + b"ABCD"
    f2 = codec.compress(b'{"doc_id": 2}\n').to_pybytes()
    blob = f1 + skip + f2
    p = str(tmp_path / "w.jsonl.zst")
    open(p, "wb").write(blob)

    class FH:
        def __init__(self, b):
            self.b, self.p = b, 0

        def seek(self, p):
            self.p = p

        def read(self, n=None):
            out = self.b[self.p:None if n is None else self.p + n]
            self.p += len(out)
            return out

    fh = FH(blob)
    assert _zstd_frame_end(fh, 0, len(blob)) == len(f1)
    assert _zstd_frame_end(fh, len(f1), len(blob)) == len(f1) + len(skip)
    assert _zstd_frame_end(fh, len(f1) + len(skip),
                           len(blob)) == len(blob)
    assert _zstd_frame_end(fh, 3, len(blob)) is None  # mid-frame junk

    # a frame split mid-line raises loudly in split mode — the torn
    # frame must be big enough that a range BOUNDARY separates it from
    # the closing frame (one task owning both frames concatenates them
    # and is legitimately fine)
    import hashlib as _h
    d = str(tmp_path / "torn")
    os.makedirs(d)
    big = "".join(_h.sha256(f"t{j}".encode()).hexdigest()
                  for j in range(40_000)).encode()
    g1 = codec.compress(b'{"doc_id": 1, "text": "' + big).to_pybytes()
    g2 = codec.compress(b'tail"}\n').to_pybytes()
    assert len(g1) > (1 << 20)
    open(os.path.join(d, "t.jsonl.zst"), "wb").write(g1 + g2)
    import pytest as _pt
    with _pt.raises(Exception, match="not line-aligned"):
        read_jsonl_zst_split(spark, d, split_mb=1).collect()


def test_zst_split_over_memory_backend(spark, tmp_path):
    """Frame splits through a non-POSIX range-read backend."""
    import os

    from dataingestion_spark.sinks.data_backend import MemoryDataBackend
    from dataingestion_spark.sources import jsonl

    schema = jsonl.DOCUMENTS_SCHEMA
    rows = [(i, "x" * 600, "l", "s", i) for i in range(3000)]
    df = spark.createDataFrame(rows, schema)
    out = str(tmp_path / "zmem")
    jsonl.write_jsonl_zst(df, out, shards=1, order_by="doc_id",
                          frame_lines=40, level=1)
    mem = MemoryDataBackend()
    for n in os.listdir(out):
        mem.write_bytes(f"store/z/{n}",
                        open(os.path.join(out, n), "rb").read())
    got = jsonl.read_jsonl_zst_split(spark, "store/z", schema,
                                     split_mb=1, backend=mem)
    assert sorted(r["doc_id"] for r in got.collect()) == list(range(3000))


def test_stream_jsonl_zst_tails_landing_dir(spark, tmp_path):
    """stream_jsonl_zst discovers shards exactly once across drains
    and parses identically to the batch reader (shared decompress +
    _parse_lines), including the corrupt-line contract."""
    import os

    import pyarrow as pa

    from dataingestion_spark.sources import jsonl

    schema = jsonl.DOCUMENTS_SCHEMA
    land = str(tmp_path / "land")
    sink = str(tmp_path / "sink")
    ckpt = str(tmp_path / "ckpt")
    os.makedirs(land)

    def drop(name, rows, corrupt=False):
        body = "\n".join(
            f'{{"doc_id": {i}, "text": "t{i}", "lang": "l", '
            f'"source": "s", "n_chars": {i}}}' for i in rows)
        if corrupt:
            body += "\nnot json at all"
        blob = pa.Codec("zstd").compress(
            (body + "\n").encode()).to_pybytes()
        open(os.path.join(land, name), "wb").write(blob)

    def drain():
        q = (jsonl.stream_jsonl_zst(spark, land, schema)
             .writeStream.format("parquet")
             .option("path", sink).option("checkpointLocation", ckpt)
             .trigger(availableNow=True).start())
        q.awaitTermination(120)

    drop("a.jsonl.zst", range(0, 5))
    drain()
    drop("b.jsonl.zst", range(5, 12), corrupt=True)
    drain()
    got = sorted(r["doc_id"]
                 for r in spark.read.parquet(sink).collect())
    assert got == list(range(12))  # corrupt line dropped, not poison


def test_zst_split_many_files_parallel_planning(spark, tmp_path):
    """Above 32 files the sniff+stat probes run as one Spark job; the
    read must still be exact (exercises the distributed planner)."""
    import pyarrow as pa

    from dataingestion_spark.sources import jsonl

    d = str(tmp_path / "many")
    import os
    os.makedirs(d)
    codec = pa.Codec("zstd")
    for i in range(40):
        body = (f'{{"doc_id": {i}, "text": "t{i}", "lang": "l", '
                f'"source": "s", "n_chars": {i}}}\n').encode()
        open(os.path.join(d, f"p{i:03d}.jsonl.zst"), "wb").write(
            codec.compress(body).to_pybytes())
    got = jsonl.read_jsonl_zst_split(spark, d, split_mb=1)
    assert sorted(r["doc_id"] for r in got.collect()) == list(range(40))
