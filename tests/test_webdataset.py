"""WebDataset tar shard sink (sinks/webdataset.py)."""

import glob
import io
import tarfile

from pyspark.sql import functions as F

from dataingestion_spark.sinks.webdataset import (
    build_tar_bytes,
    read_webdataset,
    tar_size_closed_form,
    write_webdataset,
)


def test_tar_bytes_deterministic_and_sized():
    members = [("a.txt", b"hello"), ("a.json", b'{"x":1}'), ("b.txt", b"")]
    one = build_tar_bytes(members)
    two = build_tar_bytes(members)
    assert one == two
    assert len(one) == tar_size_closed_form([5, 7, 0]) == 10240
    # payload crossing a 512 boundary grows the closed form identically
    big = build_tar_bytes([("a.txt", b"x" * 513)])
    assert len(big) == tar_size_closed_form([513])


def _df(spark):
    rows = [
        (i, f"{i:06d}", f"text body {i} " + "pad " * (i % 5), f'{{"n":{i}}}')
        for i in range(23)
    ]
    return spark.createDataFrame(rows, ["doc_id", "key", "text", "meta"]).withColumn(
        "shard_id", F.col("doc_id") % 4
    )


def test_write_and_roundtrip(spark, tmp_path):
    out = str(tmp_path / "wds")
    manifest = write_webdataset(_df(spark), out).orderBy("shard_id").collect()
    assert [m.shard_id for m in manifest] == [0, 1, 2, 3]
    assert sum(m.n_members for m in manifest) == 2 * 23
    files = sorted(glob.glob(f"{out}/shard-*.tar"))
    assert len(files) == 4
    # on-disk bytes match the manifest and the closed form
    for m, f in zip(manifest, files):
        data = open(f, "rb").read()
        assert len(data) == m.tar_nbytes
    # members are key-sorted inside each shard (txt before json per key
    # is not guaranteed — grouping is by key)
    with tarfile.open(files[0]) as tf:
        names = tf.getnames()
        keys = [n.rpartition(".")[0] for n in names]
        assert keys == sorted(keys)
        payload = tf.extractfile(f"{keys[0]}.txt").read().decode()
        assert payload.startswith("text body")
    # loader-side distributed read agrees with the source rows
    back = read_webdataset(spark, out)
    txt = {r.key: r.payload for r in back.filter("ext = 'txt'").collect()}
    for r in _df(spark).collect():
        assert txt[r.key] == r.text


def test_dry_run_writes_nothing(spark, tmp_path):
    manifest = write_webdataset(_df(spark), None).collect()
    assert len(manifest) == 4
    assert manifest[0].first_key <= manifest[0].last_key


def test_rewrite_is_byte_identical(spark, tmp_path):
    out1, out2 = str(tmp_path / "a"), str(tmp_path / "b")
    write_webdataset(_df(spark), out1).collect()
    write_webdataset(_df(spark), out2).collect()
    for f1, f2 in zip(
        sorted(glob.glob(f"{out1}/*.tar")), sorted(glob.glob(f"{out2}/*.tar"))
    ):
        assert open(f1, "rb").read() == open(f2, "rb").read()


def test_split_reader_equals_whole_file(spark, tmp_path):
    """Byte-range tar splitting must yield exactly the whole-file
    members: checksum-validated 512-aligned resync, no member lost or
    doubled at any boundary, members straddling a boundary owned by
    the split their header starts in."""
    import hashlib
    import os

    from pyspark.sql import functions as F

    from dataingestion_spark.sinks.webdataset import (
        read_webdataset, read_webdataset_split, write_webdataset,
    )

    docs = spark.range(1500).select(
        F.lit(0).alias("shard_id"),
        F.format_string("%06d", F.col("id")).alias("key"),
        F.concat(F.lit("body "), F.sha2(F.col("id").cast("string"),
                                        256),
                 F.lit(" tail " * 40)).alias("text"),
        F.to_json(F.struct(F.col("id"))).alias("meta"))
    out = str(tmp_path / "wds")
    write_webdataset(docs, out).collect()
    p = os.path.join(out, "shard-00000.tar")
    assert os.path.getsize(p) > (1 << 20)  # >= 2 splits at 1 MB

    whole = {(r["key"], r["ext"], r["payload"])
             for r in read_webdataset(spark, out).collect()}
    split = {(r["key"], r["ext"], r["payload"])
             for r in read_webdataset_split(spark, out,
                                            split_mb=1).collect()}
    assert split == whole and len(split) == 3000  # .txt + .json each


def test_split_reader_over_memory_backend(spark, tmp_path):
    import os

    from pyspark.sql import functions as F

    from dataingestion_spark.sinks.data_backend import MemoryDataBackend
    from dataingestion_spark.sinks.webdataset import (
        read_webdataset_split, write_webdataset,
    )

    docs = spark.range(800).select(
        F.lit(0).alias("shard_id"),
        F.format_string("%06d", F.col("id")).alias("key"),
        F.concat(F.sha2(F.col("id").cast("string"), 256),
                 F.lit("y" * 900)).alias("text"),
        F.lit(None).cast("string").alias("meta"))
    out = str(tmp_path / "wdsm")
    write_webdataset(docs, out, meta_col=None).collect()
    mem = MemoryDataBackend()
    for n in os.listdir(out):
        mem.write_bytes(f"store/wds/{n}",
                        open(os.path.join(out, n), "rb").read())
    got = read_webdataset_split(spark, "store/wds", split_mb=1,
                                backend=mem)
    keys = sorted(r["key"] for r in got.collect())
    assert keys == [f"{i:06d}" for i in range(800)]


def test_split_reader_handles_head_global_rejects_non_tar(
        spark, tmp_path):
    """Per-file pax (x) and GNU longname entries split since r13;
    HEAD-of-archive pax GLOBAL (g) headers split since r14 (the
    planner probe captures them — the git-archive shape); what still
    refuses loudly: files that are not USTAR at all (and MID-archive
    globals, pinned in test_split_boundaries)."""
    import os
    import tarfile as _tf

    import pytest as _pt

    from dataingestion_spark.sinks.webdataset import (
        read_webdataset_split,
    )

    d = str(tmp_path / "glob")
    os.makedirs(d)
    p = os.path.join(d, "a.tar")
    with _tf.open(p, "w", format=_tf.PAX_FORMAT,
                  pax_headers={"comment": "archive-wide"}) as tf:
        info = _tf.TarInfo("a.txt")
        data = b"hello"
        info.size = len(data)
        import io as _io
        tf.addfile(info, _io.BytesIO(data))
    rows = read_webdataset_split(spark, d, split_mb=1).collect()
    assert [(r["key"], r["ext"], r["payload"]) for r in rows] == \
        [("a", "txt", "hello")]

    d2 = str(tmp_path / "raw")
    os.makedirs(d2)
    open(os.path.join(d2, "b.tar"), "wb").write(b"not a tar" * 100)
    with _pt.raises(ValueError, match="not a USTAR"):
        read_webdataset_split(spark, d2, split_mb=1)


def test_stream_webdataset_tails_landing_dir(spark, tmp_path):
    """stream_webdataset discovers shards exactly once across drains
    and parses identically to the batch reader (shared parser)."""
    import os

    from pyspark.sql import functions as F

    from dataingestion_spark.sinks.webdataset import (
        stream_webdataset, write_webdataset,
    )

    land = str(tmp_path / "land")
    os.makedirs(land)

    def drop(shard, rng):
        docs = spark.createDataFrame(
            [(shard, f"{i:06d}", f"txt{i}", None) for i in rng],
            "shard_id long, key string, text string, meta string")
        write_webdataset(docs, land, meta_col=None).collect()

    def drain():
        q = (stream_webdataset(spark, land, max_files_per_trigger=1)
             .writeStream.format("parquet")
             .option("path", str(tmp_path / "sink"))
             .option("checkpointLocation", str(tmp_path / "ckpt"))
             .trigger(availableNow=True).start())
        q.awaitTermination(120)

    drop(0, range(0, 6))
    drain()
    drop(1, range(6, 14))
    drain()
    got = sorted(r["key"] for r in
                 spark.read.parquet(str(tmp_path / "sink")).collect())
    assert got == [f"{i:06d}" for i in range(14)]


def test_read_webdataset_split_foreign_pax_shard(spark, tmp_path):
    """A shard written by python's tarfile (PAX BY DEFAULT — x-header
    sequences for >100-char names) reads identically through the
    byte-range split path and the tarfile-backed whole-file reader:
    same keys, exts, payloads, with pax path overrides honored."""
    import io
    import os
    import tarfile

    from dataingestion_spark.sinks.webdataset import (
        read_webdataset, read_webdataset_split,
    )

    d = str(tmp_path / "foreign")
    os.makedirs(d)
    with tarfile.open(os.path.join(d, "s.tar"), "w",
                      format=tarfile.PAX_FORMAT) as tf:
        for i in range(40):
            name = (f"{'p' * 110}/{i:05d}.txt" if i % 4 == 0
                    else f"{i:05d}.txt")
            data = f"payload {i} ".encode() * (1 + (i * 53) % 200)
            info = tarfile.TarInfo(name)
            info.size = len(data)
            tf.addfile(info, io.BytesIO(data))

    whole = sorted(
        (r["key"], r["ext"], r["payload"])
        for r in read_webdataset(spark, d).collect())
    split = sorted(
        (r["key"], r["ext"], r["payload"])
        for r in read_webdataset_split(spark, d, split_mb=1).collect())
    assert split == whole
    assert len(split) == 40
    assert any(k.startswith("p" * 110) for k, _e, _p in split)
