"""Data-plane backend seam (sinks/data_backend.py): the manifest store's
full lifecycle — write/read/append/replace/DV/merge/compact/vacuum/
time-travel — must run end-to-end against a non-POSIX object-store
emulation (flat namespace, no directories, no renames, bytes in a
driver-side dict), proving nothing in the data plane assumes a local
filesystem (VERDICT r3 "What's wrong" #1)."""

import pytest

from dataingestion_spark.sinks import manifest_store as ms
from dataingestion_spark.sinks.commit_backend import (
    MemoryCommitBackend,
    register_backend,
)
from dataingestion_spark.sinks.data_backend import (
    LocalDataBackend,
    MemoryDataBackend,
    data_backend_for,
    register_data_backend,
)


def records_df(spark, docs: dict):
    rows = [
        (f"{d}#{i:03d}", d, chunk)
        for d, chunks in docs.items()
        for i, chunk in enumerate(chunks)
    ]
    return spark.createDataFrame(rows, "key string, documentid string, content string")


@pytest.fixture()
def mem_table():
    """A mem:// table routed to fresh in-memory commit + data backends."""
    cbe, dbe = MemoryCommitBackend(), MemoryDataBackend()
    register_backend("mem", lambda: cbe)
    register_data_backend("mem", lambda: dbe)
    return "mem://tbl", cbe, dbe


def test_local_backend_primitives(tmp_path):
    be = LocalDataBackend()
    p = str(tmp_path / "d" / "f.parquet")
    assert be.read_bytes(p) is None
    be.write_bytes(p, b"abc")
    assert be.read_bytes(p) == b"abc"
    assert be.list_dir(str(tmp_path / "d")) == ["f.parquet"]
    assert be.mtime(p) is not None
    be.delete(p)
    be.delete(p)  # idempotent
    assert be.read_bytes(p) is None
    assert be.mtime(p) is None


def test_memory_backend_primitives():
    be = MemoryDataBackend()
    be.write_bytes("t/files/a.parquet", b"x")
    assert be.read_bytes("t/files/a.parquet") == b"x"
    assert be.list_dir("t/files") == ["a.parquet"]
    assert be.list_dir("t") == ["files"]
    assert be.mtime("t/files/a.parquet") is not None
    be.delete("t/files/a.parquet")
    assert be.read_bytes("t/files/a.parquet") is None


def test_scheme_resolution():
    assert isinstance(data_backend_for("/local"), LocalDataBackend)
    assert isinstance(data_backend_for("file:///local"), LocalDataBackend)
    with pytest.raises(NotImplementedError, match="data backend"):
        data_backend_for("s3x://bucket/t")


def test_write_read_roundtrip_on_memory_store(spark, mem_table):
    t, cbe, dbe = mem_table
    v = ms.write_table(records_df(spark, {"a": ["a0", "a1"], "b": ["b0"]}), t)
    assert v == 0
    # bytes landed in the DATA backend, manifest in the COMMIT backend
    assert dbe.list_dir("mem://tbl/files")
    assert cbe.read_text("mem://tbl/manifest-000000.json")
    got = ms.read_table(spark, t)
    assert got.count() == 3
    assert {r.documentid for r in got.collect()} == {"a", "b"}


def test_full_lifecycle_on_memory_store(spark, mem_table):
    """append → rewrite-replace → DV-replace → delete → merge → compact
    → time travel → vacuum, all on the object-store emulation."""
    t, cbe, dbe = mem_table
    docs = {f"doc{i}": [f"doc{i}-c0"] for i in range(12)}
    v0 = ms.write_table(records_df(spark, docs), t)
    v1 = ms.append_table(records_df(spark, {"extra": ["e0"]}), t)
    assert ms.read_table(spark, t).count() == 13

    v2 = ms.incremental_replace(records_df(spark, {"doc3": ["NEW3a", "NEW3b"]}), t)
    got = {r.documentid: 0 for r in ms.read_table(spark, t).collect()}
    assert ms.read_table(spark, t).filter("documentid='doc3'").count() == 2

    v3 = ms.incremental_replace(records_df(spark, {"doc5": ["DV5"]}), t, mode="dv")
    assert ms.read_table(spark, t).filter("documentid='doc5'").count() == 1
    assert {r.content for r in
            ms.read_table(spark, t).filter("documentid='doc5'").collect()} == {"DV5"}

    ms.delete_documents(spark, t, ["doc7"])
    assert ms.read_table(spark, t).filter("documentid='doc7'").count() == 0

    ms.merge_table(records_df(spark, {"doc1": ["MERGED1"], "fresh": ["F0"]}), t)
    snap = {r.documentid: r.content for r in ms.read_table(spark, t).collect()
            if r.documentid in ("doc1", "fresh")}
    assert snap == {"doc1": "MERGED1", "fresh": "F0"}

    n_docs = ms.read_table(spark, t).count()
    ms.compact(spark, t, max_files_per_bucket=0)
    assert ms.read_table(spark, t).count() == n_docs

    # time travel: v0 still readable pre-vacuum
    assert ms.read_table(spark, t, version=v0).count() == 12
    assert ms.read_table(spark, t, version=v1).count() == 13

    removed = ms.vacuum(t, keep_versions=1, min_file_age_seconds=0)
    assert removed  # old bucket files are gone from the data backend
    assert ms.read_table(spark, t).count() == n_docs
    with pytest.raises(FileNotFoundError):
        ms.read_manifest(t, v2)


def test_pre_schema_seed_on_memory_store(spark, mem_table):
    """The r4 schema-seeding fix works through the backend scan too."""
    import json

    from pyspark.sql import functions as F

    t, cbe, dbe = mem_table
    wide = records_df(spark, {"a": ["a0"]}).withColumn("extra", F.lit("keep"))
    ms.write_table(wide, t)
    p = ms._manifest_path(t, 0)
    m = json.loads(cbe.read_text(p))
    m.pop("schema", None)
    cbe.put_atomic(p, json.dumps(m))
    ms.append_table(records_df(spark, {"b": ["b0"]}), t)
    got = {r.documentid: r.asDict() for r in ms.read_table(spark, t).collect()}
    assert got["a"]["extra"] == "keep"
    assert got["b"]["extra"] is None


def test_schema_evolution_append_on_memory_store(spark, mem_table):
    from pyspark.sql import functions as F

    t, _, _ = mem_table
    ms.write_table(records_df(spark, {"a": ["a0"]}), t)
    ms.append_table(
        records_df(spark, {"b": ["b0"]}).withColumn("lang", F.lit("en")), t)
    got = {r.documentid: r.asDict() for r in ms.read_table(spark, t).collect()}
    assert got["b"]["lang"] == "en"
    assert got["a"]["lang"] is None


def test_size_is_stat_not_read(tmp_path):
    """size() must answer from a stat where the store has one (the
    UniForm Iceberg export calls it per data file — a full read there
    is O(corpus bytes) of driver IO)."""
    from dataingestion_spark.sinks.data_backend import (
        LocalDataBackend, MemoryDataBackend,
    )

    lb = LocalDataBackend()
    p = str(tmp_path / "blob.bin")
    lb.write_bytes(p, b"x" * 1234)
    assert lb.size(p) == 1234
    assert lb.size(str(tmp_path / "missing")) is None

    mb = MemoryDataBackend()
    mb.write_bytes("k", b"abc")
    assert mb.size("k") == 3
    assert mb.size("nope") is None


def test_read_range_default_and_overrides(tmp_path):
    """read_range: base-class slice semantics, POSIX seek override,
    and RangedFile's file-like view (r11 VERDICT #3)."""
    from dataingestion_spark.sinks.data_backend import (
        LocalDataBackend, MemoryDataBackend, RangedFile,
    )

    data = bytes(range(256)) * 4
    mem = MemoryDataBackend()
    mem.write_bytes("k/a", data)
    local = LocalDataBackend()
    p = str(tmp_path / "a.bin")
    open(p, "wb").write(data)

    for b, key in ((mem, "k/a"), (local, p)):
        assert b.read_range(key, 0, 10) == data[:10]
        assert b.read_range(key, 100, 7) == data[100:107]
        assert b.read_range(key, 1000) == data[1000:]
        assert b.read_range(key, len(data) + 5, 4) == b""
        assert b.read_range(key + ".nope", 0, 4) is None

    fh = RangedFile(mem, "k/a")
    assert fh.read(4) == data[:4]
    assert fh.read(4) == data[4:8]
    fh.seek(1020)
    assert fh.read() == data[1020:]
    assert fh.read(10) == b""  # EOF
    import pytest as _pt
    with _pt.raises(FileNotFoundError):
        RangedFile(mem, "missing").read(1)


def test_memory_backend_pickles_as_snapshot():
    import pickle

    from dataingestion_spark.sinks.data_backend import MemoryDataBackend

    mem = MemoryDataBackend()
    mem.write_bytes("a/b", b"xyz")
    clone = pickle.loads(pickle.dumps(mem))
    assert clone.read_bytes("a/b") == b"xyz"
    clone.write_bytes("a/c", b"new")
    assert mem.read_bytes("a/c") is None  # snapshot, not shared


def test_ranged_file_readahead_buffers_small_reads():
    """Three tiny reads per Avro block must NOT mean three GETs per
    block: sequential small reads are served from the readahead
    buffer (one ranged fetch per window), and EOF/seek semantics match
    a real file."""
    import random

    from dataingestion_spark.sinks.data_backend import (
        MemoryDataBackend, RangedFile,
    )

    class Counting(MemoryDataBackend):
        def __init__(self):
            super().__init__()
            self.calls = 0

        def read_range(self, path, start, length=None):
            self.calls += 1
            return super().read_range(path, start, length)

    data = bytes(random.Random(3).getrandbits(8) for _ in range(1 << 20))
    b = Counting()
    b.write_bytes("k", data)

    fh = RangedFile(b, "k", readahead=64 << 10)
    pos, got = 0, []
    rng = random.Random(7)
    while pos < len(data):
        n = rng.randint(1, 400)
        chunk = fh.read(n)
        assert chunk == data[pos:pos + n]
        pos += len(chunk)
        if not chunk:
            break
    assert pos == len(data)
    assert fh.read(10) == b""          # EOF, repeatedly
    assert fh.read(10) == b""
    # ~16 windows of 64 KB + at most a couple of EOF probes
    assert b.calls <= (1 << 20) // (64 << 10) + 3, b.calls

    # backwards seek outside the buffer refetches and still serves
    fh.seek(5)
    assert fh.read(4) == data[5:9]
    # a read larger than the buffer fetches its own range exactly
    fh.seek(100)
    assert fh.read(300 << 10) == data[100:100 + (300 << 10)]


def test_ranged_file_random_ops_match_bytesio():
    """Property: any sequence of seeks and reads through RangedFile
    (buffered, whence-aware) returns exactly what io.BytesIO returns —
    the file protocol contract pa.PythonFile and the split readers
    rely on."""
    import io
    import random

    from dataingestion_spark.sinks.data_backend import (
        MemoryDataBackend, RangedFile,
    )

    data = bytes(random.Random(11).getrandbits(8)
                 for _ in range(200_000))
    mem = MemoryDataBackend()
    mem.write_bytes("k", data)

    for seed in range(5):
        rng = random.Random(seed)
        rf = RangedFile(mem, "k", readahead=rng.choice(
            (1, 64, 4096, 1 << 20)))
        ref = io.BytesIO(data)
        for _ in range(300):
            op = rng.random()
            if op < 0.5:
                n = rng.randint(0, 9000)
                assert rf.read(n) == ref.read(n)
            elif op < 0.7:
                p = rng.randint(0, len(data) + 100)
                assert rf.seek(p) == ref.seek(p)
            elif op < 0.8:
                d = rng.randint(-500, 500)
                # clamp: BytesIO raises on negative absolute position
                if ref.tell() + d >= 0:
                    assert rf.seek(d, 1) == ref.seek(d, 1)
            elif op < 0.9:
                d = rng.randint(-1000, 0)
                if len(data) + d >= 0:
                    assert rf.seek(d, 2) == ref.seek(d, 2)
            else:
                assert rf.tell() == ref.tell()
        assert rf.read() == ref.read()


class _FakeFsspecFs:
    """The fsspec method subset FsspecDataBackend touches, over a dict —
    lets the adapter be driven offline (fsspec is absent in this image;
    when present, the same test runs against fsspec's real memory://)."""

    def __init__(self):
        self.kv = {}

    def pipe_file(self, path, value):
        self.kv[path] = bytes(value)

    def cat_file(self, path, start=None, end=None):
        if path not in self.kv:
            raise FileNotFoundError(path)
        return self.kv[path][start:end]

    def rm_file(self, path):
        if path not in self.kv:
            raise FileNotFoundError(path)
        del self.kv[path]

    def ls(self, path, detail=True):
        prefix = path.rstrip("/") + "/"
        names = sorted({prefix + k[len(prefix):].split("/", 1)[0]
                        for k in self.kv if k.startswith(prefix)})
        if not names:
            raise FileNotFoundError(path)
        return names

    def size(self, path):
        if path not in self.kv:
            raise FileNotFoundError(path)
        return len(self.kv[path])

    def modified(self, path):
        import datetime

        if path not in self.kv:
            raise FileNotFoundError(path)
        return datetime.datetime(2026, 1, 1)

    def makedirs(self, path, exist_ok=False):
        pass


def _fsspec_test_fs():
    from dataingestion_spark.sinks.data_backend import fsspec_available

    if fsspec_available():
        import fsspec

        return fsspec.filesystem("memory")
    return _FakeFsspecFs()


def test_fsspec_backend_primitives():
    from dataingestion_spark.sinks.data_backend import FsspecDataBackend

    be = FsspecDataBackend(fs=_fsspec_test_fs())
    assert be.read_bytes("b/t/files/a.parquet") is None
    be.write_bytes("b/t/files/a.parquet", b"abc")
    assert be.read_bytes("b/t/files/a.parquet") == b"abc"
    assert be.size("b/t/files/a.parquet") == 3
    assert be.size("b/t/files/missing") is None
    assert be.list_dir("b/t/files") == ["a.parquet"]
    assert be.list_dir("b/t") == ["files"]
    assert be.list_dir("b/nope") == []
    assert be.read_range("b/t/files/a.parquet", 1, 1) == b"b"
    assert be.read_range("b/t/files/a.parquet", 1) == b"bc"
    assert be.read_range("b/t/files/missing", 0, 1) is None
    assert be.mtime("b/t/files/a.parquet") is not None
    be.delete("b/t/files/a.parquet")
    be.delete("b/t/files/a.parquet")  # idempotent
    assert be.read_bytes("b/t/files/a.parquet") is None


def test_fsspec_backend_splits_tar_span():
    """A byte-range split reader seeking inside one shard that lives
    only in an fsspec store: _read_tar_span through FsspecDataBackend
    (RangedFile over cat_file ranged GETs) must partition exactly like
    the POSIX path."""
    from dataingestion_spark.sinks.data_backend import FsspecDataBackend
    from dataingestion_spark.sinks.webdataset import (
        _read_tar_span, build_tar_bytes,
    )

    members = [(f"{i:04d}.txt", f"payload {i} ".encode() * (1 + i % 9))
               for i in range(20)]
    blob = build_tar_bytes(members)
    be = FsspecDataBackend(fs=_fsspec_test_fs())
    be.write_bytes("bkt/shard.tar", blob)
    size = len(blob)

    want = _read_tar_span("bkt/shard.tar", 0, size, size, backend=be)
    assert want == members
    for b in range(512, size, 2048):
        got = (_read_tar_span("bkt/shard.tar", 0, b, size, backend=be)
               + _read_tar_span("bkt/shard.tar", b, size, size,
                                backend=be))
        assert got == want, f"fsspec boundary {b} diverged"


def test_fsspec_gate_and_scheme_fallback():
    """Cloud schemes resolve to FsspecDataBackend out of the box; with
    fsspec absent the failure is the LOUD gated error naming the
    package (read_markitdown pattern), not a silent local-path mangle.
    Explicit registrations still take precedence."""
    from dataingestion_spark.sinks.data_backend import (
        FsspecDataBackend, fsspec_available,
    )

    if fsspec_available():
        import fsspec  # noqa: F401

        be = data_backend_for("s3://bucket/table")
        assert isinstance(be, FsspecDataBackend)
    else:
        with pytest.raises(NotImplementedError, match="fsspec"):
            data_backend_for("s3://bucket/table")
        with pytest.raises(NotImplementedError, match="fsspec"):
            data_backend_for("abfss://container@acct/table")
    # unknown schemes keep the registration seam error
    with pytest.raises(NotImplementedError, match="data backend"):
        data_backend_for("s3x://bucket/t")
    # an explicit registration wins over the fsspec fallback
    marker = MemoryDataBackend()
    register_data_backend("gs", lambda: marker)
    try:
        assert data_backend_for("gs://b/t") is marker
    finally:
        from dataingestion_spark.sinks.data_backend import _REGISTRY

        _REGISTRY.pop("gs", None)


def test_fsspec_backend_pickles_with_fake_fs():
    import pickle

    from dataingestion_spark.sinks.data_backend import FsspecDataBackend

    be = FsspecDataBackend(fs=_FakeFsspecFs())
    be.write_bytes("k", b"xyz")
    clone = pickle.loads(pickle.dumps(be))
    assert clone.read_bytes("k") == b"xyz"


def test_fsspec_backend_unpicklable_fs_fails_loudly():
    """An fs-constructed backend whose filesystem holds an unpicklable
    session must refuse pickling HERE with a message naming the fix,
    not deep inside Spark task serialization."""
    import pickle
    import threading

    from dataingestion_spark.sinks.data_backend import FsspecDataBackend

    fs = _FakeFsspecFs()
    fs.session = threading.Lock()  # locks never pickle
    be = FsspecDataBackend(fs=fs)
    with pytest.raises(TypeError, match="protocol=.*executor-shippable"):
        pickle.dumps(be)


def test_fsspec_list_dir_invalidates_listing_cache():
    """s3fs-style filesystems cache dir listings; list_dir must ask for
    a fresh one so vacuum/split-planning see external writes."""
    from dataingestion_spark.sinks.data_backend import FsspecDataBackend

    calls = []

    class _CachingFs(_FakeFsspecFs):
        def invalidate_cache(self, path=None):
            calls.append(path)

    fs = _CachingFs()
    be = FsspecDataBackend(fs=fs)
    be.write_bytes("t/a", b"1")
    assert be.list_dir("t") == ["a"]
    assert calls == ["t"]
