"""Commit-backend seam (sinks/commit_backend.py): the manifest commit
protocol must serialize concurrent writers through conditional puts
alone — no renames — so it runs unchanged on object storage."""

import threading

import pytest

from dataingestion_spark.sinks import manifest_store as ms
from dataingestion_spark.sinks.commit_backend import (
    LocalCommitBackend,
    MemoryCommitBackend,
    backend_for,
    register_backend,
)


def test_local_backend_primitives(tmp_path):
    be = LocalCommitBackend()
    p = str(tmp_path / "t" / "key.json")
    assert be.read_text(p) is None
    assert be.put_if_absent(p, "one") is True
    assert be.put_if_absent(p, "two") is False  # conditional: loser fails
    assert be.read_text(p) == "one"
    be.put_atomic(p, "three")
    assert be.read_text(p) == "three"
    assert "key.json" in be.list_dir(str(tmp_path / "t"))
    be.delete(p)
    be.delete(p)  # idempotent
    assert be.read_text(p) is None


def test_memory_backend_primitives():
    be = MemoryCommitBackend()
    assert be.put_if_absent("tbl/_CURRENT", "0") is True
    assert be.put_if_absent("tbl/_CURRENT", "1") is False
    be.put_atomic("tbl/_CURRENT", "2")
    assert be.read_text("tbl/_CURRENT") == "2"
    be.put_atomic("tbl/files/a.parquet", "x")
    assert be.list_dir("tbl") == ["_CURRENT", "files"]
    assert be.list_dir("tbl/files") == ["a.parquet"]


def test_backend_for_scheme_resolution():
    assert isinstance(backend_for("/local/path"), LocalCommitBackend)
    assert isinstance(backend_for("file:///local/path"), LocalCommitBackend)
    with pytest.raises(NotImplementedError, match="commit backend"):
        backend_for("s3://bucket/table")
    mem = MemoryCommitBackend()
    register_backend("mem", lambda: mem)
    assert backend_for("mem://tbl") is mem


def _commit_on(monkeypatch, be):
    """Route manifest_store's metadata plane to the given backend."""
    monkeypatch.setattr(ms, "backend_for", lambda path: be)


def test_commit_protocol_on_object_store_semantics(monkeypatch):
    """_commit against the memory (object-store) backend: versions climb,
    _CURRENT follows, manifests are readable back."""
    be = MemoryCommitBackend()
    _commit_on(monkeypatch, be)
    t = "mem://tbl"
    v0 = ms._commit(t, 0, {"0": ["b0-x-0.parquet"]}, expected_current=None)
    assert v0 == 0 and ms.current_version(t) == 0
    v1 = ms._commit(t, 1, {"0": ["b0-y-0.parquet"]}, expected_current=0)
    assert v1 == 1 and ms.read_manifest(t)["buckets"] == {"0": ["b0-y-0.parquet"]}


def test_concurrent_writers_serialize_via_conditional_put(monkeypatch):
    """Two writers race the same expected version: exactly one wins the
    conditional claim; the loser gets ConcurrentWriteError (retry), never
    a lost update — the exact object-store race the seam must survive."""
    be = MemoryCommitBackend()
    _commit_on(monkeypatch, be)
    t = "mem://tbl"
    ms._commit(t, 0, {"0": ["base.parquet"]}, expected_current=None)

    barrier = threading.Barrier(2)
    results = {}

    def writer(name, files):
        barrier.wait()
        try:
            v = ms._commit(t, 1, {"0": files}, expected_current=0)
            results[name] = ("ok", v)
        except ms.ConcurrentWriteError:
            results[name] = ("conflict", None)

    ta = threading.Thread(target=writer, args=("a", ["a.parquet"]))
    tb = threading.Thread(target=writer, args=("b", ["b.parquet"]))
    ta.start(); tb.start(); ta.join(); tb.join()

    outcomes = sorted(r[0] for r in results.values())
    assert outcomes == ["conflict", "ok"], results
    winner = next(n for n, r in results.items() if r[0] == "ok")
    assert ms.current_version(t) == 1
    assert ms.read_manifest(t)["buckets"]["0"] == [f"{winner}.parquet"]


def test_claim_is_the_commit_point_pointer_is_only_a_hint(monkeypatch):
    """A writer that dies between the manifest claim and the _CURRENT
    write HAS committed (its data files were in place before _commit);
    readers find the version by probing past the stale hint, and the
    table is not wedged for the next writer."""
    be = MemoryCommitBackend()
    _commit_on(monkeypatch, be)
    t = "mem://tbl"
    ms._commit(t, 0, {"0": ["base.parquet"]}, expected_current=None)

    real_put_atomic = be.put_atomic
    def dying(path, text):
        raise RuntimeError("crash before pointer write")
    be.put_atomic = dying
    with pytest.raises(RuntimeError):
        ms._commit(t, 1, {"0": ["new.parquet"]}, expected_current=0)
    be.put_atomic = real_put_atomic

    # the claim committed: readers see version 1 despite the stale hint
    assert be.read_text("mem://tbl/_CURRENT") == "0"
    assert ms.current_version(t) == 1
    assert ms.read_manifest(t)["buckets"]["0"] == ["new.parquet"]
    # next writer proceeds normally from the true head
    assert ms._commit(t, 2, {"0": ["v2.parquet"]}, expected_current=1) == 2
    assert be.read_text("mem://tbl/_CURRENT") == "2"  # hint caught up


def test_losing_a_claim_is_never_mistaken_for_an_orphan(monkeypatch):
    """The round-2 protocol hole: writer B losing the version-1 claim
    while _CURRENT still reads 0 must NOT 'skip the orphan' and commit
    version 2 on stale state — that silently drops A's commit. B must
    get ConcurrentWriteError instead."""
    be = MemoryCommitBackend()
    _commit_on(monkeypatch, be)
    t = "mem://tbl"
    ms._commit(t, 0, {"0": ["base.parquet"]}, expected_current=None)
    # writer A claims version 1 but its pointer write hasn't landed yet
    be.put_if_absent("mem://tbl/manifest-000001.json",
                     '{"version": 1, "buckets": {"0": ["a.parquet"]}}')
    with pytest.raises(ms.ConcurrentWriteError):
        ms._commit(t, 1, {"0": ["b.parquet"]}, expected_current=0)
    assert ms.read_manifest(t)["buckets"]["0"] == ["a.parquet"]


def test_vacuum_through_backend(monkeypatch):
    """vacuum routes manifests through the COMMIT backend and parquet
    files through the DATA backend — two independent seams."""
    from dataingestion_spark.sinks.data_backend import (
        MemoryDataBackend,
        register_data_backend,
    )

    be = MemoryCommitBackend()
    _commit_on(monkeypatch, be)
    dbe = MemoryDataBackend()
    register_data_backend("mem", lambda: dbe)
    t = "mem://tbl"
    ms._commit(t, 0, {"0": ["old.parquet"]}, expected_current=None)
    dbe.write_bytes("mem://tbl/files/old.parquet", b"DATA0")
    ms._commit(t, 1, {"0": ["new.parquet"]}, expected_current=0)
    dbe.write_bytes("mem://tbl/files/new.parquet", b"DATA1")
    removed = ms.vacuum(t, keep_versions=1, min_file_age_seconds=0)
    assert removed == ["old.parquet"]
    assert dbe.read_bytes("mem://tbl/files/new.parquet") == b"DATA1"
    assert dbe.read_bytes("mem://tbl/files/old.parquet") is None
    assert be.read_text("mem://tbl/manifest-000000.json") is None
