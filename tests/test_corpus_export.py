"""Incremental corpus exports (sinks/corpus_export.py)."""

import os

import pytest
from pyspark.sql import functions as F

from dataingestion_spark.sinks import manifest_store as ms
from dataingestion_spark.sinks.corpus_export import (
    export_corpus, export_corpus_incremental,
)


def _docs(spark, lo, hi, bump=0):
    return spark.range(lo, hi).select(
        F.col("id").cast("string").alias("documentid"),
        (F.col("id") * 2 + bump).alias("v"),
        F.concat(F.lit("text "), F.col("id")).alias("text"),
    )


def _dir_bytes(d):
    return {n: open(os.path.join(d, n), "rb").read()
            for n in os.listdir(d) if n != "_export_state.json"}


@pytest.mark.parametrize("fmt,features", [
    ("jsonl_zst", None),
    ("arrow", None),
    ("tfrecord", {"documentid": "bytes", "v": "int64", "text": "bytes"}),
])
def test_incremental_equals_full_reexport(spark, tmp_path, fmt, features):
    """THE property: after any mutation mix, the incremental publish is
    byte-identical to a from-scratch full export of the same version —
    deterministic shard bytes make changed-shards-only exact."""
    table = str(tmp_path / "t")
    ms.write_table(_docs(spark, 0, 60), table)
    inc_dir, full_dir = str(tmp_path / "inc"), str(tmp_path / "full")
    st = export_corpus(spark, table, inc_dir, fmt=fmt, shards=8,
                       features=features)
    assert len(os.listdir(inc_dir)) == 8 + 1  # all shards + state

    # mutate: append, delete, update
    ms.append_table(_docs(spark, 60, 70), table)
    ms.delete_documents(spark, table, [str(i) for i in range(0, 60, 7)])
    ms.merge_table(_docs(spark, 20, 30, bump=1), table)

    st2 = export_corpus_incremental(spark, table, inc_dir,
                                    features=features)
    assert st2["version"] > st["version"]
    assert 0 < len(st2["rewritten"]) <= 8

    export_corpus(spark, table, full_dir, fmt=fmt, shards=8,
                  features=features)
    assert _dir_bytes(inc_dir) == _dir_bytes(full_dir)

    # no-op when the table hasn't moved
    st3 = export_corpus_incremental(spark, table, inc_dir,
                                    features=features)
    assert st3["rewritten"] == []


def test_emptied_shard_is_rewritten_empty(spark, tmp_path):
    """Deleting EVERY row of some shard must rewrite it as a valid
    empty file — leaving the old bytes would keep serving dead rows."""
    from dataingestion_spark.sources.jsonl import read_jsonl_zst

    table = str(tmp_path / "t")
    ms.write_table(_docs(spark, 0, 40), table)
    out = str(tmp_path / "out")
    export_corpus(spark, table, out, fmt="jsonl_zst", shards=4)
    ms.delete_documents(spark, table, [str(i) for i in range(40)])
    st = export_corpus_incremental(spark, table, out)
    assert len(st["rewritten"]) == 4
    import pyarrow as pa

    schema = "documentid string, v long, text string"
    from pyspark.sql.types import _parse_datatype_string

    back = read_jsonl_zst(spark, out,
                          schema=_parse_datatype_string(schema))
    assert back.count() == 0
    for n in st["rewritten"]:  # every shard decodes as empty, not stale
        raw = open(os.path.join(out, n), "rb").read()
        assert pa.input_stream(pa.py_buffer(raw),
                               compression="zstd").read() == b""


def test_verify_export_catches_divergence(spark, tmp_path):
    from dataingestion_spark.sinks.corpus_export import verify_export

    table = str(tmp_path / "t")
    ms.write_table(_docs(spark, 0, 30), table)
    out = str(tmp_path / "out")
    export_corpus(spark, table, out, shards=4)
    assert verify_export(out) == []
    ms.append_table(_docs(spark, 30, 35), table)
    st = export_corpus_incremental(spark, table, out)
    assert verify_export(out) == []  # manifest re-stamped incrementally
    victim = st["rewritten"][0]
    with open(os.path.join(out, victim), "ab") as f:
        f.write(b"\x00")  # out-of-band corruption
    assert verify_export(out) == [victim]


def test_guards(spark, tmp_path):
    table = str(tmp_path / "t")
    ms.write_table(_docs(spark, 0, 5), table)
    with pytest.raises(ValueError, match="no _export_state"):
        export_corpus_incremental(spark, table, str(tmp_path / "nope"))
    with pytest.raises(ValueError, match="fmt"):
        export_corpus(spark, table, str(tmp_path / "o"), fmt="csv")
    with pytest.raises(ValueError, match="features"):
        export_corpus(spark, table, str(tmp_path / "o2"), fmt="tfrecord")
    with pytest.raises(ValueError, match="not in columns"):
        export_corpus(spark, table, str(tmp_path / "o3"),
                      columns=["v"], key="documentid")


def test_stream_export_continuous_publish(spark, tmp_path):
    """availableNow drain of the change feed rewrites affected shards;
    the published directory is byte-identical to a full re-export after
    every drain, and a second drain on the same checkpoint processes
    only the commits that landed in between."""
    from dataingestion_spark.sinks.corpus_export import stream_export_corpus

    table = str(tmp_path / "t")
    ms.write_table(_docs(spark, 0, 40), table)
    out = str(tmp_path / "pub")
    ckpt = str(tmp_path / "ckpt")
    export_corpus(spark, table, out, shards=8)

    ms.append_table(_docs(spark, 40, 50), table)
    ms.delete_documents(spark, table, [str(i) for i in range(0, 40, 9)])
    q = stream_export_corpus(spark, table, out, ckpt)
    q.awaitTermination()
    ref1 = str(tmp_path / "ref1")
    export_corpus(spark, table, ref1, shards=8)
    assert _dir_bytes(out) == _dir_bytes(ref1)

    # more commits; same checkpoint -> only the new ones drive rewrites
    ms.merge_table(_docs(spark, 45, 48, bump=3), table)
    q2 = stream_export_corpus(spark, table, out, ckpt)
    q2.awaitTermination()
    ref2 = str(tmp_path / "ref2")
    export_corpus(spark, table, ref2, shards=8)
    assert _dir_bytes(out) == _dir_bytes(ref2)


def test_publish_stamp_anchors_on_delivered_not_head(spark, tmp_path):
    """The streaming publisher stamps the batch's own max commit
    version, NOT current_version: if a commit lands after the stream's
    end-capture but before the rewrite, stamping head would make the
    next incremental diff skip it — its shard stale forever. Simulated
    deterministically by rewriting with a batch_max one commit behind
    head (exactly what publish() does for an undelivered trailing
    commit), then requiring the follow-up incremental to pick that
    commit up."""
    from dataingestion_spark.sinks.corpus_export import (
        _load_state, _rewrite_shards, _shard_expr,
    )

    table = str(tmp_path / "t")
    v0 = ms.write_table(_docs(spark, 0, 40), table)
    out = str(tmp_path / "pub")
    export_corpus(spark, table, out, shards=8)

    v1 = ms.merge_table(_docs(spark, 3, 4, bump=5), table)   # delivered
    v2 = ms.merge_table(_docs(spark, 9, 10, bump=9), table)  # NOT yet
    assert v2 > v1 > v0
    aff1 = sorted(r["_s"] for r in _docs(spark, 3, 4).select(
        _shard_expr("documentid", 8).alias("_s")).distinct().collect())
    # what publish() does for a batch that delivered only v1
    _rewrite_shards(spark, table, out, _load_state(out), aff1, v1, None)
    assert int(_load_state(out)["version"]) == v1  # not head (v2)

    # the undelivered commit is NOT lost: the next incremental rewrites
    # its shard and the directory equals a full export of head
    st = export_corpus_incremental(spark, table, out)
    assert st["version"] == v2 and st["rewritten"]
    ref = str(tmp_path / "ref")
    export_corpus(spark, table, ref, shards=8)
    assert _dir_bytes(out) == _dir_bytes(ref)


def test_stream_export_survives_publish_crash_and_restart(spark, tmp_path):
    """The idempotence claim under a REAL engine restart: the first
    publish attempt crashes after the batch is planned; restarting on
    the same checkpoint replays the batch, the rewrite converges, and
    the directory equals a full export with nothing lost or stale."""
    import dataingestion_spark.sinks.corpus_export as ce

    table = str(tmp_path / "t")
    ms.write_table(_docs(spark, 0, 40), table)
    out = str(tmp_path / "pub")
    ckpt = str(tmp_path / "ckpt")
    export_corpus(spark, table, out, shards=8)
    ms.append_table(_docs(spark, 40, 46), table)
    ms.delete_documents(spark, table, ["1", "2"])

    real_rewrite = ce._rewrite_shards
    crashed = {"n": 0}

    def crash_once(*a, **kw):
        if crashed["n"] == 0:
            crashed["n"] += 1
            raise RuntimeError("injected publish crash")
        return real_rewrite(*a, **kw)

    ce._rewrite_shards = crash_once
    try:
        q = ce.stream_export_corpus(spark, table, out, ckpt)
        with pytest.raises(Exception, match="injected publish crash"):
            q.awaitTermination()
        # restart on the same checkpoint: the failed batch replays
        q2 = ce.stream_export_corpus(spark, table, out, ckpt)
        q2.awaitTermination()
    finally:
        ce._rewrite_shards = real_rewrite
    assert crashed["n"] == 1  # the crash really happened, once
    ref = str(tmp_path / "ref")
    export_corpus(spark, table, ref, shards=8)
    assert _dir_bytes(out) == _dir_bytes(ref)
