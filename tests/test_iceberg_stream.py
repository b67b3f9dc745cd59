"""Streaming reads of Iceberg tables (streaming/iceberg_source.py).

Pins the lineage-offset contract: snapshot-first batch with delete
files applied, append tailing across mirror syncs, exactly-once across
restarts, change-snapshot failure vs skipChangeCommits, widened-column
null padding, and the loud lineage-rewritten failure after vacuum."""

import pytest
from pyspark.sql import functions as F

from dataingestion_spark.interop.iceberg import (
    export_iceberg, mirror_iceberg, vacuum_iceberg,
)
from dataingestion_spark.sinks import manifest_store as ms
from dataingestion_spark.streaming.iceberg_source import stream_iceberg


def _docs(spark, lo, hi, tag=None):
    df = spark.range(lo, hi).select(
        F.col("id").cast("string").alias("documentid"),
        (F.col("id") * 2).alias("v"))
    if tag is not None:
        df = df.withColumn("tag", F.lit(tag))
    return df


def _drain(spark, path, sink, ckpt, **kw):
    q = (stream_iceberg(spark, path, **kw)
         .writeStream.format("parquet")
         .option("path", sink).option("checkpointLocation", ckpt)
         .trigger(availableNow=True).start())
    q.awaitTermination()
    return spark.read.parquet(sink)


def test_snapshot_then_appends_exactly_once(spark, tmp_path):
    tbl = str(tmp_path / "t")
    dst = str(tmp_path / "ice")
    sink, ckpt = str(tmp_path / "sink"), str(tmp_path / "ckpt")
    ms.write_table(_docs(spark, 0, 20), tbl)
    mirror_iceberg(spark, tbl, dst)

    got = _drain(spark, dst, sink, ckpt)
    assert {(r["documentid"], r["v"]) for r in got.collect()} == \
        {(str(i), 2 * i) for i in range(20)}

    # two more mirror snapshots; a restarted stream emits ONLY them
    ms.append_table(_docs(spark, 20, 25), tbl)
    mirror_iceberg(spark, tbl, dst)
    ms.append_table(_docs(spark, 25, 28), tbl)
    mirror_iceberg(spark, tbl, dst)
    got = _drain(spark, dst, sink, ckpt)
    assert got.count() == 28
    assert got.select("documentid").distinct().count() == 28

    # idle drain: nothing new, nothing duplicated
    got = _drain(spark, dst, sink, ckpt)
    assert got.count() == 28


def test_snapshot_batch_applies_equality_deletes(spark, tmp_path):
    tbl = str(tmp_path / "t")
    dst = str(tmp_path / "ice")
    ms.write_table(_docs(spark, 0, 15), tbl)
    ms.delete_documents(spark, tbl, ["3", "7"])
    export_iceberg(spark, tbl, dst, dv_mode="equality")
    got = _drain(spark, dst, str(tmp_path / "sink"),
                 str(tmp_path / "ckpt"))
    ids = {r["documentid"] for r in got.collect()}
    assert ids == {str(i) for i in range(15)} - {"3", "7"}


def test_change_snapshots_raise_unless_skipped(spark, tmp_path):
    tbl = str(tmp_path / "t")
    dst = str(tmp_path / "ice")
    sink, ckpt = str(tmp_path / "sink"), str(tmp_path / "ckpt")
    ms.write_table(_docs(spark, 0, 10), tbl)
    mirror_iceberg(spark, tbl, dst, dv_mode="equality")
    _drain(spark, dst, sink, ckpt)

    # a delete-carrying mirror snapshot is not an append
    ms.delete_documents(spark, tbl, ["1"])
    ms.append_table(_docs(spark, 10, 12), tbl)
    mirror_iceberg(spark, tbl, dst, dv_mode="equality")
    with pytest.raises(Exception, match="adds delete files|removes"):
        _drain(spark, dst, sink, ckpt)

    # skipChangeCommits: the added files still flow
    got = _drain(spark, dst, str(tmp_path / "sink2"),
                 str(tmp_path / "ckpt2"), skip_change_commits=True)
    # fresh stream: first batch snapshots CURRENT state (deletes
    # applied), so the skip path is about the NEXT change snapshot
    assert got.count() == 11
    ms.delete_documents(spark, tbl, ["2"])
    ms.append_table(_docs(spark, 12, 14), tbl)
    mirror_iceberg(spark, tbl, dst, dv_mode="equality")
    got = _drain(spark, dst, str(tmp_path / "sink2"),
                 str(tmp_path / "ckpt2"), skip_change_commits=True)
    ids = {r["documentid"] for r in got.collect()}
    # '2' was emitted by the snapshot batch and the delete was skipped,
    # but the appended 12/13 arrived — the documented trade
    assert {"12", "13"} <= ids and got.count() == 13


def test_widened_column_null_padding(spark, tmp_path):
    tbl = str(tmp_path / "t")
    dst = str(tmp_path / "ice")
    ms.write_table(_docs(spark, 0, 5), tbl)
    mirror_iceberg(spark, tbl, dst)
    ms.append_table(_docs(spark, 5, 8, tag="w"), tbl)
    mirror_iceberg(spark, tbl, dst)
    got = _drain(spark, dst, str(tmp_path / "sink"),
                 str(tmp_path / "ckpt"))
    # doc_bucket is the manifest store's internal bucketing column —
    # it exports like any other (same behavior as the batch exporters)
    assert set(got.columns) == {"documentid", "v", "tag", "doc_bucket"}
    rows = {(r["documentid"], r["tag"]) for r in got.collect()}
    assert rows == {(str(i), None) for i in range(5)} | \
        {(str(i), "w") for i in range(5, 8)}


def test_max_snapshots_per_trigger_paces_backlog(spark, tmp_path):
    tbl = str(tmp_path / "t")
    dst = str(tmp_path / "ice")
    sink, ckpt = str(tmp_path / "sink"), str(tmp_path / "ckpt")
    ms.write_table(_docs(spark, 0, 10), tbl)
    mirror_iceberg(spark, tbl, dst)
    got = _drain(spark, dst, sink, ckpt, max_snapshots_per_trigger=1)
    assert got.count() == 10

    # a 3-snapshot backlog; each paced availableNow run advances by
    # at most one snapshot (the engine captures one end per run, the
    # position is known after the first plan)
    for lo, hi in ((10, 13), (13, 15), (15, 16)):
        ms.append_table(_docs(spark, lo, hi), tbl)
        mirror_iceberg(spark, tbl, dst)
    counts = []
    for _ in range(4):
        got = _drain(spark, dst, sink, ckpt,
                     max_snapshots_per_trigger=1)
        counts.append(got.count())
    # monotone, lands exactly on 16, and no run jumps the whole backlog
    assert counts[-1] == 16
    assert all(b >= a for a, b in zip(counts, counts[1:]))
    assert counts[0] < 16, "first paced run must not drain everything"
    # exactly-once throughout
    assert got.select("documentid").distinct().count() == 16


def test_vacuumed_lineage_fails_loudly(spark, tmp_path):
    tbl = str(tmp_path / "t")
    dst = str(tmp_path / "ice")
    sink, ckpt = str(tmp_path / "sink"), str(tmp_path / "ckpt")
    ms.write_table(_docs(spark, 0, 6), tbl)
    mirror_iceberg(spark, tbl, dst)
    _drain(spark, dst, sink, ckpt)
    ms.append_table(_docs(spark, 6, 9), tbl)
    mirror_iceberg(spark, tbl, dst)
    _drain(spark, dst, sink, ckpt)
    ms.append_table(_docs(spark, 9, 11), tbl)
    mirror_iceberg(spark, tbl, dst)
    vacuum_iceberg(dst, keep_snapshots=1)
    with pytest.raises(Exception, match="lineage changed"):
        _drain(spark, dst, sink, ckpt)
