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


def test_foreign_relative_paths_resolved(spark, tmp_path):
    """Foreign tables may store table-root-relative URIs in manifests;
    the streaming source must resolve them against the root like
    read_iceberg does (r10 advisor finding) instead of failing at
    executor ParquetFile open."""
    import json
    import os

    import pyarrow as pa
    import pyarrow.parquet as pq

    from dataingestion_spark.interop.iceberg import (
        _manifest_entry_schema, _manifest_list_schema, read_iceberg,
    )
    from dataingestion_spark.sources.avro import write_container

    root = str(tmp_path / "rel_tbl")
    os.makedirs(os.path.join(root, "metadata"))
    os.makedirs(os.path.join(root, "data"))
    pq.write_table(pa.table({
        "documentid": pa.array(["a", "b", "c"], pa.string()),
        "v": pa.array([1, 2, 3], pa.int64())}),
        os.path.join(root, "data", "d0.parquet"))
    m0 = os.path.join(root, "metadata", "m0.avro")
    write_container(m0, _manifest_entry_schema(), [{
        "status": 1, "snapshot_id": 9, "sequence_number": 1,
        "file_sequence_number": 1,
        "data_file": {
            "content": 0, "file_path": "data/d0.parquet",  # RELATIVE
            "file_format": "PARQUET", "partition": {},
            "record_count": 3,
            "file_size_in_bytes": os.path.getsize(
                os.path.join(root, "data", "d0.parquet")),
            "lower_bounds": None, "upper_bounds": None,
            "equality_ids": None}}])
    lpath = os.path.join(root, "metadata", "snap-9-1-x.avro")
    write_container(lpath, _manifest_list_schema(), [{
        "manifest_path": "metadata/m0.avro",  # RELATIVE
        "manifest_length": os.path.getsize(m0),
        "partition_spec_id": 0, "content": 0, "sequence_number": 1,
        "min_sequence_number": 1, "added_snapshot_id": 9,
        "added_files_count": 1, "existing_files_count": 0,
        "deleted_files_count": 0, "added_rows_count": 3,
        "existing_rows_count": 0, "deleted_rows_count": 0}])
    meta = {"format-version": 2, "table-uuid": "x", "location": root,
            "last-sequence-number": 1, "last-updated-ms": 0,
            "last-column-id": 2, "current-schema-id": 0,
            "schemas": [{"type": "struct", "schema-id": 0, "fields": [
                {"id": 1, "name": "documentid", "required": False,
                 "type": "string"},
                {"id": 2, "name": "v", "required": False,
                 "type": "long"}]}],
            "default-spec-id": 0,
            "partition-specs": [{"spec-id": 0, "fields": []}],
            "last-partition-id": 999, "default-sort-order-id": 0,
            "sort-orders": [{"order-id": 0, "fields": []}],
            "current-snapshot-id": 9,
            "snapshots": [{"snapshot-id": 9, "sequence-number": 1,
                           "timestamp-ms": 0, "schema-id": 0,
                           "manifest-list": "metadata/snap-9-1-x.avro",
                           "summary": {"operation": "append"}}],
            "snapshot-log": [], "metadata-log": []}
    json.dump(meta, open(os.path.join(root, "metadata",
                                      "v1.metadata.json"), "w"))
    open(os.path.join(root, "metadata", "version-hint.text"),
         "w").write("1")

    want = {("a", 1), ("b", 2), ("c", 3)}
    assert {tuple(r) for r in read_iceberg(spark, root)
            .select("documentid", "v").collect()} == want
    got = _drain(spark, root, str(tmp_path / "sink"),
                 str(tmp_path / "ckpt"))
    assert {tuple(r) for r in got.select("documentid", "v")
            .collect()} == want


def test_stream_resolves_renamed_columns(spark, tmp_path):
    """A column-mapped store table exported to Iceberg (files carry
    the frozen physical spelling, schema history records the rename):
    the streaming source must surface values under the CURRENT name,
    not null-pad the pre-rename files."""
    from dataingestion_spark.sinks import manifest_store as ms2

    tbl = str(tmp_path / "t_cm")
    dst = str(tmp_path / "ice_cm")
    ms2.write_table(_docs(spark, 0, 15), tbl)
    ms2.rename_column(tbl, "v", "value")
    export_iceberg(spark, tbl, dst, mode="copy")

    got = _drain(spark, dst, str(tmp_path / "sink"),
                 str(tmp_path / "ckpt"))
    assert "value" in got.columns
    assert {(r["documentid"], r["value"]) for r in got.collect()} == \
        {(str(i), 2 * i) for i in range(15)}
