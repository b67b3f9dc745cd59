"""Iceberg table-format interop (interop/iceberg.py)."""

import json
import os

import pytest
from pyspark.sql import functions as F, types as T

from dataingestion_spark.interop.iceberg import (
    _manifest_entry_schema, _manifest_list_schema, export_iceberg,
    iceberg_schema_from_spark, read_iceberg, spark_schema_from_iceberg,
)
from dataingestion_spark.sources.avro import read_container, write_container


def _docs(spark, n_extra_cols=True):
    df = (spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
          .select(F.col("doc_id").cast("string").alias("documentid"),
                  "text", "lang",
                  F.col("n_chars").cast("long").alias("n_chars")))
    return df


def _table(spark, tmp_path, name="t"):
    from dataingestion_spark.sinks.manifest_store import write_table

    tbl = str(tmp_path / name)
    write_table(_docs(spark), tbl)
    return tbl


def test_export_read_roundtrip_copy_and_shallow(spark, tmp_path):
    from dataingestion_spark.sinks.manifest_store import read_table

    tbl = _table(spark, tmp_path)
    want = {tuple(r) for r in read_table(spark, tbl)
            .select("documentid", "text", "lang", "n_chars").collect()}

    for mode in ("copy", "shallow"):
        dst = str(tmp_path / f"ice_{mode}")
        assert export_iceberg(spark, tbl, dst, mode=mode) == dst
        back = read_iceberg(spark, dst)
        got = {tuple(r) for r in back
               .select("documentid", "text", "lang", "n_chars").collect()}
        assert got == want
        names = os.listdir(os.path.join(dst, "metadata"))
        assert "v1.metadata.json" in names and "version-hint.text" in names
        assert any(n.startswith("snap-") for n in names)
        if mode == "copy":
            assert os.path.isdir(os.path.join(dst, "data"))
        meta = json.load(open(os.path.join(dst, "metadata",
                                           "v1.metadata.json")))
        assert meta["format-version"] == 2
        assert meta["current-schema-id"] == 0
        assert meta["partition-specs"] == [{"spec-id": 0, "fields": []}]
        snap = meta["snapshots"][0]
        assert snap["snapshot-id"] == meta["current-snapshot-id"]
        assert snap["sequence-number"] == 1
    # double export refuses
    with pytest.raises(FileExistsError):
        export_iceberg(spark, tbl, str(tmp_path / "ice_copy"))


def test_manifest_wire_shape(spark, tmp_path):
    tbl = _table(spark, tmp_path)
    dst = str(tmp_path / "ice")
    export_iceberg(spark, tbl, dst)
    meta_dir = os.path.join(dst, "metadata")
    snap = [n for n in os.listdir(meta_dir) if n.startswith("snap-")][0]
    node, rows = read_container(
        open(os.path.join(meta_dir, snap), "rb").read(), snap)
    assert rows and rows[0]["content"] == 0
    assert rows[0]["added_files_count"] >= 1
    assert rows[0]["added_rows_count"] == 500
    # field-ids preserved in the avro schema (conformant readers resolve
    # manifest columns by id, not name)
    by_name = {f["name"]: f["attrs"].get("field-id")
               for f in node["fields"]}
    assert by_name["manifest_path"] == 500
    assert by_name["sequence_number"] == 515

    mpath = rows[0]["manifest_path"]
    assert mpath.startswith("file://")
    mnode, entries = read_container(open(mpath[7:], "rb").read(), mpath)
    assert sum(e["data_file"]["record_count"] for e in entries) == 500
    e0 = entries[0]
    assert e0["status"] == 1
    assert e0["data_file"]["file_format"] == "PARQUET"
    # manifest carries the table schema + spec in file metadata
    blob = open(mpath[7:], "rb").read()
    assert b'"partition-spec-id"' in blob or b"partition-spec-id" in blob
    # bounds present for documentid (manifest-store stats carry min/max)
    lbs = e0["data_file"]["lower_bounds"]
    assert lbs and all(isinstance(kv["key"], int) for kv in lbs)


def test_bounds_pruning_skips_files(spark, tmp_path):
    # two data files with DISJOINT n_chars bounds in the manifest; a
    # where= on the low range must scan only the low file (the
    # exporter's own hash-bucketed files have overlapping ranges, so
    # this fixture pins the bounds logic directly)
    import struct

    root = str(tmp_path / "pruned")
    os.makedirs(os.path.join(root, "metadata"))
    os.makedirs(os.path.join(root, "data"))
    import pyarrow as pa
    import pyarrow.parquet as pq
    lo_path = os.path.join(root, "data", "lo.parquet")
    hi_path = os.path.join(root, "data", "hi.parquet")
    pq.write_table(pa.table({"documentid": ["a", "b"],
                             "n_chars": pa.array([10, 20], pa.int64())}),
                   lo_path)
    pq.write_table(pa.table({"documentid": ["c", "d"],
                             "n_chars": pa.array([1000, 2000],
                                                 pa.int64())}),
                   hi_path)

    def entry(path, lo, hi):
        return {"status": 1, "snapshot_id": 77, "sequence_number": 1,
                "file_sequence_number": 1,
                "data_file": {
                    "content": 0, "file_path": "file://" + path,
                    "file_format": "PARQUET", "partition": {},
                    "record_count": 2,
                    "file_size_in_bytes": os.path.getsize(path),
                    "lower_bounds": [{"key": 2,
                                      "value": struct.pack("<q", lo)}],
                    "upper_bounds": [{"key": 2,
                                      "value": struct.pack("<q", hi)}]}}

    mpath = os.path.join(root, "metadata", "m0.avro")
    write_container(mpath, _manifest_entry_schema(),
                    [entry(lo_path, 10, 20), entry(hi_path, 1000, 2000)])
    lpath = os.path.join(root, "metadata", "snap-77-1-x.avro")
    write_container(lpath, _manifest_list_schema(), [{
        "manifest_path": "file://" + mpath,
        "manifest_length": os.path.getsize(mpath),
        "partition_spec_id": 0, "content": 0, "sequence_number": 1,
        "min_sequence_number": 1, "added_snapshot_id": 77,
        "added_files_count": 2, "existing_files_count": 0,
        "deleted_files_count": 0, "added_rows_count": 4,
        "existing_rows_count": 0, "deleted_rows_count": 0}])
    schema_fields = [
        {"id": 1, "name": "documentid", "required": False,
         "type": "string"},
        {"id": 2, "name": "n_chars", "required": False, "type": "long"}]
    meta = {"format-version": 2, "table-uuid": "x", "location": root,
            "last-sequence-number": 1, "last-updated-ms": 0,
            "last-column-id": 2, "current-schema-id": 0,
            "schemas": [{"type": "struct", "schema-id": 0,
                         "fields": schema_fields}],
            "default-spec-id": 0,
            "partition-specs": [{"spec-id": 0, "fields": []}],
            "last-partition-id": 999, "default-sort-order-id": 0,
            "sort-orders": [{"order-id": 0, "fields": []}],
            "current-snapshot-id": 77,
            "snapshots": [{"snapshot-id": 77, "sequence-number": 1,
                           "timestamp-ms": 0, "schema-id": 0,
                           "manifest-list": "file://" + lpath,
                           "summary": {"operation": "append"}}],
            "snapshot-log": [], "metadata-log": []}
    json.dump(meta, open(os.path.join(root, "metadata",
                                      "v1.metadata.json"), "w"))
    open(os.path.join(root, "metadata", "version-hint.text"),
         "w").write("1")

    full = read_iceberg(spark, root)
    assert len(set(full.inputFiles())) == 2
    pruned = read_iceberg(spark, root, where=("n_chars", "<=", 20))
    assert set(pruned.inputFiles()) == {"file://" + lo_path}
    assert pruned.count() == 2
    # equality inside the high range scans only the high file
    one = read_iceberg(spark, root, where=("n_chars", "==", 1500))
    assert set(one.inputFiles()) == {"file://" + hi_path}
    # out-of-range equality prunes EVERYTHING → empty frame, zero scans
    none = read_iceberg(spark, root, where=("n_chars", "==", 500))
    assert none.count() == 0
    # pruning is conservative: a predicate matching both ranges scans both
    both = read_iceberg(spark, root, where=("n_chars", ">=", 15))
    assert len(set(both.inputFiles())) == 2
    with pytest.raises(ValueError, match="where column"):
        read_iceberg(spark, root, where=("nope", "==", 1))
    with pytest.raises(ValueError, match="unsupported where op"):
        read_iceberg(spark, root, where=("n_chars", "!=", 20))


def test_dv_tables_materialize_first(spark, tmp_path):
    from dataingestion_spark.sinks.manifest_store import (
        delete_documents, read_table,
    )

    tbl = _table(spark, tmp_path)
    ids = [r[0] for r in read_table(spark, tbl)
           .select("documentid").limit(3).collect()]
    assert delete_documents(spark, tbl, ids) > 0
    with pytest.raises(ValueError, match="deletion vectors"):
        export_iceberg(spark, tbl, str(tmp_path / "no"),
                       apply_deletes=False)
    dst = str(tmp_path / "ice")
    export_iceberg(spark, tbl, dst, apply_deletes=True)
    got = {r[0] for r in read_iceberg(spark, dst)
           .select("documentid").collect()}
    assert not (got & set(ids))
    assert got == {r[0] for r in read_table(spark, tbl)
                   .select("documentid").collect()}


def test_snapshot_travel_and_empty(spark, tmp_path):
    tbl = _table(spark, tmp_path)
    dst = str(tmp_path / "ice")
    export_iceberg(spark, tbl, dst)
    meta = json.load(open(os.path.join(dst, "metadata",
                                       "v1.metadata.json")))
    sid = meta["current-snapshot-id"]
    assert read_iceberg(spark, dst, snapshot_id=sid).count() == 500
    with pytest.raises(ValueError, match="snapshot 123 not in metadata"):
        read_iceberg(spark, dst, snapshot_id=123)

    # empty table: current-snapshot-id -1 → empty frame with schema
    empty = str(tmp_path / "empty")
    os.makedirs(os.path.join(empty, "metadata"))
    meta2 = dict(meta, **{"current-snapshot-id": -1, "snapshots": []})
    json.dump(meta2, open(os.path.join(empty, "metadata",
                                       "v1.metadata.json"), "w"))
    open(os.path.join(empty, "metadata", "version-hint.text"),
         "w").write("1")
    df = read_iceberg(spark, empty)
    assert df.count() == 0 and "documentid" in df.columns


def test_mixed_manifest_content_rejected(spark, tmp_path):
    # a manifest-list row claiming content=1 (deletes) but pointing at
    # a manifest of DATA entries is malformed metadata, not a legal
    # table — refuse loudly instead of double-counting the files
    tbl = _table(spark, tmp_path)
    dst = str(tmp_path / "ice")
    export_iceberg(spark, tbl, dst)
    meta_dir = os.path.join(dst, "metadata")
    snap = [n for n in os.listdir(meta_dir) if n.startswith("snap-")][0]
    path = os.path.join(meta_dir, snap)
    node, rows = read_container(open(path, "rb").read(), snap)
    rows.append(dict(rows[0], content=1))
    write_container(path, _manifest_list_schema(), rows)
    with pytest.raises(ValueError, match="may not mix"):
        read_iceberg(spark, dst)


def test_dv_mode_equality_exports_without_rewrite(spark, tmp_path):
    from dataingestion_spark.sinks.manifest_store import (
        delete_documents, read_manifest, read_table,
    )

    tbl = _table(spark, tmp_path)
    ids = [r[0] for r in read_table(spark, tbl)
           .select("documentid").limit(4).collect()]
    assert delete_documents(spark, tbl, ids) > 0
    dst = str(tmp_path / "ice_eq")
    export_iceberg(spark, tbl, dst, dv_mode="equality")
    # the SOURCE still carries its DVs — nothing was compacted
    m = read_manifest(tbl)
    assert any(m.get("deletes", {}).values())
    # read back equals the store's own DV-applied read
    want = {tuple(r) for r in read_table(spark, tbl)
            .select("documentid", "text", "lang", "n_chars").collect()}
    got = {tuple(r) for r in read_iceberg(spark, dst)
           .select("documentid", "text", "lang", "n_chars").collect()}
    assert got == want
    assert not ({r[0] for r in got} & set(ids))
    # metadata shape: a data manifest AND a delete manifest
    meta = json.load(open(os.path.join(dst, "metadata",
                                       "v1.metadata.json")))
    snap = meta["snapshots"][0]
    assert snap["summary"]["operation"] == "overwrite"
    assert int(snap["summary"]["added-delete-files"]) >= 1
    assert meta["last-sequence-number"] > 1
    lpath = snap["manifest-list"]
    assert lpath.startswith("file://")
    rows = read_container(open(lpath[7:], "rb").read(), lpath)[1]
    assert sorted(r["content"] for r in rows) == [0, 1]
    # shallow equality export: zero data bytes moved, same rows
    dst2 = str(tmp_path / "ice_eq_shallow")
    export_iceberg(spark, tbl, dst2, mode="shallow", dv_mode="equality")
    assert not os.path.isdir(os.path.join(dst2, "data"))
    got2 = {tuple(r) for r in read_iceberg(spark, dst2)
            .select("documentid", "text", "lang", "n_chars").collect()}
    assert got2 == want
    # name mapping rides along for field-id-less parquet
    nm = json.loads(meta["properties"]["schema.name-mapping.default"])
    assert {e["names"][0] for e in nm} >= {"documentid", "text"}


def _foreign_with_deletes(spark, root, data_rows, data_seq,
                          pos_rows=None, pos_seq=None,
                          eq_rows=None, eq_seq=None, eq_ids=None):
    """Iceberg v2 fixture with one data file and optional positional /
    equality delete files at explicit sequence numbers."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    os.makedirs(os.path.join(root, "metadata"))
    os.makedirs(os.path.join(root, "data"))
    data_path = os.path.join(root, "data", "d0.parquet")
    pq.write_table(pa.table({
        "documentid": pa.array([r[0] for r in data_rows], pa.string()),
        "n_chars": pa.array([r[1] for r in data_rows], pa.int64())}),
        data_path)

    def entry(path, content, seq, nrec, equality_ids=None):
        return {"status": 1, "snapshot_id": 77, "sequence_number": seq,
                "file_sequence_number": seq,
                "data_file": {
                    "content": content, "file_path": "file://" + path,
                    "file_format": "PARQUET", "partition": {},
                    "record_count": nrec,
                    "file_size_in_bytes": os.path.getsize(path),
                    "lower_bounds": None, "upper_bounds": None,
                    "equality_ids": equality_ids}}

    manifests = []
    m0 = os.path.join(root, "metadata", "m0.avro")
    write_container(m0, _manifest_entry_schema(),
                    [entry(data_path, 0, data_seq, len(data_rows))])
    manifests.append((m0, 0, data_seq))

    del_entries = []
    if pos_rows is not None:
        pos_path = os.path.join(root, "data", "pd0.parquet")
        pq.write_table(pa.table({
            "file_path": pa.array(["file://" + data_path] * len(pos_rows),
                                  pa.string()),
            "pos": pa.array(pos_rows, pa.int64())}), pos_path)
        del_entries.append(entry(pos_path, 1, pos_seq, len(pos_rows)))
    if eq_rows is not None:
        eq_path = os.path.join(root, "data", "ed0.parquet")
        pq.write_table(pa.table({
            "n_chars": pa.array(eq_rows, pa.int64())}), eq_path)
        del_entries.append(entry(eq_path, 2, eq_seq, len(eq_rows),
                                 equality_ids=eq_ids or [2]))
    if del_entries:
        m1 = os.path.join(root, "metadata", "m1.avro")
        write_container(m1, _manifest_entry_schema(), del_entries)
        manifests.append((m1, 1,
                          max(e["sequence_number"] for e in del_entries)))

    lpath = os.path.join(root, "metadata", "snap-77-1-x.avro")
    write_container(lpath, _manifest_list_schema(), [{
        "manifest_path": "file://" + mp,
        "manifest_length": os.path.getsize(mp),
        "partition_spec_id": 0, "content": c, "sequence_number": s,
        "min_sequence_number": 1, "added_snapshot_id": 77,
        "added_files_count": 1, "existing_files_count": 0,
        "deleted_files_count": 0, "added_rows_count": 1,
        "existing_rows_count": 0, "deleted_rows_count": 0}
        for mp, c, s in manifests])
    max_seq = max(s for _, _, s in manifests)
    meta = {"format-version": 2, "table-uuid": "x", "location": root,
            "last-sequence-number": max_seq, "last-updated-ms": 0,
            "last-column-id": 2, "current-schema-id": 0,
            "schemas": [{"type": "struct", "schema-id": 0, "fields": [
                {"id": 1, "name": "documentid", "required": False,
                 "type": "string"},
                {"id": 2, "name": "n_chars", "required": False,
                 "type": "long"}]}],
            "default-spec-id": 0,
            "partition-specs": [{"spec-id": 0, "fields": []}],
            "last-partition-id": 999, "default-sort-order-id": 0,
            "sort-orders": [{"order-id": 0, "fields": []}],
            "current-snapshot-id": 77,
            "snapshots": [{"snapshot-id": 77, "sequence-number": max_seq,
                           "timestamp-ms": 0, "schema-id": 0,
                           "manifest-list": "file://" + lpath,
                           "summary": {"operation": "overwrite"}}],
            "snapshot-log": [], "metadata-log": []}
    json.dump(meta, open(os.path.join(root, "metadata",
                                      "v1.metadata.json"), "w"))
    open(os.path.join(root, "metadata", "version-hint.text"),
         "w").write("1")


DATA4 = [("a", 10), ("b", 20), ("c", 30), ("d", 40)]


def test_foreign_positional_deletes_applied(spark, tmp_path):
    root = str(tmp_path / "posdel")
    _foreign_with_deletes(spark, root, DATA4, data_seq=2,
                          pos_rows=[1, 3], pos_seq=2)
    # pos deletes apply when data_seq <= del_seq (same-commit applies)
    got = {r[0] for r in read_iceberg(spark, root)
           .select("documentid").collect()}
    assert got == {"a", "c"}

    root2 = str(tmp_path / "posdel_old")
    _foreign_with_deletes(spark, root2, DATA4, data_seq=3,
                          pos_rows=[1, 3], pos_seq=2)
    # a delete OLDER than the data file must not touch it
    got2 = {r[0] for r in read_iceberg(spark, root2)
            .select("documentid").collect()}
    assert got2 == {"a", "b", "c", "d"}


def test_foreign_equality_deletes_strict_seq(spark, tmp_path):
    root = str(tmp_path / "eqdel")
    _foreign_with_deletes(spark, root, DATA4, data_seq=1,
                          eq_rows=[20, 40], eq_seq=2, eq_ids=[2])
    got = {r[0] for r in read_iceberg(spark, root)
           .select("documentid").collect()}
    assert got == {"a", "c"}

    # STRICTLY-smaller rule: an equality delete at the SAME seq as the
    # data file does not apply (rows appended with the delete survive)
    root2 = str(tmp_path / "eqdel_same")
    _foreign_with_deletes(spark, root2, DATA4, data_seq=2,
                          eq_rows=[20, 40], eq_seq=2, eq_ids=[2])
    got2 = {r[0] for r in read_iceberg(spark, root2)
            .select("documentid").collect()}
    assert got2 == {"a", "b", "c", "d"}

    # unknown equality field-id is named loudly
    root3 = str(tmp_path / "eqdel_bad")
    _foreign_with_deletes(spark, root3, DATA4, data_seq=1,
                          eq_rows=[20], eq_seq=2, eq_ids=[99])
    with pytest.raises(ValueError, match="field-id 99"):
        read_iceberg(spark, root3)


def test_foreign_both_delete_kinds_compose(spark, tmp_path):
    root = str(tmp_path / "bothdel")
    _foreign_with_deletes(spark, root, DATA4, data_seq=1,
                          pos_rows=[0], pos_seq=1,
                          eq_rows=[30], eq_seq=2, eq_ids=[2])
    got = {r[0] for r in read_iceberg(spark, root)
           .select("documentid").collect()}
    assert got == {"b", "d"}


def _write_foreign_table(spark, root, *, drop_col, spec_fields,
                         partition_schema_fields, partition_values,
                         schema_fields):
    """Hand-build an Iceberg v2 table the repo did NOT export: parquet
    data files (optionally missing a column), one manifest whose
    partition record carries values, metadata JSON with a partition
    spec."""
    os.makedirs(os.path.join(root, "metadata"))
    os.makedirs(os.path.join(root, "data"))
    docs = _docs(spark).limit(20)
    if drop_col:
        docs = docs.drop(drop_col)
    pdf = docs.toPandas()
    import pyarrow as pa
    import pyarrow.parquet as pq
    data_path = os.path.join(root, "data", "00000.parquet")
    pq.write_table(pa.Table.from_pandas(pdf, preserve_index=False),
                   data_path)

    entry_schema = _manifest_entry_schema()
    # swap in a partition record carrying the fixture's fields
    for f in entry_schema["fields"]:
        if f["name"] == "data_file":
            for df_f in f["type"]["fields"]:
                if df_f["name"] == "partition":
                    df_f["type"] = {"type": "record", "name": "r102",
                                    "fields": partition_schema_fields}
    entry = {"status": 1, "snapshot_id": 77, "sequence_number": 1,
             "file_sequence_number": 1,
             "data_file": {"content": 0,
                           "file_path": "file://" + data_path,
                           "file_format": "PARQUET",
                           "partition": partition_values,
                           "record_count": len(pdf),
                           "file_size_in_bytes":
                               os.path.getsize(data_path),
                           "lower_bounds": None, "upper_bounds": None}}
    mpath = os.path.join(root, "metadata", "m0.avro")
    write_container(mpath, entry_schema, [entry])
    lpath = os.path.join(root, "metadata", "snap-77-1-x.avro")
    write_container(lpath, _manifest_list_schema(), [{
        "manifest_path": "file://" + mpath,
        "manifest_length": os.path.getsize(mpath),
        "partition_spec_id": 0, "content": 0, "sequence_number": 1,
        "min_sequence_number": 1, "added_snapshot_id": 77,
        "added_files_count": 1, "existing_files_count": 0,
        "deleted_files_count": 0, "added_rows_count": len(pdf),
        "existing_rows_count": 0, "deleted_rows_count": 0}])
    meta = {"format-version": 2, "table-uuid": "x", "location": root,
            "last-sequence-number": 1, "last-updated-ms": 0,
            "last-column-id": 99,
            "current-schema-id": 0,
            "schemas": [{"type": "struct", "schema-id": 0,
                         "fields": schema_fields}],
            "default-spec-id": 0,
            "partition-specs": [{"spec-id": 0, "fields": spec_fields}],
            "last-partition-id": 1000, "default-sort-order-id": 0,
            "sort-orders": [{"order-id": 0, "fields": []}],
            "current-snapshot-id": 77,
            "snapshots": [{"snapshot-id": 77, "sequence-number": 1,
                           "timestamp-ms": 0, "schema-id": 0,
                           "manifest-list": "file://" + lpath,
                           "summary": {"operation": "append"}}],
            "snapshot-log": [], "metadata-log": []}
    json.dump(meta, open(os.path.join(root, "metadata",
                                      "v1.metadata.json"), "w"))
    open(os.path.join(root, "metadata", "version-hint.text"),
         "w").write("1")
    return len(pdf)


SCHEMA_FIELDS = [
    {"id": 1, "name": "documentid", "required": False, "type": "string"},
    {"id": 2, "name": "text", "required": False, "type": "string"},
    {"id": 3, "name": "lang", "required": False, "type": "string"},
    {"id": 4, "name": "n_chars", "required": False, "type": "long"},
]


def test_foreign_identity_partition_restored(spark, tmp_path):
    # the Hive-migration shape: data files LACK the partition column,
    # the manifest partition tuple carries it
    root = str(tmp_path / "foreign")
    n = _write_foreign_table(
        spark, root, drop_col="lang",
        spec_fields=[{"name": "lang", "transform": "identity",
                      "source-id": 3, "field-id": 1000}],
        partition_schema_fields=[{"name": "lang",
                                  "type": ["null", "string"],
                                  "field-id": 1000}],
        partition_values={"lang": "xx"},
        schema_fields=SCHEMA_FIELDS)
    df = read_iceberg(spark, root)
    assert df.count() == n
    assert df.select("lang").distinct().collect()[0][0] == "xx"
    assert df.columns == ["documentid", "text", "lang", "n_chars"]


def test_foreign_missing_column_without_identity_refused(spark, tmp_path):
    root = str(tmp_path / "foreign2")
    _write_foreign_table(
        spark, root, drop_col="lang", spec_fields=[],
        partition_schema_fields=[], partition_values={},
        schema_fields=SCHEMA_FIELDS)
    with pytest.raises(ValueError, match="field-id-less"):
        read_iceberg(spark, root)


def test_schema_translation_roundtrip():
    st = T.StructType([
        T.StructField("a", T.LongType(), False),
        T.StructField("b", T.StringType(), True),
        T.StructField("xs", T.ArrayType(T.DoubleType(), True), True),
        T.StructField("m", T.MapType(T.StringType(), T.LongType(), True),
                      True),
        T.StructField("n", T.StructType([
            T.StructField("x", T.IntegerType(), True)]), True),
        T.StructField("ts", T.TimestampType(), True),
        T.StructField("d", T.DateType(), True),
        T.StructField("dec", T.DecimalType(12, 3), True),
    ])
    ice = iceberg_schema_from_spark(st)
    ids = []

    def walk(node):
        if isinstance(node, dict):
            for k, v in node.items():
                if k in ("id", "element-id", "key-id", "value-id"):
                    ids.append(v)
                else:
                    walk(v)
        elif isinstance(node, list):
            for v in node:
                walk(v)
    walk(ice)
    assert len(ids) == len(set(ids)), "field-ids must be unique"
    assert [f["id"] for f in ice["fields"]] == list(range(1, 9))
    back = spark_schema_from_iceberg(ice)
    assert back == st
    with pytest.raises(ValueError, match="not supported"):
        spark_schema_from_iceberg(
            {"type": "struct", "fields": [
                {"id": 1, "name": "u", "required": False, "type": "uuid"}]})


def test_mirror_iceberg_incremental(spark, tmp_path):
    from dataingestion_spark.interop.iceberg import (
        mirror_iceberg, vacuum_iceberg,
    )
    from dataingestion_spark.sinks.manifest_store import (
        append_table, read_table,
    )

    tbl = _table(spark, tmp_path)
    dst = str(tmp_path / "mirror")
    assert mirror_iceberg(spark, tbl, dst) == 1     # first sync = export
    assert mirror_iceberg(spark, tbl, dst) == 1     # no change → no-op
    v1_meta = json.load(open(os.path.join(dst, "metadata",
                                          "v1.metadata.json")))
    snap1 = v1_meta["current-snapshot-id"]

    extra = _docs(spark).limit(40).select(
        (F.col("documentid").cast("long") + 1000000).cast("string")
        .alias("documentid"), "text", "lang", "n_chars")
    append_table(extra, tbl)
    assert mirror_iceberg(spark, tbl, dst) == 2
    want = {tuple(r) for r in read_table(spark, tbl)
            .select("documentid", "text", "lang", "n_chars").collect()}
    got = {tuple(r) for r in read_iceberg(spark, dst)
           .select("documentid", "text", "lang", "n_chars").collect()}
    assert got == want and len(want) == 540

    # manifest reuse: v2's list carries the v1 manifest by reference
    v2_meta = json.load(open(os.path.join(dst, "metadata",
                                          "v2.metadata.json")))
    snap2 = {s["snapshot-id"]: s for s in v2_meta["snapshots"]}[
        v2_meta["current-snapshot-id"]]
    lrows = read_container(
        open(snap2["manifest-list"][7:], "rb").read(), "l")[1]
    old_snap = {s["snapshot-id"]: s for s in v1_meta["snapshots"]}[snap1]
    old_lrows = read_container(
        open(old_snap["manifest-list"][7:], "rb").read(), "l")[1]
    assert old_lrows[0]["manifest_path"] in \
        {r["manifest_path"] for r in lrows}
    assert snap2["parent-snapshot-id"] == snap1

    # time travel to the pre-append snapshot still works
    assert read_iceberg(spark, dst, snapshot_id=snap1).count() == 500

    # a store compaction rewrites files → mirror handles removed+added
    from dataingestion_spark.sinks.manifest_store import compact
    compact(spark, tbl, max_files_per_bucket=1)
    v = mirror_iceberg(spark, tbl, dst)
    assert v == 3
    got3 = {tuple(r) for r in read_iceberg(spark, dst)
            .select("documentid", "text", "lang", "n_chars").collect()}
    assert got3 == want

    # vacuum: dry run deletes nothing, real run expires old snapshots
    dry = vacuum_iceberg(dst, keep_snapshots=1, dry_run=True)
    assert dry and all(os.path.exists(p) for p in dry)
    gone = vacuum_iceberg(dst, keep_snapshots=1)
    assert sorted(gone) == sorted(dry)
    assert not any(os.path.exists(p) for p in gone)
    got4 = {tuple(r) for r in read_iceberg(spark, dst)
            .select("documentid", "text", "lang", "n_chars").collect()}
    assert got4 == want
    with pytest.raises(ValueError, match="not in metadata"):
        read_iceberg(spark, dst, snapshot_id=snap1)


def test_mirror_iceberg_equality_dv_sync(spark, tmp_path):
    from dataingestion_spark.interop.iceberg import mirror_iceberg
    from dataingestion_spark.sinks.manifest_store import (
        delete_documents, read_manifest, read_table,
    )

    tbl = _table(spark, tmp_path)
    dst = str(tmp_path / "mirror_eq")
    assert mirror_iceberg(spark, tbl, dst, dv_mode="equality") == 1
    ids = [r[0] for r in read_table(spark, tbl)
           .select("documentid").limit(5).collect()]
    delete_documents(spark, tbl, ids)
    assert mirror_iceberg(spark, tbl, dst, dv_mode="equality") == 2
    # the source kept its DVs — the mirror shipped them, not a compact
    assert any(read_manifest(tbl).get("deletes", {}).values())
    want = {tuple(r) for r in read_table(spark, tbl)
            .select("documentid", "text", "lang", "n_chars").collect()}
    got = {tuple(r) for r in read_iceberg(spark, dst)
           .select("documentid", "text", "lang", "n_chars").collect()}
    assert got == want
    assert not ({r[0] for r in got} & set(ids))
    meta = json.load(open(os.path.join(dst, "metadata",
                                       "v2.metadata.json")))
    snap = {s["snapshot-id"]: s for s in meta["snapshots"]}[
        meta["current-snapshot-id"]]
    assert snap["summary"]["operation"] == "overwrite"
    assert int(snap["summary"]["added-delete-files"]) >= 1


def test_mirror_iceberg_schema_evolution_keeps_ids(spark, tmp_path):
    from dataingestion_spark.interop.iceberg import mirror_iceberg
    from dataingestion_spark.sinks.manifest_store import (
        append_table, read_table,
    )

    tbl = _table(spark, tmp_path)
    dst = str(tmp_path / "mirror_ev")
    mirror_iceberg(spark, tbl, dst)
    v1_meta = json.load(open(os.path.join(dst, "metadata",
                                          "v1.metadata.json")))
    old_ids = {f["name"]: f["id"]
               for f in v1_meta["schemas"][0]["fields"]}

    widened = _docs(spark).limit(25).select(
        (F.col("documentid").cast("long") + 2000000).cast("string")
        .alias("documentid"), "text", "lang", "n_chars",
        F.lit(3.5).alias("quality"))
    append_table(widened, tbl)
    assert mirror_iceberg(spark, tbl, dst) == 2
    v2_meta = json.load(open(os.path.join(dst, "metadata",
                                          "v2.metadata.json")))
    assert len(v2_meta["schemas"]) == 2
    cur = {s["schema-id"]: s for s in v2_meta["schemas"]}[
        v2_meta["current-schema-id"]]
    new_ids = {f["name"]: f["id"] for f in cur["fields"]}
    for name, fid in old_ids.items():
        assert new_ids[name] == fid, "existing field-ids must not move"
    assert new_ids["quality"] > max(old_ids.values())
    assert v2_meta["last-column-id"] >= new_ids["quality"]

    # read back: old files surface null for the widened column
    back = read_iceberg(spark, dst)
    assert back.filter(F.col("quality").isNull()).count() == 500
    assert back.filter(F.col("quality") == 3.5).count() == 25
    want = {tuple(r) for r in read_table(spark, tbl)
            .select("documentid", "quality").collect()}
    got = {tuple(r) for r in back
           .select("documentid", "quality").collect()}
    assert got == want


def test_mirror_model_random_ops(spark, tmp_path):
    """Model-based pin: a random interleaving of store ops (append /
    delete / merge-update / compact), mirrored after each, must keep
    read_iceberg == read_table at EVERY step — and, every other step,
    read_delta of a PARALLEL Delta mirror too (three engines, one
    truth). Time travel back to each prior snapshot still serves that
    step's exact rows until a final vacuum expires them. Seeded —
    failures reproduce."""
    import random

    from dataingestion_spark.interop.delta import mirror_delta, read_delta
    from dataingestion_spark.interop.iceberg import (
        mirror_iceberg, vacuum_iceberg,
    )
    from dataingestion_spark.sinks.manifest_store import (
        append_table, compact, delete_documents, merge_table, read_table,
    )

    rng = random.Random(20260816)
    tbl = str(tmp_path / "t")
    dst = str(tmp_path / "mirror")
    from dataingestion_spark.sinks.manifest_store import write_table
    base = _docs(spark).limit(60)
    write_table(base, tbl)
    mirror_iceberg(spark, tbl, dst, dv_mode="equality")

    def snap_rows():
        return {tuple(r) for r in read_table(spark, tbl)
                .select("documentid", "text", "lang", "n_chars")
                .collect()}

    history = []  # (snapshot_id, expected rows)
    next_id = 10 ** 7
    for step in range(6):
        op = rng.choice(["append", "delete", "merge", "compact"])
        live = sorted(r[0] for r in read_table(spark, tbl)
                      .select("documentid").collect())
        if op == "append":
            k = rng.randint(1, 4)
            extra = _docs(spark).limit(k).select(
                F.lit(None).cast("string").alias("drop"),
                (F.monotonically_increasing_id() + next_id)
                .cast("string").alias("documentid"),
                "text", "lang", "n_chars").drop("drop")
            next_id += 100
            append_table(extra, tbl)
        elif op == "delete" and live:
            delete_documents(
                spark, tbl, rng.sample(live, min(3, len(live))))
        elif op == "merge" and live:
            touch = rng.sample(live, min(2, len(live)))
            batch = (read_table(spark, tbl)
                     .filter(F.col("documentid").isin(touch))
                     .withColumn("n_chars", F.col("n_chars") + 1000))
            merge_table(batch, tbl)
        else:
            compact(spark, tbl, max_files_per_bucket=1)
        v = mirror_iceberg(spark, tbl, dst, dv_mode="equality")
        want = snap_rows()
        got = {tuple(r) for r in read_iceberg(spark, dst)
               .select("documentid", "text", "lang", "n_chars")
               .collect()}
        assert got == want, f"step {step} ({op}): mirror diverged"
        if step % 2 == 1:
            # the Delta mirror compacts source DVs (reader-v1 has no
            # delete representation) — MORE churn for the next iceberg
            # sync to absorb, and a cross-format equality pin
            mirror_delta(spark, tbl, str(tmp_path / "dmirror"))
            via_delta = {tuple(r) for r in
                         read_delta(spark, str(tmp_path / "dmirror"))
                         .select("documentid", "text", "lang",
                                 "n_chars").collect()}
            assert via_delta == snap_rows(), \
                f"step {step} ({op}): delta mirror diverged"
        meta = json.load(open(os.path.join(
            dst, "metadata", f"v{v}.metadata.json")))
        history.append((meta["current-snapshot-id"], want))

    # every retained snapshot still serves its step's exact rows
    for sid, want in history:
        got = {tuple(r) for r in read_iceberg(spark, dst, snapshot_id=sid)
               .select("documentid", "text", "lang", "n_chars")
               .collect()}
        assert got == want, f"time travel to {sid} diverged"

    vacuum_iceberg(dst, keep_snapshots=1)
    got = {tuple(r) for r in read_iceberg(spark, dst)
           .select("documentid", "text", "lang", "n_chars").collect()}
    assert got == history[-1][1]


def test_partitioned_export_and_mirror(spark, tmp_path):
    from dataingestion_spark.interop.iceberg import mirror_iceberg
    from dataingestion_spark.sinks.manifest_store import (
        append_table, read_table,
    )

    tbl = _table(spark, tmp_path)
    dst = str(tmp_path / "ice_part")
    export_iceberg(spark, tbl, dst, partition_by=("doc_bucket",))
    meta = json.load(open(os.path.join(dst, "metadata",
                                       "v1.metadata.json")))
    spec = meta["partition-specs"][0]
    assert spec["fields"][0]["transform"] == "identity"
    assert spec["fields"][0]["name"] == "doc_bucket"
    assert spec["fields"][0]["field-id"] == 1000
    assert meta["last-partition-id"] == 1000
    # manifest entries carry typed partition tuples
    snap = [n for n in os.listdir(os.path.join(dst, "metadata"))
            if n.startswith("snap-")][0]
    lrows = read_container(open(os.path.join(dst, "metadata", snap),
                                "rb").read(), snap)[1]
    mpath = lrows[0]["manifest_path"][7:]
    _, entries = read_container(open(mpath, "rb").read(), mpath)
    assert all(isinstance(e["data_file"]["partition"].get("doc_bucket"),
                          int) for e in entries)
    # read back equals the store (files carry the column — single-scan
    # path, no per-tuple restoration needed)
    want = {tuple(r) for r in read_table(spark, tbl)
            .select("documentid", "text", "lang", "n_chars").collect()}
    got = {tuple(r) for r in read_iceberg(spark, dst)
           .select("documentid", "text", "lang", "n_chars").collect()}
    assert got == want

    # mirror preserves the spec: appended files carry their tuples
    extra = _docs(spark).limit(10).select(
        (F.col("documentid").cast("long") + 7 * 10 ** 6).cast("string")
        .alias("documentid"), "text", "lang", "n_chars")
    append_table(extra, tbl)
    assert mirror_iceberg(spark, tbl, dst) == 2
    got2 = {tuple(r) for r in read_iceberg(spark, dst)
            .select("documentid", "text", "lang", "n_chars").collect()}
    assert got2 == {tuple(r) for r in read_table(spark, tbl)
                    .select("documentid", "text", "lang",
                            "n_chars").collect()}
    meta2 = json.load(open(os.path.join(dst, "metadata",
                                        "v2.metadata.json")))
    snap2 = {s["snapshot-id"]: s for s in meta2["snapshots"]}[
        meta2["current-snapshot-id"]]
    lrows2 = read_container(
        open(snap2["manifest-list"][7:], "rb").read(), "l")[1]
    new_m = [r for r in lrows2 if r["added_snapshot_id"]
             == meta2["current-snapshot-id"]]
    assert new_m, "mirror must add a manifest for the appended files"
    m2 = new_m[0]["manifest_path"][7:]
    _, ents2 = read_container(open(m2, "rb").read(), m2)
    assert all(isinstance(e["data_file"]["partition"].get("doc_bucket"),
                          int) for e in ents2)

    # identity partition values are exact pruning facts: a where= on
    # the partition source scans only the matching bucket's files
    full_n = len(set(read_iceberg(spark, dst).inputFiles()))
    one = read_iceberg(spark, dst, where=("doc_bucket", "==", 3))
    assert 0 < len(set(one.inputFiles())) < full_n
    assert (one.filter(F.col("doc_bucket") == 3).count()
            == read_iceberg(spark, dst)
            .filter(F.col("doc_bucket") == 3).count())
    none = read_iceberg(spark, dst, where=("doc_bucket", "==", 10 ** 6))
    assert none.count() == 0

    # manifest-LIST field summaries let the reader skip a whole
    # manifest before its IO: corrupt the manifest file — an
    # out-of-range partition predicate must still answer (skipped),
    # while an unpruned read hits the corruption loudly
    lr = read_container(
        open(os.path.join(dst, "metadata", snap), "rb").read(), snap)[1]
    assert lr[0]["partitions"][0]["contains_null"] is False
    assert lr[0]["partitions"][0]["lower_bound"] is not None
    mfile = lr[0]["manifest_path"][7:]
    orig = open(mfile, "rb").read()
    open(mfile, "wb").write(b"garbage")
    try:
        assert read_iceberg(
            spark, dst, where=("doc_bucket", "==", 10 ** 6)).count() == 0
        with pytest.raises(ValueError, match="not an Avro container"):
            read_iceberg(spark, dst)
    finally:
        open(mfile, "wb").write(orig)

    # equality DVs + partitions are mutually exclusive, loudly
    with pytest.raises(ValueError, match="partition"):
        export_iceberg(spark, tbl, str(tmp_path / "no"),
                       partition_by=("doc_bucket",), dv_mode="equality")
    del_ids = [r[0] for r in read_table(spark, tbl)
               .select("documentid").limit(2).collect()]
    from dataingestion_spark.sinks.manifest_store import delete_documents
    delete_documents(spark, tbl, del_ids)
    with pytest.raises(ValueError, match="partition"):
        export_iceberg(spark, tbl, str(tmp_path / "no2"),
                       partition_by=("doc_bucket",), dv_mode="equality")


def test_export_uniform_one_copy_two_formats(spark, tmp_path):
    from dataingestion_spark.interop.delta import read_delta
    from dataingestion_spark.interop.iceberg import export_uniform
    from dataingestion_spark.sinks.manifest_store import read_table

    tbl = _table(spark, tmp_path)
    dst = str(tmp_path / "uniform")
    export_uniform(spark, tbl, dst)
    want = {tuple(r) for r in read_table(spark, tbl)
            .select("documentid", "text", "lang", "n_chars").collect()}
    via_delta = {tuple(r) for r in read_delta(spark, dst)
                 .select("documentid", "text", "lang", "n_chars")
                 .collect()}
    via_iceberg = {tuple(r) for r in read_iceberg(spark, dst)
                   .select("documentid", "text", "lang", "n_chars")
                   .collect()}
    assert via_delta == want and via_iceberg == want
    # ONE copy of the data: parquet at dst/<name>, no dst/data dir,
    # and the Iceberg manifests reference exactly those files
    assert not os.path.isdir(os.path.join(dst, "data"))
    parquet = {n for n in os.listdir(dst)
               if n not in ("_delta_log", "metadata")
               and not n.startswith(".")}
    assert parquet, "shared data files must sit at the table root"
    ice_files = {os.path.basename(p)
                 for p in read_iceberg(spark, dst).inputFiles()}
    assert ice_files == parquet
    delta_files = {os.path.basename(p)
                   for p in read_delta(spark, dst).inputFiles()}
    assert delta_files == parquet


def test_stream_mirror_iceberg_continuous(spark, tmp_path):
    from dataingestion_spark.interop.iceberg import stream_mirror_iceberg
    from dataingestion_spark.sinks.manifest_store import (
        append_table, compact, delete_documents, read_table,
    )

    tbl = _table(spark, tmp_path)
    dst = str(tmp_path / "smirror")
    cp = str(tmp_path / "cp")

    def drain():
        q = stream_mirror_iceberg(spark, tbl, dst, cp,
                                  dv_mode="equality")
        q.awaitTermination(120)

    drain()
    want = {tuple(r) for r in read_table(spark, tbl)
            .select("documentid", "text", "lang", "n_chars").collect()}
    got = {tuple(r) for r in read_iceberg(spark, dst)
           .select("documentid", "text", "lang", "n_chars").collect()}
    assert got == want and len(got) == 500

    # a delete batch and a compaction batch both publish
    ids = [r[0] for r in read_table(spark, tbl)
           .select("documentid").limit(3).collect()]
    delete_documents(spark, tbl, ids)
    extra = _docs(spark).limit(10).select(
        (F.col("documentid").cast("long") + 5 * 10 ** 6).cast("string")
        .alias("documentid"), "text", "lang", "n_chars")
    append_table(extra, tbl)
    drain()
    want = {tuple(r) for r in read_table(spark, tbl)
            .select("documentid", "text", "lang", "n_chars").collect()}
    got = {tuple(r) for r in read_iceberg(spark, dst)
           .select("documentid", "text", "lang", "n_chars").collect()}
    assert got == want and len(got) == 507

    compact(spark, tbl, max_files_per_bucket=1)
    drain()
    got = {tuple(r) for r in read_iceberg(spark, dst)
           .select("documentid", "text", "lang", "n_chars").collect()}
    assert got == want


def test_stream_mirror_inline_manifest_compaction(spark, tmp_path):
    from dataingestion_spark.interop.iceberg import stream_mirror_iceberg
    from dataingestion_spark.sinks.manifest_store import (
        append_table, read_table,
    )

    tbl = _table(spark, tmp_path)
    dst = str(tmp_path / "smirror")
    cp = str(tmp_path / "cp")

    def drain():
        q = stream_mirror_iceberg(spark, tbl, dst, cp,
                                  dv_mode="equality", compact_every=1)
        q.awaitTermination(120)

    drain()
    for lo in (1, 2):
        extra = _docs(spark).limit(4).select(
            (F.col("documentid").cast("long") + lo * 10 ** 6)
            .cast("string").alias("documentid"),
            "text", "lang", "n_chars")
        append_table(extra, tbl)
        drain()
    # every sync compacted: the current snapshot holds ONE data manifest
    meta_path = sorted(
        n for n in os.listdir(os.path.join(dst, "metadata"))
        if n.endswith(".metadata.json"))[-1]
    meta = json.load(open(os.path.join(dst, "metadata", meta_path)))
    hint = open(os.path.join(dst, "metadata",
                             "version-hint.text")).read().strip()
    meta = json.load(open(os.path.join(dst, "metadata",
                                       f"v{hint}.metadata.json")))
    snap = {s["snapshot-id"]: s for s in meta["snapshots"]}[
        meta["current-snapshot-id"]]
    rows = read_container(
        open(snap["manifest-list"][7:], "rb").read(), "l")[1]
    assert len([r for r in rows if r["content"] == 0]) == 1
    got = {tuple(r) for r in read_iceberg(spark, dst)
           .select("documentid", "text", "lang", "n_chars").collect()}
    assert got == {tuple(r) for r in read_table(spark, tbl)
                   .select("documentid", "text", "lang",
                           "n_chars").collect()}


def test_compact_manifests_merges_without_semantic_change(spark,
                                                          tmp_path):
    from dataingestion_spark.interop.iceberg import (
        compact_manifests, mirror_iceberg,
    )
    from dataingestion_spark.sinks.manifest_store import (
        append_table, delete_documents, read_table,
    )

    tbl = _table(spark, tmp_path)
    dst = str(tmp_path / "mirror")
    mirror_iceberg(spark, tbl, dst, dv_mode="equality")
    for lo in (1, 2, 3):
        extra = _docs(spark).limit(5).select(
            (F.col("documentid").cast("long") + lo * 10 ** 6)
            .cast("string").alias("documentid"),
            "text", "lang", "n_chars")
        append_table(extra, tbl)
        mirror_iceberg(spark, tbl, dst, dv_mode="equality")
    ids = [r[0] for r in read_table(spark, tbl)
           .select("documentid").limit(2).collect()]
    delete_documents(spark, tbl, ids)
    v = mirror_iceberg(spark, tbl, dst, dv_mode="equality")

    def list_rows(version):
        meta = json.load(open(os.path.join(
            dst, "metadata", f"v{version}.metadata.json")))
        snap = {s["snapshot-id"]: s for s in meta["snapshots"]}[
            meta["current-snapshot-id"]]
        return read_container(
            open(snap["manifest-list"][7:], "rb").read(), "l")[1], meta

    before, _ = list_rows(v)
    assert len(before) >= 4, "need a multi-manifest snapshot"
    want = {tuple(r) for r in read_table(spark, tbl)
            .select("documentid", "text", "lang", "n_chars").collect()}
    pre_snap_rows = {tuple(r) for r in read_iceberg(spark, dst)
                     .select("documentid", "text", "lang", "n_chars")
                     .collect()}
    assert pre_snap_rows == want

    cv = compact_manifests(dst)
    assert cv == v + 1
    after, meta_after = list_rows(cv)
    assert len(after) == 2  # one data + one deletes manifest
    assert sorted(r["content"] for r in after) == [0, 1]
    assert all(r["added_files_count"] == 0 for r in after)
    got = {tuple(r) for r in read_iceberg(spark, dst)
           .select("documentid", "text", "lang", "n_chars").collect()}
    assert got == want  # delete semantics bit-identical (seqs kept)
    # idempotent: nothing left to merge
    assert compact_manifests(dst) == cv
    # time travel to the pre-compaction snapshot still works
    prev = meta_after["snapshots"][-2]["snapshot-id"]
    assert {tuple(r) for r in
            read_iceberg(spark, dst, snapshot_id=prev)
            .select("documentid", "text", "lang", "n_chars")
            .collect()} == want

    # a tailing stream sees an append-free snapshot: drain before and
    # after compaction must deliver identical cumulative rows
    from dataingestion_spark.streaming.iceberg_source import (
        stream_iceberg,
    )
    sink, ckpt = str(tmp_path / "sink"), str(tmp_path / "ckpt")

    def drain():
        q = (stream_iceberg(spark, dst, skip_change_commits=True)
             .writeStream.format("parquet")
             .option("path", sink).option("checkpointLocation", ckpt)
             .trigger(availableNow=True).start())
        q.awaitTermination()
        return spark.read.parquet(sink).count()

    n1 = drain()
    extra = _docs(spark).limit(3).select(
        (F.col("documentid").cast("long") + 9 * 10 ** 6).cast("string")
        .alias("documentid"), "text", "lang", "n_chars")
    append_table(extra, tbl)
    mirror_iceberg(spark, tbl, dst, dv_mode="equality")
    compact_manifests(dst)
    n2 = drain()
    assert n2 == n1 + 3  # the append arrived once; compaction added 0


def test_pyiceberg_reads_our_export_if_available(spark, tmp_path):
    pytest.importorskip("pyiceberg")
    from pyiceberg.table import StaticTable  # pragma: no cover

    tbl = _table(spark, tmp_path)
    dst = str(tmp_path / "ice")
    export_iceberg(spark, tbl, dst)
    st = StaticTable.from_metadata(
        os.path.join(dst, "metadata", "v1.metadata.json"))
    assert st.scan().to_arrow().num_rows == 500


# ---------------------------------------------------------------------------
# r11 regression pins (round-10 advisor findings)
# ---------------------------------------------------------------------------

def test_evolved_new_column_is_optional(spark, tmp_path):
    """Iceberg v2 forbids ADDING a required column: a mirror sync that
    introduces a non-nullable Spark column (lit() is non-nullable) must
    publish it as optional, or conformant engines reject/mis-read the
    older data files that lack values for it."""
    from dataingestion_spark.interop.iceberg import mirror_iceberg
    from dataingestion_spark.sinks.manifest_store import append_table

    tbl = _table(spark, tmp_path)
    dst = str(tmp_path / "mirror_req")
    mirror_iceberg(spark, tbl, dst)
    widened = _docs(spark).limit(5).select(
        (F.col("documentid").cast("long") + 5 * 10 ** 6).cast("string")
        .alias("documentid"), "text", "lang", "n_chars",
        F.lit(7).alias("epoch"))
    assert not widened.schema["epoch"].nullable  # precondition
    append_table(widened, tbl)
    mirror_iceberg(spark, tbl, dst)
    meta = json.load(open(os.path.join(dst, "metadata",
                                       "v2.metadata.json")))
    cur = {s["schema-id"]: s for s in meta["schemas"]}[
        meta["current-schema-id"]]
    epoch = next(f for f in cur["fields"] if f["name"] == "epoch")
    assert epoch["required"] is False


def test_time_travel_uses_snapshot_schema(spark, tmp_path):
    """Time travel reads a snapshot under ITS schema (snapshot
    schema-id), not the current one — after evolution adds a column,
    the old snapshot must NOT grow it."""
    from dataingestion_spark.interop.iceberg import mirror_iceberg
    from dataingestion_spark.sinks.manifest_store import append_table

    tbl = _table(spark, tmp_path)
    dst = str(tmp_path / "mirror_tt")
    mirror_iceberg(spark, tbl, dst)
    v1 = json.load(open(os.path.join(dst, "metadata",
                                     "v1.metadata.json")))
    snap1 = v1["current-snapshot-id"]

    widened = _docs(spark).limit(5).select(
        (F.col("documentid").cast("long") + 6 * 10 ** 6).cast("string")
        .alias("documentid"), "text", "lang", "n_chars",
        F.lit(1.0).alias("quality"))
    append_table(widened, tbl)
    mirror_iceberg(spark, tbl, dst)

    old = read_iceberg(spark, dst, snapshot_id=snap1)
    assert "quality" not in old.columns
    assert old.count() == 500
    cur = read_iceberg(spark, dst)
    assert "quality" in cur.columns
    assert cur.count() == 505


def test_mirror_relative_dst_keeps_copy_mode(spark, tmp_path,
                                             monkeypatch):
    """A relative dst must not misclassify a copy-mode mirror as
    shallow (export stores absolute URIs; the prefix test must
    absolutize before comparing) — otherwise later syncs reference
    source files in place and break when the source compacts."""
    from dataingestion_spark.interop.iceberg import mirror_iceberg
    from dataingestion_spark.sinks.manifest_store import append_table

    tbl = _table(spark, tmp_path)
    monkeypatch.chdir(tmp_path)
    mirror_iceberg(spark, tbl, "mirror_rel")     # first sync = copy

    extra = _docs(spark).limit(7).select(
        (F.col("documentid").cast("long") + 7 * 10 ** 6).cast("string")
        .alias("documentid"), "text", "lang", "n_chars")
    append_table(extra, tbl)
    mirror_iceberg(spark, tbl, "mirror_rel")

    root = os.path.abspath("mirror_rel")
    meta = json.load(open(os.path.join(root, "metadata",
                                       "v2.metadata.json")))
    snap = {s["snapshot-id"]: s for s in meta["snapshots"]}[
        meta["current-snapshot-id"]]
    from dataingestion_spark.interop.iceberg import _walk_snapshot
    from dataingestion_spark.sinks.data_backend import data_backend_for
    be = data_backend_for(root)
    for _, live in _walk_snapshot(be, root, snap):
        for e in live:
            p = e["data_file"]["file_path"]
            assert "/mirror_rel/data/" in p, \
                f"second sync leaked a source-tree reference: {p}"
    got = read_iceberg(spark, root).count()
    assert got == 507


def test_duckdb_iceberg_extension_reads_our_export_if_available(
        spark, tmp_path):
    """Third-party read of export_iceberg output via DuckDB's iceberg
    extension. The extension is not bundled with the python wheel and
    must be downloaded; in an offline image `INSTALL iceberg` fails
    with an IOException — probed r11: "Failed to download extension
    'iceberg'" — so this skips there and runs wherever the extension
    is present (same conditional-probe pattern as the pyiceberg and
    delta-rs tests)."""
    import duckdb

    con = duckdb.connect()
    try:
        con.execute("INSTALL iceberg")
        con.execute("LOAD iceberg")
    except Exception as e:  # offline / unsupported platform
        pytest.skip(f"duckdb iceberg extension unavailable: {e}")

    tbl = _table(spark, tmp_path)
    dst = str(tmp_path / "ice_duck")
    export_iceberg(spark, tbl, dst)
    con.execute("SET unsafe_enable_version_guessing=true")
    rows = con.execute(
        f"SELECT count(*), count(DISTINCT documentid) "
        f"FROM iceberg_scan('{dst}')").fetchone()
    assert rows == (500, 500)
    got = {tuple(r) for r in con.execute(
        f"SELECT documentid, n_chars FROM iceberg_scan('{dst}')"
    ).fetchall()}
    want = {(r["documentid"], r["n_chars"])
            for r in read_iceberg(spark, dst)
            .select("documentid", "n_chars").collect()}
    assert got == want


def test_export_column_mapped_table(spark, tmp_path):
    """r11: a column-mapped store table (renamed column; files carry
    the frozen PHYSICAL name) exports with a physical-named schema-0
    in history + physical spellings in the name-mapping, and
    read_iceberg resolves the rename — values surface under the
    CURRENT logical name."""
    from dataingestion_spark.sinks.manifest_store import (
        read_table, rename_column,
    )

    tbl = _table(spark, tmp_path)
    rename_column(tbl, "lang", "language")
    want = {tuple(r) for r in read_table(spark, tbl)
            .select("documentid", "language", "n_chars").collect()}

    dst = str(tmp_path / "ice_cm")
    export_iceberg(spark, tbl, dst, mode="copy")
    meta = json.load(open(os.path.join(dst, "metadata",
                                       "v1.metadata.json")))
    assert len(meta["schemas"]) == 2
    cur = {s["schema-id"]: s for s in meta["schemas"]}[
        meta["current-schema-id"]]
    names_cur = [f["name"] for f in cur["fields"]]
    assert "language" in names_cur and "lang" not in names_cur
    hist = meta["schemas"][0]
    fid = next(f["id"] for f in cur["fields"]
               if f["name"] == "language")
    phys = next(f["name"] for f in hist["fields"] if f["id"] == fid)
    assert phys != "language"  # frozen physical spelling
    nm = json.loads(meta["properties"]["schema.name-mapping.default"])
    entry = next(e for e in nm if e["field-id"] == fid)
    assert phys in entry["names"] and "language" in entry["names"]

    back = read_iceberg(spark, dst)
    got = {tuple(r) for r in back
           .select("documentid", "language", "n_chars").collect()}
    assert got == want


def test_manifest_split_bounds_export_mirror_compact(spark, tmp_path):
    """manifest_split caps entries per manifest file across export,
    mirror, and compact (r11 VERDICT #4): a snapshot above the cap
    writes several manifests whose per-manifest partition summaries
    still prune, and compaction merges to ceil(n/cap) bounded
    manifests instead of one monolith."""
    from dataingestion_spark.interop.iceberg import (
        compact_manifests, mirror_iceberg,
    )
    from dataingestion_spark.sinks.manifest_store import (
        append_table, read_table,
    )

    tbl = _table(spark, tmp_path)
    dst = str(tmp_path / "ice_msplit")
    export_iceberg(spark, tbl, dst, partition_by=("doc_bucket",),
                   manifest_split=2)

    def manifests(v):
        meta = json.load(open(os.path.join(
            dst, "metadata", f"v{v}.metadata.json")))
        snap = {s["snapshot-id"]: s for s in meta["snapshots"]}[
            meta["current-snapshot-id"]]
        lrows = read_container(
            open(snap["manifest-list"][7:], "rb").read(), "l")[1]
        out = []
        for r in lrows:
            mp = r["manifest_path"][7:]
            out.append((r, read_container(
                open(mp, "rb").read(), mp)[1]))
        return out

    data_ms = [(r, es) for r, es in manifests(1)
               if r.get("content", 0) == 0]
    n_files = sum(len(es) for _, es in data_ms)
    assert n_files > 2                 # fixture really exceeds the cap
    assert len(data_ms) == -(-n_files // 2)
    assert all(len(es) <= 2 for _, es in data_ms)
    assert all(r["partitions"] for r, _ in data_ms)  # summaries kept
    want = {tuple(r) for r in read_table(spark, tbl)
            .select("documentid", "text", "lang", "n_chars").collect()}
    got = {tuple(r) for r in read_iceberg(spark, dst)
           .select("documentid", "text", "lang", "n_chars").collect()}
    assert got == want
    # summary pruning still skips whole (now smaller) manifests
    all_files = set(read_iceberg(spark, dst).inputFiles())
    pruned = set(read_iceberg(
        spark, dst, where=("doc_bucket", "==", 0)).inputFiles())
    assert pruned and len(pruned) < len(all_files)

    # mirror honors the cap for new manifests; carried ones stay small
    extra = _docs(spark).limit(10).select(
        (F.col("documentid").cast("long") + 7 * 10 ** 6).cast("string")
        .alias("documentid"), "text", "lang", "n_chars")
    append_table(extra, tbl)
    assert mirror_iceberg(spark, tbl, dst, manifest_split=2) == 2
    assert all(len(es) <= 2 for _, es in manifests(2))
    got2 = {tuple(r) for r in read_iceberg(spark, dst)
            .select("documentid", "text", "lang", "n_chars").collect()}
    assert got2 == {tuple(r) for r in read_table(spark, tbl)
                    .select("documentid", "text", "lang",
                            "n_chars").collect()}

    # compaction merges to ceil(n/cap) bounded manifests, not one
    v3 = compact_manifests(dst, manifest_split=4)
    data3 = [(r, es) for r, es in manifests(v3)
             if r.get("content", 0) == 0]
    total3 = sum(len(es) for _, es in data3)
    assert len(data3) == -(-total3 // 4) > 1
    assert all(len(es) <= 4 for _, es in data3)
    got3 = {tuple(r) for r in read_iceberg(spark, dst)
            .select("documentid", "text", "lang", "n_chars").collect()}
    assert got3 == got2
