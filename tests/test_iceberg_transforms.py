"""Partition-transform pruning on foreign Iceberg tables
(interop/iceberg.py): bucket[N]/truncate[W]/day evaluation per the
spec's "Partition Transforms" + Appendix B hash vectors. Correctness
was never affected (transformed tables always scanned everything);
these pin that `where=` now reads only the provable subset."""

import datetime
import json
import os
import struct

import pytest

from dataingestion_spark.interop.iceberg import (
    _manifest_entry_schema, _manifest_list_schema, _murmur3_32,
    read_iceberg,
)
from dataingestion_spark.sources.avro import write_container


def _signed(h):
    return h - (1 << 32) if h >= (1 << 31) else h


def test_murmur3_spec_vectors():
    """Iceberg spec Appendix B: the exact 32-bit hash requirements."""
    def long_hash(v):
        return _signed(_murmur3_32(int(v).to_bytes(8, "little",
                                                   signed=True)))

    assert long_hash(34) == 2017239379                  # int & long
    assert _signed(_murmur3_32(b"iceberg")) == 1210000089   # string
    assert _signed(_murmur3_32(bytes([0, 1, 2, 3]))) == -188683207
    days = (datetime.date(2017, 11, 16).toordinal()
            - datetime.date(1970, 1, 1).toordinal())
    assert long_hash(days) == -653330422                # date
    us = (days * 86400 + 22 * 3600 + 31 * 60 + 8) * 1_000_000
    assert long_hash(us) == -2047944441                 # timestamp


def _build(root, schema_fields, spec_fields, part_avro, files,
           manifests=None):
    """Minimal foreign Iceberg v2 table. ``files`` = list of
    (parquet_path, partition_dict) already written; ``manifests``
    groups file indices per manifest (default: one manifest) with
    optional per-manifest field summaries."""
    os.makedirs(os.path.join(root, "metadata"), exist_ok=True)

    def entry(path, part):
        return {"status": 1, "snapshot_id": 7, "sequence_number": 1,
                "file_sequence_number": 1,
                "data_file": {
                    "content": 0, "file_path": "file://" + path,
                    "file_format": "PARQUET", "partition": part,
                    "record_count": 1,
                    "file_size_in_bytes": os.path.getsize(path)}}

    if manifests is None:
        manifests = [(list(range(len(files))), None)]
    list_rows = []
    for mi, (idxs, summ) in enumerate(manifests):
        mpath = os.path.join(root, "metadata", f"m{mi}.avro")
        if idxs is not None:
            write_container(mpath, _manifest_entry_schema(part_avro),
                            [entry(*files[i]) for i in idxs])
            mlen = os.path.getsize(mpath)
        else:  # deliberately missing manifest — must be skipped
            mlen = 0
        row = {"manifest_path": "file://" + mpath,
               "manifest_length": mlen,
               "partition_spec_id": 0, "content": 0,
               "sequence_number": 1, "min_sequence_number": 1,
               "added_snapshot_id": 7, "added_files_count": len(idxs or []),
               "existing_files_count": 0, "deleted_files_count": 0,
               "added_rows_count": len(idxs or []),
               "existing_rows_count": 0, "deleted_rows_count": 0}
        if summ is not None:
            row["partitions"] = summ
        list_rows.append(row)
    lpath = os.path.join(root, "metadata", "snap-7-1-x.avro")
    write_container(lpath, _manifest_list_schema(), list_rows)
    meta = {"format-version": 2, "table-uuid": "x", "location": root,
            "last-sequence-number": 1, "last-updated-ms": 0,
            "last-column-id": len(schema_fields),
            "current-schema-id": 0,
            "schemas": [{"type": "struct", "schema-id": 0,
                         "fields": schema_fields}],
            "default-spec-id": 0,
            "partition-specs": [{"spec-id": 0, "fields": spec_fields}],
            "last-partition-id": 1000 + len(spec_fields),
            "default-sort-order-id": 0,
            "sort-orders": [{"order-id": 0, "fields": []}],
            "current-snapshot-id": 7,
            "snapshots": [{"snapshot-id": 7, "sequence-number": 1,
                           "timestamp-ms": 0, "schema-id": 0,
                           "manifest-list": "file://" + lpath,
                           "summary": {"operation": "append"}}],
            "snapshot-log": [], "metadata-log": []}
    json.dump(meta, open(os.path.join(root, "metadata",
                                      "v1.metadata.json"), "w"))
    open(os.path.join(root, "metadata", "version-hint.text"),
         "w").write("1")


SCHEMA_ID_V = [
    {"id": 1, "name": "id", "required": False, "type": "long"},
    {"id": 2, "name": "v", "required": False, "type": "long"}]
PART_INT = [{"name": "pb", "type": ["null", "int"], "default": None,
             "field-id": 1000}]


def _bucket4(v):
    return (_murmur3_32(int(v).to_bytes(8, "little", signed=True))
            & 0x7FFFFFFF) % 4


def test_bucket4_prunes_to_one_file(spark, tmp_path):
    import pyarrow as pa
    import pyarrow.parquet as pq

    root = str(tmp_path / "bkt")
    os.makedirs(os.path.join(root, "data"))
    by_bucket = {b: [] for b in range(4)}
    for i in range(40):
        by_bucket[_bucket4(i)].append(i)
    assert all(by_bucket.values())        # every bucket non-empty
    assert _bucket4(34) == 2017239379 % 4  # literal pin vs spec hash
    files = []
    for b, ids in sorted(by_bucket.items()):
        p = os.path.join(root, "data", f"b{b}.parquet")
        pq.write_table(pa.table({
            "id": pa.array(ids, pa.int64()),
            "v": pa.array([i * 10 for i in ids], pa.int64())}), p)
        files.append((p, {"pb": b}))
    spec = [{"name": "pb", "transform": "bucket[4]", "source-id": 1,
             "field-id": 1000}]
    _build(root, SCHEMA_ID_V, spec, PART_INT, files)

    assert len(set(read_iceberg(spark, root).inputFiles())) == 4
    got = read_iceberg(spark, root, where=("id", "==", 34))
    want_file = os.path.join(root, "data",
                             f"b{_bucket4(34)}.parquet")
    assert set(got.inputFiles()) == {"file://" + want_file}
    rows = got.filter("id = 34").collect()
    assert [(r["id"], r["v"]) for r in rows] == [(34, 340)]
    # ranges cannot prune through a hash transform → all files scan
    rng = read_iceberg(spark, root, where=("id", ">=", 34))
    assert len(set(rng.inputFiles())) == 4


def test_truncate10_prunes_ranges(spark, tmp_path):
    import pyarrow as pa
    import pyarrow.parquet as pq

    root = str(tmp_path / "trunc")
    os.makedirs(os.path.join(root, "data"))
    files = []
    for lo in (0, 10, 20):
        p = os.path.join(root, "data", f"t{lo}.parquet")
        ids = list(range(lo, lo + 10))
        pq.write_table(pa.table({
            "id": pa.array(ids, pa.int64()),
            "v": pa.array([i * 2 for i in ids], pa.int64())}), p)
        files.append((p, {"pb": lo}))
    spec = [{"name": "pb", "transform": "truncate[10]", "source-id": 1,
             "field-id": 1000}]
    part = [{"name": "pb", "type": ["null", "long"], "default": None,
             "field-id": 1000}]
    _build(root, SCHEMA_ID_V, spec, part, files)

    def scanned(where):
        return {os.path.basename(f) for f in
                read_iceberg(spark, root, where=where).inputFiles()}

    assert scanned(None) == {"t0.parquet", "t10.parquet",
                             "t20.parquet"}
    assert scanned(("id", "==", 13)) == {"t10.parquet"}
    assert scanned(("id", ">=", 25)) == {"t20.parquet"}
    assert scanned(("id", "<", 5)) == {"t0.parquet"}
    assert scanned(("id", "<=", 10)) == {"t0.parquet", "t10.parquet"}
    got = read_iceberg(spark, root, where=("id", "==", 13))
    assert got.filter("id = 13").collect()[0]["v"] == 26


def test_day_transform_and_manifest_summary_skip(spark, tmp_path):
    """Day-partitioned foreign table: file-level pruning on a date
    predicate AND manifest-list summary skipping — the second
    manifest is a deliberately MISSING file, so if summary skipping
    regressed the read would fail with FileNotFoundError."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    root = str(tmp_path / "daily")
    os.makedirs(os.path.join(root, "data"))
    d0 = datetime.date(2024, 3, 1)
    epoch = datetime.date(1970, 1, 1).toordinal()
    files = []
    for k in range(3):
        d = datetime.date.fromordinal(d0.toordinal() + k)
        p = os.path.join(root, "data", f"d{k}.parquet")
        pq.write_table(pa.table({
            "d": pa.array([d], pa.date32()),
            "v": pa.array([k], pa.int64())}), p)
        files.append((p, {"pd": d}))
    schema = [
        {"id": 1, "name": "d", "required": False, "type": "date"},
        {"id": 2, "name": "v", "required": False, "type": "long"}]
    spec = [{"name": "pd", "transform": "day", "source-id": 1,
             "field-id": 1000}]
    part = [{"name": "pd",
             "type": ["null", {"type": "int", "logicalType": "date"}],
             "default": None, "field-id": 1000}]

    def day_bounds(lo_k, hi_k):
        return [{"contains_null": False, "contains_nan": None,
                 "lower_bound": struct.pack(
                     "<i", d0.toordinal() - epoch + lo_k),
                 "upper_bound": struct.pack(
                     "<i", d0.toordinal() - epoch + hi_k)}]

    # manifest 0: days 0-2 (real); manifest 1: days 10-12, MISSING
    # file — only reachable if summary skipping fails
    _build(root, schema, spec, part, files,
           manifests=[(list(range(3)), day_bounds(0, 2)),
                      (None, day_bounds(10, 12))])

    got = read_iceberg(spark, root, where=("d", "==", d0))
    assert {os.path.basename(f) for f in got.inputFiles()} == \
        {"d0.parquet"}
    assert got.collect()[0]["v"] == 0
    lt = read_iceberg(
        spark, root,
        where=("d", "<=", datetime.date(2024, 3, 2)))
    assert {os.path.basename(f) for f in lt.inputFiles()} == \
        {"d0.parquet", "d1.parquet"}
    # a predicate inside the missing manifest's day range DOES fail —
    # proof the skip above was the summary, not an accident
    with pytest.raises(Exception):
        read_iceberg(spark, root,
                     where=("d", "==", datetime.date(2024, 3, 11)))


def test_month_year_hour_transform_values():
    """Unit pins for the remaining time transforms (epoch-relative
    ints per spec): month/year on dates and datetimes, hour on
    timestamps, including pre-epoch values."""
    import pandas as pd

    from pyspark.sql import types as T

    from dataingestion_spark.interop.iceberg import (
        _transform_predicate_value as tv,
    )

    d = datetime.date(2017, 11, 16)
    assert tv("month", None, d, T.DateType()) == (2017 - 1970) * 12 + 10
    assert tv("year", None, d, T.DateType()) == 47
    assert tv("month", None, datetime.date(1969, 12, 31),
              T.DateType()) == -1
    assert tv("year", None, datetime.date(1969, 1, 1),
              T.DateType()) == -1
    ts = pd.Timestamp("2017-11-16 22:31:08")
    assert tv("hour", None, ts, T.TimestampType()) == \
        ts.value // 1000 // 3_600_000_000
    assert tv("day", None, ts, T.TimestampType()) == \
        (d.toordinal() - datetime.date(1970, 1, 1).toordinal())
    # bucket on strings matches the spec hash
    assert tv("bucket", 16, "iceberg", T.StringType()) == \
        1210000089 % 16


def test_month_partition_prunes(spark, tmp_path):
    import pyarrow as pa
    import pyarrow.parquet as pq

    root = str(tmp_path / "monthly")
    os.makedirs(os.path.join(root, "data"))
    files = []
    for k, (y, m) in enumerate([(2024, 1), (2024, 2), (2024, 3)]):
        d = datetime.date(y, m, 15)
        p = os.path.join(root, "data", f"m{k}.parquet")
        pq.write_table(pa.table({
            "d": pa.array([d], pa.date32()),
            "v": pa.array([k], pa.int64())}), p)
        files.append((p, {"pm": (y - 1970) * 12 + (m - 1)}))
    schema = [
        {"id": 1, "name": "d", "required": False, "type": "date"},
        {"id": 2, "name": "v", "required": False, "type": "long"}]
    spec = [{"name": "pm", "transform": "month", "source-id": 1,
             "field-id": 1000}]
    part = [{"name": "pm", "type": ["null", "int"], "default": None,
             "field-id": 1000}]
    _build(root, schema, spec, part, files)

    got = read_iceberg(spark, root,
                       where=("d", "==", datetime.date(2024, 2, 15)))
    assert {os.path.basename(f) for f in got.inputFiles()} == \
        {"m1.parquet"}
    ge = read_iceberg(spark, root,
                      where=("d", ">=", datetime.date(2024, 2, 1)))
    assert {os.path.basename(f) for f in ge.inputFiles()} == \
        {"m1.parquet", "m2.parquet"}


def test_compound_where_conjunction(spark, tmp_path):
    """where= accepts a LIST of predicates (ANDed): each prunes
    independently, so a range pair isolates the middle truncate
    bucket, and adding an unrelated column's predicate never widens
    the scan."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    root = str(tmp_path / "conj")
    os.makedirs(os.path.join(root, "data"))
    files = []
    for lo in (0, 10, 20):
        p = os.path.join(root, "data", f"t{lo}.parquet")
        ids = list(range(lo, lo + 10))
        pq.write_table(pa.table({
            "id": pa.array(ids, pa.int64()),
            "v": pa.array([i * 2 for i in ids], pa.int64())}), p)
        files.append((p, {"pb": lo}))
    spec = [{"name": "pb", "transform": "truncate[10]", "source-id": 1,
             "field-id": 1000}]
    part = [{"name": "pb", "type": ["null", "long"], "default": None,
             "field-id": 1000}]
    _build(root, SCHEMA_ID_V, spec, part, files)

    def scanned(where):
        return {os.path.basename(f) for f in
                read_iceberg(spark, root, where=where).inputFiles()}

    assert scanned([("id", ">=", 12), ("id", "<", 18)]) == \
        {"t10.parquet"}
    assert scanned([("id", ">=", 5), ("id", "<=", 25)]) == \
        {"t0.parquet", "t10.parquet", "t20.parquet"}
    # unprunable second predicate (no bounds for v) changes nothing
    assert scanned([("id", "==", 13), ("v", "==", 26)]) == \
        {"t10.parquet"}
    got = read_iceberg(spark, root,
                       where=[("id", ">=", 12), ("id", "<", 18)])
    assert got.filter("id = 13").collect()[0]["v"] == 26
    with pytest.raises(ValueError, match="where column"):
        read_iceberg(spark, root, where=[("id", "==", 1),
                                         ("nope", "==", 1)])


def test_renamed_column_resolves_by_field_id(spark, tmp_path):
    """A foreign table whose current schema RENAMED a column after
    data was written: files carry the old name + PARQUET:field_id
    metadata; the reader must resolve by id — including the
    rename-then-append table holding BOTH spellings across files."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    root = str(tmp_path / "renamed")
    os.makedirs(os.path.join(root, "data"))

    def write(path, name_for_2, ids, vals):
        f1 = pa.field("id", pa.int64(),
                      metadata={b"PARQUET:field_id": b"1"})
        f2 = pa.field(name_for_2, pa.int64(),
                      metadata={b"PARQUET:field_id": b"2"})
        pq.write_table(pa.table(
            {"id": pa.array(ids, pa.int64()),
             name_for_2: pa.array(vals, pa.int64())},
            schema=pa.schema([f1, f2])), path)

    p_old = os.path.join(root, "data", "old.parquet")
    p_new = os.path.join(root, "data", "new.parquet")
    write(p_old, "v", [1, 2], [10, 20])          # pre-rename file
    write(p_new, "v_renamed", [3, 4], [30, 40])  # post-rename file
    schema = [
        {"id": 1, "name": "id", "required": False, "type": "long"},
        {"id": 2, "name": "v_renamed", "required": False,
         "type": "long"}]
    _build(root, schema, [], [], [(p_old, {}), (p_new, {})])

    got = {(r["id"], r["v_renamed"]) for r in
           read_iceberg(spark, root).collect()}
    assert got == {(1, 10), (2, 20), (3, 30), (4, 40)}

    # old-name-only table (never appended post-rename) works too
    root2 = str(tmp_path / "renamed2")
    os.makedirs(os.path.join(root2, "data"))
    q = os.path.join(root2, "data", "only.parquet")
    write(q, "v", [7], [70])
    _build(root2, schema, [], [], [(q, {})])
    got2 = {(r["id"], r["v_renamed"]) for r in
            read_iceberg(spark, root2).collect()}
    assert got2 == {(7, 70)}


def test_rename_resolved_from_schema_history(spark, tmp_path):
    """When the metadata retains the pre-rename schema (the spec's
    normal state), rename resolution is metadata-only and works even
    when the FIRST manifest-listed file already uses the new spelling
    (the footer-probe fallback alone cannot see that case)."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    root = str(tmp_path / "hist")
    os.makedirs(os.path.join(root, "data"))

    def write(path, name2, ids, vals):
        pq.write_table(pa.table(
            {"id": pa.array(ids, pa.int64()),
             name2: pa.array(vals, pa.int64())}), path)

    p_new = os.path.join(root, "data", "a_new.parquet")
    p_old = os.path.join(root, "data", "b_old.parquet")
    write(p_new, "v_renamed", [3, 4], [30, 40])  # listed FIRST
    write(p_old, "v", [1, 2], [10, 20])
    schema = [
        {"id": 1, "name": "id", "required": False, "type": "long"},
        {"id": 2, "name": "v_renamed", "required": False,
         "type": "long"}]
    _build(root, schema, [], [], [(p_new, {}), (p_old, {})])
    # graft the pre-rename schema into history (schema-id 0)
    mp = os.path.join(root, "metadata", "v1.metadata.json")
    meta = json.load(open(mp))
    old_schema = {"type": "struct", "schema-id": 0, "fields": [
        {"id": 1, "name": "id", "required": False, "type": "long"},
        {"id": 2, "name": "v", "required": False, "type": "long"}]}
    cur = dict(meta["schemas"][0], **{"schema-id": 1})
    meta["schemas"] = [old_schema, cur]
    meta["current-schema-id"] = 1
    meta["snapshots"][0]["schema-id"] = 1
    json.dump(meta, open(mp, "w"))

    got = {(r["id"], r["v_renamed"]) for r in
           read_iceberg(spark, root).collect()}
    assert got == {(1, 10), (2, 20), (3, 30), (4, 40)}


def test_equality_deletes_across_rename(spark, tmp_path):
    """Equality delete files written PRE-rename (old column spelling)
    still kill rows after the schema renamed the column — resolved
    via the same historical-spellings coalesce as the data scan."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from dataingestion_spark.interop.iceberg import (
        _manifest_entry_schema as _mes,
    )
    from dataingestion_spark.sources.avro import (
        write_container as _wc,
    )

    root = str(tmp_path / "eqren")
    os.makedirs(os.path.join(root, "data"))
    dpath = os.path.join(root, "data", "d0.parquet")
    pq.write_table(pa.table({
        "documentid": pa.array(["a", "b", "c"], pa.string()),
        "v": pa.array([1, 2, 3], pa.int64())}), dpath)   # OLD name "v"
    epath = os.path.join(root, "data", "ed0.parquet")
    pq.write_table(pa.table({"v": pa.array([2], pa.int64())}), epath)

    def entry(path, content, seq, nrec, eq_ids=None):
        return {"status": 1, "snapshot_id": 9, "sequence_number": seq,
                "file_sequence_number": seq,
                "data_file": {
                    "content": content, "file_path": "file://" + path,
                    "file_format": "PARQUET", "partition": {},
                    "record_count": nrec,
                    "file_size_in_bytes": os.path.getsize(path),
                    "equality_ids": eq_ids}}

    os.makedirs(os.path.join(root, "metadata"), exist_ok=True)
    m0 = os.path.join(root, "metadata", "m0.avro")
    m1 = os.path.join(root, "metadata", "m1.avro")
    _wc(m0, _mes(), [entry(dpath, 0, 1, 3)])
    _wc(m1, _mes(), [entry(epath, 2, 2, 1, eq_ids=[2])])
    lpath = os.path.join(root, "metadata", "snap-9-2-x.avro")
    from dataingestion_spark.interop.iceberg import (
        _manifest_list_schema as _mls,
    )
    def _mrow(mp, content, seq):
        return {"manifest_path": "file://" + mp,
                "manifest_length": os.path.getsize(mp),
                "partition_spec_id": 0, "content": content,
                "sequence_number": seq, "min_sequence_number": 1,
                "added_snapshot_id": 9, "added_files_count": 1,
                "existing_files_count": 0, "deleted_files_count": 0,
                "added_rows_count": 1, "existing_rows_count": 0,
                "deleted_rows_count": 0}
    _wc(lpath, _mls(), [_mrow(m0, 0, 1), _mrow(m1, 1, 2)])
    old_schema = {"type": "struct", "schema-id": 0, "fields": [
        {"id": 1, "name": "documentid", "required": False,
         "type": "string"},
        {"id": 2, "name": "v", "required": False, "type": "long"}]}
    cur_schema = {"type": "struct", "schema-id": 1, "fields": [
        {"id": 1, "name": "documentid", "required": False,
         "type": "string"},
        {"id": 2, "name": "value", "required": False, "type": "long"}]}
    meta = {"format-version": 2, "table-uuid": "x", "location": root,
            "last-sequence-number": 2, "last-updated-ms": 0,
            "last-column-id": 2, "current-schema-id": 1,
            "schemas": [old_schema, cur_schema],
            "default-spec-id": 0,
            "partition-specs": [{"spec-id": 0, "fields": []}],
            "last-partition-id": 999, "default-sort-order-id": 0,
            "sort-orders": [{"order-id": 0, "fields": []}],
            "current-snapshot-id": 9,
            "snapshots": [{"snapshot-id": 9, "sequence-number": 2,
                           "timestamp-ms": 0, "schema-id": 1,
                           "manifest-list": "file://" + lpath,
                           "summary": {"operation": "overwrite"}}],
            "snapshot-log": [], "metadata-log": []}
    json.dump(meta, open(os.path.join(root, "metadata",
                                      "v1.metadata.json"), "w"))
    open(os.path.join(root, "metadata", "version-hint.text"),
         "w").write("1")

    got = {(r["documentid"], r["value"]) for r in
           read_iceberg(spark, root).collect()}
    assert got == {("a", 1), ("c", 3)}  # value==2 deleted, rename ok


def test_format_version1_foreign_table_reads(spark, tmp_path):
    """Iceberg format-version 1: singular ``schema`` key, ``partition-
    spec`` field list, v1 manifests without sequence numbers — the
    common legacy layout. Reader must answer (sequence numbers default
    to manifest inheritance = 0)."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from dataingestion_spark.interop.iceberg import (
        _manifest_entry_schema as _mes, _manifest_list_schema as _mls,
    )
    from dataingestion_spark.sources.avro import write_container as _wc

    root = str(tmp_path / "v1tbl")
    os.makedirs(os.path.join(root, "data"))
    os.makedirs(os.path.join(root, "metadata"))
    dpath = os.path.join(root, "data", "d0.parquet")
    pq.write_table(pa.table({
        "documentid": pa.array(["a", "b"], pa.string()),
        "n": pa.array([1, 2], pa.int64())}), dpath)
    m0 = os.path.join(root, "metadata", "m0.avro")
    # v1 entries omit sequence/file_sequence numbers (schema defaults)
    _wc(m0, _mes(), [{
        "status": 1, "snapshot_id": 5,
        "data_file": {
            "content": 0, "file_path": "file://" + dpath,
            "file_format": "PARQUET", "partition": {},
            "record_count": 2,
            "file_size_in_bytes": os.path.getsize(dpath)}}])
    lpath = os.path.join(root, "metadata", "snap-5-1-x.avro")
    _wc(lpath, _mls(), [{
        "manifest_path": "file://" + m0,
        "manifest_length": os.path.getsize(m0),
        "partition_spec_id": 0, "content": 0, "sequence_number": 0,
        "min_sequence_number": 0, "added_snapshot_id": 5,
        "added_files_count": 1, "existing_files_count": 0,
        "deleted_files_count": 0, "added_rows_count": 2,
        "existing_rows_count": 0, "deleted_rows_count": 0}])
    meta = {"format-version": 1, "table-uuid": "x", "location": root,
            "last-updated-ms": 0, "last-column-id": 2,
            "schema": {"type": "struct", "fields": [
                {"id": 1, "name": "documentid", "required": False,
                 "type": "string"},
                {"id": 2, "name": "n", "required": False,
                 "type": "long"}]},
            "partition-spec": [],
            "current-snapshot-id": 5,
            "snapshots": [{"snapshot-id": 5, "timestamp-ms": 0,
                           "manifest-list": "file://" + lpath,
                           "summary": {"operation": "append"}}],
            "snapshot-log": [], "metadata-log": []}
    json.dump(meta, open(os.path.join(root, "metadata",
                                      "v1.metadata.json"), "w"))
    open(os.path.join(root, "metadata", "version-hint.text"),
         "w").write("1")

    got = {tuple(r) for r in read_iceberg(spark, root)
           .select("documentid", "n").collect()}
    assert got == {("a", 1), ("b", 2)}


def test_name_swap_history_refused(spark, tmp_path):
    """A rename history where one field's OLD spelling equals another
    field's CURRENT name (a → b while c → a) is unresolvable by name
    when old-spelling files exist — must refuse loudly, never surface
    the wrong field's values."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    root = str(tmp_path / "swap")
    os.makedirs(os.path.join(root, "data"))
    # pre-rename file: column "a" is fid 2's data
    p_old = os.path.join(root, "data", "old.parquet")
    pq.write_table(pa.table({
        "id": pa.array([1], pa.int64()),
        "a": pa.array([111], pa.int64())}), p_old)
    schema_old = {"type": "struct", "schema-id": 0, "fields": [
        {"id": 1, "name": "id", "required": False, "type": "long"},
        {"id": 2, "name": "a", "required": False, "type": "long"}]}
    # current: fid 2 renamed to "b"; a NEW fid 3 took the name "a"
    schema_cur = {"type": "struct", "schema-id": 1, "fields": [
        {"id": 1, "name": "id", "required": False, "type": "long"},
        {"id": 2, "name": "b", "required": False, "type": "long"},
        {"id": 3, "name": "a", "required": False, "type": "long"}]}
    _build(root, schema_cur["fields"], [], [], [(p_old, {})])
    mp = os.path.join(root, "metadata", "v1.metadata.json")
    meta = json.load(open(mp))
    meta["schemas"] = [schema_old, schema_cur]
    meta["current-schema-id"] = 1
    meta["snapshots"][0]["schema-id"] = 1
    meta["last-column-id"] = 3
    json.dump(meta, open(mp, "w"))

    with pytest.raises(Exception, match="name-swap|historical spelling"):
        read_iceberg(spark, root).collect()
