"""Delta Lake protocol interop (interop/delta.py).

Round-trips manifest tables through export_delta/read_delta and pins the
reader against hand-built Delta logs: multi-commit replay with removes,
partition-column restoration, checkpoint resume, and loud rejection of
reader features (deletion vectors, column mapping) this reader does not
implement.
"""

import json
import os

import pytest
from pyspark.sql import functions as F

from dataingestion_spark.interop.delta import export_delta, read_delta
from dataingestion_spark.sinks import manifest_store as ms


def _mk(spark, a, b):
    return spark.range(a, b).select(
        F.col("id").cast("string").alias("documentid"),
        (F.col("id") * 2).alias("v"),
        F.concat(F.lit("w"), F.col("id")).alias("w"),
    )


def _assert_same(a, b):
    assert a.exceptAll(b).count() == 0
    assert b.exceptAll(a).count() == 0


@pytest.mark.parametrize("mode", ["copy", "shallow"])
def test_export_roundtrip(spark, tmp_path, mode):
    table, dst = str(tmp_path / "t"), str(tmp_path / f"delta_{mode}")
    ms.write_table(_mk(spark, 0, 60), table)
    ms.append_table(_mk(spark, 60, 90), table)
    export_delta(spark, table, dst, mode=mode)
    got = read_delta(spark, dst)
    want = ms.read_table(spark, table)
    _assert_same(got.select("documentid", "v", "w"),
                 want.select("documentid", "v", "w"))
    # the log carries per-file stats a Delta reader can skip on
    log0 = open(os.path.join(dst, "_delta_log",
                             "0" * 20 + ".json")).read().splitlines()
    adds = [json.loads(x)["add"] for x in log0 if '"add"' in x]
    assert adds and all("stats" in a for a in adds)
    assert all(json.loads(a["stats"])["numRecords"] > 0 for a in adds)


def test_export_materializes_dvs(spark, tmp_path):
    table, dst = str(tmp_path / "t"), str(tmp_path / "delta")
    ms.write_table(_mk(spark, 0, 50), table)
    ms.delete_documents(spark, table, [str(i) for i in range(0, 50, 5)])
    with pytest.raises(ValueError, match="deletion vectors"):
        export_delta(spark, table, dst, apply_deletes=False)
    export_delta(spark, table, dst)  # compacts DV buckets, then exports
    got = read_delta(spark, dst)
    assert got.count() == 40
    assert not any(r.documentid == "10" for r in got.collect())


def test_export_refuses_overwrite(spark, tmp_path):
    table, dst = str(tmp_path / "t"), str(tmp_path / "delta")
    ms.write_table(_mk(spark, 0, 5), table)
    export_delta(spark, table, dst)
    with pytest.raises(FileExistsError):
        export_delta(spark, table, dst)


def _write_delta_commit(log_dir, version, actions):
    os.makedirs(log_dir, exist_ok=True)
    with open(os.path.join(log_dir, f"{version:020d}.json"), "w") as f:
        for a in actions:
            f.write(json.dumps(a) + "\n")


def _meta_action(schema_json, part_cols=()):
    return {"metaData": {"id": "m", "format": {"provider": "parquet",
                                               "options": {}},
                         "schemaString": json.dumps(schema_json),
                         "partitionColumns": list(part_cols),
                         "configuration": {}}}


_SCHEMA = {"type": "struct", "fields": [
    {"name": "k", "type": "string", "nullable": True, "metadata": {}},
    {"name": "n", "type": "long", "nullable": True, "metadata": {}},
    {"name": "day", "type": "integer", "nullable": True, "metadata": {}},
]}


def _write_part(spark, path, rows):
    import pyarrow as pa
    import pyarrow.parquet as pq

    pq.write_table(pa.table({"k": [r[0] for r in rows],
                             "n": pa.array([r[1] for r in rows],
                                           type=pa.int64())}), path)


def test_read_foreign_log_replay_and_partitions(spark, tmp_path):
    """Multi-commit log with partitionValues and a remove action."""
    root = str(tmp_path / "ext")
    log = os.path.join(root, "_delta_log")
    os.makedirs(root, exist_ok=True)
    _write_part(spark, os.path.join(root, "a.parquet"), [("x", 1), ("y", 2)])
    _write_part(spark, os.path.join(root, "b.parquet"), [("z", 3)])
    _write_part(spark, os.path.join(root, "c.parquet"), [("q", 4)])
    _write_delta_commit(log, 0, [
        {"protocol": {"minReaderVersion": 1, "minWriterVersion": 2}},
        _meta_action(_SCHEMA, part_cols=["day"]),
        {"add": {"path": "a.parquet", "partitionValues": {"day": "7"},
                 "size": 1, "modificationTime": 0, "dataChange": True}},
        {"add": {"path": "b.parquet", "partitionValues": {"day": "8"},
                 "size": 1, "modificationTime": 0, "dataChange": True}},
    ])
    _write_delta_commit(log, 1, [
        {"remove": {"path": "b.parquet", "dataChange": True}},
        {"add": {"path": "c.parquet", "partitionValues": {"day": None},
                 "size": 1, "modificationTime": 0, "dataChange": True}},
    ])
    got = read_delta(spark, root)
    assert [f.name for f in got.schema.fields] == ["k", "n", "day"]
    rows = {(r.k, r.n, r.day) for r in got.collect()}
    assert rows == {("x", 1, 7), ("y", 2, 7), ("q", 4, None)}
    assert dict(got.dtypes)["day"] == "int"  # typed, not the log's string


def test_read_resumes_from_checkpoint(spark, tmp_path):
    """_last_checkpoint + a later JSON commit; pre-checkpoint commits may
    be vacuumed away and must not be required."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    root = str(tmp_path / "cp")
    log = os.path.join(root, "_delta_log")
    os.makedirs(log, exist_ok=True)
    _write_part(spark, os.path.join(root, "a.parquet"), [("x", 1)])
    _write_part(spark, os.path.join(root, "b.parquet"), [("y", 2)])
    schema2 = {"type": "struct", "fields": _SCHEMA["fields"][:2]}
    # checkpoint at version 5 holds state: metaData + protocol + one add
    cp = pa.table({
        "protocol": [{"minReaderVersion": 1, "minWriterVersion": 2}, None],
        "metaData": [{"id": "m", "schemaString": json.dumps(schema2),
                      "partitionColumns": []}, None],
        "add": [None, {"path": "a.parquet",
                       "size": 1, "modificationTime": 0}],
    })
    pq.write_table(cp, os.path.join(log, f"{5:020d}.checkpoint.parquet"))
    with open(os.path.join(log, "_last_checkpoint"), "w") as f:
        json.dump({"version": 5, "size": 2}, f)
    _write_delta_commit(log, 6, [
        {"add": {"path": "b.parquet", "partitionValues": {},
                 "size": 1, "modificationTime": 0, "dataChange": True}},
    ])
    got = read_delta(spark, root)
    assert {(r.k, r.n) for r in got.collect()} == {("x", 1), ("y", 2)}


def test_reader_rejects_unsupported_features(spark, tmp_path):
    root = str(tmp_path / "dv")
    log = os.path.join(root, "_delta_log")
    os.makedirs(root, exist_ok=True)
    _write_part(spark, os.path.join(root, "a.parquet"), [("x", 1)])
    _write_delta_commit(log, 0, [
        {"protocol": {"minReaderVersion": 3, "minWriterVersion": 7,
                      "readerFeatures": ["deletionVectors"]}},
        _meta_action({"type": "struct", "fields": _SCHEMA["fields"][:2]}),
        {"add": {"path": "a.parquet", "partitionValues": {}, "size": 1,
                 "modificationTime": 0, "dataChange": True}},
    ])
    with pytest.raises(NotImplementedError, match="deletionVectors"):
        read_delta(spark, root)


def test_read_column_mapping_by_name(spark, tmp_path):
    """columnMapping.mode=name: files store physical col-… names (and
    partitionValues are keyed by them); the reader scans physically and
    returns the LOGICAL schema."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    root = str(tmp_path / "cmn")
    log = os.path.join(root, "_delta_log")
    os.makedirs(root, exist_ok=True)
    pq.write_table(
        pa.table({"col-aaa": ["x", "y"],
                  "col-bbb": pa.array([1, 2], type=pa.int64())}),
        os.path.join(root, "a.parquet"))
    schema = {"type": "struct", "fields": [
        {"name": "k", "type": "string", "nullable": True,
         "metadata": {"delta.columnMapping.id": 1,
                      "delta.columnMapping.physicalName": "col-aaa"}},
        {"name": "n", "type": "long", "nullable": True,
         "metadata": {"delta.columnMapping.id": 2,
                      "delta.columnMapping.physicalName": "col-bbb"}},
        {"name": "day", "type": "integer", "nullable": True,
         "metadata": {"delta.columnMapping.id": 3,
                      "delta.columnMapping.physicalName": "col-ddd"}},
    ]}
    meta = _meta_action(schema, part_cols=["day"])
    meta["metaData"]["configuration"] = {"delta.columnMapping.mode": "name"}
    _write_delta_commit(log, 0, [
        {"protocol": {"minReaderVersion": 2, "minWriterVersion": 5}},
        meta,
        {"add": {"path": "a.parquet",
                 "partitionValues": {"col-ddd": "9"},
                 "size": 1, "modificationTime": 0, "dataChange": True}},
    ])
    got = read_delta(spark, root)
    assert [f.name for f in got.schema.fields] == ["k", "n", "day"]
    assert {(r.k, r.n, r.day) for r in got.collect()} == {("x", 1, 9),
                                                          ("y", 2, 9)}


def test_reader_rejects_id_mapping(spark, tmp_path):
    root = str(tmp_path / "cmi")
    log = os.path.join(root, "_delta_log")
    os.makedirs(root, exist_ok=True)
    meta = _meta_action({"type": "struct", "fields": _SCHEMA["fields"][:2]})
    meta["metaData"]["configuration"] = {"delta.columnMapping.mode": "id"}
    _write_delta_commit(log, 0, [
        {"protocol": {"minReaderVersion": 2, "minWriterVersion": 5}},
        meta,
    ])
    with pytest.raises(NotImplementedError, match="only 'none' and 'name'"):
        read_delta(spark, root)


def test_mirror_incremental_sync(spark, tmp_path):
    """mirror_delta keeps an export current in O(changed files): first
    call = full export; appends mirror as add-only commits; deletes
    (materialized by compaction) mirror as remove+add of the affected
    buckets; a no-change sync writes nothing."""
    from dataingestion_spark.interop.delta import mirror_delta

    table, dst = str(tmp_path / "t"), str(tmp_path / "mirror")
    ms.write_table(_mk(spark, 0, 60), table)
    v0 = mirror_delta(spark, table, dst)
    assert v0 == 0
    _assert_same(read_delta(spark, dst).select("documentid", "v"),
                 ms.read_table(spark, table).select("documentid", "v"))

    ms.append_table(_mk(spark, 60, 100), table)
    v1 = mirror_delta(spark, table, dst)
    assert v1 == 1
    assert read_delta(spark, dst).count() == 100
    # the append commit contains only adds (no removes)
    log1 = open(os.path.join(dst, "_delta_log",
                             f"{1:020d}.json")).read()
    assert '"remove"' not in log1 and '"add"' in log1

    ms.delete_documents(spark, table, [str(i) for i in range(0, 100, 10)])
    v2 = mirror_delta(spark, table, dst)  # materializes DVs, then diffs
    assert v2 == 2
    got = read_delta(spark, dst)
    assert got.count() == 90
    assert not any(r.documentid == "30" for r in got.collect())
    log2 = open(os.path.join(dst, "_delta_log",
                             f"{2:020d}.json")).read()
    assert '"remove"' in log2  # DV buckets rewrote -> remove+add

    # idempotent: nothing changed, no commit written
    assert mirror_delta(spark, table, dst) == 2
    assert not os.path.exists(
        os.path.join(dst, "_delta_log", f"{3:020d}.json"))

    # schema widening re-emits metaData
    ms.append_table(
        _mk(spark, 100, 110).withColumn("extra", F.lit(7)), table)
    v3 = mirror_delta(spark, table, dst)
    assert v3 == 3
    out = read_delta(spark, dst)
    assert "extra" in out.columns and out.count() == 100
    assert out.filter(F.col("extra") == 7).count() == 10


def test_replay_matches_model_random_logs(spark, tmp_path):
    """Model-based replay check: random add/remove action sequences over
    many commits (with an occasional checkpoint) must reconstruct
    exactly the model's live file set and latest schema."""
    import random

    from dataingestion_spark.interop.delta import _delta_state

    rng = random.Random(20260815)
    for trial in range(8):
        root = str(tmp_path / f"m{trial}")
        log = os.path.join(root, "_delta_log")
        os.makedirs(log, exist_ok=True)
        model = {}  # path -> add dict
        schema_rev = [0]
        n_commits = rng.randint(1, 9)
        cp_at = rng.choice([None] + list(range(n_commits)))
        for v in range(n_commits):
            actions = []
            if v == 0 or rng.random() < 0.2:
                schema_rev[0] += 1
                sch = {"type": "struct", "fields": _SCHEMA["fields"][:2]
                       + [{"name": f"c{schema_rev[0]}", "type": "long",
                           "nullable": True, "metadata": {}}]}
                if v == 0:
                    actions.append({"protocol": {"minReaderVersion": 1,
                                                 "minWriterVersion": 2}})
                actions.append(_meta_action(sch))
            for _ in range(rng.randint(0, 4)):
                p = f"f{rng.randint(0, 14)}.parquet"
                if p in model and rng.random() < 0.5:
                    actions.append({"remove": {"path": p,
                                               "dataChange": True}})
                    model.pop(p)
                else:
                    add = {"path": p, "partitionValues": {}, "size": 1,
                           "modificationTime": v, "dataChange": True}
                    actions.append({"add": add})
                    model[p] = add
            _write_delta_commit(log, v, actions)
            if cp_at == v:
                # checkpoint = the state as of this commit
                import pyarrow as pa
                import pyarrow.parquet as pq

                rows_meta, rows_add = [], []
                sch_now = {"type": "struct",
                           "fields": _SCHEMA["fields"][:2]
                           + [{"name": f"c{schema_rev[0]}", "type": "long",
                               "nullable": True, "metadata": {}}]}
                rows_meta.append({"id": "m",
                                  "schemaString": json.dumps(sch_now),
                                  "partitionColumns": []})
                for a in model.values():
                    rows_add.append({"path": a["path"], "size": 1,
                                     "modificationTime": 0})
                n = max(len(rows_add), 1)
                cp = pa.table({
                    "protocol": [{"minReaderVersion": 1,
                                  "minWriterVersion": 2}] + [None] * (n - 1)
                    if n > 0 else [],
                    "metaData": [rows_meta[0]] + [None] * (n - 1),
                    "add": (rows_add + [None] * (n - len(rows_add)))
                    if rows_add else [None] * n,
                })
                pq.write_table(
                    cp, os.path.join(log, f"{v:020d}.checkpoint.parquet"))
                with open(os.path.join(log, "_last_checkpoint"), "w") as f:
                    json.dump({"version": v, "size": n}, f)
                # pre-checkpoint commits may be vacuumed
                if rng.random() < 0.5:
                    for old in range(v):
                        p = os.path.join(log, f"{old:020d}.json")
                        if os.path.exists(p):
                            os.remove(p)
        adds, state = _delta_state(root)
        assert set(adds) == set(model), (trial, sorted(adds), sorted(model))
        got_schema = json.loads(state["metaData"]["schemaString"])
        assert got_schema["fields"][-1]["name"] == f"c{schema_rev[0]}"
        assert state["lastDeltaVersion"] == n_commits - 1


def test_read_delta_where_skips_files(spark, tmp_path):
    """where= prunes files by add.stats bounds before any parquet IO
    (proved by pointing a pruned add at a nonexistent file), prunes
    partitions by partitionValues, and still returns EXACT rows."""
    root = str(tmp_path / "skip")
    log = os.path.join(root, "_delta_log")
    os.makedirs(root, exist_ok=True)
    _write_part(spark, os.path.join(root, "lo.parquet"), [("a", 1), ("b", 5)])
    # hi.parquet does NOT exist on disk: if pruning failed, the scan
    # would error loudly instead of skipping it
    _write_delta_commit(log, 0, [
        {"protocol": {"minReaderVersion": 1, "minWriterVersion": 2}},
        _meta_action(_SCHEMA, part_cols=["day"]),
        {"add": {"path": "lo.parquet", "partitionValues": {"day": "1"},
                 "size": 1, "modificationTime": 0, "dataChange": True,
                 "stats": json.dumps({"numRecords": 2,
                                      "minValues": {"n": 1},
                                      "maxValues": {"n": 5}})}},
        {"add": {"path": "hi.parquet", "partitionValues": {"day": "1"},
                 "size": 1, "modificationTime": 0, "dataChange": True,
                 "stats": json.dumps({"numRecords": 2,
                                      "minValues": {"n": 100},
                                      "maxValues": {"n": 200}})}},
        {"add": {"path": "other_day.parquet", "partitionValues": {"day": "9"},
                 "size": 1, "modificationTime": 0, "dataChange": True}},
    ])
    got = read_delta(spark, root, where=[("n", "<", 10), ("day", "=", 1)])
    rows = {(r.k, r.n, r.day) for r in got.collect()}
    assert rows == {("a", 1, 1), ("b", 5, 1)}
    # row-exactness on top of file pruning: a tighter predicate cuts
    # rows WITHIN the surviving file too
    got2 = read_delta(spark, root, where=[("n", "<", 3), ("day", "=", 1)])
    assert {(r.k, r.n) for r in got2.collect()} == {("a", 1)}


def test_vacuum_delta_removes_old_unreferenced(spark, tmp_path):
    """vacuum: files removed by mirror commits and outside the retention
    window are deleted; live files and recent removes survive; dry_run
    only lists."""
    from dataingestion_spark.interop.delta import mirror_delta, vacuum_delta

    table, dst = str(tmp_path / "t"), str(tmp_path / "mirror")
    ms.write_table(_mk(spark, 0, 40), table)
    mirror_delta(spark, table, dst)
    ms.delete_documents(spark, table, [str(i) for i in range(0, 40, 4)])
    mirror_delta(spark, table, dst)  # compaction -> remove+add commit
    # candidates exist but are inside the 7-day window
    assert vacuum_delta(dst) == []
    cands = vacuum_delta(dst, keep_hours=0, dry_run=True)
    assert cands  # the pre-compaction files
    for p in cands:
        assert os.path.exists(os.path.join(dst, p))
    gone = vacuum_delta(dst, keep_hours=0)
    assert gone == cands
    for p in gone:
        assert not os.path.exists(os.path.join(dst, p))
    # table still reads fully after vacuum
    assert read_delta(spark, dst).count() == 30


def test_export_column_mapped_table_roundtrip(spark, tmp_path):
    """A renamed-column table exports with real columnMapping metadata
    (mode=name, per-field physicalName, reader v2) and read_delta
    round-trips it under logical names; mirror_delta upgrades an
    existing unmapped export in place when the source renames."""
    import json

    from pyspark.sql import functions as F

    from dataingestion_spark.interop.delta import (
        export_delta, mirror_delta, read_delta,
    )
    from dataingestion_spark.sinks import manifest_store as ms

    t = str(tmp_path / "src")
    df = spark.range(0, 80).select(
        F.col("id").cast("string").alias("documentid"),
        F.col("id").alias("score"))
    ms.write_table(df, t)
    d0 = str(tmp_path / "mirror")
    export_delta(spark, t, d0, mode="copy")          # unmapped export

    ms.rename_column(t, "score", "points")
    ms.append_table(spark.range(80, 100).select(
        F.col("id").cast("string").alias("documentid"),
        F.col("id").alias("points")), t)

    # fresh export of the mapped table
    d1 = str(tmp_path / "mapped")
    export_delta(spark, t, d1, mode="copy")
    log0 = json.loads(
        open(f"{d1}/_delta_log/{0:020d}.json").read().splitlines()[1])
    cfg = log0["metaData"]["configuration"]
    assert cfg["delta.columnMapping.mode"] == "name"
    fields = json.loads(log0["metaData"]["schemaString"])["fields"]
    by_name = {f["name"]: f["metadata"] for f in fields}
    assert by_name["points"]["delta.columnMapping.physicalName"] == "score"
    back = read_delta(spark, d1)
    assert "points" in back.columns and "score" not in back.columns
    assert back.count() == 100
    assert back.filter("documentid = '90'").collect()[0].points == 90

    # incremental mirror upgrades the pre-rename export in place
    mirror_delta(spark, t, d0)
    back0 = read_delta(spark, d0)
    assert "points" in back0.columns and back0.count() == 100
    assert back0.filter("documentid = '7'").collect()[0].points == 7


def test_read_foreign_multipart_checkpoint_with_string_stats(spark, tmp_path):
    """A log shaped like a FOREIGN writer's (this repo's exporter never
    produces it): a two-part checkpoint ({v}.checkpoint.{i}.{parts}
    .parquet named by _last_checkpoint's `parts`), `add.stats` carried
    as Delta's JSON string (with extra keys like nullCount), and the
    pre-checkpoint commits vacuumed away.  The reader must reconstruct
    state from ALL parts, apply the post-checkpoint commit, and use the
    string stats for file skipping."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    root = str(tmp_path / "mp")
    log = os.path.join(root, "_delta_log")
    os.makedirs(log, exist_ok=True)
    _write_part(spark, os.path.join(root, "a.parquet"), [("a1", 1), ("a2", 2)])
    _write_part(spark, os.path.join(root, "b.parquet"), [("b1", 3)])
    _write_part(spark, os.path.join(root, "c.parquet"), [("c1", 4)])
    schema2 = {"type": "struct", "fields": _SCHEMA["fields"][:2]}

    def stats(lo, hi, n):
        return json.dumps({"numRecords": n, "minValues": {"k": lo},
                           "maxValues": {"k": hi},
                           "nullCount": {"k": 0}})  # foreign extra key

    add_t = pa.struct([("path", pa.string()), ("size", pa.int64()),
                       ("modificationTime", pa.int64()),
                       ("stats", pa.string())])
    # part 1: protocol + metaData; part 2: the adds — state spans parts
    part1 = pa.table({
        "protocol": [{"minReaderVersion": 1, "minWriterVersion": 2}],
        "metaData": [{"id": "m", "schemaString": json.dumps(schema2),
                      "partitionColumns": []}],
        "add": pa.array([None], type=add_t),
    })
    part2 = pa.table({
        "add": pa.array(
            [{"path": "a.parquet", "size": 1, "modificationTime": 0,
              "stats": stats("a1", "a2", 2)},
             {"path": "b.parquet", "size": 1, "modificationTime": 0,
              "stats": stats("b1", "b1", 1)}], type=add_t),
    })
    v = 7
    pq.write_table(part1, os.path.join(
        log, f"{v:020d}.checkpoint.{1:010d}.{2:010d}.parquet"))
    pq.write_table(part2, os.path.join(
        log, f"{v:020d}.checkpoint.{2:010d}.{2:010d}.parquet"))
    with open(os.path.join(log, "_last_checkpoint"), "w") as f:
        json.dump({"version": v, "size": 3, "parts": 2}, f)
    # post-checkpoint commit: one more add with string stats
    _write_delta_commit(log, v + 1, [
        {"add": {"path": "c.parquet", "partitionValues": {}, "size": 1,
                 "modificationTime": 0, "dataChange": True,
                 "stats": stats("c1", "c1", 1)}},
    ])
    got = read_delta(spark, root)
    assert {(r.k, r.n) for r in got.collect()} == {
        ("a1", 1), ("a2", 2), ("b1", 3), ("c1", 4)}
    # string stats drive skipping: k = 'b1' can only live in b.parquet
    hit = read_delta(spark, root, where=[("k", "=", "b1")])
    assert {(r.k, r.n) for r in hit.collect()} == {("b1", 3)}


def test_read_foreign_multipart_checkpoint_missing_part_falls_back(
        spark, tmp_path):
    """If any checkpoint part is absent the checkpoint must be IGNORED
    (not half-applied): with all JSON commits still present the replay
    reconstructs the same state from scratch."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    root = str(tmp_path / "mp2")
    log = os.path.join(root, "_delta_log")
    os.makedirs(log, exist_ok=True)
    _write_part(spark, os.path.join(root, "a.parquet"), [("x", 1)])
    schema2 = {"type": "struct", "fields": _SCHEMA["fields"][:2]}
    _write_delta_commit(log, 0, [
        {"protocol": {"minReaderVersion": 1, "minWriterVersion": 2}},
        _meta_action(schema2),
        {"add": {"path": "a.parquet", "partitionValues": {}, "size": 1,
                 "modificationTime": 0, "dataChange": True}},
    ])
    # _last_checkpoint advertises 2 parts but only part 1 exists
    add_t = pa.struct([("path", pa.string()), ("size", pa.int64()),
                       ("modificationTime", pa.int64())])
    pq.write_table(
        pa.table({"metaData": [{"id": "m",
                                "schemaString": json.dumps(schema2),
                                "partitionColumns": []}],
                  "add": pa.array([None], type=add_t)}),
        os.path.join(log, f"{0:020d}.checkpoint.{1:010d}.{2:010d}.parquet"))
    with open(os.path.join(log, "_last_checkpoint"), "w") as f:
        json.dump({"version": 0, "size": 2, "parts": 2}, f)
    got = read_delta(spark, root)
    assert {(r.k, r.n) for r in got.collect()} == {("x", 1)}


def _third_party_delta_writer():
    """Probe for a genuinely third-party Delta log writer in this image:
    delta-rs (`deltalake`) preferred, else DuckDB's delta extension
    (read-only — only usable as a third-party READER check). Returns
    ("deltalake", module) / ("duckdb", con) / None."""
    try:
        import deltalake  # type: ignore

        return ("deltalake", deltalake)
    except ImportError:
        pass
    try:
        import duckdb

        con = duckdb.connect()
        con.execute("LOAD delta")  # no INSTALL: offline images can't fetch
        return ("duckdb", con)
    except Exception:
        return None


@pytest.mark.skipif(_third_party_delta_writer() is None,
                    reason="no third-party Delta tool in this image "
                           "(deltalake absent, duckdb delta extension "
                           "not downloadable offline) — foreign-shaped "
                           "fixtures in this file stand in")
def test_read_delta_log_written_by_third_party_tool(spark, tmp_path):
    """The strongest interop pin: read a _delta_log this repo did NOT
    write. Runs whenever delta-rs (or a preloaded duckdb delta
    extension) is importable; skip-marked otherwise (r6-r8 ask,
    closable only as far as the image allows)."""
    kind, tool = _third_party_delta_writer()
    root = str(tmp_path / "foreign")
    if kind == "deltalake":
        import pyarrow as pa

        tool.write_deltalake(root, pa.table({
            "documentid": ["a", "b", "c"], "v": [1, 2, 3]}))
        tool.write_deltalake(root, pa.table({
            "documentid": ["d"], "v": [4]}), mode="append")
        got = read_delta(spark, root)
        assert {(r.documentid, r.v) for r in got.collect()} == {
            ("a", 1), ("b", 2), ("c", 3), ("d", 4)}
    else:
        # duckdb's extension only reads Delta; use it as the foreign
        # READER of a log we exported — the reciprocal interop check
        t = str(tmp_path / "t")
        ms.write_table(_mk(spark, 0, 5), t)
        dst = str(tmp_path / "exported")
        export_delta(spark, t, dst)
        rows = tool.execute(
            f"SELECT documentid, v FROM delta_scan('{dst}') ORDER BY 1"
        ).fetchall()
        assert rows == [(str(i), 2 * i) for i in range(5)]
