import tempfile

import pytest
from pyspark.sql import Row, functions as F

from dataingestion_spark.sinks import manifest_store as ms
from dataingestion_spark.sinks.scd import scd2_at, scd2_current, scd2_merge


def _tbl():
    return tempfile.mkdtemp(prefix="scd2_") + "/dim"


def _batch(spark, rows):
    return spark.createDataFrame(
        [Row(documentid=k, segment=s, balance=float(b), effective_ts=float(t))
         for k, s, b, t in rows])


def _state(spark, table):
    return {(r.documentid, r.valid_from): (r.segment, r.balance, r.valid_to,
                                           r.is_current)
            for r in ms.read_table(spark, table).collect()}


def test_scd2_lifecycle(spark):
    table = _tbl()
    scd2_merge(_batch(spark, [("a", "AUTO", 10, 1), ("b", "BIKE", 20, 1)]),
               table, tracked=["segment", "balance"])
    # a changes balance, b unchanged, c is new
    scd2_merge(_batch(spark, [("a", "AUTO", 15, 2), ("b", "BIKE", 20, 2),
                              ("c", "CARS", 30, 2)]),
               table, tracked=["segment", "balance"])
    st = _state(spark, table)
    assert st[("a", 1.0)] == ("AUTO", 10.0, 2.0, False)
    assert st[("a", 2.0)] == ("AUTO", 15.0, None, True)
    assert st[("b", 1.0)] == ("BIKE", 20.0, None, True)  # untouched
    assert st[("c", 2.0)] == ("CARS", 30.0, None, True)
    assert len(st) == 4

    # third batch: a changes again -> three-version history
    scd2_merge(_batch(spark, [("a", "GOLF", 15, 3)]),
               table, tracked=["segment", "balance"])
    st = _state(spark, table)
    assert st[("a", 2.0)] == ("AUTO", 15.0, 3.0, False)
    assert st[("a", 3.0)] == ("GOLF", 15.0, None, True)
    assert len(st) == 5

    cur = {r.documentid: r.segment for r in scd2_current(spark, table).collect()}
    assert cur == {"a": "GOLF", "b": "BIKE", "c": "CARS"}
    at2 = {r.documentid: (r.segment, r.balance)
           for r in scd2_at(spark, table, 2.0).collect()}
    assert at2 == {"a": ("AUTO", 15.0), "b": ("BIKE", 20.0),
                   "c": ("CARS", 30.0)}
    at1 = {r.documentid for r in scd2_at(spark, table, 1.5).collect()}
    assert at1 == {"a", "b"}


def test_scd2_null_safe_change_detection(spark):
    table = _tbl()
    df1 = spark.createDataFrame(
        [("a", None, 1.0, 1.0)],
        "documentid string, segment string, balance double, effective_ts double")
    scd2_merge(df1, table, tracked=["segment", "balance"])
    # same null segment -> no-op
    scd2_merge(df1.withColumn("effective_ts", F.lit(2.0)),
               table, tracked=["segment", "balance"])
    assert ms.read_table(spark, table).count() == 1
    # null -> value IS a change
    scd2_merge(df1.withColumn("segment", F.lit("S"))
               .withColumn("effective_ts", F.lit(3.0)),
               table, tracked=["segment", "balance"])
    st = _state(spark, table)
    assert st[("a", 1.0)][3] is False and st[("a", 3.0)][3] is True


def test_scd2_guards(spark):
    table = _tbl()
    scd2_merge(_batch(spark, [("a", "AUTO", 10, 5)]),
               table, tracked=["segment", "balance"])
    with pytest.raises(ValueError, match="duplicate"):
        scd2_merge(_batch(spark, [("a", "X", 1, 6), ("a", "Y", 2, 6)]),
                   table, tracked=["segment", "balance"])
    with pytest.raises(ValueError, match="monotone"):
        scd2_merge(_batch(spark, [("a", "LATE", 9, 5)]),
                   table, tracked=["segment", "balance"])
    with pytest.raises(ValueError, match="history columns"):
        scd2_merge(_batch(spark, [("a", "X", 1, 6)])
                   .withColumn("is_current", F.lit(True)),
                   table, tracked=["segment", "balance"])
    with pytest.raises(ValueError, match="missing column"):
        scd2_merge(_batch(spark, [("a", "X", 1, 6)]).drop("segment"),
                   table, tracked=["segment", "balance"])


def test_scd2_txn_idempotent(spark):
    table = _tbl()
    scd2_merge(_batch(spark, [("a", "AUTO", 10, 1)]),
               table, tracked=["segment"], txn=("app", 1))
    v = scd2_merge(_batch(spark, [("a", "GOLF", 10, 2)]),
                   table, tracked=["segment"], txn=("app", 2))
    # retry of epoch 2 is a no-op returning the same version
    assert scd2_merge(_batch(spark, [("a", "GOLF", 10, 2)]),
                      table, tracked=["segment"], txn=("app", 2)) == v
    assert ms.read_table(spark, table).count() == 2


def test_scd2_matches_sql_replay(spark):
    """Three snapshot batches over a 40-key dimension must equal the
    closed-form SQL replay (valid_to = next version's valid_from)."""
    keys = list(range(40))
    b1 = _batch(spark, [(str(k), "S0", k, 1) for k in keys])
    b2 = _batch(spark, [(str(k), "S0" if k % 3 else "S1", k, 2) for k in keys])
    b3 = _batch(spark, [(str(k), ("S0" if k % 3 else "S1"),
                         k + (100 if k % 2 == 0 else 0), 3) for k in keys])
    table = _tbl()
    for b in (b1, b2, b3):
        scd2_merge(b, table, tracked=["segment", "balance"])
    got = _state(spark, table)

    expected = {}
    for k in keys:
        versions = [(1.0, "S0", float(k))]
        if k % 3 == 0:
            versions.append((2.0, "S1", float(k)))
        if k % 2 == 0:
            seg = "S1" if k % 3 == 0 else "S0"
            versions.append((3.0, seg, float(k + 100)))
        for i, (vf, seg, bal) in enumerate(versions):
            vt = versions[i + 1][0] if i + 1 < len(versions) else None
            expected[(str(k), vf)] = (seg, bal, vt, vt is None)
    assert got == expected


def test_stream_scd2(spark, tmp_path):
    """File-source stream drained per-file: each micro-batch applies as
    one SCD2 merge; within-batch duplicate keys collapse to the latest
    observation; the final history equals the sequential replay."""
    from dataingestion_spark.streaming.pipeline import stream_scd2

    import pyarrow as pa
    import pyarrow.parquet as pq

    src = tmp_path / "in"
    src.mkdir()
    schema = ("documentid string, segment string, balance double, "
              "effective_ts double")

    def put(name, rows):  # flat files: the file source does not recurse
        k, s, b, t = zip(*rows)
        pq.write_table(pa.table({"documentid": list(k), "segment": list(s),
                                 "balance": list(map(float, b)),
                                 "effective_ts": list(map(float, t))}),
                       str(src / name))

    put("b1.parquet", [("a", "A", 1.0, 1.0), ("b", "B", 2.0, 1.0),
                       ("a", "A1", 1.0, 1.5)])  # dup key: 1.5 wins
    table = str(tmp_path / "dim")

    def drain():
        stream = (spark.readStream.schema(schema)
                  .option("maxFilesPerTrigger", 1).parquet(str(src)))
        q = stream_scd2(stream, table, tracked=["segment", "balance"])
        q.awaitTermination()

    drain()
    st1 = {(r.documentid, r.valid_from): (r.segment, r.is_current)
           for r in ms.read_table(spark, table).collect()}
    assert st1 == {("a", 1.5): ("A1", True), ("b", 1.0): ("B", True)}
    put("b2.parquet", [("a", "A2", 1.0, 2.0), ("b", "B", 2.0, 2.0),
                       ("c", "C", 3.0, 2.0)])
    drain()  # fresh checkpointless availableNow re-reads all files, but
    # the per-epoch txn guard plus change detection keep history exact
    st2 = {(r.documentid, r.valid_from): (r.segment, r.is_current)
           for r in ms.read_table(spark, table).collect()}
    assert st2[("a", 1.5)] == ("A1", False)
    assert st2[("a", 2.0)] == ("A2", True)
    assert st2[("b", 1.0)] == ("B", True)
    assert st2[("c", 2.0)] == ("C", True)
    assert len(st2) == 4


def test_scd2_tombstones_and_reinsert(spark):
    """deleted_col=True closes the key's current row without opening a
    new one; a later observation re-inserts the key and its PRIOR closed
    history survives the replace commit."""
    table = _tbl()

    def b(rows):
        return spark.createDataFrame(
            rows, "documentid string, segment string, balance double, "
                  "effective_ts double, gone boolean")

    scd2_merge(b([("a", "A", 1.0, 1.0, False), ("b", "B", 2.0, 1.0, False)]),
               table, tracked=["segment", "balance"], deleted_col="gone")
    # tombstone a; tombstone for unknown key x is a no-op
    scd2_merge(b([("a", None, None, 2.0, True), ("x", None, None, 2.0, True)]),
               table, tracked=["segment", "balance"], deleted_col="gone")
    st = _state(spark, table)
    assert st[("a", 1.0)] == ("A", 1.0, 2.0, False)  # closed, no reopen
    assert st[("b", 1.0)] == ("B", 2.0, None, True)
    assert len(st) == 2
    assert {r.documentid for r in scd2_current(spark, table).collect()} == {"b"}
    # re-insert a: closed history must SURVIVE alongside the new version
    scd2_merge(b([("a", "A2", 5.0, 3.0, False)]),
               table, tracked=["segment", "balance"], deleted_col="gone")
    st = _state(spark, table)
    assert st[("a", 1.0)] == ("A", 1.0, 2.0, False)  # preserved
    assert st[("a", 3.0)] == ("A2", 5.0, None, True)
    assert len(st) == 3
    # point-in-time: a absent in the tombstoned window
    assert {r.documentid for r in scd2_at(spark, table, 2.5).collect()} == {"b"}


def test_stream_history_cdc_to_scd2(spark, tmp_path):
    """stream_history follows a table's change feed into a Type-2
    dimension: inserts open, updates close+open (unchanged attrs skip),
    deletes tombstone; stamps are source commit versions; a drained
    re-run is a no-op."""
    from dataingestion_spark.streaming.pipeline import stream_history

    src, dim = str(tmp_path / "src"), str(tmp_path / "dim")

    def mk(rows):
        return spark.createDataFrame(rows,
                                     "documentid string, lang string, n long")

    ms.write_table(mk([("a", "en", 1), ("b", "de", 2), ("c", "fr", 3)]), src)
    ms.merge_table(mk([("a", "en", 9), ("b", "de", 2)]), src)   # v1: a upd, b same-values update
    ms.delete_documents(spark, src, ["c"])                       # v2: c gone

    def drain():
        q = stream_history(spark, src, dim, tracked=["lang", "n"])
        q.awaitTermination()

    drain()
    st = {(r.documentid, r.valid_from): (r.lang, r.n, r.valid_to, r.is_current)
          for r in ms.read_table(spark, dim).collect()}
    assert st[("a", 0.0)] == ("en", 1, 1.0, False)
    assert st[("a", 1.0)] == ("en", 9, None, True)
    assert st[("b", 0.0)] == ("de", 2, None, True)   # rewrite, no attr change
    assert st[("c", 0.0)] == ("fr", 3, 2.0, False)   # tombstoned at v2
    assert len(st) == 4
    drain()  # nothing new: exactly-once, dim unchanged
    assert ms.read_table(spark, dim).count() == 4


def test_scd2_model_based_random_ops(spark):
    """Seeded random batch sequence (observations, tombstones, re-inserts,
    no-op repeats) against a pure-python SCD2 model: the stored history
    must equal the model's after every merge."""
    import random

    rng = random.Random(20260815)
    keys = [f"k{i}" for i in range(8)]
    table = _tbl()
    model = {}  # key -> list of [seg, vf, vt, cur]

    def model_apply(obs, stamp):
        for k, seg, dead in obs:
            hist = model.setdefault(k, [])
            cur = next((h for h in hist if h[3]), None)
            if dead:
                if cur is not None:
                    cur[2], cur[3] = stamp, False
            elif cur is None:
                hist.append([seg, stamp, None, True])
            elif cur[0] != seg:
                cur[2], cur[3] = stamp, False
                hist.append([seg, stamp, None, True])

    for stamp in range(1, 13):
        chosen = rng.sample(keys, rng.randint(1, 6))
        obs = []
        for k in chosen:
            dead = rng.random() < 0.25
            seg = None if dead else rng.choice(["A", "B", "C"])
            obs.append((k, seg, dead))
        df = spark.createDataFrame(
            [(k, s, float(stamp), d) for k, s, d in obs],
            "documentid string, segment string, effective_ts double, "
            "gone boolean")
        scd2_merge(df, table, tracked=["segment"], deleted_col="gone")
        model_apply(obs, float(stamp))
        got = {(r.documentid, r.valid_from): (r.segment, r.valid_to,
                                              r.is_current)
               for r in ms.read_table(spark, table).collect()}
        want = {(k, h[1]): (h[0], h[2], h[3])
                for k, hist in model.items() for h in hist}
        assert got == want, f"diverged after stamp {stamp}"


def test_stream_history_inline_maintenance(spark, tmp_path):
    """maintain_every compacts the DV/small-file debris the per-commit
    scd2 merges accumulate, without changing the dimension's contents."""
    from dataingestion_spark.streaming.pipeline import stream_history

    src, dim = str(tmp_path / "src"), str(tmp_path / "dim")

    def mk(rows):
        return spark.createDataFrame(rows, "documentid string, lang string")

    ms.write_table(mk([("a", "en"), ("b", "de")]), src)
    for i, lang in enumerate(["fr", "it", "pt"]):
        ms.merge_table(mk([("a", lang)]), src)
    stream_history(spark, src, dim, tracked=["lang"], maintain_every=1,
                   maintain_kwargs={"min_file_age_seconds": 0,
                                    "keep_versions": 1}).awaitTermination()
    st = ms.table_stats(dim)
    assert st["n_delete_vectors"] == 0  # maintenance materialized the DVs
    got = {(r.documentid, r.valid_from): (r.lang, r.is_current)
           for r in ms.read_table(spark, dim).collect()}
    assert got[("a", 3.0)] == ("pt", True)
    assert got[("b", 0.0)] == ("de", True)
    assert len(got) == 5  # a: 4 versions, b: 1


def test_scd2_prepared_handle_identical_and_overlappable(spark):
    """r15 §2.6: a prepare_batch handle computed AHEAD of earlier
    commits (even from a worker thread, the intended overlap shape)
    must leave results identical to the plain sequential calls, and the
    dup guard must still fire for a prepared duplicate batch."""
    from concurrent.futures import ThreadPoolExecutor

    rows1 = [("a", "AUTO", 10, 1), ("b", "BIKE", 20, 1)]
    rows2 = [("a", "AUTO", 15, 2), ("b", "BIKE", 20, 2), ("c", "CARS", 30, 2)]

    plain = _tbl()
    scd2_merge(_batch(spark, rows1), plain, tracked=["segment", "balance"])
    scd2_merge(_batch(spark, rows2), plain, tracked=["segment", "balance"])

    overlapped = _tbl()
    b2 = _batch(spark, rows2)
    with ThreadPoolExecutor(max_workers=1) as pool:
        h2 = pool.submit(ms.prepare_batch, b2)   # before merge 1 commits
        scd2_merge(_batch(spark, rows1), overlapped,
                   tracked=["segment", "balance"])
        scd2_merge(b2, overlapped, tracked=["segment", "balance"],
                   prepared=h2.result())
    assert _state(spark, overlapped) == _state(spark, plain)

    dup = _batch(spark, [("d", "X", 1, 3), ("d", "Y", 2, 3)])
    with pytest.raises(ValueError, match="duplicate documentid"):
        scd2_merge(dup, overlapped, tracked=["segment", "balance"],
                   prepared=ms.prepare_batch(dup))


def test_merge_table_prepared_handle_identical(spark):
    """merge_table with a prepared handle (update + delete-only merges)
    equals the sequential calls row-for-row."""
    from concurrent.futures import ThreadPoolExecutor
    from pyspark.sql import Row

    def mk(rows):
        return spark.createDataFrame(
            [Row(documentid=k, lang=v) for k, v in rows],
            "documentid string, lang string")

    def run(prepared):
        t = tempfile.mkdtemp(prefix="mrgprep_") + "/t"
        src1, src2 = mk([("a", "fr"), ("c", "pt")]), mk([("b", None)])
        src2 = src2.select("documentid")
        if prepared:
            with ThreadPoolExecutor(max_workers=2) as pool:
                h1 = pool.submit(ms.prepare_batch, src1)
                h2 = pool.submit(ms.prepare_batch, src2)
                ms.write_table(mk([("a", "en"), ("b", "de")]), t)
                ms.merge_table(src1, t, prepared=h1.result())
                ms.merge_table(src2, t, when_matched="delete",
                               when_not_matched=None, prepared=h2.result())
        else:
            ms.write_table(mk([("a", "en"), ("b", "de")]), t)
            ms.merge_table(src1, t)
            ms.merge_table(src2, t, when_matched="delete",
                           when_not_matched=None)
        return {(r.documentid, r.lang)
                for r in ms.read_table(spark, t).collect()}

    assert run(True) == run(False) == {("a", "fr"), ("c", "pt")}
