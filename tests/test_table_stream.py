"""Streaming reads of manifest tables (streaming/table_source.py).

Pins the Delta-streaming-source semantics: snapshot-first batch, append
tailing with commit versions as checkpointed offsets, exactly-once
across restarts, change-commit failure vs ``skipChangeCommits``,
``startingVersion``, DV application in snapshots, and schema-evolution
null padding in the per-file Arrow reads.
"""

import glob

import pytest
from pyspark.sql import functions as F

from dataingestion_spark.sinks import manifest_store as ms
from dataingestion_spark.streaming.table_source import stream_table


def _mk(spark, a, b, extra=None):
    df = spark.range(a, b).select(
        F.col("id").cast("string").alias("documentid"),
        (F.col("id") * 2).alias("v"),
    )
    if extra is not None:
        df = df.withColumn("tag", F.lit(extra))
    return df


def _drain(spark, table, sink, ckpt, **kw):
    """One availableNow pass; returns the cumulative sink row count."""
    q = (
        stream_table(spark, table, **kw)
        .writeStream.format("parquet")
        .option("path", sink)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return spark.read.parquet(sink).count()


def test_snapshot_then_tail_exactly_once(spark, tmp_path):
    table, sink, ckpt = (str(tmp_path / n) for n in ("t", "sink", "ckpt"))
    ms.write_table(_mk(spark, 0, 80), table)
    assert _drain(spark, table, sink, ckpt) == 80  # snapshot batch
    ms.append_table(_mk(spark, 80, 120), table)
    assert _drain(spark, table, sink, ckpt) == 120  # only the append
    # no new commits -> the checkpoint holds, nothing re-emitted
    assert _drain(spark, table, sink, ckpt) == 120
    # offsets in the checkpoint are commit versions
    tails = [open(f).read().splitlines()[-1]
             for f in sorted(glob.glob(ckpt + "/offsets/*"))]
    assert '{"version": 1}' in tails[-1]


def test_snapshot_applies_deletion_vectors(spark, tmp_path):
    table, sink, ckpt = (str(tmp_path / n) for n in ("t", "sink", "ckpt"))
    ms.write_table(_mk(spark, 0, 50), table)
    ms.delete_documents(spark, table, [str(i) for i in range(0, 50, 5)])
    got = _drain(spark, table, sink, ckpt)
    assert got == 40
    ids = {r.documentid for r in spark.read.parquet(sink).collect()}
    assert "5" not in ids and "7" in ids


def test_change_commit_fails_then_skip_recovers(spark, tmp_path):
    table, sink, ckpt = (str(tmp_path / n) for n in ("t", "sink", "ckpt"))
    ms.write_table(_mk(spark, 0, 40), table)
    assert _drain(spark, table, sink, ckpt) == 40
    ms.delete_documents(spark, table, ["1", "2"])  # v1: change commit
    with pytest.raises(Exception) as ei:
        _drain(spark, table, sink, ckpt)
    assert "skipChangeCommits" in str(ei.value)
    ms.append_table(_mk(spark, 40, 50), table)  # v2: clean append
    # recovery replays the failed WAL batch first (skipped -> no rows),
    # then the next pass drains the append — engine availableNow behavior
    n = _drain(spark, table, sink, ckpt, skip_change_commits=True)
    if n != 50:
        n = _drain(spark, table, sink, ckpt, skip_change_commits=True)
    assert n == 50


def test_starting_version_skips_snapshot(spark, tmp_path):
    table, sink, ckpt = (str(tmp_path / n) for n in ("t", "sink", "ckpt"))
    ms.write_table(_mk(spark, 0, 30), table)  # v0
    ms.append_table(_mk(spark, 30, 45), table)  # v1
    ms.append_table(_mk(spark, 45, 55), table)  # v2
    got = _drain(spark, table, sink, ckpt, starting_version=1)
    assert got == 25  # v1 + v2 appends only, no v0 snapshot


def test_schema_evolution_null_padded(spark, tmp_path):
    table, sink, ckpt = (str(tmp_path / n) for n in ("t", "sink", "ckpt"))
    ms.write_table(_mk(spark, 0, 10), table)
    ms.append_table(_mk(spark, 10, 20, extra="new"), table)  # widens schema
    assert _drain(spark, table, sink, ckpt) == 20
    out = spark.read.parquet(sink)
    assert "tag" in out.columns
    assert out.filter(F.col("tag").isNull()).count() == 10
    assert out.filter(F.col("tag") == "new").count() == 10


def test_stream_matches_batch_read(spark, tmp_path):
    """Snapshot + appends through the source == read_table, row for row."""
    table, sink, ckpt = (str(tmp_path / n) for n in ("t", "sink", "ckpt"))
    ms.write_table(_mk(spark, 0, 60), table)
    ms.append_table(_mk(spark, 60, 90), table)
    _drain(spark, table, sink, ckpt)
    streamed = spark.read.parquet(sink).select("documentid", "v")
    batch = ms.read_table(spark, table).select("documentid", "v")
    assert streamed.exceptAll(batch).count() == 0
    assert batch.exceptAll(streamed).count() == 0


def test_max_commits_per_trigger_reader_protocol(spark, tmp_path):
    """maxCommitsPerTrigger paces the offset advance: driving the reader
    through the engine's planning sequence (initialOffset → latestOffset
    → partitions → latestOffset …), each latestOffset moves at most N
    commits past the last planned position — and never regresses, even
    when calls arrive in the availableNow order (latestOffset BEFORE
    initialOffset, observed engine behavior)."""
    from dataingestion_spark.streaming.table_source import _TableStreamReader

    table = str(tmp_path / "t")
    ms.write_table(_mk(spark, 0, 10), table)        # v0
    ms.append_table(_mk(spark, 10, 30), table)      # v1
    ms.append_table(_mk(spark, 30, 60), table)      # v2
    ms.append_table(_mk(spark, 60, 100), table)     # v3
    opts = {"path": table, "startingversion": "0",
            "maxcommitspertrigger": "2"}

    # fresh processing-time stream: initialOffset first, then paced taps
    r = _TableStreamReader(None, opts)
    assert r.initialOffset() == {"version": -1}
    assert r.latestOffset() == {"version": 1}       # -1 + 2
    r.partitions({"version": -1}, {"version": 1})
    assert r.latestOffset() == {"version": 3}       # 1 + 2, backlog done
    assert r.latestOffset() == {"version": 3}       # no further commits

    # availableNow ordering: the end-capture precedes initialOffset; the
    # capture is unpaced (position unknown) and the later initialOffset
    # must not regress the position below it
    r2 = _TableStreamReader(None, opts)
    assert r2.latestOffset() == {"version": 3}
    r2.initialOffset()
    assert r2.latestOffset() == {"version": 3}      # monotone, no regress

    # restart shape: no initialOffset call at all — first tap unpaced
    r3 = _TableStreamReader(None, opts)
    assert r3.latestOffset() == {"version": 3}


def test_max_commits_per_trigger_drains_fully(spark, tmp_path):
    """End to end under the engine: the option never loses or duplicates
    rows — an availableNow pass over a 4-commit backlog still lands all
    rows exactly once."""
    table, sink, ckpt = (str(tmp_path / n) for n in ("t", "sink", "ckpt"))
    ms.write_table(_mk(spark, 0, 10), table)
    ms.append_table(_mk(spark, 10, 30), table)
    ms.append_table(_mk(spark, 30, 100), table)
    n = _drain(spark, table, sink, ckpt,
               starting_version=0, max_commits_per_trigger=1)
    assert n == 100
    assert spark.read.parquet(sink).select("documentid").distinct().count() == 100


def test_stream_shallow_clone_resolves_ext_refs(spark, tmp_path):
    """A shallow clone references the SOURCE's files via the manifest ext
    map; the streaming source must resolve those paths in both snapshot
    and tail partitions."""
    from dataingestion_spark.sinks.manifest_store import clone_table

    src, clone = str(tmp_path / "src"), str(tmp_path / "clone")
    sink, ckpt = str(tmp_path / "sink"), str(tmp_path / "ckpt")
    ms.write_table(_mk(spark, 0, 40), src)
    clone_table(src, clone)
    assert _drain(spark, clone, sink, ckpt) == 40  # snapshot via ext refs
    ms.append_table(_mk(spark, 40, 55), clone)  # clone-local commit
    assert _drain(spark, clone, sink, ckpt) == 55


def test_columns_projection(spark, tmp_path):
    """stream_table(columns=…) narrows the source schema — the executor
    reads only those parquet columns (Spark can't push projection into
    Python sources, so the option IS the pruning path). DVs still apply
    even when documentid is projected away."""
    table, sink, ckpt = (str(tmp_path / n) for n in ("t", "sink", "ckpt"))
    ms.write_table(_mk(spark, 0, 30), table)
    ms.delete_documents(spark, table, ["3", "4"])
    q = (
        stream_table(spark, table, columns=["v"])
        .writeStream.format("parquet").option("path", sink)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True).start()
    )
    q.awaitTermination()
    out = spark.read.parquet(sink)
    assert out.columns == ["v"]
    vals = {r.v for r in out.collect()}
    assert len(vals) == 28 and 6 not in vals and 8 not in vals  # DVs applied
    with pytest.raises(Exception, match="not in table schema"):
        stream_table(spark, table, columns=["nope"]).schema


def test_stream_table_pipeline_e2e(spark, tmp_path):
    """stream_table_pipeline: tail a source table, transform, merge into
    a destination exactly-once; appends flow through, drained re-runs
    commit nothing."""
    from dataingestion_spark.streaming.pipeline import stream_table_pipeline

    src, dst, ckpt = (str(tmp_path / n) for n in ("src", "dst", "ckpt"))
    ms.write_table(_mk(spark, 0, 50), src)

    def clean(df):
        return df.filter(F.col("v") % 4 == 0).withColumn(
            "vv", F.col("v") * 10)

    q = stream_table_pipeline(spark, src, dst, ckpt, transform=clean)
    q.awaitTermination()
    got = ms.read_table(spark, dst)
    assert got.count() == 25  # ids 0..49 with (2*id)%4==0 -> even ids
    assert got.filter(F.col("vv") != F.col("v") * 10).count() == 0

    ms.append_table(_mk(spark, 50, 70), src)
    v_before = ms.current_version(dst)
    q = stream_table_pipeline(spark, src, dst, ckpt, transform=clean)
    q.awaitTermination()
    assert ms.read_table(spark, dst).count() == 35
    assert ms.current_version(dst) == v_before + 1  # exactly one commit

    # drained: no new commits on re-run
    q = stream_table_pipeline(spark, src, dst, ckpt, transform=clean)
    q.awaitTermination()
    assert ms.current_version(dst) == v_before + 1


def test_stream_table_pipeline_chunking_transform_keeps_all_rows(spark, tmp_path):
    """A transform that fans one document into several rows (a chunker —
    the canonical silver job) keeps ALL rows per document in the
    destination (regression: dropDuplicates + one-row-per-key MERGE
    silently truncated chunked documents to one arbitrary row)."""
    from dataingestion_spark.streaming.pipeline import stream_table_pipeline

    src, dst, ckpt = (str(tmp_path / n) for n in ("src", "dst", "ckpt"))
    ms.write_table(_mk(spark, 0, 20), src)

    def chunker(df):
        return df.withColumn(
            "chunk", F.explode(F.array(F.lit(0), F.lit(1), F.lit(2))))

    q = stream_table_pipeline(spark, src, dst, ckpt, transform=chunker)
    q.awaitTermination()
    got = ms.read_table(spark, dst)
    assert got.count() == 60
    assert got.groupBy("documentid").count().filter("count != 3").count() == 0

    ms.append_table(_mk(spark, 20, 25), src)
    q = stream_table_pipeline(spark, src, dst, ckpt, transform=chunker)
    q.awaitTermination()
    assert ms.read_table(spark, dst).count() == 75
