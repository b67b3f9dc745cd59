"""Structured Streaming: windowed event aggregation and continuous ingest
with per-batch incremental vector writes."""

import shutil

from pyspark.sql import functions as F

from dataingestion_spark.sinks.vector_store import read_vector_table_versioned
from dataingestion_spark.streaming.pipeline import stream_events_windowed, stream_ingest

SF = "/root/testdata/sf0.001"


def test_stream_events_windowed(spark):
    q = stream_events_windowed(spark, SF, query_name="t_events_win")
    q.awaitTermination()
    out = spark.table("t_events_win")
    assert out.count() > 0
    # batch equivalence: streaming append-mode output (finalized windows)
    # must be a subset of the batch aggregation with identical values
    from dataingestion_spark.streaming.pipeline import normalize_event_ts

    events = normalize_event_ts(spark.read.parquet(f"{SF}/events.parquet"))
    batch = (
        events.groupBy(F.window("ts", "5 minutes").alias("w"), "event_type")
        .agg(F.count("*").alias("n"))
        .select(F.col("w.start").alias("win_start"), "event_type", "n")
    )
    merged = out.select("win_start", "event_type", "n").join(
        batch.withColumnRenamed("n", "n_batch"), ["win_start", "event_type"], "left"
    )
    assert merged.filter(F.col("n") != F.col("n_batch")).count() == 0


def test_stateful_running_stats(spark):
    from dataingestion_spark.streaming.stateful import stream_user_running_stats

    q = stream_user_running_stats(spark, SF, query_name="t_user_stats")
    q.awaitTermination()
    out = spark.table("t_user_stats")
    # update-mode emits one row per user per touched batch; the LAST row per
    # user is the cumulative total and must equal the batch aggregation
    events = spark.read.parquet(f"{SF}/events.parquet")
    expected = {
        r.user_id: (r.n, round(r.s, 6))
        for r in events.groupBy("user_id")
        .agg(F.count("*").alias("n"), F.sum("value").alias("s"))
        .collect()
    }
    got = {
        r.user_id: (r.n_events, round(r.sum_value, 6))
        for r in out.collect()  # single availableNow batch → one row per user
    }
    assert got == expected


def test_stream_ingest_incremental(spark, tmp_path):
    src = tmp_path / "stream_src"
    src.mkdir()
    shutil.copy(f"{SF}/documents.parquet", src / "documents.parquet")
    table_path = str(tmp_path / "vt_stream")
    q = stream_ingest(spark, str(src), table_path, max_tokens=64, overlap=16)
    q.awaitTermination()
    table = read_vector_table_versioned(spark, table_path)
    n_docs = spark.read.parquet(f"{SF}/documents.parquet").count()
    assert table.select("documentid").distinct().count() == n_docs
    assert set(table.columns) >= {"key", "embedding", "content", "documentid"}


def test_stream_ingest_dedup_idempotent(spark, tmp_path):
    """Content-level dedup across micro-batches AND across stream restarts:
    the table itself is the dedup state, so re-reading all input files
    (no checkpoint) must not duplicate rows."""
    from dataingestion_spark.streaming.pipeline import stream_ingest_dedup
    from dataingestion_spark.sinks import manifest_store as ms

    inp = str(tmp_path / "in")
    table = str(tmp_path / "docs_table")
    rows1 = [
        (1, "alpha content", "en", "s", 13),
        (2, "beta content", "en", "s", 12),
        (3, "alpha content", "en", "s", 13),  # in-batch duplicate of 1
    ]
    spark.createDataFrame(
        rows1, "doc_id long, text string, lang string, source string, n_chars long"
    ).write.mode("overwrite").parquet(inp)

    stream_ingest_dedup(spark, inp, table).awaitTermination()
    t1 = ms.read_table(spark, table)
    assert t1.count() == 2
    assert t1.select("content_hash").distinct().count() == 2

    # second wave: one genuinely new doc, one repeat of an old content
    spark.createDataFrame(
        [(4, "gamma content", "en", "s", 13), (5, "beta content", "en", "s", 12)],
        "doc_id long, text string, lang string, source string, n_chars long",
    ).write.mode("append").parquet(inp)

    # no checkpoint → the stream re-reads EVERYTHING; table must end at 3
    stream_ingest_dedup(spark, inp, table).awaitTermination()
    t2 = ms.read_table(spark, table)
    assert t2.count() == 3
    kept = sorted(r.text for r in t2.select("text").collect())
    assert kept == ["alpha content", "beta content", "gamma content"]


def test_stream_ingest_dedup_null_text(spark, tmp_path):
    """Null-text rows must not bypass dedup: md5(NULL)=NULL never anti-join
    matches, so they are dropped up front — the table must stay stable
    across restarts (regression for the null-key append loop)."""
    from dataingestion_spark.sinks import manifest_store as ms
    from dataingestion_spark.streaming.pipeline import stream_ingest_dedup

    inp, table = str(tmp_path / "in"), str(tmp_path / "t")
    spark.createDataFrame(
        [(1, "alpha", "en", "s", 5), (2, None, "en", "s", 0), (3, None, "en", "s", 0)],
        "doc_id long, text string, lang string, source string, n_chars long",
    ).write.parquet(inp)
    stream_ingest_dedup(spark, inp, table).awaitTermination()
    assert ms.read_table(spark, table).count() == 1
    stream_ingest_dedup(spark, inp, table).awaitTermination()
    assert ms.read_table(spark, table).count() == 1


def test_events_stream_schema_probe(spark, tmp_path):
    """The streaming schema comes from the parquet footers: current-gen NTZ
    files probe to timestamp_ntz, legacy nanos generations (readable only
    as bigint under nanosAsLong) probe to long so normalize_event_ts's
    bigint branch stays reachable, and an empty dir falls back to the
    default schema."""
    from dataingestion_spark.streaming.pipeline import (
        EVENTS_SCHEMA, events_stream_schema, normalize_event_ts,
    )

    ntz_dir = str(tmp_path / "ntz")
    spark.createDataFrame(
        [(1, "2024-01-01 00:00:00", 7, "click", 1.0, "{}")],
        "event_id long, ts string, user_id long, event_type string,"
        " value double, props string",
    ).withColumn("ts", F.col("ts").cast("timestamp_ntz")).write.parquet(ntz_dir)
    s = events_stream_schema(spark, ntz_dir, glob="*.parquet")
    assert s["ts"].dataType.simpleString() == "timestamp_ntz"

    long_dir = str(tmp_path / "legacy")
    spark.createDataFrame(
        [(1, 1_700_000_000_000_000_000, 7, "click", 1.0, "{}")],
        "event_id long, ts long, user_id long, event_type string,"
        " value double, props string",
    ).write.parquet(long_dir)
    s = events_stream_schema(spark, long_dir, glob="*.parquet")
    assert s["ts"].dataType.simpleString() == "bigint"
    # and the normalizer converts that representation to a real timestamp
    normed = normalize_event_ts(
        spark.read.schema(s).parquet(long_dir)
    )
    assert dict(normed.dtypes)["ts"] == "timestamp"

    assert events_stream_schema(spark, str(tmp_path / "missing")) == EVENTS_SCHEMA


def test_stream_events_sessions_match_batch(spark):
    """Streamed session windows must agree with the batch session_window
    aggregation for every session the watermark closed; the unflushed
    tail is exactly the sessions ending within the final watermark."""
    from dataingestion_spark.streaming.pipeline import stream_events_sessions

    sf = "/root/testdata/sf0.001"
    q = stream_events_sessions(spark, sf, query_name="sess_check")
    q.awaitTermination()
    streamed = {
        (r.user_id, r.session_start, r.session_end): r.n_events
        for r in spark.table("sess_check").collect()
    }

    from dataingestion_spark.streaming.pipeline import normalize_event_ts

    events = normalize_event_ts(
        spark.read.option("pathGlobFilter", "events*.parquet").parquet(sf)
    )
    batch = (
        events.groupBy(F.session_window("ts", "30 minutes").alias("w"), "user_id")
        .agg(F.count("*").alias("n_events"))
        .select("user_id", F.col("w.start").alias("session_start"),
                F.col("w.end").alias("session_end"), "n_events")
    )
    full = {
        (r.user_id, r.session_start, r.session_end): r.n_events
        for r in batch.collect()
    }
    assert streamed, "stream emitted nothing"
    # every emitted session matches the batch result exactly
    for k, n in streamed.items():
        assert full.get(k) == n
    # and the only missing sessions are in the final watermark's shadow
    import datetime

    max_ts = events.agg(F.max("ts")).first()[0]
    horizon = max_ts - datetime.timedelta(minutes=10)
    for k in set(full) - set(streamed):
        assert k[2] > horizon


def test_stream_interval_join_matches_batch(spark):
    from dataingestion_spark.streaming.pipeline import (
        normalize_event_ts,
        stream_events_interval_join,
    )

    spark.conf.set("spark.sql.session.timeZone", "UTC")
    q = stream_events_interval_join(spark, SF, query_name="t_ivl_join")
    q.awaitTermination()
    got = {
        (r.user_id, r.left_id, r.right_id)
        for r in spark.table("t_ivl_join").collect()
    }
    ev = normalize_event_ts(spark.read.parquet(f"{SF}/events.parquet"))
    clicks = ev.filter("event_type = 'click'").select(
        F.col("user_id").alias("u"), F.col("event_id").alias("lid"),
        F.col("ts").alias("lts"))
    buys = ev.filter("event_type = 'purchase'").select(
        F.col("user_id").alias("u"), F.col("event_id").alias("rid"),
        F.col("ts").alias("rts"))
    want = {
        (r.u, r.lid, r.rid)
        for r in clicks.join(buys, "u")
        .filter("rts >= lts AND rts <= lts + INTERVAL 30 minutes")
        .collect()
    }
    assert want, "corpus must contain click→purchase pairs"
    assert got == want


def test_stream_dedup_within_watermark_equals_batch_distinct(spark):
    """Doubled delivery → dropDuplicatesWithinWatermark → exactly the
    batch rows, each once."""
    from dataingestion_spark.streaming.pipeline import stream_events_dedup

    q = stream_events_dedup(spark, "/root/testdata/sf0.001",
                            query_name="ev_dedup_t")
    q.awaitTermination()
    got = spark.table("ev_dedup_t")
    batch = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    assert got.count() == batch.count()
    assert got.select("event_id").distinct().count() == batch.count()


def test_stream_upsert_merges_batches_and_is_exactly_once(spark, tmp_path):
    """Streaming MERGE (stream_upsert): the base table plus a streamed
    update batch converge to merge semantics, and a retried epoch is a
    no-op (merge_table txn guard)."""
    from dataingestion_spark.sinks import manifest_store as ms
    from dataingestion_spark.streaming.pipeline import stream_upsert

    docs = spark.read.parquet(f"{SF}/documents.parquet").select(
        F.col("doc_id").cast("string").alias("documentid"),
        "text", "lang", "source", "n_chars")
    table = str(tmp_path / "upsert_t")
    ms.write_table(docs.filter("documentid NOT LIKE '%7'"), table)

    src = tmp_path / "upsert_src"
    src.mkdir()
    updates = spark.read.parquet(f"{SF}/documents.parquet").filter(
        "doc_id % 2 = 0").withColumn(
        "text", F.concat(F.lit("v2 "), F.col("text")))
    updates.coalesce(1).write.mode("overwrite").parquet(str(src))
    stream_upsert(spark, str(src), table).awaitTermination()

    out = ms.read_table(spark, table)
    # updated: even ids now carry the v2 text
    assert out.filter("documentid = '2' AND text NOT LIKE 'v2 %'").count() == 0
    # inserted: even ids ending in 7 were absent from base, now present
    base_n = docs.filter("documentid NOT LIKE '%7'").count()
    ins_n = updates.filter("CAST(doc_id AS STRING) LIKE '%7'").count()
    assert out.count() == base_n + ins_n

    # retried epoch is a no-op: replay the same merge with epoch 0
    v = ms.current_version(table)
    ms.merge_table(
        updates.select(F.col("doc_id").cast("string").alias("documentid"),
                       "text", "lang", "source", "n_chars"),
        table, txn=("stream_upsert", 0))
    assert ms.current_version(table) == v  # nothing recommitted


def test_stream_upsert_inline_maintenance_compacts(spark, tmp_path):
    """maintain_every runs the table maintenance inside the foreachBatch
    sink: after the stream drains, the per-batch DV/small-file debris is
    compacted away and the data is unchanged."""
    from dataingestion_spark.sinks import manifest_store as ms
    from dataingestion_spark.streaming.pipeline import stream_upsert

    docs = spark.read.parquet(f"{SF}/documents.parquet").select(
        F.col("doc_id").cast("string").alias("documentid"),
        "text", "lang", "source", "n_chars")
    table = str(tmp_path / "maint_t")
    ms.write_table(docs, table)

    src = tmp_path / "maint_src"
    src.mkdir()
    # several small files -> several micro-batches (maxFilesPerTrigger=4)
    updates = spark.read.parquet(f"{SF}/documents.parquet").filter(
        "doc_id % 3 = 0").withColumn(
        "text", F.concat(F.lit("m "), F.col("text")))
    updates.repartition(8).write.mode("overwrite").parquet(str(src))
    stream_upsert(spark, str(src), table, maintain_every=1,
                  maintain_kwargs={"min_file_age_seconds": 0,
                                   "keep_versions": 1}).awaitTermination()

    st = ms.table_stats(table)
    assert st["n_delete_vectors"] == 0           # maintenance ran
    assert st["max_files_per_bucket"] <= 4
    out = ms.read_table(spark, table)
    assert out.filter("documentid = '3' AND text NOT LIKE 'm %'").count() == 0
    assert out.count() == docs.count()
    ops = [h["op"] for h in ms.table_history(table)]
    assert "COMPACT" in ops


def test_stream_binary_landing_dirs_warc_tfrecord_avro(spark, tmp_path):
    """The three binary landing-dir tails (r12: stream_warc,
    stream_tfrecord, stream_avro) discover shards exactly once across
    drains and decode identically to their batch readers (shared
    parser factories)."""
    import os

    from pyspark.sql import functions as F

    from dataingestion_spark.sources.avro import stream_avro, write_container
    from dataingestion_spark.sources.tfrecord import (
        _frame_record, encode_example, stream_tfrecord,
    )
    from dataingestion_spark.sources.warc import stream_warc, wet_record_bytes

    def drain(df, name, sink, ckpt):
        q = (df.writeStream.format("parquet")
             .option("path", sink).option("checkpointLocation", ckpt)
             .trigger(availableNow=True).start())
        q.awaitTermination(120)

    # --- warc ---
    land = str(tmp_path / "warc_land")
    os.makedirs(land)
    for batch, rng in (("a", range(0, 4)), ("b", range(4, 9))):
        blob = b"".join(wet_record_bytes(f"https://x.test/{i}",
                                         f"t{i}".encode())
                        for i in rng)
        open(os.path.join(land, f"{batch}.wet"), "wb").write(blob)
        drain(stream_warc(spark, land), "warc",
              str(tmp_path / "warc_sink"), str(tmp_path / "warc_ckpt"))
    uris = sorted(r["target_uri"] for r in
                  spark.read.parquet(str(tmp_path / "warc_sink")).collect())
    assert uris == sorted(f"https://x.test/{i}" for i in range(9))

    # --- tfrecord ---
    land = str(tmp_path / "tf_land")
    os.makedirs(land)
    for batch, rng in (("a", range(0, 5)), ("b", range(5, 12))):
        blob = b"".join(_frame_record(encode_example(
            {"i": ("int64", i)})) for i in rng)
        open(os.path.join(land, f"{batch}.tfrecord"), "wb").write(blob)
        drain(stream_tfrecord(spark, land, {"i": "int64"}), "tf",
              str(tmp_path / "tf_sink"), str(tmp_path / "tf_ckpt"))
    got = sorted(r["i"] for r in
                 spark.read.parquet(str(tmp_path / "tf_sink")).collect())
    assert got == list(range(12))

    # --- avro (explicit schema: the landing dir may start empty) ---
    land = str(tmp_path / "av_land")
    os.makedirs(land)
    sch = {"type": "record", "name": "r", "fields": [
        {"name": "v", "type": "long"}]}
    for batch, rng in (("a", range(0, 6)), ("b", range(6, 10))):
        write_container(os.path.join(land, f"{batch}.avro"), sch,
                        [{"v": i} for i in rng])
        drain(stream_avro(spark, land, sch), "avro",
              str(tmp_path / "av_sink"), str(tmp_path / "av_ckpt"))
    got = sorted(r["v"] for r in
                 spark.read.parquet(str(tmp_path / "av_sink")).collect())
    assert got == list(range(10))
