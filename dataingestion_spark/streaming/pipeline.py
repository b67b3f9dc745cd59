"""Structured Streaming mode: continuous ingestion + event-time analytics.

The reference's "streaming" is a pull-based IAsyncEnumerable inside one
process; the Spark counterpart is a real streaming source with exactly-once
file tracking. Two entry points:

* :func:`stream_ingest` — file-source stream of new documents →
  chunk → ``foreachBatch`` incremental vector-table write (the streaming
  form of replace-by-documentid; each micro-batch is one transactional
  replace, mirroring IngestionPipeline-per-file semantics at cluster scale).
* :func:`stream_events_windowed` — watermarked sliding-window aggregation
  over the ``events`` table, the canonical late-data-tolerant streaming agg.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F, types as T

from ..operators.chunkers import token_chunk_text
from ..sinks.vector_store import write_vector_table_versioned

DOCUMENTS_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("text", T.StringType()),
        T.StructField("lang", T.StringType()),
        T.StructField("source", T.StringType()),
        T.StructField("n_chars", T.LongType()),
    ]
)

# ts is TIMESTAMP(MICROS, isAdjustedToUTC=false) in the driver's parquet →
# TimestampNTZType. Older generations stored TIMESTAMP(NANOS) which Spark can
# only read as long (spark.sql.legacy.parquet.nanosAsLong); the batch paths
# handle both via normalize_event_ts, and the streaming readers probe the
# actual footer type via events_stream_schema (readStream needs an explicit
# schema, so the default here is only the current-generation shape).
EVENTS_SCHEMA = T.StructType(
    [
        T.StructField("event_id", T.LongType()),
        T.StructField("ts", T.TimestampNTZType()),
        T.StructField("user_id", T.LongType()),
        T.StructField("event_type", T.StringType()),
        T.StructField("value", T.DoubleType()),
        T.StructField("props", T.StringType()),
    ]
)


def events_stream_schema(spark, events_dir: str,
                         glob: str = "events*.parquet") -> T.StructType:
    """Schema for a streaming read of the events files, derived from the
    actual parquet footers (a batch-read schema probe — footer-only, no data
    scan). Keeps legacy TIMESTAMP(NANOS) generations streamable: those files
    infer ``ts`` as bigint under ``spark.sql.legacy.parquet.nanosAsLong``,
    and normalize_event_ts converts either representation. Falls back to
    EVENTS_SCHEMA when the probe fails (e.g. empty input dir before the
    first file lands)."""
    from pyspark.errors import AnalysisException

    try:
        probed = (
            spark.read.option("pathGlobFilter", glob).parquet(events_dir).schema
        )
        return T.StructType(
            [probed[f.name] if f.name in probed.fieldNames() else f
             for f in EVENTS_SCHEMA.fields]
        )
    except AnalysisException as e:
        # only the documented fallback case: nothing to probe yet. Any
        # OTHER failure (e.g. TIMESTAMP(NANOS) without nanosAsLong) must
        # surface here, where the message is actionable — swallowing it
        # just moves the crash to stream start with a worse error.
        msg = str(e)
        if "PATH_NOT_FOUND" in msg or "UNABLE_TO_INFER_SCHEMA" in msg                 or "Path does not exist" in msg:
            return EVENTS_SCHEMA
        raise


def normalize_event_ts(df: DataFrame) -> DataFrame:
    """Normalize the ``ts`` column to session-zone TIMESTAMP regardless of how
    the parquet stored it: bigint = epoch nanos (legacy nanosAsLong reads,
    integer DIV keeps exactness beyond double's 2^53 range), otherwise a
    native timestamp/timestamp_ntz (cast is wall-clock under a UTC session)."""
    if dict(df.dtypes)["ts"] == "bigint":
        # FLOOR division, not DIV: DIV truncates toward zero, which would
        # round pre-1970 nanos the wrong way (still integer math — no
        # double precision loss past 2^53)
        return df.withColumn(
            "ts", F.timestamp_micros(F.expr("(ts - pmod(ts, 1000)) DIV 1000")))
    return df.withColumn("ts", F.col("ts").cast("timestamp"))


def stream_ingest(spark, input_dir: str, table_path: str,
                  max_tokens: int = 128, overlap: int = 32):
    """documents parquet file-stream → token chunks → incremental vector
    writes per micro-batch. Returns the started StreamingQuery."""
    stream = (
        spark.readStream.schema(DOCUMENTS_SCHEMA)
        .option("maxFilesPerTrigger", 4)
        .parquet(input_dir)
    )
    chunks = token_chunk_text(stream, text_col="text", id_col="doc_id",
                              max_tokens=max_tokens, overlap=overlap)
    chunks = chunks.withColumn("context", F.lit(None).cast("string")).withColumn(
        "metadata", F.lit(None).cast("map<string,string>")
    )

    def sink(batch_df: DataFrame, epoch_id: int) -> None:
        # one versioned O(changed-buckets) commit per micro-batch; the
        # (app, epoch) txn makes retried micro-batches no-ops, so the
        # table contents are exactly-once even under at-least-once
        # foreachBatch delivery (Delta's txn appId/version pattern)
        write_vector_table_versioned(batch_df, table_path, incremental=True,
                                     deterministic_keys=True,
                                     txn=("stream_ingest", epoch_id))

    return (
        chunks.writeStream.outputMode("append")
        .foreachBatch(sink)
        .trigger(availableNow=True)
        .start()
    )


def stream_upsert(spark, input_dir: str, table_path: str,
                  matched_condition: str | None = None,
                  app: str = "stream_upsert",
                  maintain_every: int | None = None,
                  maintain_kwargs: dict | None = None):
    """Streaming MERGE INTO (the Delta CDC-apply pattern): a file-source
    stream of document batches, each micro-batch applied as one
    conditional upsert — matched documents replaced (optionally gated by
    ``matched_condition``), unmatched inserted. Within-batch duplicate
    ids keep one row (``dropDuplicates`` on documentid — Spark gives no
    intra-batch order, same as Delta's own streaming merge guidance),
    and the ``(app, epoch)`` txn makes retried micro-batches no-ops, so
    the table is exactly-once under at-least-once foreachBatch delivery.
    Each commit reads only the source batch's buckets, range-pruned to
    the files its ids can touch — O(batch), never O(table).

    ``maintain_every=N`` runs :func:`..sinks.manifest_store.maintain_table`
    after every Nth micro-batch (kwargs via ``maintain_kwargs``): the
    small files + DVs that per-batch merges accumulate get compacted
    inline instead of by a separate cron. Maintenance losing an
    optimistic race to a concurrent writer just defers to the next
    trigger — the merge itself is never blocked."""
    from ..sinks.manifest_store import (ConcurrentWriteError, maintain_table,
                                        merge_table)

    stream = (
        spark.readStream.schema(DOCUMENTS_SCHEMA)
        .option("maxFilesPerTrigger", 4)
        .parquet(input_dir)
    )
    records = stream.select(
        F.col("doc_id").cast("string").alias("documentid"),
        "text", "lang", "source", "n_chars",
    )

    def sink(batch_df: DataFrame, epoch_id: int) -> None:
        merge_table(batch_df.dropDuplicates(["documentid"]), table_path,
                    matched_condition=matched_condition,
                    txn=(app, epoch_id))
        if maintain_every and (epoch_id + 1) % maintain_every == 0:
            try:
                maintain_table(spark, table_path, **(maintain_kwargs or {}))
            except ConcurrentWriteError:
                pass  # a live writer won the race; next trigger retries

    return (
        records.writeStream.outputMode("append")
        .foreachBatch(sink)
        .trigger(availableNow=True)
        .start()
    )


def _maybe_maintain(spark, table_path: str, epoch_id: int,
                    maintain_every: int | None,
                    maintain_kwargs: dict | None) -> None:
    """Every Nth micro-batch, run table maintenance inline (compact the
    small files + DVs that per-batch DV merges accumulate). Losing the
    optimistic race to a live writer defers to the next trigger — the
    data commit itself is never blocked. Shared by the scd2 sinks;
    stream_upsert carries the same logic inline."""
    if not maintain_every or (epoch_id + 1) % maintain_every:
        return
    from ..sinks.manifest_store import ConcurrentWriteError, maintain_table

    try:
        maintain_table(spark, table_path, **(maintain_kwargs or {}))
    except ConcurrentWriteError:
        pass


def stream_scd2(records: DataFrame, table_path: str, *,
                tracked: list, effective_col: str = "effective_ts",
                app: str = "stream_scd2",
                maintain_every: int | None = None,
                maintain_kwargs: dict | None = None):
    """Streaming SCD Type 2 apply: each micro-batch of key observations
    merges into the dimension via :func:`..sinks.scd.scd2_merge` —
    changed keys close their current row and open a new version,
    unchanged keys are no-ops. Within a batch, the LATEST observation
    per key wins (``row_number`` over ``effective_col`` descending —
    micro-batch granularity is snapshot granularity, the same collapsing
    Delta's streaming-merge guidance prescribes; equal stamps break
    arbitrarily, which is safe under retries because the ``(app,
    epoch)`` txn makes a re-delivered batch a committed no-op — the
    first commit's choice stands). A non-monotone batch (an effective
    stamp at or before a key's current ``valid_from``) fails the stream
    loudly rather than silently corrupting history order.

    ``records`` is any streaming DataFrame carrying ``documentid``, the
    ``tracked`` attribute columns, and ``effective_col``. Returns the
    started query (availableNow trigger — rerun to drain new data)."""
    from pyspark.sql.window import Window

    from ..sinks.scd import scd2_merge

    def sink(batch_df: DataFrame, epoch_id: int) -> None:
        w = Window.partitionBy("documentid").orderBy(
            F.col(effective_col).desc())
        latest = (batch_df.withColumn("_rn", F.row_number().over(w))
                  .filter("_rn = 1").drop("_rn"))
        scd2_merge(latest, table_path, tracked=tracked,
                   effective_col=effective_col, txn=(app, epoch_id))
        _maybe_maintain(batch_df.sparkSession, table_path, epoch_id,
                        maintain_every, maintain_kwargs)

    return (records.writeStream.outputMode("append")
            .foreachBatch(sink)
            .trigger(availableNow=True)
            .start())


def stream_history(spark, src_table: str, dim_table: str, *,
                   tracked: list, app: str = "stream_history",
                   maintain_every: int | None = None,
                   maintain_kwargs: dict | None = None):
    """Turn a Type-1 operational table into a Type-2 HISTORY table by
    following its change feed: each micro-batch of
    :func:`..streaming.table_source.stream_changes` rows collapses to
    the last change per key (same rule as :func:`stream_replicate`),
    then applies as one :func:`..sinks.scd.scd2_merge` — inserts and
    update post-images open new versions (unchanged attributes are
    detected and skipped), pure deletes become tombstones that close the
    key's history. ``valid_from``/``valid_to`` stamps are the SOURCE
    COMMIT VERSIONS (monotone per key by construction), so the dimension
    is point-in-time queryable against source versions via
    :func:`..sinks.scd.scd2_at`. Commits apply ONE AT A TIME inside the
    sink (a micro-batch may span several source commits), each under a
    txn whose epoch is the source version — no intermediate version is
    ever collapsed away, and replays skip already-applied commits.
    Returns the started availableNow query."""
    from ..sinks.manifest_store import pair_update_images
    from ..sinks.scd import scd2_merge
    from .table_source import stream_changes

    def sink(batch_df: DataFrame, epoch_id: int) -> None:
        # a batch may span several source commits (availableNow captures
        # its end offset up front, so source-side pacing cannot split
        # it): apply them one at a time, oldest first, each under a txn
        # whose epoch IS the source version — exactly-once per commit,
        # and a replayed batch skips the versions already applied
        batch = batch_df.localCheckpoint()
        versions = sorted(r[0] for r in
                          batch.select("_commit_version").distinct().collect())
        for v in versions:
            paired = pair_update_images(
                batch.filter(F.col("_commit_version") == v))
            live = paired.filter(F.col("_change_type") != "update_preimage")
            obs = live.select(
                "documentid", *tracked,
                F.col("_commit_version").cast("double").alias("effective_ts"),
                (F.col("_change_type") == "delete").alias("_tombstone"))
            scd2_merge(obs, dim_table, tracked=tracked,
                       deleted_col="_tombstone", txn=(app, v))
        _maybe_maintain(spark, dim_table, epoch_id,
                        maintain_every, maintain_kwargs)

    return (stream_changes(spark, src_table, max_commits_per_trigger=1)
            .writeStream.outputMode("append")
            .foreachBatch(sink)
            .trigger(availableNow=True)
            .start())


def stream_events_windowed(spark, events_dir: str, window: str = "5 minutes",
                           slide: str = "5 minutes", watermark: str = "10 minutes",
                           query_name: str = "events_windowed",
                           glob: str = "events*.parquet"):
    """Watermarked tumbling/sliding window counts+sums per event_type into an
    in-memory sink (smoke-testable with availableNow + processAllAvailable).

    ``glob`` selects the event files inside ``events_dir`` (the driver's sf
    dirs mix several tables in one directory — widen it for a dedicated
    events directory). Note two inherent semantics: (1) append output mode
    only emits windows the watermark has passed, so the final
    ``watermark``-worth of data stays unflushed when the stream ends — by
    design for late-data correctness; (2) timestamps are read as NTZ and
    cast to session-zone TIMESTAMP (run under a UTC session for oracle
    parity)."""
    stream = normalize_event_ts(
        spark.readStream.schema(events_stream_schema(spark, events_dir, glob))
        .option("pathGlobFilter", glob)
        .parquet(events_dir)
    )
    agg = (
        stream.withWatermark("ts", watermark)
        .groupBy(F.window("ts", window, slide), "event_type")
        # decimal-exact sum: a parallel DOUBLE sum is accumulation-order
        # dependent, which would break cross-engine oracle equality
        .agg(F.count("*").alias("n"),
             F.sum(F.col("value").cast("decimal(18,6)")).cast("double")
             .alias("sum_value"))
        .select(
            F.col("window.start").alias("win_start"),
            F.col("window.end").alias("win_end"),
            "event_type",
            "n",
            "sum_value",
        )
    )
    return (
        agg.writeStream.outputMode("append")
        .format("memory")
        .queryName(query_name)
        .trigger(availableNow=True)
        .start()
    )


def stream_events_sessions(spark, events_dir: str, gap: str = "30 minutes",
                           watermark: str = "10 minutes",
                           query_name: str = "events_sessions",
                           glob: str = "events*.parquet"):
    """Watermarked per-user session windows (``F.session_window`` — the
    merging-window stateful op): sessions close when the watermark passes
    their end, so append mode emits each finished session exactly once.
    Batch twin: the events_session_window driver query — same gap
    semantics (a gap of exactly ``gap`` starts a new session), which is
    how the streaming output is oracle-checkable after the stream drains."""
    stream = normalize_event_ts(
        spark.readStream.schema(events_stream_schema(spark, events_dir, glob))
        .option("pathGlobFilter", glob)
        .parquet(events_dir)
    )
    agg = (
        stream.withWatermark("ts", watermark)
        .groupBy(F.session_window("ts", gap).alias("w"), "user_id")
        .agg(F.count("*").alias("n_events"))
        .select(
            "user_id",
            F.col("w.start").alias("session_start"),
            F.col("w.end").alias("session_end"),
            "n_events",
        )
    )
    return (
        agg.writeStream.outputMode("append")
        .format("memory")
        .queryName(query_name)
        .trigger(availableNow=True)
        .start()
    )


def stream_events_interval_join(spark, events_dir: str,
                                left_type: str = "click",
                                right_type: str = "purchase",
                                within: str = "30 minutes",
                                watermark: str = "60 minutes",
                                query_name: str = "events_interval_join",
                                glob: str = "events*.parquet"):
    """Watermarked stream-stream interval join: right-side events
    attributed to a preceding left-side event by the same user within
    ``within`` (the click→purchase conversion shape).

    Both sides carry a watermark and the join condition bounds event
    time in both directions, so Spark can size and evict join state:
    each side retains only ``watermark + within`` of events per key —
    that bound, not the stream length, is the state footprint at
    100 TB/day. Inner matches are emitted within the micro-batch they
    complete in, so with availableNow + a drained stream the output
    equals the batch join (pinned by
    tests/test_streaming.py::test_stream_interval_join_matches_batch).
    """
    src = normalize_event_ts(
        spark.readStream.schema(events_stream_schema(spark, events_dir, glob))
        .option("pathGlobFilter", glob)
        .parquet(events_dir)
    )
    left = (
        src.filter(F.col("event_type") == left_type)
        .select(
            F.col("user_id").alias("l_user"),
            F.col("event_id").alias("left_id"),
            F.col("ts").alias("left_ts"),
        )
        .withWatermark("left_ts", watermark)
    )
    right = (
        src.filter(F.col("event_type") == right_type)
        .select(
            F.col("user_id").alias("user_id"),
            F.col("event_id").alias("right_id"),
            F.col("ts").alias("right_ts"),
        )
        .withWatermark("right_ts", watermark)
    )
    joined = left.join(
        right,
        (F.col("l_user") == F.col("user_id"))
        & (F.col("right_ts") >= F.col("left_ts"))
        & (F.col("right_ts") <= F.col("left_ts") + F.expr(f"INTERVAL {within}")),
    ).select("user_id", "left_id", "right_id", "left_ts", "right_ts")
    return (
        joined.writeStream.outputMode("append")
        .format("memory")
        .queryName(query_name)
        .trigger(availableNow=True)
        .start()
    )


def stream_events_dedup(spark, events_dir: str,
                        watermark: str = "60 minutes",
                        query_name: str = "events_dedup",
                        glob: str = "events*.parquet"):
    """Native streaming deduplication: ``dropDuplicatesWithinWatermark``
    on ``event_id`` over a stream that delivers every event TWICE (the
    source unioned with itself — the at-least-once delivery shape this
    operator exists for).

    Unlike plain ``dropDuplicates`` (whose key state grows forever), the
    within-watermark variant evicts each key once the watermark passes
    its event time + the duplicate window — at 100 TB/day the state is
    bounded by (event rate × watermark), independent of stream length.
    Duplicates of an emitted row arriving within the watermark are
    guaranteed dropped; here both copies arrive in the same micro-batch,
    so the drained output is exactly one row per event_id == the batch
    DISTINCT — which makes this streaming query fully oracle-checkable.
    """
    schema = events_stream_schema(spark, events_dir, glob)

    def src():
        return normalize_event_ts(
            spark.readStream.schema(schema)
            .option("pathGlobFilter", glob)
            .parquet(events_dir)
        )

    doubled = src().unionByName(src())
    deduped = (
        doubled.withWatermark("ts", watermark)
        .dropDuplicatesWithinWatermark(["event_id"])
        .select("event_id", "ts", "user_id", "event_type", "value")
    )
    return (
        deduped.writeStream.outputMode("append")
        .format("memory")
        .queryName(query_name)
        .trigger(availableNow=True)
        .start()
    )


def stream_ingest_dedup(spark, input_dir: str, table_path: str):
    """Continuous ingest keeping exactly one copy per distinct content.

    Per micro-batch: within-batch ``dropDuplicates`` on the content hash,
    cross-batch LEFT ANTI join against the hashes already committed, then
    an append-only O(batch) commit to the versioned table. The dedup state
    is the TABLE itself, not a streaming state store — restarts (and full
    re-reads of the input) are idempotent with no checkpoint recovery, and
    the same per-batch function serves batch backfills unchanged. The
    anti-join reads one 32-byte column of the table per batch (column
    pruning); at 100 TB keep the hash column in its own compacted bucket
    files or front it with a bloom filter — the commit protocol is
    unchanged. Returns the started StreamingQuery.
    """
    from ..sinks import manifest_store as ms

    stream = (
        spark.readStream.schema(DOCUMENTS_SCHEMA)
        .option("maxFilesPerTrigger", 4)
        .parquet(input_dir)
    )
    # Null text is dropped up front: md5(NULL) is NULL, and NULL join keys
    # never anti-join-match, so null-content rows would bypass dedup and
    # re-append on every restart (there is nothing to ingest in them anyway).
    docs = (
        stream.filter(F.col("text").isNotNull())
        .withColumn("content_hash", F.md5(F.col("text")))
        .withColumn("documentid", F.col("doc_id").cast("string"))
    )

    def sink(batch_df: DataFrame, epoch_id: int) -> None:
        batch = batch_df.dropDuplicates(["content_hash"])
        if ms.current_version(table_path) is not None:
            seen = ms.read_table(spark, table_path).select("content_hash").distinct()
            batch = batch.join(seen, "content_hash", "left_anti")
        batch = batch.localCheckpoint(eager=True)  # plan reused twice below
        if batch.limit(1).count() == 0:
            return
        ms.append_table(batch, table_path)

    return (
        docs.writeStream.outputMode("append")
        .foreachBatch(sink)
        .trigger(availableNow=True)
        .start()
    )


def winning_changes(batch_df: DataFrame) -> DataFrame:
    """Rows of the last-committed change per documentid within one
    change-feed micro-batch. The winner per key is selected as
    ``max(struct(_commit_version, is_insert))`` — map-side-combinable,
    insert outranks delete at the same version (an update's delete half
    is superseded by its insert half) — then equi-joined back so ALL
    rows of the winning change survive (a ``row_number()==1`` pick
    would truncate chunked documents to one arbitrary row).

    The join-back carries NO broadcast hint: a replica bootstrapping a
    large table gets one batch spanning the entire keyset, and a forced
    ``broadcast(winners)`` would materialize one row per distinct
    documentid on every executor — an OOM at the 100 TB design point.
    A plain equi-join lets AQE broadcast small batches at runtime and
    shuffle large ones."""
    import pyspark.sql.functions as SF

    # winners is built from ONLY the change-feed columns (a source table
    # may legitimately carry columns named like the helpers), and every
    # helper column is dropped by its winners-side Column REFERENCE, so a
    # same-named data column on the batch side survives untouched
    winners = (batch_df
               .select("documentid", "_commit_version", "_change_type")
               .withColumn("__wc_ins", (SF.col("_change_type") == "insert")
                           .cast("int"))
               .groupBy("documentid")
               .agg(SF.max(SF.struct(SF.col("_commit_version"),
                                     SF.col("__wc_ins"))).alias("__wc_w"))
               .select("documentid",
                       SF.col("__wc_w._commit_version").alias("__wc_wv"),
                       SF.col("__wc_w.__wc_ins").alias("__wc_wins")))
    return batch_df.join(
        winners,
        on=[batch_df["documentid"] == winners["documentid"],
            batch_df["_commit_version"] == winners["__wc_wv"],
            (batch_df["_change_type"] == "insert").cast("int")
            == winners["__wc_wins"]],
    ).drop(winners["documentid"]).drop(winners["__wc_wv"]) \
     .drop(winners["__wc_wins"])


def stream_table_pipeline(spark, src_table: str, dst_table: str,
                          checkpoint: str, transform=None,
                          app: str = "table_pipeline",
                          skip_change_commits: bool = False,
                          available_now: bool = True,
                          starting_version=None,
                          max_commits_per_trigger=None):
    """Table-to-table streaming pipeline — the medallion silver job as
    one call: TAIL ``src_table`` through the streaming table source
    (:func:`..streaming.table_source.stream_table` — snapshot first,
    then appended commits), apply ``transform`` (DataFrame -> DataFrame,
    must keep ``documentid``) per micro-batch, and apply the result to
    ``dst_table`` as one replace-by-documentid commit exactly-once
    (``(app, epoch)`` txn guard, so retried batches are no-ops and
    re-running a drained pipeline commits nothing). The transform may
    emit MULTIPLE rows per documentid (a chunker fans a document out) —
    documents are whole replacement units everywhere in this store, so
    the apply is :func:`..sinks.manifest_store.incremental_replace`
    (``mode="dv"``, O(batch)), NOT a one-row-per-key MERGE, which would
    silently truncate chunked documents to one arbitrary row. Batches
    whose transform yields no rows skip the commit.

    Cost per sync is O(new commits): the source plans from manifest
    diffs and the replace writes the batch plus one deletion vector.
    ``max_commits_per_trigger`` bounds how many source commits one
    micro-batch may span (so a catch-up over a long history is paced
    instead of landing as one table-sized batch) and
    ``starting_version`` skips the snapshot and tails from a commit.
    Returns the StreamingQuery (``awaitTermination()`` it)."""
    from ..sinks.manifest_store import incremental_replace
    from .table_source import stream_table

    src = stream_table(spark, src_table,
                       starting_version=starting_version,
                       skip_change_commits=skip_change_commits,
                       max_commits_per_trigger=max_commits_per_trigger,
                       pace_from_start=(max_commits_per_trigger is not None
                                        and starting_version is not None
                                        and not available_now),
                       # restart anchor: the paced seed reads the
                       # query's own offset log so a restored stream
                       # never polls below its committed offset
                       checkpoint=checkpoint)

    def sink(batch_df: DataFrame, epoch_id: int) -> None:
        out = transform(batch_df) if transform is not None else batch_df
        if "documentid" not in out.columns:
            raise ValueError("transform must keep the documentid column")
        if out.isEmpty():
            return
        incremental_replace(out, dst_table, mode="dv", txn=(app, epoch_id))

    writer = (src.writeStream.outputMode("append")
              .foreachBatch(sink)
              .option("checkpointLocation", checkpoint))
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def stream_replicate(spark, src_table: str, dst_table: str,
                     checkpoint: str, app: str = "stream_replicate",
                     skip_rewrites: bool = False,
                     available_now: bool = True,
                     starting_version: int = 0,
                     max_commits_per_trigger=None):
    """Continuous replication off the streaming CHANGE FEED
    (:func:`..streaming.table_source.stream_changes`) — the streaming
    twin of :func:`..sinks.manifest_store.sync_table`: every micro-batch
    applies its winning insert rows as one replace-by-documentid commit
    (``incremental_replace(mode="dv")`` — multi-row/chunked documents
    replace atomically, which a one-row-per-key MERGE cannot express;
    same apply path as the batch twin) and its pure-delete keys (keys
    whose last change in the batch is a delete) as a delete MERGE, each
    exactly-once under its own ``(app, epoch)`` txn. The replica follows
    UPDATES and DELETES, which plain ``stream_table`` tailing cannot.
    Cost per sync is O(changes).

    A batch may span several source commits; within one batch the
    last-committed change of a document wins — selected per key as
    ``max(struct(_commit_version, is_insert))`` (insert outranks delete
    at the same version: an update's delete half is superseded by its
    insert half), then joined back so ALL rows of the winning change
    survive, not one arbitrary row (:func:`winning_changes` — no
    broadcast hint; AQE sizes the join). This equals the source's
    final state for the commit range. ``max_commits_per_trigger``
    paces catch-up so a replica bootstrapping a large table never
    sees one batch spanning the whole history (processing-time
    triggers; an ``availableNow`` run's end-capture precedes the
    pacing position by design — same documented behavior as the
    table source); ``starting_version`` resumes the feed
    mid-history. Returns the StreamingQuery."""
    from ..sinks.manifest_store import incremental_replace, merge_table
    from .table_source import stream_changes

    feed = stream_changes(spark, src_table,
                          starting_version=starting_version,
                          skip_rewrites=skip_rewrites,
                          max_commits_per_trigger=max_commits_per_trigger,
                          # paced bootstrap is the point of the cap on a
                          # processing-time replica; an availableNow run
                          # keeps the drain-everything contract (its one
                          # catch-up batch is unpaced by design)
                          pace_from_start=(max_commits_per_trigger
                                           is not None
                                           and not available_now),
                          # restart anchor: the paced seed reads the
                          # query's own offset log so a restored stream
                          # never polls below its committed offset
                          checkpoint=checkpoint)

    def sink(batch_df: DataFrame, epoch_id: int) -> None:
        import pyspark.sql.functions as SF

        data_cols = [c for c in batch_df.columns
                     if c not in ("_change_type", "_commit_version")]
        last = winning_changes(batch_df).localCheckpoint(eager=False)
        ins = last.filter(SF.col("_change_type") == "insert") \
            .select(*data_cols)
        dels = last.filter(SF.col("_change_type") == "delete") \
            .select("documentid").distinct()
        if not ins.isEmpty():
            incremental_replace(ins, dst_table, mode="dv",
                                txn=(f"{app}-ins", epoch_id))
        if not dels.isEmpty():
            merge_table(dels, dst_table, when_matched="delete",
                        when_not_matched=None,
                        txn=(f"{app}-del", epoch_id))

    writer = (feed.writeStream.outputMode("append")
              .foreachBatch(sink)
              .option("checkpointLocation", checkpoint))
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
