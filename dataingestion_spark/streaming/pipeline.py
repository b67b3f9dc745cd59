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

# ts is TIMESTAMP(NANOS) in the driver's parquet — Spark must read it as
# long (spark.sql.legacy.parquet.nanosAsLong) and truncate to micros.
EVENTS_SCHEMA = T.StructType(
    [
        T.StructField("event_id", T.LongType()),
        T.StructField("ts", T.LongType()),
        T.StructField("user_id", T.LongType()),
        T.StructField("event_type", T.StringType()),
        T.StructField("value", T.DoubleType()),
        T.StructField("props", T.StringType()),
    ]
)


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
        # one versioned O(changed-buckets) commit per micro-batch
        write_vector_table_versioned(batch_df, table_path, incremental=True,
                                     deterministic_keys=True)

    return (
        chunks.writeStream.outputMode("append")
        .foreachBatch(sink)
        .trigger(availableNow=True)
        .start()
    )


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
    design for late-data correctness; (2) reading TIMESTAMP(NANOS) parquet
    requires the session-wide nanosAsLong flag, which this function sets."""
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    stream = (
        spark.readStream.schema(EVENTS_SCHEMA)
        .option("pathGlobFilter", glob)
        .parquet(events_dir)
        .withColumn("ts", F.timestamp_micros(F.expr("ts DIV 1000")))
    )
    agg = (
        stream.withWatermark("ts", watermark)
        .groupBy(F.window("ts", window, slide), "event_type")
        .agg(F.count("*").alias("n"), F.round(F.sum("value"), 6).alias("sum_value"))
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
