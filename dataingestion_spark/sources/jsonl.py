"""JSONL corpus interchange (the Dolma / RedPajama / HF-datasets wire
format: one JSON document per line, optionally gzipped).

Readers in the reference consume files one at a time
(``MarkdownReader``/``MarkItDownReader``); web-scale corpora ship as
JSONL shards instead, so this is the ingestion format a training
pipeline actually starts from. Spark's native JSON source does the heavy
lifting — the value here is pinning the tolerant-read contract:

* **explicit schema always** (never inference — an inference pass is a
  full extra scan at 100 TB, and schema drift across shards silently
  widens types);
* **malformed lines are data, not poison**: PERMISSIVE mode routes them
  to ``_corrupt`` with every real column null, so one truncated shard
  tail can't kill a 10-hour job; count them, alert on the rate;
* round trips are byte-faithful for string/integer columns (JSON escapes
  newlines inside ``text``), so write→read is lossless — the driver
  query proves it against the parquet original.
"""

from __future__ import annotations

from typing import Optional

from pyspark.sql import DataFrame, SparkSession, functions as F, types as T

#: documents-table shape (TESTDATA.md); any schema works, this is the default
DOCUMENTS_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("text", T.StringType()),
        T.StructField("lang", T.StringType()),
        T.StructField("source", T.StringType()),
        T.StructField("n_chars", T.LongType()),
    ]
)

_CORRUPT = "_corrupt"


def _parse_lines(raw: DataFrame, schema: T.StructType,
                 keep_corrupt: bool) -> DataFrame:
    """Tolerant-parse a one-string-column ("value") frame of JSONL lines
    — shared by the text-source and zstd readers so the corrupt-line
    contract can never drift between them."""
    # from_json (Spark 4) yields a null-FIELDED struct for malformed input,
    # not a null struct — the corrupt-record field in the parse schema is
    # what actually distinguishes "unparseable line" from "all fields null"
    with_corrupt = T.StructType(
        list(schema.fields) + [T.StructField(_CORRUPT, T.StringType())]
    )
    parsed = raw.filter(F.trim(F.col("value")) != "").select(
        F.from_json(
            F.col("value"), with_corrupt,
            {"mode": "PERMISSIVE", "columnNameOfCorruptRecord": _CORRUPT},
        ).alias("_r")
    )
    if keep_corrupt:
        return parsed.select("_r.*")
    return parsed.filter(F.col(f"_r.{_CORRUPT}").isNull()).select("_r.*").drop(_CORRUPT)


def read_jsonl(spark: SparkSession, path: str,
               schema: Optional[T.StructType] = None,
               keep_corrupt: bool = False) -> DataFrame:
    """Schema-enforced tolerant JSONL read. With ``keep_corrupt`` the
    ``_corrupt`` column carries each unparseable line verbatim (null for
    good rows); otherwise corrupt lines are dropped silently — use
    :func:`corrupt_count` first when the rate matters.

    Implemented as ``text`` source + ``from_json`` rather than the native
    JSON source: same Jackson parser and pushdown-friendly scan, but free
    of the analyzer restriction that a plan referencing ONLY the internal
    corrupt-record column (e.g. a count after filtering on it) is
    disallowed — and blank lines are structural, never counted corrupt."""
    return _parse_lines(spark.read.text(path), schema or DOCUMENTS_SCHEMA,
                        keep_corrupt)


def corrupt_count(spark: SparkSession, path: str,
                  schema: Optional[T.StructType] = None) -> int:
    """Number of malformed lines in the shard set (one scan that prunes
    to the raw line column)."""
    df = read_jsonl(spark, path, schema, keep_corrupt=True)
    return df.filter(F.col(_CORRUPT).isNotNull()).count()


def write_jsonl(df: DataFrame, path: str, compression: Optional[str] = "gzip",
                shards: Optional[int] = None) -> None:
    """Write JSONL shards (one file per partition — pass ``shards`` to
    control the shard count; gzip by default, the format's convention)."""
    if shards is not None:
        df = df.repartition(shards)
    w = df.write.mode("overwrite")
    if compression:
        w = w.option("compression", compression)
    w.json(path)


def stream_jsonl(spark: SparkSession, path: str,
                 schema: Optional[T.StructType] = None,
                 keep_corrupt: bool = False,
                 max_files_per_trigger: Optional[int] = None) -> DataFrame:
    """Streaming twin of :func:`read_jsonl`: continuous ingestion of a
    landing directory of JSONL shards (gzip included — the file stream
    source decompresses like the batch one).

    Spark's file streaming source provides exactly-once shard
    discovery through the checkpoint's file log, so a curation
    pipeline tails a crawler's output directory with no bookkeeping of
    its own; ``max_files_per_trigger`` paces catch-up after downtime
    (the backlog drains in bounded micro-batches instead of one giant
    batch — same philosophy as the lakehouse sources'
    maxCommitsPerTrigger). Line parsing shares ``_parse_lines``, so
    the corrupt-record contract is identical to the batch reader:
    malformed lines are data, never poison a running stream."""
    reader = spark.readStream.format("text")
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger",
                               str(max_files_per_trigger))
    raw = reader.load(path)
    return _parse_lines(raw, schema or DOCUMENTS_SCHEMA, keep_corrupt)


def read_jsonl_zst(spark: SparkSession, path: str,
                   schema: Optional[T.StructType] = None,
                   keep_corrupt: bool = False,
                   glob: str = "*.jsonl.zst") -> DataFrame:
    """Tolerant JSONL read over zstd-compressed shards (the DCLM /
    RedPajama-v2 corpus shape, ``*.jsonl.zst``).

    Spark's text source lacks a zstd codec in this image, so shards
    decompress through pyarrow's bundled zstd in the same
    ``binaryFile`` + ``mapInPandas`` shape as the WARC/TFRecord
    readers: one task per file (zstd frames aren't splittable without
    a seekable-table sidecar; shard at write time), memory bounds to
    one decompressed shard per task, multi-frame streams accepted.
    Line parsing reuses :func:`read_jsonl`'s exact corrupt-record
    contract via the shared ``_parse_lines``."""
    schema = schema or DOCUMENTS_SCHEMA

    def decompress(batches):
        import pandas as pd
        import pyarrow as pa

        for pdf in batches:
            for blob in pdf["content"]:
                # CompressedInputStream, not Codec.decompress: the
                # one-shot API demands the decompressed size up front,
                # the stream API doesn't and accepts multi-frame files
                data = pa.input_stream(pa.py_buffer(bytes(blob)),
                                       compression="zstd").read()
                lines = data.decode("utf-8").split("\n")
                yield pd.DataFrame({"value": lines})

    raw = (spark.read.format("binaryFile")
           .option("pathGlobFilter", glob).load(path)
           .select("content")
           .mapInPandas(decompress, "value string"))
    return _parse_lines(raw, schema, keep_corrupt)


def write_jsonl_zst(df: DataFrame, path: str, shards: int = 4,
                    order_by: Optional[str] = None,
                    level: int = 3, prefix: str = "part") -> list:
    """Write ``df`` as ``shards`` zstd-compressed JSONL files.

    Rows hash-shard on ``order_by`` (default: first column) and sort
    within a shard — the same deterministic-bytes contract as the
    TFRecord/WebDataset sinks, so re-exports are idempotent and shards
    content-addressable. One task per shard; raise ``shards`` to scale
    (a big export wants file sizes a downstream one-task-per-file
    reader can hold decompressed in memory). Returns shard names."""
    import os

    if shards < 1:
        raise ValueError("shards must be >= 1")
    key = order_by or df.columns[0]
    os.makedirs(path, exist_ok=True)
    payload = df.select(
        F.col(key).cast("string").alias("_k"),
        F.to_json(F.struct(*[F.col(c) for c in df.columns])).alias("_j"),
    ).withColumn(
        "_shard", F.pmod(F.xxhash64(F.col("_k")), F.lit(shards)).cast("int"))

    def write_shard(pdf):
        import pandas as pd
        import pyarrow as pa

        if len(pdf) == 0:
            return pd.DataFrame({"name": [], "n_records": []})
        shard = int(pdf["_shard"].iloc[0])
        pdf = pdf.sort_values("_k", kind="mergesort")
        name = f"{prefix}-{shard:05d}-of-{shards:05d}.jsonl.zst"
        body = ("\n".join(pdf["_j"]) + "\n").encode("utf-8")
        codec = pa.Codec("zstd", compression_level=level)
        tmp = os.path.join(path, f".{name}.tmp")
        with open(tmp, "wb") as f:
            f.write(codec.compress(body).to_pybytes())
        os.replace(tmp, os.path.join(path, name))
        return pd.DataFrame({"name": [name], "n_records": [len(pdf)]})

    manifest = (payload.groupBy("_shard").applyInPandas(
        write_shard, "name string, n_records long").collect())
    return sorted(r["name"] for r in manifest)
