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
    readers: one task per file, memory bounds to one decompressed
    shard per task, multi-frame streams accepted. An oversized
    MULTI-frame shard can instead split across executors —
    :func:`read_jsonl_zst_split` (write with ``frame_lines=`` to make
    shards frame-aligned).
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
                    level: int = 3, prefix: str = "part",
                    frame_lines: Optional[int] = None) -> list:
    """Write ``df`` as ``shards`` zstd-compressed JSONL files.

    Rows hash-shard on ``order_by`` (default: first column) and sort
    within a shard — the same deterministic-bytes contract as the
    TFRecord/WebDataset sinks, so re-exports are idempotent and shards
    content-addressable. One task per shard; raise ``shards`` to scale
    (a big export wants file sizes a downstream one-task-per-file
    reader can hold decompressed in memory). Returns shard names.

    ``frame_lines=N`` compresses every N lines as its OWN zstd frame
    (frames are self-contained and concatenable per RFC 8878), making
    the shard SPLITTABLE: :func:`read_jsonl_zst_split` byte-range
    reads it across executors, so one oversized shard no longer pins
    parallelism to the file count. Whole-line frames are the split
    contract — the default single-frame layout stays byte-identical
    to previous rounds."""
    import os

    if shards < 1:
        raise ValueError("shards must be >= 1")
    if frame_lines is not None and frame_lines < 1:
        raise ValueError("frame_lines must be >= 1")
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
        codec = pa.Codec("zstd", compression_level=level)
        if frame_lines is None:
            bodies = [("\n".join(pdf["_j"]) + "\n").encode("utf-8")]
        else:
            js = list(pdf["_j"])
            bodies = [("\n".join(js[at:at + frame_lines]) + "\n")
                      .encode("utf-8")
                      for at in range(0, len(js), frame_lines)]
        tmp = os.path.join(path, f".{name}.tmp")
        with open(tmp, "wb") as f:
            for body in bodies:  # one self-contained frame per chunk
                f.write(codec.compress(body).to_pybytes())
        os.replace(tmp, os.path.join(path, name))
        return pd.DataFrame({"name": [name], "n_records": [len(pdf)]})

    manifest = (payload.groupBy("_shard").applyInPandas(
        write_shard, "name string, n_records long").collect())
    return sorted(r["name"] for r in manifest)


def stream_jsonl_zst(spark: SparkSession, path: str,
                     schema: Optional[T.StructType] = None,
                     keep_corrupt: bool = False,
                     glob: str = "*.jsonl.zst",
                     max_files_per_trigger: Optional[int] = None
                     ) -> DataFrame:
    """Streaming twin of :func:`read_jsonl_zst`: continuously ingest a
    landing directory of ``.jsonl.zst`` shards (the DCLM corpus shape
    :func:`stream_jsonl` can't tail — Spark's text source has no zstd
    codec in this image).

    The binaryFile STREAMING source provides the same exactly-once
    shard discovery as the text source (checkpointed file log);
    decompression and line parsing are byte-identical to the batch
    reader (shared decompress shape + ``_parse_lines``), so corrupt
    lines are data here too. One task per discovered file;
    ``max_files_per_trigger`` paces catch-up after downtime."""
    # streaming sources require the schema up front; binaryFile's is
    # fixed by the format
    reader = (spark.readStream.format("binaryFile")
              .schema("path string, modificationTime timestamp, "
                      "length long, content binary")
              .option("pathGlobFilter", glob))
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger",
                               str(max_files_per_trigger))

    def decompress(batches):
        import pandas as pd
        import pyarrow as pa

        for pdf in batches:
            for blob in pdf["content"]:
                data = pa.input_stream(pa.py_buffer(bytes(blob)),
                                       compression="zstd").read()
                lines = data.decode("utf-8").split("\n")
                yield pd.DataFrame({"value": lines})

    raw = (reader.load(path).select("content")
           .mapInPandas(decompress, "value string"))
    return _parse_lines(raw, schema or DOCUMENTS_SCHEMA, keep_corrupt)


# ---------------------------------------------------------------------------
# scale-IN: byte-range splitting of multi-frame .jsonl.zst shards
# (RFC 8878 structural frame walk — no decompression needed to plan)

_ZSTD_MAGIC = b"\x28\xb5\x2f\xfd"          # 0xFD2FB528 little-endian


def _zst_sniff_meta(path: str, backend) -> tuple:
    """(first four bytes, file size) for split planning — callable
    driver- or executor-side."""
    head = backend.read_range(path, 0, 4)
    size = backend.size(path)
    if head is None or size is None:
        raise FileNotFoundError(path)
    return head, size


def _zstd_frame_end(fh, at: int, size: int) -> Optional[int]:
    """Offset just past the zstd (or skippable) frame starting at
    ``at``, or None when the bytes there do not parse as one — a pure
    STRUCTURAL walk (RFC 8878 §3): frame header fields give the block
    stream's start, each 3-byte block header gives the next block, so
    a frame skips in O(blocks) tiny reads with zero decompression.
    Used both to validate resync candidates (a false magic inside
    compressed data fails the walk or its chain check) and to find the
    range's end boundary."""
    fh.seek(at)
    magic = fh.read(4)
    if len(magic) < 4:
        return None
    m = int.from_bytes(magic, "little")
    if (m & 0xFFFFFFF0) == 0x184D2A50:     # skippable frame
        sz = fh.read(4)
        if len(sz) < 4:
            return None
        end = at + 8 + int.from_bytes(sz, "little")
        return end if end <= size else None
    if m != 0xFD2FB528:
        return None
    fhd_b = fh.read(1)
    if not fhd_b:
        return None
    fhd = fhd_b[0]
    if fhd & 0x08:                         # reserved bit must be 0
        return None
    single = (fhd >> 5) & 1
    pos = at + 5
    if not single:
        pos += 1                           # Window_Descriptor
    pos += (0, 1, 2, 4)[fhd & 3]           # Dictionary_ID
    pos += (1 if single else 0, 2, 4, 8)[fhd >> 6]  # Content_Size
    while True:                            # block walk
        if pos + 3 > size:
            return None
        fh.seek(pos)
        h = fh.read(3)
        if len(h) < 3:
            return None
        v = int.from_bytes(h, "little")
        last, btype, bsize = v & 1, (v >> 1) & 3, v >> 3
        if btype == 3:                     # reserved type
            return None
        pos += 3 + (1 if btype == 1 else bsize)   # RLE stores 1 byte
        if pos > size:
            return None
        if last:
            break
    if fhd & 0x04:                         # Content_Checksum
        pos += 4
        if pos > size:
            return None
    return pos


def _find_zstd_frame(fh, start: int, size: int) -> Optional[int]:
    """First VALIDATED frame start at offset >= start: magic bytes
    must also pass the structural walk AND chain to a second valid
    frame or exact EOF (same ~squared-error discipline as the TFRecord
    resync)."""
    CHUNK = 1 << 20
    base = start
    carry = b""
    while base < size:
        fh.seek(base)
        chunk = fh.read(CHUNK)
        if not chunk:
            return None
        buf = carry + chunk
        buf_at = base - len(carry)
        i = 0
        while True:
            i = buf.find(_ZSTD_MAGIC, i)
            if i < 0:
                break
            cand = buf_at + i
            if cand >= start:
                end = _zstd_frame_end(fh, cand, size)
                if end is not None and (
                        end == size
                        or _zstd_frame_end(fh, end, size) is not None):
                    return cand
            i += 1
        carry = buf[-3:]
        base += len(chunk)
    return None


def _read_zst_span(path: str, start: int, end: int, size: int,
                   backend=None) -> bytes:
    """Raw bytes of every frame STARTING in [start, end) — itself a
    valid multi-frame zstd stream (frames are self-contained)."""
    from ..sinks.data_backend import open_split, resolve_split_backend

    with open_split(path, resolve_split_backend(path, backend)) as fh:
        if start == 0:
            pos = 0
        else:
            found = _find_zstd_frame(fh, start, size)
            if found is None or found >= end:
                return b""
            pos = found
        stop = pos
        while stop < end and stop < size:
            nxt = _zstd_frame_end(fh, stop, size)
            if nxt is None:
                raise ValueError(f"{path}: corrupt zstd frame at "
                                 f"byte {stop}")
            stop = nxt
        fh.seek(pos)
        return fh.read(stop - pos)


def read_jsonl_zst_split(spark: SparkSession, path: str,
                         schema: Optional[T.StructType] = None,
                         keep_corrupt: bool = False, *,
                         split_mb: int = 128,
                         glob_pat: str = "*.jsonl.zst",
                         backend=None) -> DataFrame:
    """Scale-IN .jsonl.zst reader for MULTI-FRAME shards (written with
    ``write_jsonl_zst(frame_lines=N)`` or any writer that starts a
    fresh frame at a line boundary — zstd frames are self-contained
    and concatenable, RFC 8878).

    Byte ranges of ``split_mb`` per file; a task landing mid-frame
    resyncs on the frame magic VALIDATED by a structural block walk
    chained to the next frame (a false magic inside compressed data
    fails one of the two), then decompresses exactly the frames that
    START in its range. Each decompressed span must end at a line
    boundary — frames that split a JSON line across tasks raise
    loudly (use :func:`read_jsonl_zst`, one task per file). Line
    parsing shares ``_parse_lines``: the corrupt-record contract is
    identical to the whole-file readers. Whole-file single-frame
    shards degrade gracefully (split 0 owns the one frame). Local
    paths seek with ``open()``; other schemes route through the
    range-read DataBackend (or pass ``backend=``), like the
    avro/tfrecord/warc split readers."""
    from ..sinks.data_backend import (
        list_split_files, resolve_split_backend,
    )

    if split_mb < 1:
        raise ValueError("split_mb must be >= 1")
    backend = resolve_split_backend(path, backend)
    files = list_split_files(path, glob_pat, backend)
    if not files:
        raise ValueError(f"no files match {glob_pat!r} under {path}")
    # one tiny sniff + stat per file; distributed above 32 files so a
    # huge landing dir never serializes on driver IO (same pattern as
    # the avro/tfrecord/warc/arrow split planners)
    if len(files) <= 32:
        probes = {p: _zst_sniff_meta(p, backend) for p in files}
    else:
        bk = backend
        probes = dict(
            spark.sparkContext
            .parallelize(files, min(len(files), 256))
            .map(lambda p: (p, _zst_sniff_meta(p, bk))).collect())
    metas = {}
    for p in files:
        head, size = probes[p]
        m = int.from_bytes(head.ljust(4, b"\x00"), "little")
        if m != 0xFD2FB528 and (m & 0xFFFFFFF0) != 0x184D2A50:
            raise ValueError(
                f"{p}: not zstd — read_jsonl_zst_split handles "
                "multi-frame zstd shards; use read_jsonl_zst")
        metas[p] = size

    step = split_mb << 20
    ranges = []
    for p in files:
        size = metas[p]
        lo = 0
        while lo < size:
            hi = min(lo + step, size)
            ranges.append((p, lo, hi, size))
            lo = hi
    rdf = spark.createDataFrame(
        ranges, "path string, start long, end long, size long"
    ).repartition(min(len(ranges), 4096))

    def decode(batches):
        import pandas as pd
        import pyarrow as pa

        for pdf in batches:
            for row in pdf.itertuples(index=False):
                span = _read_zst_span(row.path, int(row.start),
                                      int(row.end), int(row.size),
                                      backend=backend)
                if not span:
                    continue
                data = pa.input_stream(pa.py_buffer(span),
                                       compression="zstd").read()
                blob = data.to_pybytes() if hasattr(
                    data, "to_pybytes") else bytes(data)
                if blob and not blob.endswith(b"\n"):
                    raise ValueError(
                        f"{row.path}: frame ending at a mid-line byte "
                        "— shard is not line-aligned per frame; use "
                        "read_jsonl_zst (whole-file) instead")
                lines = blob.decode("utf-8").split("\n")
                yield pd.DataFrame({"value": lines})

    raw = rdf.mapInPandas(decode, "value string")
    return _parse_lines(raw, schema or DOCUMENTS_SCHEMA, keep_corrupt)
