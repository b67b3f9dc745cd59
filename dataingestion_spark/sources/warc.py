"""WARC / WET web-archive reader (ISO 28500, the Common Crawl layout).

Large-scale text pipelines start from web archives: WARC response
captures or the derived WET text conversions, shipped as many
independent ~100 MB-1 GB files.  That layout is exactly what a Spark
``binaryFile`` scan wants — one file per task, records parsed
streaming inside an Arrow-batched ``mapInPandas``, so a 100 TB crawl
is just "point the glob at the bucket" with no driver involvement and
no shuffle.  (The reference ingests single documents through
``IngestionDocumentReader`` — ``src/Microsoft.Extensions.DataIngestion/
IngestionDocumentReader.cs`` — it has no archive-container source; this
module is the archive-scale analog of that read stage.)

Format essentials (public spec, ISO 28500 / WARC 1.1):

* a record is a version line ``WARC/1.0`` (or 1.1), CRLF-separated
  named headers, an empty line, then exactly ``Content-Length`` bytes
  of payload, then two CRLFs;
* header names are case-insensitive;
* files are commonly gzip-compressed — either the whole file or one
  gzip member per record (the Common Crawl convention); both
  decompress with a multi-member-aware loop.

The parser tolerates LF-only line endings and, with
``on_error="skip"``, drops malformed trailing records instead of
failing the task (crawl dumps do contain truncated files).
"""

from __future__ import annotations

import gzip
import io
import zlib
from typing import Any, Iterator, List, Optional, Tuple

from pyspark.sql import functions as F
from pyspark.sql.types import (
    LongType,
    StringType,
    StructField,
    StructType,
)

WARC_RECORD_SCHEMA = StructType(
    [
        StructField("path", StringType()),
        StructField("record_idx", LongType()),
        StructField("warc_type", StringType()),
        StructField("target_uri", StringType()),
        StructField("warc_date", StringType()),
        StructField("content_type", StringType()),
        StructField("content_length", LongType()),
        StructField("payload", StringType()),
    ]
)

_CRLF = b"\r\n"


def wet_record_bytes(
    uri: str,
    payload: bytes,
    warc_type: str = "conversion",
    date: str = "2026-01-01T00:00:00Z",
    content_type: str = "text/plain",
) -> bytes:
    """Serialize one WET-style record (test/synthesis helper)."""
    head = (
        f"WARC/1.0\r\n"
        f"WARC-Type: {warc_type}\r\n"
        f"WARC-Target-URI: {uri}\r\n"
        f"WARC-Date: {date}\r\n"
        f"Content-Type: {content_type}\r\n"
        f"Content-Length: {len(payload)}\r\n\r\n"
    ).encode()
    return head + payload + b"\r\n\r\n"


def wet_record_expr(uri_col, text_col, warc_type: str = "conversion",
                    content_type: str = "text/plain") -> "F.Column":
    """Column expression building the same record as ``wet_record_bytes``
    from string columns — lets a synthetic corpus be WET-serialized
    entirely JVM-side (Content-Length is the UTF-8 byte length)."""
    return F.concat(
        F.lit("WARC/1.0\r\n"),
        F.lit(f"WARC-Type: {warc_type}\r\n"),
        F.lit("WARC-Target-URI: "), uri_col, F.lit("\r\n"),
        F.lit("WARC-Date: 2026-01-01T00:00:00Z\r\n"),
        F.lit(f"Content-Type: {content_type}\r\n"),
        F.lit("Content-Length: "),
        F.octet_length(text_col).cast("string"),
        F.lit("\r\n\r\n"),
        text_col,
        F.lit("\r\n\r\n"),
    )


def _gunzip_all(data: bytes) -> bytes:
    """Decompress every gzip member in ``data`` (Common Crawl gzips each
    record as its own member; a plain whole-file gzip is the 1-member
    case)."""
    out = io.BytesIO()
    pos = 0
    while pos < len(data):
        d = zlib.decompressobj(wbits=zlib.MAX_WBITS | 16)
        out.write(d.decompress(data[pos:]))
        tail = d.unused_data
        if not tail:
            break
        pos = len(data) - len(tail)
    return out.getvalue()


def parse_warc_bytes(
    data: bytes, on_error: str = "fail"
) -> List[Tuple[str, str, str, str, int, bytes]]:
    """Parse one (possibly gzipped) WARC/WET file into records.

    Returns ``(warc_type, target_uri, warc_date, content_type,
    content_length, payload)`` tuples in file order.
    """
    if data[:2] == b"\x1f\x8b":
        data = _gunzip_all(data)
    records = []
    pos = 0
    n = len(data)
    while pos < n:
        # skip inter-record blank lines
        while pos < n and data[pos : pos + 1] in (b"\r", b"\n"):
            pos += 1
        if pos >= n:
            break
        try:
            if not data.startswith(b"WARC/", pos):
                raise ValueError(f"expected WARC/ version line at byte {pos}")
            line_end = data.index(b"\n", pos)
            pos = line_end + 1
            headers = {}
            while True:
                line_end = data.index(b"\n", pos)
                line = data[pos:line_end].rstrip(b"\r")
                pos = line_end + 1
                if not line:
                    break
                name, _, value = line.partition(b":")
                headers[name.strip().lower()] = value.strip()
            length = int(headers[b"content-length"])
            if pos + length > n:
                raise ValueError("truncated payload")
            payload = data[pos : pos + length]
            pos += length
        except (ValueError, KeyError, IndexError):
            if on_error == "skip":
                break
            raise
        records.append(
            (
                headers.get(b"warc-type", b"").decode("utf-8", "replace"),
                headers.get(b"warc-target-uri", b"").decode("utf-8", "replace"),
                headers.get(b"warc-date", b"").decode("utf-8", "replace"),
                headers.get(b"content-type", b"").decode("utf-8", "replace"),
                length,
                payload,
            )
        )
    return records


def parse_warc_files(df, content_col: str = "content", path_col: str = "path",
                     on_error: str = "fail"):
    """(path, content-bytes) DataFrame → one row per WARC record.

    Arrow-batched ``mapInPandas``; each input row (= one archive file)
    expands independently, so parallelism is the file count and memory
    is bounded by the largest single file — the intended unit for
    crawl dumps.  Payloads decode as UTF-8 (replacement chars on bad
    bytes), matching WET's text/plain contract.
    """

    def run(batches) -> Iterator:
        import pandas as pd

        for pdf in batches:
            rows = []
            for path, content in zip(pdf[path_col], pdf[content_col]):
                recs = parse_warc_bytes(bytes(content), on_error=on_error)
                for i, (wt, uri, date, ctype, length, payload) in enumerate(recs):
                    rows.append(
                        (
                            path,
                            i,
                            wt,
                            uri,
                            date,
                            ctype,
                            length,
                            payload.decode("utf-8", "replace"),
                        )
                    )
            yield pd.DataFrame(
                rows, columns=[f.name for f in WARC_RECORD_SCHEMA.fields]
            )

    return df.select(path_col, content_col).mapInPandas(
        run, schema=WARC_RECORD_SCHEMA
    )


def read_warc(
    spark,
    path: str,
    glob: str = "*.we[tb]*",
    recursive: bool = False,
    on_error: str = "fail",
):
    """Distributed WARC/WET → records scan (binaryFile + mapInPandas)."""
    from .markdown import binary_file_scan

    files = binary_file_scan(spark, path, glob, recursive)
    return parse_warc_files(files, on_error=on_error)


def stream_warc(spark, path: str, glob: str = "*.we[tb]*",
                on_error: str = "fail",
                max_files_per_trigger=None):
    """Streaming twin of :func:`read_warc`: continuously ingest a
    landing directory of WARC/WET shards (a crawler's output) with the
    file stream source's checkpointed exactly-once discovery. Record
    parsing is the batch reader's code (`parse_warc_files` runs on a
    streaming frame unchanged), so the tolerant-parse contract is
    identical. ``max_files_per_trigger`` paces catch-up."""
    from .markdown import stream_binary_files

    return parse_warc_files(
        stream_binary_files(spark, path, glob,
                            max_files_per_trigger=max_files_per_trigger),
        on_error=on_error)


def read_warc_split(spark, path: str, *, split_mb: int = 128,
                    glob_pat: str = "*.we[tb]*.gz",
                    on_error: str = "fail",
                    backend: Optional[Any] = None):
    """Scale-IN WARC reader for MEMBER-PER-RECORD gzip archives (the
    Common Crawl convention: each record is its own gzip member, so a
    ~1 GB .warc.gz/.wet.gz is a concatenation of independently
    decompressible members).

    Byte ranges of ``split_mb`` per file; a task landing mid-member
    scans for the next gzip member header (``1f 8b 08``) and VALIDATES
    it by actually decompressing and checking the ``WARC/`` version
    line — a false magic inside compressed data fails one of the two
    checks. A member belongs to the split its header starts in, so
    coverage is exact and disjoint. ``record_idx`` carries
    ``(member's absolute COMPRESSED byte offset << 16) | in-member
    record sequence`` — globally unique and ordered per file even
    for multi-record members (incl. the whole-file-gzip degraded
    case), unlike read_warc's plain sequential index. Loud
    ``ValueError`` if a member holds ≥ 2^16 records or a file
    reaches 2^47 bytes (128 TiB) — beyond the encoding's range.

    Whole-file single-member gzips degrade gracefully (the first
    split owns the one member — same parallelism as read_warc, not
    wrong rows). Local/POSIX paths seek with ``open()``; other schemes
    route through the registered range-read DataBackend (or pass
    ``backend=``), like the avro/tfrecord split readers. The per-file
    magic sniff + stat plan runs as one Spark job above 32 files."""
    from ..sinks.data_backend import (
        list_split_files, resolve_split_backend,
    )

    if split_mb < 1:
        raise ValueError("split_mb must be >= 1")
    backend = resolve_split_backend(path, backend)
    files = list_split_files(path, glob_pat, backend)
    if not files:
        raise ValueError(f"no files match {glob_pat!r} under {path}")
    if len(files) <= 32:
        metas = {p: _warc_sniff_meta(p, backend) for p in files}
    else:
        bk = backend
        metas = dict(
            spark.sparkContext
            .parallelize(files, min(len(files), 256))
            .map(lambda p: (p, _warc_sniff_meta(p, bk))).collect())
    for p in files:
        if metas[p][0] != b"\x1f\x8b":
            raise ValueError(
                f"{p}: not gzip — the split reader handles "
                "member-per-record gzip archives; use read_warc")

    step = split_mb << 20
    ranges = []
    for p in files:
        size = metas[p][1]
        lo = 0
        while lo < size:
            hi = min(lo + step, size)
            ranges.append((p, lo, hi))
            lo = hi
    rdf = spark.createDataFrame(
        ranges, "path string, start long, end long"
    ).repartition(min(len(ranges), 4096))

    def run(batches) -> Iterator:
        import pandas as pd

        for pdf in batches:
            rows = []
            for p, start, end in zip(pdf["path"], pdf["start"],
                                     pdf["end"]):
                for off, member in _iter_members(str(p), int(start),
                                                 int(end),
                                                 backend=backend):
                    if off >= 1 << 47:
                        raise ValueError(
                            f"{p}: member offset {off} exceeds the "
                            "record_idx encoding range (2^47 bytes)")
                    for i, (wt, uri, date, ctype, length, payload) in                             enumerate(parse_warc_bytes(member,
                                                       on_error=on_error)):
                        if i >= 1 << 16:
                            raise ValueError(
                                f"{p}: gzip member at {off} holds >= "
                                "2^16 WARC records — record_idx "
                                "encoding cannot stay unique")
                        rows.append((str(p), (off << 16) | i, wt, uri,
                                     date, ctype, length,
                                     payload.decode("utf-8",
                                                    "replace")))
            yield pd.DataFrame(
                rows, columns=[f.name for f in
                               WARC_RECORD_SCHEMA.fields])

    return rdf.mapInPandas(run, schema=WARC_RECORD_SCHEMA)


def _find_member(fh, start: int, size: int) -> Optional[int]:
    """First VALIDATED gzip member header at offset >= start: the
    ``1f 8b 08`` magic must also decompress to bytes opening with
    ``WARC/`` (two independent checks — magic bytes inside compressed
    data fail the second)."""
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
            i = buf.find(b"\x1f\x8b\x08", i)
            if i < 0:
                break
            cand = buf_at + i
            if cand >= start:
                d = zlib.decompressobj(wbits=zlib.MAX_WBITS | 16)
                try:
                    fh.seek(cand)
                    head = d.decompress(fh.read(1 << 15), 16)
                except zlib.error:
                    head = b""
                if head[:5] == b"WARC/":
                    return cand
            i += 1
        carry = buf[-2:]
        base += len(chunk)
    return None


def _warc_sniff_meta(path: str, backend: Any) -> Tuple[bytes, int]:
    """(first two bytes, file size) for split planning — one small
    ranged read + one stat, callable driver- or executor-side."""
    head = backend.read_range(path, 0, 2)
    size = backend.size(path)
    if head is None or size is None:
        raise FileNotFoundError(path)
    return head, size


def _iter_members(path: str, start: int, end: int,
                  backend: Any = None):
    """(absolute offset, decompressed bytes) of every gzip member
    whose header starts in [start, end)."""
    from ..sinks.data_backend import open_split, resolve_split_backend

    backend = resolve_split_backend(path, backend)
    size = backend.size(path)
    if size is None:
        raise FileNotFoundError(path)
    with open_split(path, backend) as fh:
        if start == 0:
            pos = 0
        else:
            found = _find_member(fh, start, size)
            if found is None or found >= end:
                return
            pos = found
        while pos < end:
            fh.seek(pos)
            d = zlib.decompressobj(wbits=zlib.MAX_WBITS | 16)
            chunks = []
            fed = 0
            while not d.eof:
                piece = fh.read(256 << 10)
                if not piece:
                    raise ValueError(
                        f"{path}: truncated gzip member at {pos}")
                chunks.append(d.decompress(piece))
                fed += len(piece)
            consumed = fed - len(d.unused_data)
            yield pos, b"".join(chunks)
            pos += consumed


def split_http_payload(df, payload_col: str = "payload"):
    """WARC ``response`` payloads carry the captured HTTP message:
    status line, headers, blank line, body. Split them with pure column
    expressions (no second Python pass after the record parse): adds
    ``http_status`` (int, 0 when the payload isn't HTTP),
    ``http_content_type`` (lowercased header value, '' when absent) and
    ``http_body``. Chain with ``operators/html_extract.html_to_text``
    for the crawl-to-corpus path."""
    p = F.col(payload_col)
    status = F.regexp_extract(p, r"^HTTP/[0-9.]+ ([0-9]{3})", 1)
    head = F.element_at(F.split(p, r"\r\n\r\n", 2), 1)
    body = F.element_at(F.split(p, r"\r\n\r\n", 2), 2)
    ctype = F.lower(
        F.regexp_extract(head, r"(?im)^content-type:[ \t]*([^\r\n;]+)", 1)
    )
    return df.withColumns(
        {
            "http_status": F.when(status == "", 0)
            .otherwise(status.cast("int")),
            "http_content_type": F.when(status == "", "").otherwise(ctype),
            "http_body": F.when(status == "", p).otherwise(F.coalesce(body, F.lit(""))),
        }
    )
