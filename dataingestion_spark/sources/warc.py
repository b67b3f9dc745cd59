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
from typing import Iterator, List, Optional, Tuple

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
