"""WARC/WET archive reader (sources/warc.py)."""

import gzip

import pytest

from dataingestion_spark.sources.warc import (
    parse_warc_bytes,
    read_warc,
    wet_record_bytes,
    wet_record_expr,
)


def _two_records() -> bytes:
    return wet_record_bytes(
        "http://a.example/1", "hello world".encode()
    ) + wet_record_bytes(
        "http://b.example/2", "héllo\nagain".encode(), content_type="text/plain; charset=utf-8"
    )


def test_roundtrip_two_records():
    recs = parse_warc_bytes(_two_records())
    assert [r[1] for r in recs] == ["http://a.example/1", "http://b.example/2"]
    assert recs[0][0] == "conversion"
    assert recs[0][4] == len(b"hello world")
    assert recs[0][5] == b"hello world"
    assert recs[1][5].decode() == "héllo\nagain"
    # Content-Length counts BYTES, not chars (é is 2 bytes)
    assert recs[1][4] == len("héllo\nagain".encode())


def test_payload_containing_warc_marker():
    # record splitting must honor Content-Length, not scan for "WARC/"
    tricky = "body with\r\n\r\nWARC/1.0 inside it"
    data = wet_record_bytes("http://t/1", tricky.encode()) + wet_record_bytes(
        "http://t/2", b"second"
    )
    recs = parse_warc_bytes(data)
    assert len(recs) == 2
    assert recs[0][5].decode() == tricky


def test_whole_file_and_per_record_gzip():
    raw = _two_records()
    whole = gzip.compress(raw)
    per_record = gzip.compress(
        wet_record_bytes("http://a.example/1", b"hello world")
    ) + gzip.compress(
        wet_record_bytes("http://b.example/2", "héllo\nagain".encode())
    )
    for data in (whole, per_record):
        recs = parse_warc_bytes(data)
        assert [r[1] for r in recs] == ["http://a.example/1", "http://b.example/2"]


def test_lf_only_headers_and_case_insensitivity():
    data = (
        b"WARC/1.1\n"
        b"warc-type: response\n"
        b"WARC-TARGET-URI: http://x/\n"
        b"content-length: 3\n"
        b"\n"
        b"abc\n\n"
    )
    (rec,) = parse_warc_bytes(data)
    assert rec[0] == "response" and rec[1] == "http://x/" and rec[5] == b"abc"


def test_truncated_record_fail_and_skip():
    data = _two_records() + b"WARC/1.0\r\nContent-Length: 100\r\n\r\nshort"
    with pytest.raises(ValueError):
        parse_warc_bytes(data)
    recs = parse_warc_bytes(data, on_error="skip")
    assert len(recs) == 2


def test_read_warc_distributed(spark, tmp_path):
    (tmp_path / "part-0.wet").write_bytes(_two_records())
    (tmp_path / "part-1.wet.gz").write_bytes(
        gzip.compress(wet_record_bytes("http://c.example/3", b"third body"))
    )
    out = read_warc(spark, str(tmp_path), glob="*.wet*").orderBy("target_uri")
    rows = out.collect()
    assert [r.target_uri for r in rows] == [
        "http://a.example/1",
        "http://b.example/2",
        "http://c.example/3",
    ]
    assert rows[2].payload == "third body"
    assert rows[0].record_idx == 0 and rows[1].record_idx == 1


def test_wet_record_expr_matches_python(spark):
    from pyspark.sql import functions as F

    df = spark.createDataFrame(
        [("http://a.example/1", "hello world"), ("http://u/é", "héllo\nagain")],
        ["uri", "text"],
    )
    got = [
        r.rec
        for r in df.select(
            wet_record_expr(F.col("uri"), F.col("text")).alias("rec")
        ).orderBy("uri").collect()
    ]
    want = sorted(
        wet_record_bytes(u, t.encode()).decode()
        for u, t in [("http://a.example/1", "hello world"), ("http://u/é", "héllo\nagain")]
    )
    assert got == want


def test_split_http_payload(spark):
    from pyspark.sql import functions as F

    from dataingestion_spark.sources.warc import split_http_payload

    rows = [
        (0, "HTTP/1.1 200 OK\r\nContent-Type: text/HTML; charset=utf-8\r\n"
            "X-Other: y\r\n\r\n<p>body</p>"),
        (1, "HTTP/1.0 404 Not Found\r\nContent-Length: 0\r\n\r\n"),
        (2, "plain WET text, not an HTTP message"),
    ]
    df = spark.createDataFrame(rows, ["i", "payload"])
    out = {r.i: r for r in split_http_payload(df).collect()}
    assert out[0].http_status == 200
    assert out[0].http_content_type == "text/html"
    assert out[0].http_body == "<p>body</p>"
    assert out[1].http_status == 404 and out[1].http_body == ""
    assert out[2].http_status == 0
    assert out[2].http_body == rows[2][1]


def test_warc_response_to_text_chain(spark):
    """Full crawl-to-corpus chain: response record -> HTTP split -> HTML
    -> visible text, all inside the engine."""
    from pyspark.sql import functions as F

    from dataingestion_spark.operators.html_extract import html_to_text
    from dataingestion_spark.sources.warc import parse_warc_files, split_http_payload

    payload = (
        b"HTTP/1.1 200 OK\r\nContent-Type: text/html\r\n\r\n"
        b"<html><body><h1>Title</h1><p>Hello &amp; bye</p></body></html>"
    )
    rec = wet_record_bytes("http://x/", payload, warc_type="response",
                           content_type="application/http; msgtype=response")
    files = spark.createDataFrame([("f0", bytearray(rec))], ["path", "content"])
    out = (
        split_http_payload(parse_warc_files(files))
        .withColumn("text", html_to_text(F.col("http_body")))
        .collect()[0]
    )
    assert out.warc_type == "response" and out.http_status == 200
    assert out.text == "Title\nHello & bye"


def test_warc_split_equals_whole_file(spark, tmp_path):
    """Member-per-record gzip (the Common Crawl layout) read as byte
    ranges must yield exactly the whole-file records — no member lost
    or doubled at any split boundary, and no false resync on gzip
    magic bytes inside compressed data."""
    import gzip
    import hashlib
    import os

    from dataingestion_spark.sources.warc import (
        read_warc, read_warc_split, wet_record_bytes,
    )

    d = str(tmp_path / "crawl")
    os.makedirs(d)
    blobs = []
    for i in range(1200):
        body = b"".join(
            hashlib.sha256(f"{i}:{j}".encode()).digest()
            for j in range(80))  # ~2.5 KB incompressible
        blobs.append(gzip.compress(
            wet_record_bytes(f"https://x.test/{i}", body)))
    p = os.path.join(d, "seg.wet.gz")
    open(p, "wb").write(b"".join(blobs))
    assert os.path.getsize(p) > 1 << 20  # at least 2 splits at 1 MB

    feats = dict(on_error="fail")
    whole = read_warc(spark, d, glob="*.wet.gz")
    split = read_warc_split(spark, d, split_mb=1)
    a = {(r["target_uri"], r["payload"]) for r in whole.collect()}
    b = {(r["target_uri"], r["payload"]) for r in split.collect()}
    assert a == b and len(a) == 1200
    # record_idx = member's absolute compressed offset: unique
    offs = [r["record_idx"] for r in split.collect()]
    assert len(set(offs)) == 1200


def test_warc_split_refuses_raw(spark, tmp_path):
    import os

    from dataingestion_spark.sources.warc import (
        read_warc_split, wet_record_bytes,
    )

    d = str(tmp_path / "raw")
    os.makedirs(d)
    open(os.path.join(d, "a.wet.gz"), "wb").write(
        wet_record_bytes("https://x.test/1", b"plain"))
    with pytest.raises(ValueError, match="not gzip"):
        read_warc_split(spark, d)


def test_warc_split_multi_record_member_idx_unique(spark, tmp_path):
    """record_idx must stay unique and ordered when one gzip member
    holds several WARC records (r11 ADVICE: every record in a member
    got the member offset). Encoding: (member offset << 16) | seq."""
    import gzip
    import os

    from dataingestion_spark.sources.warc import (
        read_warc_split, wet_record_bytes,
    )

    d = str(tmp_path / "multi")
    os.makedirs(d)
    m0 = gzip.compress(b"".join(
        wet_record_bytes(f"https://x.test/m0/{j}", b"p" * 40)
        for j in range(3)))           # 3 records, ONE member
    m1 = gzip.compress(wet_record_bytes("https://x.test/m1", b"q" * 40))
    open(os.path.join(d, "a.wet.gz"), "wb").write(m0 + m1)

    rows = sorted(read_warc_split(spark, d, split_mb=1).collect(),
                  key=lambda r: r["record_idx"])
    assert [r["target_uri"] for r in rows] == [
        "https://x.test/m0/0", "https://x.test/m0/1",
        "https://x.test/m0/2", "https://x.test/m1"]
    idx = [r["record_idx"] for r in rows]
    assert len(set(idx)) == 4 and idx == sorted(idx)
    # member 0 starts at offset 0: in-member sequence in the low bits
    assert idx[:3] == [0, 1, 2]
    assert idx[3] == (len(m0) << 16)


def test_split_reader_over_memory_backend(spark, tmp_path):
    """WARC member splits through a non-POSIX range-read backend
    (r11 VERDICT #3)."""
    import gzip
    import hashlib

    from dataingestion_spark.sinks.data_backend import MemoryDataBackend
    from dataingestion_spark.sources.warc import (
        read_warc_split, wet_record_bytes,
    )

    blobs = []
    for i in range(600):
        body = b"".join(hashlib.sha256(f"{i}:{j}".encode()).digest()
                        for j in range(80))
        blobs.append(gzip.compress(
            wet_record_bytes(f"https://x.test/{i}", body)))
    blob = b"".join(blobs)
    assert len(blob) > (1 << 20)

    mem = MemoryDataBackend()
    mem.write_bytes("crawl/seg/a.wet.gz", blob)
    got = read_warc_split(spark, "crawl/seg", split_mb=1, backend=mem)
    uris = sorted(r["target_uri"] for r in got.collect())
    assert uris == sorted(f"https://x.test/{i}" for i in range(600))
