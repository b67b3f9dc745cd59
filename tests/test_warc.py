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
