"""Exhaustive boundary sweeps for every split reader's span function.

The r11 ADVICE high was a block starting EXACTLY at a split boundary
being dropped (an off-by-one in the resync scan). These tests make
that whole bug class unrepresentable: for each format, build a small
archive, then for EVERY byte boundary b (or every aligned/frame
boundary) check that ranges [0, b) and [b, size) partition the
records exactly — nothing lost, nothing doubled — using the span
functions directly (no Spark session, so the sweep is cheap enough
to be exhaustive at this size)."""

import gzip
import os
import struct

import pytest


def _union_counts(parts):
    out = {}
    for p in parts:
        for k in p:
            out[k] = out.get(k, 0) + 1
    return out


def test_avro_every_boundary(tmp_path):
    from dataingestion_spark.sources.avro import (
        _parse_header, _read_split_blocks, write_container,
    )

    sch = {"type": "record", "name": "r", "fields": [
        {"name": "v", "type": "long"},
        {"name": "s", "type": "string"}]}
    rows = [{"v": i, "s": f"x{i}" * (i % 17)} for i in range(60)]
    p = str(tmp_path / "a.avro")
    write_container(p, sch, rows, block_rows=3)  # 20 blocks
    blob = open(p, "rb").read()
    _n, codec, sync, body_at, _ = _parse_header(blob, p)
    size = os.path.getsize(p)

    def span(start, end, first):
        datas, counts = _read_split_blocks(p, start, end, first,
                                           sync, codec)
        return sum(counts)

    whole = span(body_at, size, True)
    assert whole == 60
    for b in range(body_at + 1, size):
        got = span(body_at, b, True) + span(b, size, False)
        assert got == 60, f"boundary {b}: {got} rows"


def test_tfrecord_every_boundary(tmp_path):
    from dataingestion_spark.sources.tfrecord import (
        _frame_record, _iter_records, _read_split_span,
    )

    recs = [f"payload-{i}".encode() * (1 + i % 5) for i in range(40)]
    blob = b"".join(_frame_record(r) for r in recs)
    p = str(tmp_path / "t.tfrecord")
    open(p, "wb").write(blob)
    size = len(blob)

    def names(start, end):
        span, base = _read_split_span(p, start, end, size)
        return list(_iter_records(span, p)) if span else []

    for b in range(1, size):
        got = names(0, b) + names(b, size)
        assert got == recs, f"boundary {b} diverged"


def test_warc_member_every_boundary(tmp_path):
    from dataingestion_spark.sources.warc import (
        _iter_members, wet_record_bytes,
    )

    members = [gzip.compress(wet_record_bytes(f"u{i}",
                                              f"b{i}".encode() * 9))
               for i in range(12)]
    blob = b"".join(members)
    p = str(tmp_path / "w.wet.gz")
    open(p, "wb").write(blob)
    size = len(blob)

    def offs(start, end):
        return [o for o, _m in _iter_members(p, start, end)]

    want = offs(0, size)
    assert len(want) == 12
    for b in range(1, size):
        got = offs(0, b) + offs(b, size)
        assert got == want, f"boundary {b} diverged"


def test_zstd_frame_every_boundary(tmp_path):
    import pyarrow as pa

    from dataingestion_spark.sources.jsonl import _read_zst_span

    codec = pa.Codec("zstd")
    frames = [codec.compress(f'{{"doc_id": {i}}}\n'.encode() * 3)
              .to_pybytes() for i in range(10)]
    blob = b"".join(frames)
    p = str(tmp_path / "z.jsonl.zst")
    open(p, "wb").write(blob)
    size = len(blob)

    whole = _read_zst_span(p, 0, size, size)
    assert whole == blob
    for b in range(1, size):
        a = _read_zst_span(p, 0, b, size)
        c = _read_zst_span(p, b, size, size)
        assert a + c == blob, f"boundary {b}: lost/doubled frames"


def test_tar_every_aligned_boundary(tmp_path):
    from dataingestion_spark.sinks.webdataset import (
        _read_tar_span, build_tar_bytes,
    )

    members = [(f"{i:04d}.txt", f"body {i} ".encode() * (1 + i % 7))
               for i in range(25)]
    blob = build_tar_bytes(members)
    p = str(tmp_path / "s.tar")
    open(p, "wb").write(blob)
    size = len(blob)

    want = _read_tar_span(p, 0, size, size)
    assert [n for n, _d in want] == [n for n, _d in members]
    # headers live at 512-aligned offsets; sweep every byte anyway —
    # unaligned boundaries must round up, never capture mid-payload
    for b in range(1, size, 97):  # prime stride covers both classes
        got = _read_tar_span(p, 0, b, size) \
            + _read_tar_span(p, b, size, size)
        assert got == want, f"boundary {b} diverged"
    for b in range(512, size, 512):  # every aligned boundary exactly
        got = _read_tar_span(p, 0, b, size) \
            + _read_tar_span(p, b, size, size)
        assert got == want, f"aligned boundary {b} diverged"
