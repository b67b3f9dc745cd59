"""Vectorized columnar Avro decode (sources/avro_vec.py): differential
equivalence against the scalar decoder, schema-resolution coverage,
fallback gating, and loud corruption parity."""

import random

import pytest

from dataingestion_spark.sources.avro import (
    read_container, read_container_columnar, write_container,
)

WIDE = {"type": "record", "name": "w", "fields": [
    {"name": "id", "type": "long"},
    {"name": "small", "type": "int"},
    {"name": "txt", "type": ["null", "string"], "default": None},
    {"name": "raw", "type": ["null", "bytes"], "default": None},
    {"name": "d", "type": "double"},
    {"name": "f", "type": "float"},
    {"name": "flag", "type": "boolean"},
    {"name": "color", "type": {"type": "enum", "name": "c",
                               "symbols": ["R", "G", "B"]}},
    {"name": "fx", "type": {"type": "fixed", "name": "fx8",
                            "size": 4}},
    {"name": "nd", "type": ["null", "double"], "default": None},
]}


def _wide_rows(n, seed=7):
    rng = random.Random(seed)
    rows = []
    for i in range(n):
        rows.append({
            "id": rng.randint(-2 ** 62, 2 ** 62),
            "small": rng.randint(-2 ** 31, 2 ** 31 - 1),
            "txt": None if i % 5 == 0 else "héllo wörld " * (i % 4),
            "raw": None if i % 7 == 0 else bytes([i % 256, 0xFF, 0x80]),
            "d": rng.random() * 1e6,
            "f": float(i) / 3,
            "flag": bool(i % 2),
            "color": "RGB"[i % 3],
            "fx": bytes([i % 256] * 4),
            "nd": None if i % 3 == 0 else i * 0.5,
        })
    return rows


def _vec(tmp_path, schema, rows, reader_node=None, codec="null",
         block_rows=8):
    p = str(tmp_path / "t.avro")
    write_container(p, schema, rows, codec=codec,
                    block_rows=block_rows)
    blob = open(p, "rb").read()
    node, cols = read_container_columnar(blob, p,
                                         reader_node=reader_node)
    _, scalar = read_container(blob, p, reader_node=reader_node)
    return cols, scalar


def _assert_equal(cols, scalar_rows, names, approx=()):
    assert cols is not None, "vector path unexpectedly fell back"
    for c in names:
        got = [None if v is None else v for v in cols[c]]
        want = [r.get(c) for r in scalar_rows]
        if c in approx:
            got = [None if v is None else round(float(v), 4)
                   for v in got]
            want = [None if v is None else round(float(v), 4)
                    for v in want]
        assert got == want, f"column {c!r} diverges"


@pytest.mark.parametrize("codec", ["null", "deflate", "snappy"])
def test_differential_wide_types(tmp_path, codec):
    rows = _wide_rows(700)
    cols, scalar = _vec(tmp_path, WIDE, rows, codec=codec)
    _assert_equal(cols, scalar, [f["name"] for f in WIDE["fields"]],
                  approx=("f",))


def test_projection_defaults_and_promotions(tmp_path):
    from dataingestion_spark.sources.avro import parse_schema

    rows = _wide_rows(600)
    reader = parse_schema({"type": "record", "name": "w", "fields": [
        {"name": "id", "type": "double"},          # long -> double
        {"name": "small", "type": "long"},          # int -> long
        {"name": "txt", "type": ["null", "bytes"],  # string -> bytes
         "default": None},
        {"name": "added", "type": "string", "default": "dflt"},
    ]})
    cols, scalar = _vec(tmp_path, WIDE, rows, reader_node=reader)
    _assert_equal(cols, scalar, ["id", "small", "txt", "added"])


def test_all_null_and_no_null_columns(tmp_path):
    sch = {"type": "record", "name": "n", "fields": [
        {"name": "a", "type": ["null", "long"], "default": None},
        {"name": "b", "type": ["null", "string"], "default": None}]}
    rows = [{"a": None, "b": "x" * (i % 3)} for i in range(600)]
    cols, scalar = _vec(tmp_path, sch, rows)
    _assert_equal(cols, scalar, ["a", "b"])


def test_fallback_nested_and_small(tmp_path):
    nested = {"type": "record", "name": "r", "fields": [
        {"name": "xs", "type": {"type": "array", "items": "long"}}]}
    rows = [{"xs": [1, 2, i]} for i in range(600)]
    cols, _ = _vec(tmp_path, nested, rows)
    assert cols is None  # arrays -> scalar path
    flat = {"type": "record", "name": "r", "fields": [
        {"name": "v", "type": "long"}]}
    cols, _ = _vec(tmp_path, flat, [{"v": i} for i in range(600)],
                   block_rows=1024)  # 1 block < _MIN_BLOCKS
    assert cols is None


def test_corruption_parity(tmp_path):
    flat = {"type": "record", "name": "r", "fields": [
        {"name": "v", "type": "long"},
        {"name": "t", "type": "string"}]}
    rows = [{"v": i, "t": "abc"} for i in range(600)]
    p = str(tmp_path / "t.avro")
    write_container(p, flat, rows, block_rows=8)
    blob = open(p, "rb").read()
    assert read_container_columnar(blob, p)[1] is not None
    # truncating mid-container corrupts the framing
    with pytest.raises(ValueError):
        read_container_columnar(blob[: len(blob) // 2], p)
    # reader expecting an extra non-default field -> loud (via plan
    # falling back or mismatch); reader with FEWER bytes per row than
    # written -> trailing bytes
    from dataingestion_spark.sources.avro import parse_schema
    short = parse_schema({"type": "record", "name": "r", "fields": [
        {"name": "v", "type": "long"}]})
    cols = read_container_columnar(blob, p, reader_node=short)[1]
    assert cols is not None and "t" not in cols  # projection skips


def test_invalid_utf8_is_loud(tmp_path):
    # write as bytes, read claiming string: invalid utf-8 must raise
    from dataingestion_spark.sources.avro import parse_schema

    sch = {"type": "record", "name": "r", "fields": [
        {"name": "b", "type": "bytes"}]}
    rows = [{"b": b"\xff\xfe\x80"} for _ in range(600)]
    p = str(tmp_path / "t.avro")
    write_container(p, sch, rows, block_rows=8)
    blob = open(p, "rb").read()
    reader = parse_schema({"type": "record", "name": "r", "fields": [
        {"name": "b", "type": "string"}]})
    with pytest.raises(ValueError, match="UTF-8"):
        read_container_columnar(blob, p, reader_node=reader)


def test_timestamp_and_date_logicals(tmp_path):
    sch = {"type": "record", "name": "r", "fields": [
        {"name": "ts", "type": ["null", {
            "type": "long", "logicalType": "timestamp-micros"}],
         "default": None},
        {"name": "day", "type": {"type": "int",
                                 "logicalType": "date"}}]}
    import datetime

    import pandas as pd

    base = 1_700_000_000_000_000
    rows = [{"ts": None if i % 4 == 0
             else pd.Timestamp((base + i * 1_000_003) * 1000),
             "day": datetime.date.fromordinal(719_163 + 19_000 + i % 400)}
            for i in range(600)]
    p = str(tmp_path / "t.avro")
    write_container(p, sch, rows, block_rows=8)
    blob = open(p, "rb").read()
    _, cols = read_container_columnar(blob, p)
    _, scalar = read_container(blob, p)
    assert cols is not None
    import pandas as pd
    for i, r in enumerate(scalar):
        v = cols["ts"].iloc[i]
        assert (r["ts"] is None and pd.isna(v)) or v == r["ts"]
        assert cols["day"].iloc[i] == r["day"]


def test_spark_read_uses_columnar(spark, tmp_path):
    """End-to-end through read_avro with enough blocks to engage the
    vector path; values must equal the original frame."""
    from pyspark.sql import functions as F

    from dataingestion_spark.sources.avro import read_avro, write_avro

    df = (spark.read.parquet("/root/testdata/sf0.01/documents.parquet")
          .select("doc_id", "text", "lang",
                  F.col("n_chars").cast("long").alias("n_chars")))
    out = str(tmp_path / "corpus")
    write_avro(df, out, shards=2, block_rows=16)
    back = read_avro(spark, out)
    assert {tuple(r) for r in back.collect()} == \
        {tuple(r) for r in df.collect()}
