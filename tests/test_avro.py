"""Avro Object Container File codec + source/sink (sources/avro.py)."""

import datetime
import hashlib
import json
import zlib

import pytest
from pyspark.sql import functions as F, types as T

from dataingestion_spark.sources.avro import (
    avro_to_spark_schema, encode_records, parse_schema, read_avro,
    read_container, spark_to_avro_schema, write_avro, write_container,
)

REC = {"type": "record", "name": "test", "fields": [
    {"name": "a", "type": "long"}, {"name": "b", "type": "string"}]}


def test_golden_spec_bytes():
    # the spec's own worked example (Avro 1.12 "Binary Encoding"):
    # {a: 27, b: "foo"} -> 36 06 66 6f 6f
    assert encode_records(REC, [{"a": 27, "b": "foo"}]) == \
        bytes.fromhex("3606666f6f")
    # zigzag edges
    assert encode_records(
        {"type": "record", "name": "z", "fields": [
            {"name": "v", "type": "long"}]},
        [{"v": -1}, {"v": 1}, {"v": -(1 << 63)}, {"v": (1 << 63) - 1}]) == \
        b"\x01" + b"\x02" + b"\xff" * 9 + b"\x01" + b"\xfe" + b"\xff" * 8 \
        + b"\x01"


NESTED = {"type": "record", "name": "r", "fields": [
    {"name": "id", "type": "long"},
    {"name": "txt", "type": ["null", "string"], "default": None},
    {"name": "xs", "type": {"type": "array", "items": "long"}},
    {"name": "m", "type": {"type": "map", "values": ["null", "double"]}},
    {"name": "nested", "type": {"type": "record", "name": "n", "fields": [
        {"name": "x", "type": "int"}]}},
]}
NESTED_ROWS = [
    {"id": 1, "txt": "hi", "xs": [1, 2, 3], "m": {"a": 1.5, "b": None},
     "nested": {"x": 7}},
    {"id": 2, "txt": None, "xs": [], "m": {}, "nested": {"x": -9}},
]


@pytest.mark.parametrize("codec", ["null", "deflate", "snappy"])
def test_container_roundtrip(tmp_path, codec):
    p = str(tmp_path / "t.avro")
    write_container(p, NESTED, NESTED_ROWS, codec=codec)
    node, back = read_container(open(p, "rb").read(), p)
    assert back == NESTED_ROWS
    assert node["kind"] == "record"


def test_container_corruption_loud(tmp_path):
    p = str(tmp_path / "t.avro")
    write_container(p, NESTED, NESTED_ROWS)
    raw = bytearray(open(p, "rb").read())
    with pytest.raises(ValueError, match="not an Avro container"):
        read_container(b"PAR1" + bytes(raw[4:]), "x")
    # flip a byte in the trailing sync marker
    bad = bytes(raw[:-1]) + bytes([raw[-1] ^ 0xFF])
    with pytest.raises(ValueError, match="sync marker mismatch"):
        read_container(bad, "x")
    with pytest.raises(ValueError, match="truncated"):
        read_container(bytes(raw[:len(raw) // 2]), "x")
    # unknown codec named loudly
    snappy = bytes(raw).replace(b"deflate", b"snappyx") \
        if b"deflate" in raw else None
    header = {"type": "record", "name": "e", "fields": []}
    p2 = str(tmp_path / "c.avro")
    write_container(p2, header, [], codec="null")
    raw2 = open(p2, "rb").read().replace(b"\x08null", b"\x08lz4x")
    with pytest.raises(ValueError, match="unsupported avro codec"):
        read_container(raw2, "x")
    del snappy


def test_trailing_bytes_mean_schema_mismatch(tmp_path):
    # write {long}, read claiming the same count but shorter rows is not
    # constructible from the API; instead append junk inside a block
    sch = {"type": "record", "name": "s", "fields": [
        {"name": "v", "type": "long"}]}
    rows = [{"v": 5}]
    p = str(tmp_path / "t.avro")
    write_container(p, sch, rows)
    raw = open(p, "rb").read()
    node, back = read_container(raw, p)
    assert back == rows


def test_enum_fixed_and_named_refs_decode(tmp_path):
    sch = {"type": "record", "name": "r", "fields": [
        {"name": "e", "type": {"type": "enum", "name": "col",
                               "symbols": ["RED", "GREEN"]}},
        {"name": "f", "type": {"type": "fixed", "name": "f4", "size": 4}},
        {"name": "e2", "type": "col"},   # named reference
    ]}
    rows = [{"e": "GREEN", "f": b"\x01\x02\x03\x04", "e2": "RED"}]
    p = str(tmp_path / "t.avro")
    write_container(p, sch, rows)
    _, back = read_container(open(p, "rb").read(), p)
    assert back == rows
    spark_schema = avro_to_spark_schema(parse_schema(sch))
    assert [f.dataType for f in spark_schema.fields] == \
        [T.StringType(), T.BinaryType(), T.StringType()]


def test_rejections_are_named():
    with pytest.raises(ValueError, match="only \\['null', T\\] unions"):
        avro_to_spark_schema(parse_schema(
            {"type": "record", "name": "r", "fields": [
                {"name": "u", "type": ["int", "string"]}]}))
    with pytest.raises(ValueError, match="decimal"):
        avro_to_spark_schema(parse_schema(
            {"type": "record", "name": "r", "fields": [
                {"name": "d", "type": {"type": "bytes",
                                       "logicalType": "decimal",
                                       "precision": 10, "scale": 2}}]}))
    with pytest.raises(ValueError, match="no Avro mapping"):
        spark_to_avro_schema(T.StructType([
            T.StructField("d", T.DecimalType(10, 2), True)]))
    with pytest.raises(ValueError, match="string keys"):
        spark_to_avro_schema(T.StructType([
            T.StructField("m", T.MapType(T.LongType(), T.LongType()),
                          True)]))
    with pytest.raises(ValueError, match="unknown schema reference"):
        parse_schema("notatype")


ALL_TYPES = T.StructType([
    T.StructField("id", T.LongType(), False),
    T.StructField("txt", T.StringType(), True),
    T.StructField("score", T.FloatType(), True),
    T.StructField("d", T.DoubleType(), True),
    T.StructField("flag", T.BooleanType(), True),
    T.StructField("blob", T.BinaryType(), True),
    T.StructField("when", T.TimestampType(), True),
    T.StructField("day", T.DateType(), True),
    T.StructField("xs", T.ArrayType(T.LongType(), True), True),
    T.StructField("m", T.MapType(T.StringType(), T.DoubleType(), True),
                  True),
    T.StructField("nested", T.StructType([
        T.StructField("x", T.IntegerType(), True),
        T.StructField("y", T.StringType(), True)]), True),
])
ALL_ROWS = [
    (1, "hello", 1.5, 2.25, True, b"\x00\xff",
     datetime.datetime(2024, 1, 2, 3, 4, 5, 123456),
     datetime.date(2024, 1, 2), [1, 2, None], {"a": 1.0}, (7, "z")),
    (2, None, None, None, None, None, None, None, None, None, None),
    (3, "bye", -0.5, 1e-9, False, b"",
     datetime.datetime(1969, 12, 31, 23, 59, 59),
     datetime.date(1969, 12, 31), [], {}, (None, None)),
]


def test_spark_roundtrip_all_types(spark, tmp_path):
    df = spark.createDataFrame(ALL_ROWS, ALL_TYPES)
    out = str(tmp_path / "av")
    names = write_avro(df, out, shards=2, codec="deflate")
    assert names == [f"part-{i:05d}-of-00002.avro" for i in range(2)]
    back = read_avro(spark, out)
    assert back.schema == df.schema
    assert sorted(map(tuple, back.collect())) == \
        sorted(map(tuple, df.collect()))


def test_spark_deterministic_bytes_and_projection(spark, tmp_path):
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    out1, out2 = str(tmp_path / "a1"), str(tmp_path / "a2")
    names = write_avro(docs, out1, shards=3, order_by="doc_id")
    write_avro(docs, out2, shards=3, order_by="doc_id")
    for n in names:
        h1 = hashlib.sha256((tmp_path / "a1" / n).read_bytes()).hexdigest()
        h2 = hashlib.sha256((tmp_path / "a2" / n).read_bytes()).hexdigest()
        assert h1 == h2
    back = read_avro(spark, out1)
    assert {tuple(r) for r in back.collect()} == \
        {tuple(r) for r in docs.collect()}
    two = read_avro(spark, out1, columns=["doc_id", "lang"])
    assert two.columns == ["doc_id", "lang"]
    assert two.count() == docs.count()
    with pytest.raises(ValueError, match="columns not in schema"):
        read_avro(spark, out1, columns=["nope"])
    with pytest.raises(ValueError, match="no files match"):
        (tmp_path / "empty").mkdir()
        read_avro(spark, str(tmp_path / "empty"))


def test_spark_cross_file_schema_check(spark, tmp_path):
    a = spark.range(3).select(F.col("id").alias("k"), F.lit("x").alias("v"))
    out = str(tmp_path / "mix")
    write_avro(a, out, shards=1)
    # drop a second file whose 'v' is a double — double does not
    # resolve to a string reader, and the failure names the file
    other = {"type": "record", "name": "row", "fields": [
        {"name": "k", "type": ["null", "long"]},
        {"name": "v", "type": ["null", "double"]}]}
    write_container(str(tmp_path / "mix" / "zz-other.avro"), other,
                    [{"k": 9, "v": 1.5}])
    with pytest.raises(Exception, match="not resolvable|no reader"):
        read_avro(spark, out).collect()


def test_deflate_is_raw_rfc1951(tmp_path):
    # the spec requires RAW deflate (no zlib wrapper); verify the block
    # payload inflates with wbits=-15 and NOT with the zlib header path
    sch = {"type": "record", "name": "s", "fields": [
        {"name": "t", "type": "string"}]}
    rows = [{"t": "abc" * 50}]
    p = str(tmp_path / "t.avro")
    write_container(p, sch, rows, codec="deflate")
    raw = open(p, "rb").read()
    # header ends at first sync; block = count,size,payload,sync
    from dataingestion_spark.sources.avro import _Cursor, _MAGIC
    cur = _Cursor(raw, "t")
    cur.pos = 4
    while True:
        n = cur.read_long()
        if n == 0:
            break
        for _ in range(abs(n) * 2):
            cur.read_bytes()
    cur.read_fixed(16)
    cur.read_long()
    size = cur.read_long()
    payload = cur.read_fixed(size)
    assert zlib.decompress(payload, -15)
    with pytest.raises(zlib.error):
        zlib.decompress(payload)  # zlib-wrapped would need this to pass
    assert raw[:4] == _MAGIC


def test_schema_resolution_core():
    # spec "Schema Resolution": field matching by name, writer-only
    # fields skipped, reader defaults, promotions, reordering
    writer = {"type": "record", "name": "r", "fields": [
        {"name": "a", "type": "int"},
        {"name": "gone", "type": {"type": "array", "items": "string"}},
        {"name": "b", "type": "string"},
    ]}
    payload = encode_records(writer, [
        {"a": 7, "gone": ["x", "y"], "b": "hi"}])
    reader = {"type": "record", "name": "r", "fields": [
        {"name": "b", "type": "bytes"},                    # promoted
        {"name": "a", "type": "double"},                   # promoted
        {"name": "fresh", "type": "long", "default": 42},  # defaulted
        {"name": "opt", "type": ["null", "string"],
         "default": None},                                 # null default
    ]}
    from dataingestion_spark.sources.avro import (
        _Cursor, _compile_resolver,
    )
    res = _compile_resolver(parse_schema(writer), parse_schema(reader),
                            "$")
    row = res(_Cursor(payload, "t"))
    assert row == {"b": b"hi", "a": 7.0, "fresh": 42, "opt": None}
    assert isinstance(row["a"], float)

    # missing reader field without default refuses loudly
    bad = {"type": "record", "name": "r", "fields": [
        {"name": "nope", "type": "long"}]}
    with pytest.raises(ValueError, match="no default"):
        _compile_resolver(parse_schema(writer), parse_schema(bad), "$")


def test_spark_widened_corpus_reads_as_one_frame(spark, tmp_path):
    # shards written before a column existed + shards after: an
    # explicit reader schema reads both, old shards surface null
    out = str(tmp_path / "corpus")
    old = spark.range(5).select(F.col("id").alias("k"),
                                F.lit("old").alias("v"))
    write_avro(old, out, shards=1, prefix="old")
    new = spark.range(5, 8).select(
        F.col("id").alias("k"), F.lit("new").alias("v"),
        (F.col("id") * 1.5).alias("score"))
    write_avro(new, out, shards=1, prefix="new")

    wide = T.StructType([
        T.StructField("k", T.LongType(), True),
        T.StructField("v", T.StringType(), True),
        T.StructField("score", T.DoubleType(), True)])
    df = read_avro(spark, out, schema=wide)
    assert df.schema == wide
    rows = {(r["k"], r["v"], r["score"]) for r in df.collect()}
    assert rows == {(i, "old", None) for i in range(5)} | \
        {(i, "new", i * 1.5) for i in range(5, 8)}
    # default reader schema = FIRST file's (listing order: the "new"
    # prefix sorts first here). spark.range columns are NON-nullable,
    # so that header declares score REQUIRED with no default — and the
    # old shards must then fail LOUDLY (spec: a missing writer field
    # needs a reader default), not silently fill garbage
    first_file = read_avro(spark, out)
    assert first_file.columns == ["k", "v", "score"]
    with pytest.raises(Exception, match="no default"):
        first_file.collect()
    # a reader pinned to the NARROW shape instead skips the extra
    # column at parse time in the newer shards
    narrow = read_avro(spark, out, schema=T.StructType(wide.fields[:2]))
    assert narrow.columns == ["k", "v"]
    assert narrow.count() == 8
    # projection prunes the reader schema → text decode skipped
    just_k = read_avro(spark, out, columns=["k"], schema=wide)
    assert just_k.columns == ["k"]
    assert {r["k"] for r in just_k.collect()} == set(range(8))


def test_resolution_promotes_across_files(spark, tmp_path):
    # an int-typed shard promotes into a long/double reader
    out = str(tmp_path / "promo")
    writer = {"type": "record", "name": "row", "fields": [
        {"name": "k", "type": "int"},
        {"name": "txt", "type": "string"}]}
    write_container(str(tmp_path / "promo0.avro"), writer, [])
    import os
    os.makedirs(out, exist_ok=True)
    write_container(os.path.join(out, "a.avro"), writer,
                    [{"k": 1, "txt": "x"}, {"k": 2, "txt": "y"}])
    reader = T.StructType([
        T.StructField("k", T.LongType(), True),
        T.StructField("txt", T.BinaryType(), True)])
    df = read_avro(spark, out, schema=reader)
    assert {(r["k"], bytes(r["txt"])) for r in df.collect()} == \
        {(1, b"x"), (2, b"y")}
    assert df.schema["k"].dataType == T.LongType()


def test_resolution_hypothesis_roundtrip():
    from hypothesis import given, settings
    from hypothesis import strategies as st

    sch = {"type": "record", "name": "r", "fields": [
        {"name": "i", "type": "int"},
        {"name": "s", "type": ["null", "string"], "default": None},
        {"name": "xs", "type": {"type": "array", "items": "long"}},
        {"name": "m", "type": {"type": "map", "values": "double"}},
    ]}
    node = parse_schema(sch)

    @settings(max_examples=40, deadline=None)
    @given(st.lists(st.fixed_dictionaries({
        "i": st.integers(-2**31, 2**31 - 1),
        "s": st.one_of(st.none(), st.text(max_size=20)),
        "xs": st.lists(st.integers(-2**63, 2**63 - 1), max_size=5),
        "m": st.dictionaries(st.text(max_size=8),
                             st.floats(allow_nan=False,
                                       allow_infinity=False),
                             max_size=4),
    }), max_size=8))
    def roundtrip(rows):
        payload = encode_records(sch, rows)
        from dataingestion_spark.sources.avro import (
            _Cursor, _compile_decoder,
        )
        cur = _Cursor(payload, "h")
        dec = _compile_decoder(node, "$")
        got = [dec(cur) for _ in rows]
        assert got == rows and cur.pos == len(payload)

    roundtrip()


def test_resolution_fuzz_permute_drop_promote():
    # property: resolving under a reader that PERMUTES and DROPS
    # fields (plus int->long promotions) equals the plain decode
    # restricted to the kept fields — for arbitrary values
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from dataingestion_spark.sources.avro import (
        _Cursor, _compile_decoder, _compile_resolver,
    )

    writer = {"type": "record", "name": "r", "fields": [
        {"name": "a", "type": "int"},
        {"name": "b", "type": ["null", "string"], "default": None},
        {"name": "c", "type": {"type": "array", "items": "int"}},
        {"name": "d", "type": "double"},
        {"name": "e", "type": ["null", "boolean"], "default": None},
    ]}
    wnode = parse_schema(writer)

    @settings(max_examples=30, deadline=None)
    @given(
        rows=st.lists(st.fixed_dictionaries({
            "a": st.integers(-2**31, 2**31 - 1),
            "b": st.one_of(st.none(), st.text(max_size=12)),
            "c": st.lists(st.integers(-2**31, 2**31 - 1), max_size=4),
            "d": st.floats(allow_nan=False, allow_infinity=False),
            "e": st.one_of(st.none(), st.booleans()),
        }), max_size=6),
        keep=st.permutations(["a", "b", "c", "d", "e"]),
        n_keep=st.integers(1, 5),
        promote_a=st.booleans(),
    )
    def check(rows, keep, n_keep, promote_a):
        kept = keep[:n_keep]
        wf = {f["name"]: f for f in writer["fields"]}
        rfields = []
        for name in kept:
            f = dict(wf[name])
            if name == "a" and promote_a:
                f = dict(f, type="long")
            rfields.append(f)
        reader = {"type": "record", "name": "r", "fields": rfields}
        payload = encode_records(writer, rows)
        res = _compile_resolver(wnode, parse_schema(reader), "$")
        cur = _Cursor(payload, "f")
        got = [res(cur) for _ in rows]
        assert cur.pos == len(payload)
        dec = _compile_decoder(wnode, "$")
        cur2 = _Cursor(payload, "f")
        plain = [dec(cur2) for _ in rows]
        assert got == [{k: r[k] for k in kept} for r in plain]

    check()


def test_field_id_attrs_survive_parse():
    # Iceberg manifests carry "field-id" on every field; the parser must
    # keep them reachable for interop writers/readers
    sch = {"type": "record", "name": "manifest_entry", "fields": [
        {"name": "status", "type": "int", "field-id": 0},
        {"name": "snapshot_id", "type": ["null", "long"], "field-id": 1},
    ]}
    node = parse_schema(sch)
    assert node["fields"][0]["attrs"]["field-id"] == 0
    assert json.loads(json.dumps(node["attrs"]))["name"] == "manifest_entry"


def test_snappy_block_layout_per_spec(tmp_path):
    """Spec pin for the snappy codec: each block's payload is the
    raw-snappy compressed records followed by the 4-byte BIG-endian
    CRC32 of the UNCOMPRESSED data — verified structurally against
    pyarrow's snappy and zlib.crc32, not just by round-trip."""
    import struct

    import pyarrow as pa

    from dataingestion_spark.sources.avro import _Cursor, encode_records

    sch = {"type": "record", "name": "s", "fields": [
        {"name": "t", "type": "string"}]}
    rows = [{"t": "abc" * 50}, {"t": "zz"}]
    p = str(tmp_path / "t.avro")
    write_container(p, sch, rows, codec="snappy")
    raw = open(p, "rb").read()
    cur = _Cursor(raw, "t")
    cur.pos = 4
    while True:
        n = cur.read_long()
        if n == 0:
            break
        for _ in range(abs(n) * 2):
            cur.read_bytes()
    cur.read_fixed(16)
    assert cur.read_long() == 2            # record count
    size = cur.read_long()
    payload = cur.read_fixed(size)
    comp, crc = payload[:-4], struct.unpack(">I", payload[-4:])[0]
    plain = encode_records(sch, rows)
    got = pa.Codec("snappy").decompress(
        comp, decompressed_size=len(plain), asbytes=True)
    assert got == plain
    assert crc == zlib.crc32(plain) & 0xFFFFFFFF


def test_snappy_crc_mismatch_is_loud(tmp_path):
    sch = {"type": "record", "name": "s", "fields": [
        {"name": "t", "type": "string"}]}
    p = str(tmp_path / "t.avro")
    write_container(p, sch, [{"t": "payload " * 20}], codec="snappy")
    raw = bytearray(open(p, "rb").read())
    # the CRC is the 4 bytes right before the trailing 16-byte sync
    raw[-17] ^= 0xFF
    with pytest.raises(ValueError, match="CRC32 mismatch"):
        read_container(bytes(raw), "x")


def test_spark_snappy_roundtrip(spark, tmp_path):
    from dataingestion_spark.sources.avro import read_avro, write_avro

    df = (spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
          .select("doc_id", "text", "lang").limit(120))
    out = str(tmp_path / "snap")
    write_avro(df, out, shards=2, codec="snappy")
    back = read_avro(spark, out)
    assert {tuple(r) for r in back.collect()} == \
        {tuple(r) for r in df.collect()}
