"""TFRecord (tf.train.Example) source and sink.

TFRecord is the other ubiquitous training-data interchange format next
to WebDataset (``sinks/webdataset.py``): a flat stream of
length-framed protobuf ``tf.train.Example`` records. Both sides are
implemented from the public wire specifications, self-contained (no
tensorflow / protobuf dependency — the Example message is three nested
messages and is hand-coded here, same philosophy as the repo's stdlib
PNG/JPEG codecs):

* **Framing** (TFRecord): per record ``uint64-LE length`` + ``masked
  crc32c(length bytes)`` + ``payload`` + ``masked crc32c(payload)``;
  mask(crc) = ``((crc >> 15 | crc << 17) + 0xa282ead8) & 0xffffffff``.
* **Payload** (proto3 wire format): ``Example{1: Features}``,
  ``Features{1: map<string, Feature>}`` (a map entry is a nested
  message ``{1: key, 2: value}``), ``Feature`` = oneof
  ``bytes_list(1)`` / ``float_list(2)`` / ``int64_list(3)``;
  FloatList/Int64List values arrive packed or unpacked (readers must
  accept both; this writer emits packed, protoc's canonical form).

Scale shape: TFRecord files are NOT splittable (no sync markers or
index), so parallelism = file count — exactly how TF pipelines shard
them (many ~100-500 MB files). The reader is one task per file
(``binaryFile`` scan + ``mapInPandas``), the writer one task per shard
(hash-sharded, deterministic order within a shard — same layout
contract as the WebDataset sink). Every record's CRCs are verified on
read; corruption fails loudly rather than yielding silent garbage.
"""

from __future__ import annotations

import struct
from typing import Dict, Iterable, List, Optional, Tuple

from pyspark.sql import DataFrame, SparkSession, functions as F, types as T

__all__ = ["read_tfrecord", "write_tfrecord", "encode_example",
           "decode_example", "crc32c", "FEATURE_KINDS"]

FEATURE_KINDS = ("bytes", "int64", "float",
                 "bytes_list", "int64_list", "float_list")

# ---------------------------------------------------------------------------
# crc32c (Castagnoli) — table-driven, pure python; the table builds once
# per interpreter (executor) and each record pays one pass over its bytes
# ---------------------------------------------------------------------------

_CRC_TABLE: Optional[List[int]] = None


def _crc_table() -> List[int]:
    global _CRC_TABLE
    if _CRC_TABLE is None:
        poly = 0x82F63B78  # reflected CRC-32C polynomial
        tbl = []
        for n in range(256):
            c = n
            for _ in range(8):
                c = (c >> 1) ^ poly if c & 1 else c >> 1
            tbl.append(c)
        _CRC_TABLE = tbl
    return _CRC_TABLE


def crc32c(data: bytes) -> int:
    tbl = _crc_table()
    crc = 0xFFFFFFFF
    for b in data:
        crc = tbl[(crc ^ b) & 0xFF] ^ (crc >> 8)
    return crc ^ 0xFFFFFFFF


def _masked_crc(data: bytes) -> int:
    crc = crc32c(data)
    return (((crc >> 15) | (crc << 17)) + 0xA282EAD8) & 0xFFFFFFFF


# ---------------------------------------------------------------------------
# proto3 wire helpers (varint + length-delimited fields only — the
# Example message tree uses nothing else except FloatList's fixed32s)
# ---------------------------------------------------------------------------


def _put_varint(out: bytearray, v: int) -> None:
    while True:
        b = v & 0x7F
        v >>= 7
        if v:
            out.append(b | 0x80)
        else:
            out.append(b)
            return


def _get_varint(buf: bytes, pos: int) -> Tuple[int, int]:
    result = shift = 0
    while True:
        b = buf[pos]
        pos += 1
        result |= (b & 0x7F) << shift
        if not b & 0x80:
            return result, pos
        shift += 7
        if shift > 63:
            raise ValueError("varint longer than 10 bytes")


def _put_tag(out: bytearray, field: int, wire: int) -> None:
    _put_varint(out, (field << 3) | wire)


def _put_len_delimited(out: bytearray, field: int, payload: bytes) -> None:
    _put_tag(out, field, 2)
    _put_varint(out, len(payload))
    out += payload


def _encode_feature(kind: str, values) -> bytes:
    inner = bytearray()
    if kind == "bytes_list":
        for v in values:
            _put_len_delimited(inner, 1, bytes(v))
        field = 1
    elif kind == "float_list":
        # packed fixed32 floats (canonical packed encoding)
        packed = struct.pack(f"<{len(values)}f", *[float(v) for v in values])
        _put_len_delimited(inner, 1, packed)
        field = 2
        if not values:
            inner = bytearray()  # empty packed field is omitted
    elif kind == "int64_list":
        packed = bytearray()
        for v in values:
            _put_varint(packed, int(v) & 0xFFFFFFFFFFFFFFFF)  # two's compl.
        _put_len_delimited(inner, 1, bytes(packed))
        field = 3
        if not values:
            inner = bytearray()
    else:
        raise ValueError(f"unknown feature kind {kind!r}")
    out = bytearray()
    _put_len_delimited(out, field, bytes(inner))
    return bytes(out)


def encode_example(features: Dict[str, Tuple[str, list]]) -> bytes:
    """``{name: (kind, values)}`` -> serialized tf.train.Example bytes.

    ``kind`` ∈ {bytes_list, float_list, int64_list} (the scalar aliases
    bytes/int64/float wrap a one-element list). Map entries are emitted
    in sorted-name order so the encoding is deterministic — protobuf
    map order is unspecified, so sorting is valid and reproducible."""
    feats = bytearray()
    for name in sorted(features):
        kind, values = features[name]
        if kind in ("bytes", "int64", "float"):
            kind, values = kind + "_list", [values]
        entry = bytearray()
        _put_len_delimited(entry, 1, name.encode("utf-8"))
        _put_len_delimited(entry, 2, _encode_feature(kind, values))
        _put_len_delimited(feats, 1, bytes(entry))
    example = bytearray()
    _put_len_delimited(example, 1, bytes(feats))
    return bytes(example)


def _decode_feature(buf: bytes) -> Tuple[str, list]:
    pos, end = 0, len(buf)
    while pos < end:
        tag, pos = _get_varint(buf, pos)
        field, wire = tag >> 3, tag & 7
        if wire != 2:
            raise ValueError(f"unexpected wire type {wire} in Feature")
        ln, pos = _get_varint(buf, pos)
        body = buf[pos:pos + ln]
        pos += ln
        if field == 1:  # BytesList
            vals, p = [], 0
            while p < len(body):
                t, p = _get_varint(body, p)
                if t >> 3 != 1 or t & 7 != 2:
                    raise ValueError("bad BytesList entry")
                n, p = _get_varint(body, p)
                vals.append(bytes(body[p:p + n]))
                p += n
            return "bytes_list", vals
        if field == 2:  # FloatList: packed (wire 2) or unpacked fixed32
            vals, p = [], 0
            while p < len(body):
                t, p = _get_varint(body, p)
                if t >> 3 != 1:
                    raise ValueError("bad FloatList entry")
                if t & 7 == 2:  # packed run
                    n, p = _get_varint(body, p)
                    vals += list(struct.unpack(f"<{n // 4}f",
                                               body[p:p + n]))
                    p += n
                elif t & 7 == 5:  # single fixed32
                    vals.append(struct.unpack("<f", body[p:p + 4])[0])
                    p += 4
                else:
                    raise ValueError("bad FloatList wire type")
            return "float_list", vals
        if field == 3:  # Int64List: packed or unpacked varints
            vals, p = [], 0
            while p < len(body):
                t, p = _get_varint(body, p)
                if t >> 3 != 1:
                    raise ValueError("bad Int64List entry")
                if t & 7 == 2:
                    n, p = _get_varint(body, p)
                    q, stop = p, p + n
                    while q < stop:
                        v, q = _get_varint(body, q)
                        vals.append(v - (1 << 64) if v >> 63 else v)
                    p = stop
                elif t & 7 == 0:
                    v, p = _get_varint(body, p)
                    vals.append(v - (1 << 64) if v >> 63 else v)
                else:
                    raise ValueError("bad Int64List wire type")
            return "int64_list", vals
    return "bytes_list", []  # empty Feature (no oneof set)


def decode_example(payload: bytes) -> Dict[str, Tuple[str, list]]:
    """Serialized tf.train.Example -> ``{name: (kind, values)}``."""
    out: Dict[str, Tuple[str, list]] = {}
    pos, end = 0, len(payload)
    while pos < end:
        tag, pos = _get_varint(payload, pos)
        if tag >> 3 != 1 or tag & 7 != 2:
            raise ValueError("not a tf.train.Example (bad outer field)")
        ln, pos = _get_varint(payload, pos)
        feats = payload[pos:pos + ln]
        pos += ln
        fp, fend = 0, len(feats)
        while fp < fend:
            ftag, fp = _get_varint(feats, fp)
            if ftag >> 3 != 1 or ftag & 7 != 2:
                raise ValueError("bad Features map entry")
            eln, fp = _get_varint(feats, fp)
            entry = feats[fp:fp + eln]
            fp += eln
            name, feat = None, b""
            ep, eend = 0, len(entry)
            while ep < eend:
                etag, ep = _get_varint(entry, ep)
                n, ep = _get_varint(entry, ep)
                body = entry[ep:ep + n]
                ep += n
                if etag >> 3 == 1:
                    name = body.decode("utf-8")
                elif etag >> 3 == 2:
                    feat = body
            if name is not None:
                out[name] = _decode_feature(bytes(feat))
    return out


# ---------------------------------------------------------------------------
# framing
# ---------------------------------------------------------------------------


def _frame_record(payload: bytes) -> bytes:
    header = struct.pack("<Q", len(payload))
    return (header + struct.pack("<I", _masked_crc(header))
            + payload + struct.pack("<I", _masked_crc(payload)))


def _iter_records(data: bytes, source: str, verify: bool = True):
    pos, end = 0, len(data)
    while pos < end:
        if end - pos < 12:
            raise ValueError(f"{source}: truncated TFRecord header")
        header = data[pos:pos + 8]
        (length,) = struct.unpack("<Q", header)
        (hcrc,) = struct.unpack("<I", data[pos + 8:pos + 12])
        if verify and _masked_crc(header) != hcrc:
            raise ValueError(f"{source}: length CRC mismatch at byte {pos}")
        pos += 12
        if end - pos < length + 4:
            raise ValueError(f"{source}: truncated TFRecord payload")
        payload = data[pos:pos + length]
        (pcrc,) = struct.unpack("<I", data[pos + length:pos + length + 4])
        if verify and _masked_crc(payload) != pcrc:
            raise ValueError(f"{source}: payload CRC mismatch at byte {pos}")
        pos += length + 4
        yield payload


# ---------------------------------------------------------------------------
# Spark source / sink
# ---------------------------------------------------------------------------

_SPARK_TYPES = {
    "bytes": T.BinaryType(), "int64": T.LongType(), "float": T.FloatType(),
    "bytes_list": T.ArrayType(T.BinaryType()),
    "int64_list": T.ArrayType(T.LongType()),
    "float_list": T.ArrayType(T.FloatType()),
}


def read_tfrecord(spark: SparkSession, path: str,
                  features: Dict[str, str],
                  glob: str = "*.tfrecord",
                  verify_crc: bool = True) -> DataFrame:
    """Read a directory of TFRecord files of ``tf.train.Example``.

    ``features`` maps feature name -> kind (``bytes | int64 | float``
    for required scalars — one-element lists, the overwhelmingly common
    shape — or ``bytes_list | int64_list | float_list`` for the full
    list). A declared feature absent from a record surfaces as NULL;
    a scalar kind over a multi-value list raises (data mismatch should
    be loud). One task per file — TFRecord is not splittable, so shard
    at write time (``write_tfrecord(shards=…)``)."""
    bad = {k: v for k, v in features.items() if v not in FEATURE_KINDS}
    if bad:
        raise ValueError(f"unknown feature kinds: {bad}")
    out_fields = [T.StructField("_file", T.StringType())] + [
        T.StructField(n, _SPARK_TYPES[k]) for n, k in sorted(features.items())
    ]
    schema = T.StructType(out_fields)
    spec = sorted(features.items())

    def parse(batches):
        import pandas as pd

        for pdf in batches:
            rows = []
            for fpath, blob in zip(pdf["path"], pdf["content"]):
                for payload in _iter_records(bytes(blob), str(fpath),
                                             verify=verify_crc):
                    decoded = decode_example(payload)
                    row = {"_file": str(fpath)}
                    for name, kind in spec:
                        got = decoded.get(name)
                        if got is None:
                            row[name] = None
                            continue
                        gkind, values = got
                        want_list = kind.endswith("_list")
                        base = kind if want_list else kind + "_list"
                        if gkind != base:
                            raise ValueError(
                                f"{fpath}: feature {name!r} is {gkind}, "
                                f"declared {kind}")
                        if want_list:
                            row[name] = values
                        elif len(values) != 1:
                            raise ValueError(
                                f"{fpath}: feature {name!r} has "
                                f"{len(values)} values, declared scalar "
                                f"{kind}")
                        else:
                            row[name] = values[0]
                    rows.append(row)
            yield pd.DataFrame(
                rows, columns=[f.name for f in out_fields])

    scan = (spark.read.format("binaryFile")
            .option("pathGlobFilter", glob).load(path)
            .select("path", "content"))
    return scan.mapInPandas(parse, schema)


def write_tfrecord(df: DataFrame, features: Dict[str, str], out_dir: str,
                   shards: int = 4, order_by: Optional[str] = None,
                   prefix: str = "part") -> List[str]:
    """Write ``df`` as ``shards`` TFRecord files of tf.train.Example.

    Rows hash-shard on the first declared feature (or ``order_by``) and
    sort within a shard, so the byte output is DETERMINISTIC given the
    data — the same contract as the WebDataset sink. Returns the shard
    file names. One task per shard; raise ``shards`` to scale the write
    (a 1000-executor export wants ~thousands of shards, which is also
    what the consuming TF input pipeline wants)."""
    import os

    bad = {k: v for k, v in features.items() if v not in FEATURE_KINDS}
    if bad:
        raise ValueError(f"unknown feature kinds: {bad}")
    if shards < 1:
        raise ValueError("shards must be >= 1")
    key = order_by or sorted(features)[0]
    spec = sorted(features.items())
    os.makedirs(out_dir, exist_ok=True)

    sel = df.select(*[c for c, _ in spec]).withColumn(
        "_shard", F.pmod(F.xxhash64(F.col(key).cast("string")),
                         F.lit(shards)).cast("int"))

    def write_shard(pdf):
        import pandas as pd

        if len(pdf) == 0:
            return pd.DataFrame({"name": [], "n_records": []})
        shard = int(pdf["_shard"].iloc[0])
        pdf = pdf.sort_values(key, kind="mergesort")
        name = f"{prefix}-{shard:05d}-of-{shards:05d}.tfrecord"
        tmp = os.path.join(out_dir, f".{name}.tmp")
        n = 0
        with open(tmp, "wb") as f:
            for _, row in pdf.iterrows():
                feats = {}
                for col, kind in spec:
                    v = row[col]
                    if v is None:
                        continue
                    if kind in ("bytes", "bytes_list"):
                        conv = (bytes(v) if kind == "bytes"
                                else [bytes(x) for x in v])
                    elif kind in ("int64", "int64_list"):
                        conv = (int(v) if kind == "int64"
                                else [int(x) for x in v])
                    else:
                        conv = (float(v) if kind == "float"
                                else [float(x) for x in v])
                    feats[col] = (kind, conv)
                f.write(_frame_record(encode_example(feats)))
                n += 1
        os.replace(tmp, os.path.join(out_dir, name))
        return pd.DataFrame({"name": [name], "n_records": [n]})

    manifest = (sel.groupBy("_shard").applyInPandas(
        write_shard, "name string, n_records long").collect())
    return sorted(r["name"] for r in manifest)
