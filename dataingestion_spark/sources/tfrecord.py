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

import os
import struct
from typing import Any, Dict, Iterable, List, Optional, Tuple

try:
    import numpy as np
except ImportError:  # pragma: no cover - numpy is baked into this image
    np = None

from pyspark.sql import DataFrame, SparkSession, functions as F, types as T

__all__ = ["read_tfrecord", "write_tfrecord", "encode_example",
           "read_tfrecord_split", "stream_tfrecord",
           "decode_example", "crc32c", "FEATURE_KINDS"]

FEATURE_KINDS = ("bytes", "int64", "float",
                 "bytes_list", "int64_list", "float_list")

# ---------------------------------------------------------------------------
# crc32c (Castagnoli) — three paths, fastest available wins; all pinned by
# the same known-answer + hypothesis-equivalence tests:
#   1. native `crc32c` wheel when importable (not in this image; common in
#      real deployments — hardware CRC32C instruction, ~GB/s)
#   2. numpy GF(2)-vectorized for buffers >= 4 KB (the measured
#      crossover) — see the derivation above _crc32c_numpy; shards
#      verify/frame through the batched _crc32c_many regardless of
#      record size, which is where the real throughput lives
#   3. slicing-by-16 scalar python below that (headers, small payloads)
# This was the slowest per-byte path in the repo (every read AND written
# byte passes through it with verify_crc on by default).
# ---------------------------------------------------------------------------

try:  # optional native seam — not in this image, common in real deployments
    from crc32c import crc32c as _native_crc32c  # type: ignore
except Exception:  # pragma: no cover - import guard
    _native_crc32c = None

_CRC_TABLES: Optional[List[List[int]]] = None


def _crc_tables() -> List[List[int]]:
    global _CRC_TABLES
    if _CRC_TABLES is None:
        poly = 0x82F63B78  # reflected CRC-32C polynomial
        t0 = []
        for n in range(256):
            c = n
            for _ in range(8):
                c = (c >> 1) ^ poly if c & 1 else c >> 1
            t0.append(c)
        tables = [t0]
        # T[k][n] advances T[k-1][n] by one extra zero byte, so
        # T[k][b] == crc-remainder of byte b followed by k zero bytes.
        for _ in range(15):
            prev = tables[-1]
            tables.append([(prev[n] >> 8) ^ t0[prev[n] & 0xFF]
                           for n in range(256)])
        _CRC_TABLES = tables
    return _CRC_TABLES


def _crc32c_sliced(data: bytes) -> int:
    """Slicing-by-16 scalar path — small buffers (record headers are 8
    bytes) where numpy call overhead would dominate."""
    (t0, t1, t2, t3, t4, t5, t6, t7,
     t8, t9, t10, t11, t12, t13, t14, t15) = _crc_tables()
    crc = 0xFFFFFFFF
    n = len(data)
    i = 0
    end16 = n - (n & 15)
    while i < end16:
        crc ^= data[i] | (data[i + 1] << 8) | (data[i + 2] << 16) \
            | (data[i + 3] << 24)
        crc = (t15[crc & 0xFF] ^ t14[(crc >> 8) & 0xFF]
               ^ t13[(crc >> 16) & 0xFF] ^ t12[crc >> 24]
               ^ t11[data[i + 4]] ^ t10[data[i + 5]]
               ^ t9[data[i + 6]] ^ t8[data[i + 7]]
               ^ t7[data[i + 8]] ^ t6[data[i + 9]]
               ^ t5[data[i + 10]] ^ t4[data[i + 11]]
               ^ t3[data[i + 12]] ^ t2[data[i + 13]]
               ^ t1[data[i + 14]] ^ t0[data[i + 15]])
        i += 16
    while i < n:
        crc = t0[(crc ^ data[i]) & 0xFF] ^ (crc >> 8)
        i += 1
    return crc ^ 0xFFFFFFFF


# -- numpy path: the byte-step s' = T[(s ^ b) & 0xff] ^ (s >> 8) is GF(2)-
# linear in (s, b) jointly (CRC tables satisfy T[x^y] = T[x]^T[y]), so the
# final state factors as Shift_n(init) ^ R0(data) where R0 is the zero-init
# remainder and Shift_n advances a state through n zero bytes.  R0 is
# insensitive to leading zero padding, which lets the buffer reshape into
# (rows, w) with front padding; the per-row R0s compute COLUMN-AT-A-TIME
# (w vectorized steps over all rows at once), then combine via per-row
# shift operators applied by binary decomposition of the row index —
# log2(rows) masked table applications, all vectorized.  A 32-bit linear
# operator is four 256-entry uint32 tables (one per state byte); operators
# for shift-by-2^j bytes build once by self-composition (doubling).

_NP_TABLE = None          # uint32[256] byte-step table
_POW_OPS: Dict[int, tuple] = {}   # j -> operator tables for 2^j byte shift


def _np_setup():
    global _NP_TABLE
    import numpy as np

    if _NP_TABLE is None:
        _NP_TABLE = np.array(_crc_tables()[0], dtype=np.uint32)
        b = np.arange(256, dtype=np.uint32)
        # shift-by-1-byte operator: apply(s) = T[s & 0xff] ^ (s >> 8)
        _POW_OPS[0] = (_NP_TABLE.copy(), b.copy(), b << np.uint32(8),
                       b << np.uint32(16))
    return _NP_TABLE


def _apply_op(op, v):
    f0, f1, f2, f3 = op
    return (f0[v & 0xFF] ^ f1[(v >> np.uint32(8)) & 0xFF]
            ^ f2[(v >> np.uint32(16)) & 0xFF] ^ f3[v >> np.uint32(24)])


def _pow_op(j: int):
    """Operator tables for 'advance through 2**j zero bytes'."""
    if j not in _POW_OPS:
        half = _pow_op(j - 1)
        _POW_OPS[j] = tuple(_apply_op(half, t) for t in half)
    return _POW_OPS[j]


def _shift_state(state: int, nbytes: int) -> int:
    """Scalar Shift_nbytes(state) via binary decomposition."""
    j = 0
    while nbytes:
        if nbytes & 1:
            state = int(_apply_op(_pow_op(j), np.uint32(state)))
        nbytes >>= 1
        j += 1
    return state


def _crc32c_numpy(data: bytes) -> int:
    tbl = _np_setup()
    n = len(data)
    # row width balances the two loops (w column steps vectorized over
    # all rows vs log2(n/w) combine levels); widths measured on this
    # host, see SCALE.md
    w = 8 if n < 4096 else (32 if n < 65536 else 128)
    m = -(-n // w)
    pad = m * w - n
    buf = np.empty(m * w, dtype=np.uint8)
    if pad:
        buf[:pad] = 0
    buf[pad:] = np.frombuffer(data, dtype=np.uint8)
    cols = buf.reshape(m, w).T.copy()  # contiguous per-column access
    state = np.zeros(m, dtype=np.uint32)
    u8 = np.uint32(8)
    for j in range(w):
        state = tbl[(state ^ cols[j]) & 0xFF] ^ (state >> u8)
    # row i's remainder needs shifting past the (m-1-i) rows after it
    rev = np.arange(m - 1, -1, -1, dtype=np.int64)
    bit = 0
    wlog = w.bit_length() - 1  # w is a power of two
    while (1 << bit) <= m - 1:
        mask = ((rev >> bit) & 1).astype(bool)
        state = np.where(mask, _apply_op(_pow_op(bit + wlog), state), state)
        bit += 1
    r0 = int(np.bitwise_xor.reduce(state)) if m else 0
    return _shift_state(0xFFFFFFFF, n) ^ r0 ^ 0xFFFFFFFF


def _crc32c_many(buf, starts, lens):
    """CRCs of many slices of one buffer in a single vectorized sweep.

    The per-record state recurrences run in LOCKSTEP: one python-level
    iteration per byte COLUMN (j-th byte of every still-active record),
    each a handful of numpy gathers over all active records. Sorting by
    length makes the active set a contiguous suffix, so there is no
    masking and no wasted lanes; when fewer than 8 long stragglers
    remain, each finishes through the row-parallel single-buffer path,
    its already-consumed prefix state carried across by GF(2)
    linearity. This is what makes verify-on-read affordable: a shard of
    ~KB records verifies at hundreds of MB/s instead of the ~10 MB/s
    scalar loop (measurements in SCALE.md).

    ``buf`` is a uint8 array; returns uint32 CRCs aligned with the
    input order."""
    tbl = _np_setup()
    mrec = len(starts)
    order = np.argsort(lens, kind="stable")
    s = starts[order].astype(np.int64)
    ln = lens[order].astype(np.int64)
    st = np.full(mrec, 0xFFFFFFFF, dtype=np.uint32)
    u8 = np.uint32(8)
    j = 0
    k = 0  # first record still active (suffix = sorted longer records)
    lmax = int(ln[-1]) if mrec else 0
    while j < lmax:
        k = int(np.searchsorted(ln, j, side="right"))
        if k >= mrec:
            break
        if mrec - k < 512 and int(ln[-1]) - j > 16384:
            # few-but-long active set: per-record row-parallel CRC beats
            # the lockstep once the per-column gather is under ~512
            # lanes with tens of KB still to go (measured on this host:
            # 64×512KB lockstep 8 MB/s vs row-parallel 147; 1024×8KB
            # lockstep 48 vs 24 — the crossover is ~512 lanes / ~16 KB)
            break
        col = buf[s[k:] + j]
        st[k:] = tbl[(st[k:] ^ col) & 0xFF] ^ (st[k:] >> u8)
        j += 1
    if j < lmax:  # stragglers: finish from the carried state
        k = int(np.searchsorted(ln, j, side="right"))
        for i in range(k, mrec):
            tail = buf[s[i] + j:s[i] + int(ln[i])].tobytes()
            # final_state = Shift_len(tail)(state) ^ R0(tail), where
            # R0 comes back out of the public crc by undoing its
            # init/final constants
            r0 = (crc32c(tail) ^ 0xFFFFFFFF
                  ^ _shift_state(0xFFFFFFFF, len(tail)))
            st[i] = _shift_state(int(st[i]), len(tail)) ^ r0
    out = np.empty(mrec, dtype=np.uint32)
    out[order] = st ^ np.uint32(0xFFFFFFFF)
    return out


def crc32c(data: bytes) -> int:
    if _native_crc32c is not None:
        return _native_crc32c(data)
    if len(data) >= 4096 and np is not None:
        return _crc32c_numpy(data)
    return _crc32c_sliced(data)


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
    end = len(buf)
    while True:
        if pos >= end:
            # keep malformed input inside the module's ValueError family —
            # a CRC-valid but truncated varint otherwise surfaced a bare
            # IndexError instead of the loud, labeled decode errors
            raise ValueError("truncated varint")
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


def _frame_records(payloads: List[bytes]) -> bytes:
    """Frame many records at once: all header and payload CRCs compute
    in one `_crc32c_many` sweep (the write-side twin of the batched
    read verification — per-record scalar CRC was ~35% of shard-write
    time). Byte-identical to concatenated `_frame_record` calls."""
    if np is None or not payloads:  # pragma: no cover - numpy is baked in
        return b"".join(_frame_record(p) for p in payloads)
    m = len(payloads)
    headers = b"".join(struct.pack("<Q", len(p)) for p in payloads)
    body = b"".join(payloads)
    buf = np.frombuffer(headers + body, dtype=np.uint8)
    starts = np.empty(2 * m, dtype=np.int64)
    lens = np.empty(2 * m, dtype=np.int64)
    off = 8 * m
    for i, p in enumerate(payloads):
        starts[i], lens[i] = 8 * i, 8
        starts[m + i], lens[m + i] = off, len(p)
        off += len(p)
    crcs = _crc32c_many(buf, starts, lens)
    masked = (((crcs >> np.uint32(15)) | (crcs << np.uint32(17)))
              + np.uint32(0xA282EAD8)).astype("<u4").tobytes()
    out = bytearray()
    for i, p in enumerate(payloads):
        out += headers[8 * i:8 * i + 8]
        out += masked[4 * i:4 * i + 4]
        out += p
        out += masked[4 * (m + i):4 * (m + i) + 4]
    return bytes(out)


def _iter_records(data: bytes, source: str, verify: bool = True):
    """Walk a shard's framing, verify, and yield payload bytes.

    Two passes: a cheap struct-only walk collects every record's
    (offset, length), then ALL header and payload CRCs of the file
    verify in one vectorized `_crc32c_many` sweep — per-record scalar
    CRC was the slowest per-byte path in the repo. The first (lowest
    byte offset) mismatch raises, headers before their payload, with
    the same message shape as the original streaming check."""
    pos, end = 0, len(data)
    recs: List[Tuple[int, int]] = []  # (record offset, payload length)
    while pos < end:
        if end - pos < 12:
            raise ValueError(f"{source}: truncated TFRecord header")
        (length,) = struct.unpack("<Q", data[pos:pos + 8])
        if end - pos - 12 < length + 4:
            raise ValueError(f"{source}: truncated TFRecord payload")
        recs.append((pos, length))
        pos += 12 + length + 4
    if verify and recs:
        if np is None:  # pragma: no cover - numpy is baked in
            for p, ln in recs:
                if _masked_crc(data[p:p + 8]) != struct.unpack(
                        "<I", data[p + 8:p + 12])[0]:
                    raise ValueError(
                        f"{source}: length CRC mismatch at byte {p}")
                if _masked_crc(data[p + 12:p + 12 + ln]) != struct.unpack(
                        "<I", data[p + 12 + ln:p + 16 + ln])[0]:
                    raise ValueError(
                        f"{source}: payload CRC mismatch at byte {p + 12}")
        else:
            buf = np.frombuffer(data, dtype=np.uint8)
            m = len(recs)
            # one batch over 2m slices: m 8-byte headers + m payloads
            starts = np.empty(2 * m, dtype=np.int64)
            lens = np.empty(2 * m, dtype=np.int64)
            stored_at = np.empty(2 * m, dtype=np.int64)
            for i, (p, ln) in enumerate(recs):
                starts[i], lens[i], stored_at[i] = p, 8, p + 8
                starts[m + i], lens[m + i] = p + 12, ln
                stored_at[m + i] = p + 12 + ln
            crcs = _crc32c_many(buf, starts, lens)
            masked = ((crcs >> np.uint32(15)) | (crcs << np.uint32(17))) \
                + np.uint32(0xA282EAD8)
            stored = (buf[stored_at].astype(np.uint32)
                      | buf[stored_at + 1].astype(np.uint32) << np.uint32(8)
                      | buf[stored_at + 2].astype(np.uint32) << np.uint32(16)
                      | buf[stored_at + 3].astype(np.uint32) << np.uint32(24))
            bad = np.nonzero(masked != stored)[0]
            if bad.size:
                # report the first failure in byte order, header first
                first = min(bad, key=lambda i: (starts[i], lens[i] != 8))
                if first < m:
                    raise ValueError(f"{source}: length CRC mismatch "
                                     f"at byte {int(starts[first])}")
                raise ValueError(f"{source}: payload CRC mismatch "
                                 f"at byte {int(starts[first])}")
    for p, ln in recs:
        yield data[p + 12:p + 12 + ln]


def _maybe_decompress(data: bytes) -> bytes:
    """Sniff-and-decompress a TFRecord shard payload.

    Magic-byte detection alone is ambiguous: the first 8 bytes of a raw
    shard are a little-endian record length, so a 35615-byte first
    record starts ``1f 8b`` (the gzip magic) and a 0x...78-length one
    can mimic a zlib header. Detection therefore ATTEMPTS the sniffed
    decompression and falls back to raw bytes if the stream doesn't
    actually decode — the subsequent per-record CRC check then
    adjudicates either way."""
    import gzip
    import zlib

    if data[:2] == b"\x1f\x8b":
        try:
            return gzip.decompress(data)  # multi-member streams included
        except (OSError, EOFError):
            # EOFError too: a RAW shard whose fake magic leads the gzip
            # header parser off the end raises EOFError, not BadGzipFile;
            # falling back lets the CRC walk adjudicate either way (a
            # genuinely truncated gzip then fails the walk loudly)
            return data
    if len(data) >= 2 and data[0] == 0x78 and data[1] in (0x01, 0x5E,
                                                          0x9C, 0xDA):
        try:
            return zlib.decompress(data)
        except zlib.error:
            return data
    return data


# ---------------------------------------------------------------------------
# Spark source / sink
# ---------------------------------------------------------------------------

_SPARK_TYPES = {
    "bytes": T.BinaryType(), "int64": T.LongType(), "float": T.FloatType(),
    "bytes_list": T.ArrayType(T.BinaryType()),
    "int64_list": T.ArrayType(T.LongType()),
    "float_list": T.ArrayType(T.FloatType()),
}




def _rows_from_payloads(payloads, spec, fpath: str) -> List[Dict]:
    """tf.train.Example payloads -> row dicts under the declared
    feature spec (shared by the whole-file and sync-split readers)."""
    rows: List[Dict] = []
    for payload in payloads:
        decoded = decode_example(payload)
        row: Dict = {"_file": fpath}
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
                    f"{len(values)} values, declared scalar {kind}")
            else:
                row[name] = values[0]
        rows.append(row)
    return rows


def read_tfrecord(spark: SparkSession, path: str,
                  features: Dict[str, str],
                  glob: str = "*.tfrecord*",
                  verify_crc: bool = True) -> DataFrame:
    """Read a directory of TFRecord files of ``tf.train.Example``.

    ``features`` maps feature name -> kind (``bytes | int64 | float``
    for required scalars — one-element lists, the overwhelmingly common
    shape — or ``bytes_list | int64_list | float_list`` for the full
    list). A declared feature absent from a record surfaces as NULL;
    a scalar kind over a multi-value list raises (data mismatch should
    be loud). One task per file — TFRecord is not splittable, so shard
    at write time (``write_tfrecord(shards=…)``).

    Compression contract: GZIP-compressed shards (TF's
    ``TFRecordOptions(compression_type='GZIP')``, conventionally
    ``*.tfrecord.gz``) are detected per file by the ``1f 8b`` magic —
    not by extension — decompressed in the same ``mapInPandas`` pass
    (multi-member streams included), and CRC-verified on the
    decompressed frames, which is where TF puts the CRCs too. ZLIB
    streams (``78 xx``) are also accepted. A gzip'd file is a single
    stream, so it stays one task; compressed exports should use more,
    smaller shards."""
    parse, schema = _example_parser(features, verify_crc)
    scan = (spark.read.format("binaryFile")
            .option("pathGlobFilter", glob).load(path)
            .select("path", "content"))
    return scan.mapInPandas(parse, schema)


def _example_parser(features: Dict[str, str], verify_crc: bool):
    """(mapInPandas parse fn, output schema) over (path, content) rows
    — shared by the batch scan and the streaming landing-dir tail so
    the decode contract cannot drift between them."""
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
                data = _maybe_decompress(bytes(blob))
                rows.extend(_rows_from_payloads(
                    _iter_records(data, str(fpath), verify=verify_crc),
                    spec, str(fpath)))
            yield pd.DataFrame(
                rows, columns=[f.name for f in out_fields])

    return parse, schema


def stream_tfrecord(spark: SparkSession, path: str,
                    features: Dict[str, str],
                    glob: str = "*.tfrecord*",
                    verify_crc: bool = True,
                    max_files_per_trigger=None) -> DataFrame:
    """Streaming twin of :func:`read_tfrecord`: tail a landing
    directory of TFRecord shards (a TF export pipeline's output) with
    checkpointed exactly-once shard discovery; decode (gzip/zlib
    sniffing, CRC verification, feature spec) is the batch parser's
    code via `_example_parser`. ``max_files_per_trigger`` paces
    catch-up."""
    from .markdown import stream_binary_files

    parse, schema = _example_parser(features, verify_crc)
    return stream_binary_files(
        spark, path, glob,
        max_files_per_trigger=max_files_per_trigger
    ).mapInPandas(parse, schema)


def read_tfrecord_split(spark: SparkSession, path: str,
                        features: Dict[str, str], *,
                        split_mb: int = 128,
                        glob_pat: str = "*.tfrecord",
                        verify_crc: bool = True,
                        backend: Optional[Any] = None) -> DataFrame:
    """Scale-IN TFRecord reader: byte-range splits of UNCOMPRESSED
    shards, resynchronized on the format's self-validating framing.

    TFRecord has no sync markers, but every record header is
    ``u64 length + u32 masked-crc32c(length)`` — a 12-byte
    self-check. A task landing mid-record scans forward testing each
    offset's header CRC (vectorized: `_crc32c_many` over every 8-byte
    window of the scan chunk) and additionally requires the implied
    NEXT record header (or exact EOF) to validate, pushing the
    false-positive rate from ~2^-32 to ~2^-64 per candidate byte. A
    record belongs to the split its header starts in; the owned span
    is then bulk-read and verified through the same batched-CRC walk
    as the whole-file reader.

    Gzip/zlib shards are single streams and cannot split — they raise
    here (use :func:`read_tfrecord`, one task per file). Local/POSIX
    paths seek with ``open()``; other schemes route through the
    registered range-read :class:`~..sinks.data_backend.DataBackend`
    (or pass ``backend=``), matching
    `sources/avro.py::read_avro_split`. The per-file magic sniff +
    stat plan runs as one Spark job above 32 files so a huge foreign
    corpus never serializes on driver IO."""
    from ..sinks.data_backend import (
        list_split_files, resolve_split_backend,
    )

    if split_mb < 1:
        raise ValueError("split_mb must be >= 1")
    backend = resolve_split_backend(path, backend)
    bad = {k: v for k, v in features.items() if v not in FEATURE_KINDS}
    if bad:
        raise ValueError(f"unknown feature kinds: {bad}")
    files = list_split_files(path, glob_pat, backend)
    if not files:
        raise ValueError(f"no files match {glob_pat!r} under {path}")
    if len(files) <= 32:
        metas = {p: _split_sniff_meta(p, backend) for p in files}
    else:
        bk = backend
        metas = dict(
            spark.sparkContext
            .parallelize(files, min(len(files), 256))
            .map(lambda p: (p, _split_sniff_meta(p, bk))).collect())
    for p in files:
        head, _size = metas[p]
        if head[:2] == b"\x1f\x8b" or (
                len(head) == 2 and head[0] == 0x78
                and head[1] in (0x01, 0x5E, 0x9C, 0xDA)):
            raise ValueError(
                f"{p}: compressed TFRecord shards are single streams "
                "and cannot split — use read_tfrecord")

    out_fields = [T.StructField("_file", T.StringType())] + [
        T.StructField(n, _SPARK_TYPES[k])
        for n, k in sorted(features.items())]
    schema = T.StructType(out_fields)
    spec = sorted(features.items())

    step = split_mb << 20
    ranges = []
    for p in files:
        _head, size = metas[p]
        lo = 0
        while lo < size or (lo == 0 and size == 0):
            hi = min(lo + step, size)
            ranges.append((p, lo, hi, size))
            lo = hi
            if size == 0:
                break
    rdf = spark.createDataFrame(
        ranges, "path string, start long, end long, size long"
    ).repartition(min(len(ranges), 4096))

    def decode(batches):
        import pandas as pd

        for pdf in batches:
            rows = []
            for row in pdf.itertuples(index=False):
                span, base = _read_split_span(
                    row.path, int(row.start), int(row.end),
                    int(row.size), backend=backend)
                if span:
                    rows.extend(_rows_from_payloads(
                        _iter_records(span, row.path,
                                      verify=verify_crc),
                        spec, row.path))
            yield pd.DataFrame(
                rows, columns=[f.name for f in out_fields])

    return rdf.mapInPandas(decode, schema)


def _header_ok(buf: bytes, off: int, limit: int) -> Optional[int]:
    """If ``buf[off:]`` starts a plausible record header whose frame
    fits in ``limit - off`` file bytes, return the record length."""
    if off + 12 > len(buf):
        return None
    (length,) = struct.unpack("<Q", buf[off:off + 8])
    if off + 12 + length + 4 > limit - 0:
        return None
    if _masked_crc(buf[off:off + 8]) != struct.unpack(
            "<I", buf[off + 8:off + 12])[0]:
        return None
    return length


def _resync_tfrecord(fh, start: int, size: int) -> Optional[int]:
    """First valid record-header offset >= start, or None. Candidates
    pass the 12-byte header CRC (vectorized over each scan chunk) AND
    chain to a valid next header or exact EOF."""
    CHUNK = 1 << 20
    base = start
    while base < size:
        fh.seek(base)
        # +28 so a header near the chunk edge can chain-check its
        # successor header without another read in the common case
        buf = fh.read(CHUNK + 28)
        if len(buf) < 12:
            return None
        n_cand = min(len(buf) - 11, CHUNK)
        if np is not None and n_cand > 64:
            nb = np.frombuffer(buf, np.uint8)
            starts = np.arange(n_cand, dtype=np.int64)
            crcs = _crc32c_many(nb, starts, np.full(n_cand, 8,
                                                    np.int64))
            masked = (((crcs >> np.uint32(15))
                       | (crcs << np.uint32(17)))
                      + np.uint32(0xA282EAD8))
            stored = (nb[starts + 8].astype(np.uint32)
                      | nb[starts + 9].astype(np.uint32) << np.uint32(8)
                      | nb[starts + 10].astype(np.uint32)
                      << np.uint32(16)
                      | nb[starts + 11].astype(np.uint32)
                      << np.uint32(24))
            cands = np.nonzero(masked == stored)[0]
        else:  # pragma: no cover - numpy is baked in
            cands = [o for o in range(n_cand)
                     if _header_ok(buf, o, size - base + o + 16)
                     is not None]
        for o in map(int, cands):
            length = _header_ok(buf, o, size - base)
            if length is None:
                continue
            nxt = o + 12 + length + 4
            if base + nxt == size:
                return base + o
            # chain check: the next header must also validate
            if nxt + 12 <= len(buf):
                if _header_ok(buf, nxt, size - base) is not None:
                    return base + o
                continue
            fh.seek(base + nxt)
            nh = fh.read(12)
            if len(nh) == 12 and _header_ok(nh, 0, size - (base + nxt)
                                            ) is not None:
                return base + o
        base += CHUNK
    return None


def _split_sniff_meta(path: str, backend: Any) -> Tuple[bytes, int]:
    """(first two bytes, file size) for split planning — one small
    ranged read + one stat, callable driver- or executor-side."""
    head = backend.read_range(path, 0, 2)
    size = backend.size(path)
    if head is None or size is None:
        raise FileNotFoundError(path)
    return head, size


def _read_split_span(path: str, start: int, end: int, size: int,
                     backend: Any = None) -> Tuple[bytes, int]:
    """Bytes of every record whose HEADER starts in [start, end) —
    a standalone valid TFRecord stream — plus its file offset."""
    from ..sinks.data_backend import open_split, resolve_split_backend

    with open_split(path, resolve_split_backend(path, backend)) as fh:
        if start == 0:
            pos = 0
        else:
            found = _resync_tfrecord(fh, start, size)
            if found is None or found >= end:
                return b"", start
            pos = found
        fh.seek(pos)
        span = fh.read(end - pos)
        # walk; extend for the straddling record, truncate any partial
        off = 0
        while off < len(span):
            if off + 12 > len(span):
                tail = fh.read(off + 12 - len(span))
                span += tail
                if off + 12 > len(span):
                    # EOF mid-header: the whole-file reader raises for
                    # this corruption — split mode must not hide it
                    raise ValueError(
                        f"{path}: truncated TFRecord header at byte "
                        f"{pos + off}")
            (length,) = struct.unpack("<Q", span[off:off + 8])
            frame_end = off + 12 + length + 4
            if frame_end > len(span):
                tail = fh.read(frame_end - len(span))
                span += tail
                if frame_end > len(span):
                    raise ValueError(
                        f"{path}: truncated TFRecord at byte "
                        f"{pos + off}")
            off = frame_end
        return span[:off], pos


def write_tfrecord(df: DataFrame, features: Dict[str, str], out_dir: str,
                   shards: int = 4, order_by: Optional[str] = None,
                   prefix: str = "part",
                   compression: Optional[str] = None) -> List[str]:
    """Write ``df`` as ``shards`` TFRecord files of tf.train.Example.

    Rows hash-shard on the first declared feature (or ``order_by``) and
    sort within a shard, so the byte output is DETERMINISTIC given the
    data — the same contract as the WebDataset sink. Returns the shard
    file names. One task per shard; raise ``shards`` to scale the write
    (a 1000-executor export wants ~thousands of shards, which is also
    what the consuming TF input pipeline wants).

    ``compression='gzip'`` writes ``*.tfrecord.gz`` shards (gzip mtime
    pinned to 0 so the determinism contract survives compression) —
    the same on-disk shape as TF's ``TFRecordOptions(
    compression_type='GZIP')``; ``'zlib'`` mirrors the ZLIB option
    (plain ``.tfrecord`` name, the reader sniffs the stream header).
    A NULL cell (None, or NaN in a
    nullable numeric column — Arrow→pandas renders nullable int64 as
    float64-with-NaN) is written as an ABSENT feature, mirroring the
    read path, which maps absent features back to NULL."""
    import os

    bad = {k: v for k, v in features.items() if v not in FEATURE_KINDS}
    if bad:
        raise ValueError(f"unknown feature kinds: {bad}")
    if shards < 1:
        raise ValueError("shards must be >= 1")
    if compression not in (None, "gzip", "zlib"):
        raise ValueError(f"unsupported compression {compression!r} "
                         "(None, 'gzip' or 'zlib')")
    key = order_by or sorted(features)[0]
    spec = sorted(features.items())
    os.makedirs(out_dir, exist_ok=True)

    sel = df.select(*[c for c, _ in spec]).withColumn(
        "_shard", F.pmod(F.xxhash64(F.col(key).cast("string")),
                         F.lit(shards)).cast("int"))

    ext = ".tfrecord.gz" if compression == "gzip" else ".tfrecord"

    def write_shard(pdf):
        import gzip

        import pandas as pd

        if len(pdf) == 0:
            return pd.DataFrame({"name": [], "n_records": []})
        shard = int(pdf["_shard"].iloc[0])
        pdf = pdf.sort_values(key, kind="mergesort")
        name = f"{prefix}-{shard:05d}-of-{shards:05d}{ext}"
        tmp = os.path.join(out_dir, f".{name}.tmp")
        # column arrays instead of iterrows (measured 2× on the shard
        # loop), batch framing instead of per-record CRC (another ~35%)
        cols = {c: pdf[c].to_numpy() for c, _ in spec}
        payloads = []
        for i in range(len(pdf)):
            feats = {}
            for col, kind in spec:
                v = cols[col][i]
                # None OR scalar NaN is a NULL cell -> absent feature
                # (Arrow->pandas renders nullable int64/float64 nulls
                # as NaN; int(NaN) would crash, float NaN would be
                # silently written — both asymmetric with the read
                # path's absent-feature -> NULL mapping)
                if v is None or (
                        not isinstance(v, (list, tuple))
                        and not hasattr(v, "__len__")
                        and pd.isna(v)):
                    continue
                if kind in ("bytes", "bytes_list"):
                    # a string cell under a bytes kind is utf-8 encoded
                    # (the TF convention for text features); bytes("x")
                    # without an encoding would crash
                    enc = (lambda x: x.encode("utf-8")
                           if isinstance(x, str) else bytes(x))
                    conv = (enc(v) if kind == "bytes"
                            else [enc(x) for x in v])
                elif kind in ("int64", "int64_list"):
                    conv = (int(v) if kind == "int64"
                            else [int(x) for x in v])
                else:
                    conv = (float(v) if kind == "float"
                            else [float(x) for x in v])
                feats[col] = (kind, conv)
            payloads.append(encode_example(feats))
        n = len(payloads)
        framed = _frame_records(payloads)
        with open(tmp, "wb") as raw:
            if compression == "gzip":
                # mtime=0 keeps gzip output byte-deterministic (the gzip
                # header otherwise embeds wall-clock time)
                f = gzip.GzipFile(fileobj=raw, mode="wb", mtime=0)
                f.write(framed)
                f.close()  # flush the gzip trailer before the rename
            elif compression == "zlib":
                import zlib

                raw.write(zlib.compress(framed, 9))  # no header timestamp
            else:
                raw.write(framed)
        os.replace(tmp, os.path.join(out_dir, name))
        return pd.DataFrame({"name": [name], "n_records": [n]})

    manifest = (sel.groupBy("_shard").applyInPandas(
        write_shard, "name string, n_records long").collect())
    return sorted(r["name"] for r in manifest)
