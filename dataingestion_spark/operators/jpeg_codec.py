"""Pure-python baseline JPEG codec (numpy for the 8×8 DCT only).

Closes the JPEG half of "real media decode" the way
:mod:`.png_codec` closed PNG: enough of ISO/IEC 10918-1 (ITU T.81) to
decode the files cameras and exporters actually produce in baseline
mode — SOF0/SOF1, Huffman entropy coding, 8-bit precision, 1 or 3
components, any H/V chroma subsampling (4:4:4 / 4:2:2 / 4:2:0 / 4:1:1),
restart markers, 0xFF00 byte unstuffing — plus a matching baseline
encoder (4:4:4, Annex K quantization tables with libjpeg's quality
scaling, Annex K Huffman tables) so round-trips are testable without
any external imaging library. Progressive (SOF2), arithmetic coding,
12-bit, and CMYK raise with the feature named — loud capability
boundaries, never a silently wrong image.

Everything numeric is deterministic: the IDCT/FDCT are exact float64
matrix products with a single final rounding, so decode output is
bit-stable across runs and platforms that implement IEEE 754.

Like the PNG codec, these run inside Arrow-batched ``mapInPandas``
workers — the driver never touches pixels.
"""

from __future__ import annotations

import struct
from typing import Dict, List, Optional, Tuple

import numpy as np

ZIGZAG = np.array([
    0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63,
])

#: Annex K base quantization tables (luminance, chrominance)
QUANT_LUMA = np.array([
    16, 11, 10, 16, 24, 40, 51, 61, 12, 12, 14, 19, 26, 58, 60, 55,
    14, 13, 16, 24, 40, 57, 69, 56, 14, 17, 22, 29, 51, 87, 80, 62,
    18, 22, 37, 56, 68, 109, 103, 77, 24, 35, 55, 64, 81, 104, 113, 92,
    49, 64, 78, 87, 103, 121, 120, 101, 72, 92, 95, 98, 112, 100, 103, 99,
])
QUANT_CHROMA = np.array([
    17, 18, 24, 47, 99, 99, 99, 99, 18, 21, 26, 66, 99, 99, 99, 99,
    24, 26, 56, 99, 99, 99, 99, 99, 47, 66, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99,
])

# Annex K Huffman specifications: (bits[1..16], values)
HUFF_DC_LUMA = ([0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0],
                list(range(12)))
HUFF_DC_CHROMA = ([0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0],
                  list(range(12)))
HUFF_AC_LUMA = (
    [0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7D],
    [0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12, 0x21, 0x31, 0x41,
     0x06, 0x13, 0x51, 0x61, 0x07, 0x22, 0x71, 0x14, 0x32, 0x81, 0x91,
     0xA1, 0x08, 0x23, 0x42, 0xB1, 0xC1, 0x15, 0x52, 0xD1, 0xF0, 0x24,
     0x33, 0x62, 0x72, 0x82, 0x09, 0x0A, 0x16, 0x17, 0x18, 0x19, 0x1A,
     0x25, 0x26, 0x27, 0x28, 0x29, 0x2A, 0x34, 0x35, 0x36, 0x37, 0x38,
     0x39, 0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49, 0x4A, 0x53,
     0x54, 0x55, 0x56, 0x57, 0x58, 0x59, 0x5A, 0x63, 0x64, 0x65, 0x66,
     0x67, 0x68, 0x69, 0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78, 0x79,
     0x7A, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89, 0x8A, 0x92, 0x93,
     0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5,
     0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5, 0xB6, 0xB7,
     0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7, 0xC8, 0xC9,
     0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA, 0xE1,
     0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF1, 0xF2,
     0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA])
HUFF_AC_CHROMA = (
    [0, 2, 1, 2, 4, 4, 3, 4, 7, 5, 4, 4, 0, 1, 2, 0x77],
    [0x00, 0x01, 0x02, 0x03, 0x11, 0x04, 0x05, 0x21, 0x31, 0x06, 0x12,
     0x41, 0x51, 0x07, 0x61, 0x71, 0x13, 0x22, 0x32, 0x81, 0x08, 0x14,
     0x42, 0x91, 0xA1, 0xB1, 0xC1, 0x09, 0x23, 0x33, 0x52, 0xF0, 0x15,
     0x62, 0x72, 0xD1, 0x0A, 0x16, 0x24, 0x34, 0xE1, 0x25, 0xF1, 0x17,
     0x18, 0x19, 0x1A, 0x26, 0x27, 0x28, 0x29, 0x2A, 0x35, 0x36, 0x37,
     0x38, 0x39, 0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49, 0x4A,
     0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59, 0x5A, 0x63, 0x64, 0x65,
     0x66, 0x67, 0x68, 0x69, 0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78,
     0x79, 0x7A, 0x82, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89, 0x8A,
     0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3,
     0xA4, 0xA5, 0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5,
     0xB6, 0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7,
     0xC8, 0xC9, 0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9,
     0xDA, 0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF2,
     0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA])

# exact orthonormal DCT-II basis (C @ block @ C.T = coefficients)
_C = np.zeros((8, 8))
for _k in range(8):
    for _n in range(8):
        _C[_k, _n] = np.cos(np.pi * (2 * _n + 1) * _k / 16) * (
            np.sqrt(0.125) if _k == 0 else 0.5)


class _HuffDecoder:
    """Canonical Huffman decode table: (length, code) → symbol."""

    def __init__(self, bits: List[int], values: List[int]):
        self.lookup: Dict[Tuple[int, int], int] = {}
        code = 0
        k = 0
        for length in range(1, 17):
            for _ in range(bits[length - 1]):
                self.lookup[(length, code)] = values[k]
                code += 1
                k += 1
            code <<= 1


class _BitReader:
    """MSB-first bit reader over the entropy-coded segment with 0xFF00
    unstuffing; surfaces restart markers as alignment resets."""

    def __init__(self, data: bytes, pos: int):
        self.data = data
        self.pos = pos
        self.cur = 0
        self.nbits = 0

    def _fill(self) -> None:
        d = self.data
        b = d[self.pos]
        if b == 0xFF:
            nxt = d[self.pos + 1]
            if nxt == 0x00:
                self.pos += 2
            elif 0xD0 <= nxt <= 0xD7:
                raise _RestartMarker(nxt)
            else:
                raise EOFError("marker inside entropy data")
        else:
            self.pos += 1
        self.cur = (self.cur << 8) | b
        self.nbits += 8

    def read_bit(self) -> int:
        if not self.nbits:
            self._fill()
        self.nbits -= 1
        return (self.cur >> self.nbits) & 1

    def read_bits(self, n: int) -> int:
        v = 0
        for _ in range(n):
            v = (v << 1) | self.read_bit()
        return v

    def decode_symbol(self, table: _HuffDecoder) -> int:
        code = 0
        for length in range(1, 17):
            code = (code << 1) | self.read_bit()
            sym = table.lookup.get((length, code))
            if sym is not None:
                return sym
        raise ValueError("invalid Huffman code")

    def align_and_skip_marker(self) -> None:
        self.cur = 0
        self.nbits = 0
        # consume the two marker bytes (we stopped ON them)
        self.pos += 2


class _RestartMarker(Exception):
    def __init__(self, marker: int):
        self.marker = marker


def _extend(v: int, size: int) -> int:
    """T.81 F.12: map a ``size``-bit magnitude to its signed value."""
    if size == 0:
        return 0
    return v if v >= (1 << (size - 1)) else v - (1 << size) + 1


def decode_jpeg(data: bytes) -> Tuple[bytes, int, int, int]:
    """→ (row-major samples, width, height, channels 1|3)."""
    if data[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG byte stream")
    pos = 2
    qt: Dict[int, np.ndarray] = {}
    huff_dc: Dict[int, _HuffDecoder] = {}
    huff_ac: Dict[int, _HuffDecoder] = {}
    comps: List[dict] = []
    width = height = 0
    restart_interval = 0
    scan_pos = None
    scan_comps: List[dict] = []
    while pos < len(data) - 1:
        if data[pos] != 0xFF:
            pos += 1
            continue
        marker = data[pos + 1]
        if marker in (0xD8, 0x01) or 0xD0 <= marker <= 0xD7:
            pos += 2
            continue
        if marker == 0xD9:  # EOI
            break
        (seglen,) = struct.unpack_from(">H", data, pos + 2)
        seg = data[pos + 4:pos + 2 + seglen]
        if marker == 0xDB:  # DQT
            sp = 0
            while sp < len(seg):
                pq, tq = seg[sp] >> 4, seg[sp] & 0xF
                sp += 1
                if pq:
                    tbl = np.frombuffer(seg[sp:sp + 128], ">u2").astype(np.int32)
                    sp += 128
                else:
                    tbl = np.frombuffer(seg[sp:sp + 64], np.uint8).astype(np.int32)
                    sp += 64
                dez = np.zeros(64, np.int32)
                dez[ZIGZAG] = tbl
                qt[tq] = dez.reshape(8, 8)
        elif marker in (0xC0, 0xC1):  # SOF0/1 baseline
            precision = seg[0]
            if precision != 8:
                raise NotImplementedError(f"JPEG: {precision}-bit precision")
            height, width = struct.unpack_from(">HH", seg, 1)
            ncomp = seg[5]
            if ncomp not in (1, 3):
                raise NotImplementedError(f"JPEG: {ncomp}-component color")
            comps = []
            for i in range(ncomp):
                cid, hv, tq = seg[6 + 3 * i:9 + 3 * i]
                comps.append({"id": cid, "h": hv >> 4, "v": hv & 0xF, "tq": tq})
        elif marker in (0xC2, 0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB,
                        0xCD, 0xCE, 0xCF):
            raise NotImplementedError(
                f"JPEG: SOF{marker - 0xC0} (progressive/arithmetic/"
                f"hierarchical) unsupported — baseline only")
        elif marker == 0xC4:  # DHT
            sp = 0
            while sp < len(seg):
                tc, th = seg[sp] >> 4, seg[sp] & 0xF
                bits = list(seg[sp + 1:sp + 17])
                nvals = sum(bits)
                values = list(seg[sp + 17:sp + 17 + nvals])
                (huff_ac if tc else huff_dc)[th] = _HuffDecoder(bits, values)
                sp += 17 + nvals
        elif marker == 0xDD:  # DRI
            (restart_interval,) = struct.unpack_from(">H", seg, 0)
        elif marker == 0xDA:  # SOS
            ns = seg[0]
            scan_comps = []
            for i in range(ns):
                cid, tables = seg[1 + 2 * i], seg[2 + 2 * i]
                comp = next(c for c in comps if c["id"] == cid)
                scan_comps.append({**comp, "dc": tables >> 4, "ac": tables & 0xF})
            scan_pos = pos + 2 + seglen
            break
        pos += 2 + seglen
    if scan_pos is None or not comps:
        raise ValueError("JPEG: missing SOS/SOF")

    hmax = max(c["h"] for c in comps)
    vmax = max(c["v"] for c in comps)
    mcux = (width + 8 * hmax - 1) // (8 * hmax)
    mcuy = (height + 8 * vmax - 1) // (8 * vmax)
    planes = {
        c["id"]: np.zeros((mcuy * c["v"] * 8, mcux * c["h"] * 8), np.float64)
        for c in comps
    }
    reader = _BitReader(data, scan_pos)
    preds = {c["id"]: 0 for c in comps}
    mcu_index = 0
    for my in range(mcuy):
        for mx in range(mcux):
            if restart_interval and mcu_index and mcu_index % restart_interval == 0:
                # entropy data may end exactly at a restart marker
                try:
                    while True:
                        reader.read_bit()  # drain to the marker
                except _RestartMarker:
                    reader.align_and_skip_marker()
                    preds = {c["id"]: 0 for c in comps}
                except (EOFError, IndexError):
                    pass
            for c in scan_comps:
                for by in range(c["v"]):
                    for bx in range(c["h"]):
                        coef = np.zeros(64, np.float64)
                        s = reader.decode_symbol(huff_dc[c["dc"]])
                        diff = _extend(reader.read_bits(s), s)
                        preds[c["id"]] += diff
                        coef[0] = preds[c["id"]]
                        k = 1
                        while k < 64:
                            rs = reader.decode_symbol(huff_ac[c["ac"]])
                            r, s = rs >> 4, rs & 0xF
                            if s == 0:
                                if r == 15:
                                    k += 16
                                    continue
                                break  # EOB
                            k += r
                            if k > 63:
                                raise ValueError("JPEG: AC index overflow")
                            coef[ZIGZAG[k]] = _extend(reader.read_bits(s), s)
                            k += 1
                        block = coef.reshape(8, 8) * qt[c["tq"]]
                        pix = _C.T @ block @ _C + 128.0
                        y0 = (my * c["v"] + by) * 8
                        x0 = (mx * c["h"] + bx) * 8
                        planes[c["id"]][y0:y0 + 8, x0:x0 + 8] = pix
            mcu_index += 1

    # upsample each component to full resolution (nearest), crop, stack
    out_planes = []
    for c in comps:
        p = planes[c["id"]]
        ry, rx = vmax // c["v"], hmax // c["h"]
        if ry > 1 or rx > 1:
            p = np.repeat(np.repeat(p, ry, axis=0), rx, axis=1)
        out_planes.append(p[:height, :width])
    if len(comps) == 1:
        gray = np.clip(np.round(out_planes[0]), 0, 255).astype(np.uint8)
        return gray.tobytes(), width, height, 1
    y, cb, cr = out_planes
    r = y + 1.402 * (cr - 128.0)
    g = y - 0.344136 * (cb - 128.0) - 0.714136 * (cr - 128.0)
    b = y + 1.772 * (cb - 128.0)
    rgb = np.stack([r, g, b], axis=-1)
    rgb = np.clip(np.round(rgb), 0, 255).astype(np.uint8)
    return rgb.tobytes(), width, height, 3


# --- encoder (tests / thumbnails): baseline, 4:4:4, Annex K tables --------

class _HuffEncoder:
    def __init__(self, bits: List[int], values: List[int]):
        self.codes: Dict[int, Tuple[int, int]] = {}
        code = 0
        k = 0
        for length in range(1, 17):
            for _ in range(bits[length - 1]):
                self.codes[values[k]] = (length, code)
                code += 1
                k += 1
            code <<= 1


class _BitWriter:
    def __init__(self):
        self.out = bytearray()
        self.cur = 0
        self.nbits = 0

    def write(self, length: int, code: int) -> None:
        for i in range(length - 1, -1, -1):
            self.cur = (self.cur << 1) | ((code >> i) & 1)
            self.nbits += 1
            if self.nbits == 8:
                self.out.append(self.cur)
                if self.cur == 0xFF:
                    self.out.append(0x00)  # byte stuffing
                self.cur = 0
                self.nbits = 0

    def flush(self) -> bytes:
        if self.nbits:
            self.cur <<= 8 - self.nbits
            self.cur |= (1 << (8 - self.nbits)) - 1  # pad with 1s
            self.out.append(self.cur)
            if self.cur == 0xFF:
                self.out.append(0x00)
        return bytes(self.out)


def _scaled_quant(base: np.ndarray, quality: int) -> np.ndarray:
    quality = min(100, max(1, quality))
    scale = 5000 // quality if quality < 50 else 200 - 2 * quality
    q = np.clip((base * scale + 50) // 100, 1, 255)
    return q.astype(np.int32)


def _magnitude(v: int) -> Tuple[int, int]:
    size = int(v).bit_length() if v > 0 else int(-v).bit_length()
    if v < 0:
        v = v + (1 << size) - 1
    return size, v


def _down2(p: np.ndarray) -> np.ndarray:
    """2×2 mean downsample with edge replication to even dims."""
    if p.shape[0] % 2:
        p = np.vstack([p, p[-1:]])
    if p.shape[1] % 2:
        p = np.hstack([p, p[:, -1:]])
    return (p[0::2, 0::2] + p[1::2, 0::2]
            + p[0::2, 1::2] + p[1::2, 1::2]) / 4.0


def encode_jpeg(pixels: bytes, width: int, height: int, channels: int,
                quality: int = 75, subsampling: str = "444") -> bytes:
    """Baseline encoder (grayscale, or color with 4:4:4 / 4:2:0 chroma
    subsampling); inverse of decode up to quantization loss. The 4:2:0
    path pins the decoder's interleaved-MCU + upsample branch without
    any external fixture."""
    if channels not in (1, 3):
        raise ValueError("channels must be 1 (gray) or 3 (RGB)")
    arr = np.frombuffer(bytes(pixels), np.uint8).astype(np.float64)
    arr = arr.reshape(height, width, channels)
    if channels == 3:
        r, g, b = arr[..., 0], arr[..., 1], arr[..., 2]
        y = 0.299 * r + 0.587 * g + 0.114 * b
        cb = -0.168736 * r - 0.331264 * g + 0.5 * b + 128.0
        cr = 0.5 * r - 0.418688 * g - 0.081312 * b + 128.0
        if subsampling == "420":
            planes = [y, _down2(cb), _down2(cr)]
            samp = [(2, 2), (1, 1), (1, 1)]
        elif subsampling == "444":
            planes = [y, cb, cr]
            samp = [(1, 1), (1, 1), (1, 1)]
        else:
            raise ValueError("subsampling must be '444' or '420'")
        qtabs = [_scaled_quant(QUANT_LUMA.reshape(8, 8)[:], quality),
                 _scaled_quant(QUANT_CHROMA.reshape(8, 8)[:], quality)]
        comp_q = [0, 1, 1]
        huffs = [(HUFF_DC_LUMA, HUFF_AC_LUMA), (HUFF_DC_CHROMA, HUFF_AC_CHROMA)]
        comp_h = [0, 1, 1]
    else:
        planes = [arr[..., 0]]
        samp = [(1, 1)]
        qtabs = [_scaled_quant(QUANT_LUMA.reshape(8, 8)[:], quality)]
        comp_q = [0]
        huffs = [(HUFF_DC_LUMA, HUFF_AC_LUMA)]
        comp_h = [0]
    qmats = [qt.reshape(8, 8) for qt in qtabs]
    hmax = max(h for h, _ in samp)
    vmax = max(v for _, v in samp)

    out = bytearray(b"\xff\xd8")  # SOI
    # DQT (entries stored in zigzag order)
    for i, q in enumerate(qtabs):
        flat = q.reshape(64)
        zig = np.zeros(64, np.int32)
        for k in range(64):
            zig[k] = flat[ZIGZAG[k]]
        out += b"\xff\xdb" + struct.pack(">H", 67) + bytes([i])
        out += bytes(int(x) for x in zig)
    # SOF0
    ncomp = len(planes)
    out += b"\xff\xc0" + struct.pack(">HBHHB", 8 + 3 * ncomp, 8,
                                     height, width, ncomp)
    for i in range(ncomp):
        h_i, v_i = samp[i]
        out += bytes([i + 1, (h_i << 4) | v_i, comp_q[i]])
    # DHT
    for i, (dc, ac) in enumerate(huffs):
        for tc, (bits, values) in ((0, dc), (1, ac)):
            out += b"\xff\xc4" + struct.pack(">H", 19 + len(values))
            out += bytes([(tc << 4) | i] + bits + values)
    # SOS
    out += b"\xff\xda" + struct.pack(">HB", 6 + 2 * ncomp, ncomp)
    for i in range(ncomp):
        out += bytes([i + 1, (comp_h[i] << 4) | comp_h[i]])
    out += b"\x00\x3f\x00"

    encs = [(_HuffEncoder(*huffs[comp_h[i]][0]),
             _HuffEncoder(*huffs[comp_h[i]][1])) for i in range(ncomp)]
    bw = _BitWriter()
    preds = [0] * ncomp
    mcux = (width + 8 * hmax - 1) // (8 * hmax)
    mcuy = (height + 8 * vmax - 1) // (8 * vmax)
    for my in range(mcuy):
        for mx in range(mcux):
            for ci in range(ncomp):
                h_i, v_i = samp[ci]
                p = planes[ci]
                ph, pw = p.shape
                for by in range(v_i):
                    for bx in range(h_i):
                        y0 = (my * v_i + by) * 8
                        x0 = (mx * h_i + bx) * 8
                        yy = np.clip(np.arange(y0, y0 + 8), 0, ph - 1)
                        xx = np.clip(np.arange(x0, x0 + 8), 0, pw - 1)
                        block = p[np.ix_(yy, xx)]
                        coef = _C @ (block - 128.0) @ _C.T
                        q = np.round(coef / qmats[comp_q[ci]]).astype(np.int64)
                        dc_enc, ac_enc = encs[ci]
                        diff = int(q[0, 0]) - preds[ci]
                        preds[ci] = int(q[0, 0])
                        size, mag = _magnitude(diff) if diff else (0, 0)
                        ln, code = dc_enc.codes[size]
                        bw.write(ln, code)
                        if size:
                            bw.write(size, mag)
                        zz = q.reshape(64)[ZIGZAG]
                        run = 0
                        last_nz = 0
                        for k in range(1, 64):
                            if zz[k]:
                                last_nz = k
                        for k in range(1, last_nz + 1):
                            v = int(zz[k])
                            if v == 0:
                                run += 1
                                continue
                            while run > 15:
                                ln, code = ac_enc.codes[0xF0]
                                bw.write(ln, code)
                                run -= 16
                            size, mag = _magnitude(v)
                            ln, code = ac_enc.codes[(run << 4) | size]
                            bw.write(ln, code)
                            bw.write(size, mag)
                            run = 0
                        if last_nz < 63:
                            ln, code = ac_enc.codes[0x00]
                            bw.write(ln, code)
    out += bw.flush()
    out += b"\xff\xd9"
    return bytes(out)


def jpeg_decoder(data: bytes, max_side: int) -> Tuple[bytes, int, int]:
    """``image_resize`` codec hook for JPEG bytes: decode → shrink (never
    upscale, aspect preserved) → re-encode as PNG (lossless output side,
    reusing the PNG encoder)."""
    from .png_codec import encode_png, resize_nearest

    pixels, w, h, ch = decode_jpeg(data)
    if max(w, h) <= max_side:
        return encode_png(pixels, w, h, ch), w, h
    if w >= h:
        nw, nh = max_side, max(1, h * max_side // w)
    else:
        nw, nh = max(1, w * max_side // h), max_side
    return (encode_png(resize_nearest(pixels, w, h, ch, nw, nh), nw, nh, ch),
            nw, nh)


def probe_jpeg_dimensions(data: bytes) -> Optional[Tuple[int, int]]:
    """(width, height) from the first SOF marker — header-only, no
    entropy decode; None if no SOF found. Upgrades ``probe_image``'s
    JPEG story from format-only to real dimensions."""
    pos = 2
    while pos < len(data) - 9:
        if data[pos] != 0xFF:
            pos += 1
            continue
        marker = data[pos + 1]
        if marker in (0xD8, 0x01) or 0xD0 <= marker <= 0xD7:
            pos += 2
            continue
        if marker == 0xD9 or marker == 0xDA:
            return None
        (seglen,) = struct.unpack_from(">H", data, pos + 2)
        if 0xC0 <= marker <= 0xCF and marker not in (0xC4, 0xC8, 0xCC):
            h, w = struct.unpack_from(">HH", data, pos + 5)
            return int(w), int(h)
        pos += 2 + seglen
    return None
