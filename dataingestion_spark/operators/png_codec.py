"""Pure-stdlib PNG codec: decode / nearest-neighbor resize / tile crop /
re-encode, no external imaging libraries.

Enough of RFC 2083 to make the multimodal pipeline's pixel operations
REAL for the formats the fixtures and the PDF image extractor generate
(``sources/pdf.py`` already implements the same row predictors for
xref/object streams): 8-bit depth, color types 0 (gray), 2 (RGB),
3 (palette), 4 (gray+alpha), 6 (RGBA), non-interlaced. Anything else
(16-bit, Adam7) raises with the format named — a loud capability
boundary, not a silent wrong answer.

Decode path: chunk walk → concatenated IDAT ``zlib.decompress`` →
per-row filter reversal (None/Sub/Up/Average/Paeth) → flat row-major
``bytes`` of ``width*height*channels`` samples. Palette images expand
through PLTE to RGB. Encode path mirrors ``sources/pdf.py::_wrap_png``
generalized to 1-4 channels (filter 0 rows, one IDAT).

These run INSIDE Arrow-batched ``mapInPandas`` workers
(:func:`..operators.multimodal.image_resize` and
:func:`png_tile_pixels`), so the driver never touches pixels and the
work scales with executor count like any other binary-column operator.
"""

from __future__ import annotations

import struct
import zlib
from typing import List, Tuple

_SIG = b"\x89PNG\r\n\x1a\n"
#: color type → samples per pixel (after palette expansion for type 3)
_CHANNELS = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}


def _chunks(data: bytes):
    pos = 8
    while pos + 8 <= len(data):
        (length,) = struct.unpack(">I", data[pos:pos + 4])
        tag = data[pos + 4:pos + 8]
        yield tag, data[pos + 8:pos + 8 + length]
        pos += 12 + length
        if tag == b"IEND":
            break


def _unfilter(raw: bytes, width: int, height: int, bpp: int) -> bytes:
    """Reverse PNG row filters (the same predictor family as
    ``sources/pdf.py::_png_unpredict``, keyed per row)."""
    stride = width * bpp
    out = bytearray()
    prev = bytearray(stride)
    pos = 0
    for _ in range(height):
        ft = raw[pos]
        row = bytearray(raw[pos + 1:pos + 1 + stride])
        pos += 1 + stride
        if ft == 1:  # Sub
            for j in range(bpp, stride):
                row[j] = (row[j] + row[j - bpp]) & 0xFF
        elif ft == 2:  # Up
            for j in range(stride):
                row[j] = (row[j] + prev[j]) & 0xFF
        elif ft == 3:  # Average
            for j in range(stride):
                left = row[j - bpp] if j >= bpp else 0
                row[j] = (row[j] + ((left + prev[j]) >> 1)) & 0xFF
        elif ft == 4:  # Paeth
            for j in range(stride):
                a = row[j - bpp] if j >= bpp else 0
                b = prev[j]
                c = prev[j - bpp] if j >= bpp else 0
                p = a + b - c
                pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                pred = a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)
                row[j] = (row[j] + pred) & 0xFF
        elif ft != 0:
            raise ValueError(f"PNG: unknown row filter {ft}")
        out += row
        prev = row
    return bytes(out)


def decode_png(data: bytes) -> Tuple[bytes, int, int, int]:
    """→ (row-major samples, width, height, channels). Palette expands
    to RGB; gray+alpha / RGBA keep their alpha channel."""
    if data[:8] != _SIG:
        raise ValueError("not a PNG byte stream")
    width = height = None
    color_type = bit_depth = interlace = None
    idat: List[bytes] = []
    plte = b""
    for tag, payload in _chunks(data):
        if tag == b"IHDR":
            width, height, bit_depth, color_type, _, _, interlace = (
                struct.unpack(">IIBBBBB", payload))
        elif tag == b"PLTE":
            plte = payload
        elif tag == b"IDAT":
            idat.append(payload)
    if width is None or not idat:
        raise ValueError("PNG: missing IHDR or IDAT")
    if bit_depth != 8:
        raise ValueError(f"PNG: unsupported bit depth {bit_depth} (8 only)")
    if interlace:
        raise ValueError("PNG: Adam7 interlacing unsupported")
    if color_type not in _CHANNELS:
        raise ValueError(f"PNG: unsupported color type {color_type}")
    ch = _CHANNELS[color_type]
    raw = zlib.decompress(b"".join(idat))
    pixels = _unfilter(raw, width, height, ch)
    if color_type == 3:  # palette → RGB
        pixels = b"".join(plte[3 * i:3 * i + 3] for i in pixels)
        ch = 3
    return pixels, width, height, ch


def encode_png(pixels: bytes, width: int, height: int, channels: int) -> bytes:
    """Samples → PNG (filter-0 rows, one IDAT); inverse of decode for
    gray/gray+alpha/RGB/RGBA."""
    color_type = {1: 0, 2: 4, 3: 2, 4: 6}[channels]

    def chunk(tag: bytes, payload: bytes) -> bytes:
        c = struct.pack(">I", len(payload)) + tag + payload
        return c + struct.pack(">I", zlib.crc32(tag + payload) & 0xFFFFFFFF)

    ihdr = struct.pack(">IIBBBBB", width, height, 8, color_type, 0, 0, 0)
    stride = width * channels
    scan = b"".join(b"\x00" + pixels[y * stride:(y + 1) * stride]
                    for y in range(height))
    return (_SIG + chunk(b"IHDR", ihdr)
            + chunk(b"IDAT", zlib.compress(scan)) + chunk(b"IEND", b""))


def resize_nearest(pixels: bytes, width: int, height: int, channels: int,
                   new_w: int, new_h: int) -> bytes:
    """Deterministic nearest-neighbor rescale (index = i*src/dst, the
    floor mapping every implementation agrees on)."""
    out = bytearray(new_w * new_h * channels)
    stride = width * channels
    for y in range(new_h):
        sy = y * height // new_h
        row_off = sy * stride
        o = y * new_w * channels
        for x in range(new_w):
            sx = (x * width // new_w) * channels
            out[o:o + channels] = pixels[row_off + sx:row_off + sx + channels]
            o += channels
    return bytes(out)


def crop(pixels: bytes, width: int, height: int, channels: int,
         x0: int, y0: int, x1: int, y1: int) -> bytes:
    """Row-major rectangle crop with exclusive x1/y1 (the
    :func:`..operators.multimodal.image_tiles` rectangle contract)."""
    x0, y0 = max(0, x0), max(0, y0)
    x1, y1 = min(width, x1), min(height, y1)
    stride = width * channels
    return b"".join(
        pixels[y * stride + x0 * channels:y * stride + x1 * channels]
        for y in range(y0, y1)
    )


def png_decoder(data: bytes, max_side: int) -> Tuple[bytes, int, int]:
    """The ``decoder`` callable :func:`..operators.multimodal.image_resize`
    asks for: decode → shrink so max(w, h) == max_side (never upscale,
    aspect preserved, floor≥1) → re-encode PNG."""
    pixels, w, h, ch = decode_png(data)
    if max(w, h) <= max_side:
        return encode_png(pixels, w, h, ch), w, h
    if w >= h:
        nw, nh = max_side, max(1, h * max_side // w)
    else:
        nw, nh = max(1, w * max_side // h), max_side
    return encode_png(resize_nearest(pixels, w, h, ch, nw, nh), nw, nh, ch), nw, nh
