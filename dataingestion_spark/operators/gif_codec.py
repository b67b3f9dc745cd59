"""Pure-stdlib GIF decoder (GIF87a/89a, stills + animation frames) and
minimal encoder.

Completes the native still-image codec family next to
:mod:`.png_codec` and :mod:`.jpeg_codec`: logical screen + global/local
color tables, LZW decompression with variable code width and table
reset, interlaced row reordering, the GCE transparency index (exposed
as alpha). :func:`decode_gif` returns the first frame (the single
representative raster corpus pipelines want); :func:`iter_gif_frames`
yields every frame with its GCE delay, which is what
:mod:`.video_demux` samples for animated-GIF frame extraction. Frames
come back as standalone rasters — logical-screen compositing (disposal
methods, partial-frame offsets) is a loud documented boundary, not a
wrong answer. Output is RGB or RGBA samples, same contract as the
other codecs, so :func:`..multimodal.decode_image_bytes` routes
``GIF8`` magic here and resize/tile work unchanged.

The encoder writes single- or multi-frame GIFs with a 256-entry color
table via real LZW compression — enough to round-trip any ≤256-color
image or animation and pin the decoder without external libraries.
"""

from __future__ import annotations

import struct
from typing import List, Optional, Tuple


def _lzw_decode(data: bytes, min_code_size: int) -> bytes:
    """GIF-flavor LZW: variable code width starting at min+1, CLEAR and
    EOI codes, dictionary grows to 4095 then waits for CLEAR."""
    clear = 1 << min_code_size
    eoi = clear + 1
    out = bytearray()
    # bit stream, LSB first
    bitpos = 0
    nbits = len(data) * 8

    def read_code(width: int) -> Optional[int]:
        nonlocal bitpos
        if bitpos + width > nbits:
            return None
        byte = bitpos >> 3
        shift = bitpos & 7
        val = int.from_bytes(data[byte:byte + 3], "little") >> shift
        bitpos += width
        return val & ((1 << width) - 1)

    def reset():
        table = [bytes([i]) for i in range(clear)] + [b"", b""]
        return table, min_code_size + 1

    table, width = reset()
    prev: Optional[bytes] = None
    while True:
        code = read_code(width)
        if code is None or code == eoi:
            break
        if code == clear:
            table, width = reset()
            prev = None
            continue
        if code < len(table):
            entry = table[code]
        elif code == len(table) and prev is not None:
            entry = prev + prev[:1]
        else:
            raise ValueError("GIF: corrupt LZW stream")
        out += entry
        if prev is not None and len(table) < 4096:
            table.append(prev + entry[:1])
            if len(table) == (1 << width) and width < 12:
                width += 1
        prev = entry
    return bytes(out)


def _deinterlace(indices: bytes, width: int, height: int) -> bytes:
    """Reorder the four GIF interlace passes into natural row order."""
    rows = [indices[r * width:(r + 1) * width] for r in range(height)]
    order: List[int] = (list(range(0, height, 8)) + list(range(4, height, 8))
                        + list(range(2, height, 4)) + list(range(1, height, 2)))
    natural = [b""] * height
    for src, dst in enumerate(order):
        natural[dst] = rows[src]
    return b"".join(natural)


def iter_gif_frames(data: bytes):
    """Every frame of a (possibly animated) GIF, in stream order:
    yields ``(delay_ms, samples, width, height, channels 3|4)``.

    ``delay_ms`` is the frame's own Graphic Control Extension delay
    (centiseconds × 10; 0 when the stream declares none). Per GIF89a the
    GCE applies only to the image that follows it, so transparency and
    delay reset after each frame. Frames are returned as standalone
    rasters — logical-screen compositing (disposal methods, frame
    offsets onto the previous canvas) is out of scope, the same
    documented boundary as :func:`decode_gif`."""
    if data[:6] not in (b"GIF87a", b"GIF89a"):
        raise ValueError("not a GIF byte stream")
    try:
        yield from _iter_gif_frames_unchecked(data)
    except (IndexError, struct.error) as e:  # truncated mid-structure
        raise ValueError(f"GIF: truncated byte stream ({e})") from e


def _iter_gif_frames_unchecked(data: bytes):
    sw, sh, flags, _bg, _ar = struct.unpack_from("<HHBBB", data, 6)
    pos = 13
    gct: Optional[bytes] = None
    if flags & 0x80:
        n = 2 << (flags & 7)
        gct = data[pos:pos + 3 * n]
        pos += 3 * n
    transparent: Optional[int] = None
    delay_ms = 0
    while pos < len(data):
        b = data[pos]
        if b == 0x3B:  # trailer
            break
        if b == 0x21:  # extension
            label = data[pos + 1]
            pos += 2
            if label == 0xF9 and data[pos] >= 4:  # GCE
                gflags = data[pos + 1]
                delay_ms = struct.unpack_from("<H", data, pos + 2)[0] * 10
                if gflags & 1:
                    transparent = data[pos + 4]
            while data[pos]:  # sub-blocks
                pos += 1 + data[pos]
            pos += 1
            continue
        if b == 0x2C:  # image descriptor
            ix, iy, iw, ih, iflags = struct.unpack_from("<HHHHB", data, pos + 1)
            pos += 10
            ct = gct
            if iflags & 0x80:
                n = 2 << (iflags & 7)
                ct = data[pos:pos + 3 * n]
                pos += 3 * n
            if ct is None:
                raise ValueError("GIF: no color table")
            min_code = data[pos]
            pos += 1
            lzw = bytearray()
            while data[pos]:
                ln = data[pos]
                lzw += data[pos + 1:pos + 1 + ln]
                pos += 1 + ln
            pos += 1
            indices = _lzw_decode(bytes(lzw), min_code)[:iw * ih]
            if len(indices) < iw * ih:
                raise ValueError("GIF: truncated pixel data")
            if iflags & 0x40:
                indices = _deinterlace(indices, iw, ih)
            ch = 4 if transparent is not None else 3
            out = bytearray(iw * ih * ch)
            for i, idx in enumerate(indices):
                c = ct[3 * idx:3 * idx + 3]
                o = i * ch
                out[o:o + 3] = c if len(c) == 3 else b"\x00\x00\x00"
                if ch == 4:
                    out[o + 3] = 0 if idx == transparent else 255
            # frames positioned inside a larger logical screen: return the
            # frame raster itself (corpus semantics: the image IS the frame)
            yield delay_ms, bytes(out), iw, ih, ch
            transparent = None  # GCE scope ends with its image
            delay_ms = 0
            continue
        pos += 1


def decode_gif(data: bytes) -> Tuple[bytes, int, int, int]:
    """First frame → (samples, width, height, channels 3|4). Channels
    is 4 (RGBA) iff the frame declares a transparent index."""
    for _delay, samples, w, h, ch in iter_gif_frames(data):
        return samples, w, h, ch
    raise ValueError("GIF: no image descriptor")


def _lzw_encode(indices: bytes, min_code_size: int) -> bytes:
    clear = 1 << min_code_size
    eoi = clear + 1
    out = bytearray()
    cur = 0
    curbits = 0

    def emit(code: int, width: int):
        nonlocal cur, curbits
        cur |= code << curbits
        curbits += width
        while curbits >= 8:
            out.append(cur & 0xFF)
            cur >>= 8
            curbits -= 8

    table = {bytes([i]): i for i in range(clear)}
    next_code = eoi + 1
    width = min_code_size + 1
    emit(clear, width)
    prev = b""
    for byte in indices:
        piece = prev + bytes([byte])
        if piece in table:
            prev = piece
            continue
        emit(table[prev], width)
        if next_code < 4096:
            table[piece] = next_code
            next_code += 1
            if next_code - 1 == (1 << width) and width < 12:
                width += 1
        else:
            emit(clear, width)
            table = {bytes([i]): i for i in range(clear)}
            next_code = eoi + 1
            width = min_code_size + 1
        prev = bytes([byte])
    if prev:
        emit(table[prev], width)
    emit(eoi, width)
    if curbits:
        out.append(cur & 0xFF)
    return bytes(out)


def encode_gif(pixels: bytes, width: int, height: int, channels: int) -> bytes:
    """Single-frame GIF89a with a full 256-entry palette built from the
    image's distinct colors (>256 distinct colors raises — GIF is an
    indexed format; quantization is out of scope)."""
    return encode_gif_animation([pixels], width, height, channels)


def encode_gif_animation(frames, width: int, height: int, channels: int,
                         delays_ms=None) -> bytes:
    """GIF89a with one image block per frame raster, sharing one global
    256-entry palette over ALL frames (more than 256 distinct colors
    across the animation raises, like :func:`encode_gif`). ``delays_ms``
    (per-frame, rounded down to centiseconds) become each frame's GCE
    delay; a single-frame call with no delays writes a plain still."""
    if channels not in (3, 4):
        raise ValueError("channels must be 3 (RGB) or 4 (RGBA)")
    if not frames:
        raise ValueError("need at least one frame")
    delays = list(delays_ms or [0] * len(frames))
    if len(delays) != len(frames):
        raise ValueError("delays_ms must match frames")
    colors: dict = {}
    transparent = None
    frame_indices: List[bytearray] = []
    for pixels in frames:
        px = bytes(pixels)
        if len(px) != width * height * channels:
            raise ValueError("frame size mismatch")
        indices = bytearray()
        for i in range(width * height):
            o = i * channels
            if channels == 4 and px[o + 3] < 128:
                key = None  # transparent pixel
            else:
                key = px[o:o + 3]
            if key not in colors:
                if len(colors) >= 256:
                    raise ValueError(
                        "GIF encode: more than 256 distinct colors")
                colors[key] = len(colors)
                if key is None:
                    transparent = colors[key]
            indices.append(colors[key])
        frame_indices.append(indices)
    palette = bytearray(256 * 3)
    for key, idx in colors.items():
        if key is not None:
            palette[3 * idx:3 * idx + 3] = key
    out = bytearray(b"GIF89a")
    out += struct.pack("<HHBBB", width, height, 0x80 | 7, 0, 0)  # 256-entry GCT
    out += palette
    min_code = 8
    for indices, delay in zip(frame_indices, delays):
        if transparent is not None or delay:
            out += (b"\x21\xf9\x04"
                    + bytes([1 if transparent is not None else 0])
                    + struct.pack("<H", max(0, int(delay)) // 10)
                    + bytes([transparent or 0]) + b"\x00")
        out += b"\x2c" + struct.pack("<HHHHB", 0, 0, width, height, 0)
        out += bytes([min_code])
        lzw = _lzw_encode(bytes(indices), min_code)
        for i in range(0, len(lzw), 255):
            chunk = lzw[i:i + 255]
            out += bytes([len(chunk)]) + chunk
        out += b"\x00"
    out += b"\x3b"
    return bytes(out)
