"""Multimodal column operators: images/audio/video as opaque binary + typed
metadata, with Arrow-batched processing plumbing.

Design for 100 TB multimodal corpora: media bytes live in a ``binary``
column (or a path column pointing at object storage for >100 MB assets),
typed metadata travels in ordinary columns so pruning/filtering never
touches the bytes, and every transform is a ``mapInPandas`` batch operator —
Arrow moves the bytes to Python once per batch, the decode library runs
vectorized, and the output schema is fixed up front.

Codec story (r4): PNG and baseline JPEG decode/encode/resize/crop are
REAL, pure-python, deterministic (:mod:`.png_codec`,
:mod:`.jpeg_codec`) — ``image_resize(decoder=image_decoder)`` and
:func:`image_tile_pixels` do actual pixel work with no external imaging
libraries, and the probes parse real container headers (PNG IHDR, JPEG
SOF, GIF/BMP, WAV fmt). Formats beyond those (video demux, progressive
JPEG, HEIC, …) stay behind explicit ``decoder=`` hooks that raise with
the needed library named; the Spark side — schemas, Arrow batching,
partitioning, null handling — is identical either way, so swapping in
Pillow/ffmpeg is a one-argument change.
"""

from __future__ import annotations

import hashlib
import struct
from typing import Callable, Iterator, Optional

from pyspark.sql import DataFrame, functions as F

IMAGE_META_SCHEMA = (
    "width int, height int, format string, n_bytes long, sha256 string"
)

AUDIO_META_SCHEMA = (
    "sample_rate int, channels int, duration_ms long, n_bytes long, sha256 string"
)


def probe_image(data: bytes) -> dict:
    """Structural image probe: real PNG IHDR / GIF / BMP header parsing,
    deterministic fallback for unknown formats."""
    width = height = None
    fmt = "unknown"
    if data[:8] == b"\x89PNG\r\n\x1a\n" and len(data) >= 24:
        fmt = "png"
        width, height = struct.unpack(">II", data[16:24])
    elif data[:6] in (b"GIF87a", b"GIF89a") and len(data) >= 10:
        fmt = "gif"
        width, height = struct.unpack("<HH", data[6:10])
    elif data[:2] == b"BM" and len(data) >= 26:
        fmt = "bmp"
        width, height = struct.unpack("<ii", data[18:26])
        height = abs(height)  # top-down BMPs store a negative biHeight
    elif data[:3] == b"\xff\xd8\xff":
        fmt = "jpeg"
        try:  # header-only SOF scan (operators/jpeg_codec.py) — real dims
            from .jpeg_codec import probe_jpeg_dimensions

            dims = probe_jpeg_dimensions(data)
            if dims is not None:
                width, height = dims
        except Exception:
            pass
    elif data[:4] == b"RIFF" and data[8:12] == b"WEBP" and len(data) >= 16:
        fmt = "webp"
        tag = data[12:16]
        if tag == b"VP8X" and len(data) >= 30:  # 24-bit canvas minus one
            width = 1 + int.from_bytes(data[24:27], "little")
            height = 1 + int.from_bytes(data[27:30], "little")
        elif tag == b"VP8L" and len(data) >= 25 and data[20] == 0x2F:
            bits = int.from_bytes(data[21:25], "little")  # lossless stream
            width = (bits & 0x3FFF) + 1
            height = ((bits >> 14) & 0x3FFF) + 1
        elif (tag == b"VP8 " and len(data) >= 30
              and data[23:26] == b"\x9d\x01\x2a"):  # lossy key frame
            width = struct.unpack("<H", data[26:28])[0] & 0x3FFF
            height = struct.unpack("<H", data[28:30])[0] & 0x3FFF
    elif data[:4] in (b"II*\x00", b"MM\x00*") and len(data) >= 8:
        fmt = "tiff"
        bo = "<" if data[:2] == b"II" else ">"
        try:  # IFD0 walk: tags 256/257, SHORT or LONG inline values
            (ifd_off,) = struct.unpack_from(f"{bo}I", data, 4)
            (n,) = struct.unpack_from(f"{bo}H", data, ifd_off)
            for i in range(n):
                tag, typ, cnt = struct.unpack_from(
                    f"{bo}HHI", data, ifd_off + 2 + 12 * i)
                voff = ifd_off + 2 + 12 * i + 8
                val = (struct.unpack_from(f"{bo}H", data, voff)[0]
                       if typ == 3 else struct.unpack_from(f"{bo}I", data, voff)[0])
                if tag == 256:
                    width = val
                elif tag == 257:
                    height = val
        except (struct.error, IndexError):
            width = height = None
    return {
        "width": width,
        "height": height,
        "format": fmt,
        "n_bytes": len(data),
        "sha256": hashlib.sha256(data).hexdigest(),
    }


def probe_audio(data: bytes) -> dict:
    """Structural audio probe: real RIFF/WAV fmt parsing, else deterministic
    metadata from the byte stream."""
    sample_rate = channels = None
    duration_ms = None
    if data[:4] == b"RIFF" and data[8:12] == b"WAVE" and len(data) >= 44:
        channels, sample_rate = struct.unpack("<HI", data[22:28])
        byte_rate = struct.unpack("<I", data[28:32])[0]
        if byte_rate:
            duration_ms = int((len(data) - 44) * 1000 / byte_rate)
    return {
        "sample_rate": sample_rate,
        "channels": channels,
        "duration_ms": duration_ms,
        "n_bytes": len(data),
        "sha256": hashlib.sha256(data).hexdigest(),
    }


def _binary_op(df: DataFrame, binary_col: str, probe: Callable[[bytes], dict],
               out_schema: str, keep_cols) -> DataFrame:
    keep = list(keep_cols)
    schema = ", ".join(f"{c} {t}" for c, t in keep) + ", " + out_schema

    def run(batches) -> Iterator:
        import pandas as pd

        for pdf in batches:
            out = []
            for _, r in pdf.iterrows():
                data = r[binary_col]
                row = {c: r[c] for c, _ in keep}
                row.update(
                    probe(bytes(data)) if data is not None
                    else {k.split()[0]: None for k in out_schema.split(", ")}
                )
                out.append(row)
            yield pd.DataFrame(out)

    return df.mapInPandas(run, schema=schema)


def image_metadata(df: DataFrame, binary_col: str = "image_content",
                   id_cols=(("doc_id", "string"), ("seq", "long"))) -> DataFrame:
    """Probe every image binary into typed metadata columns. Input rows
    without bytes produce null metadata (never dropped)."""
    return _binary_op(df, binary_col, probe_image, IMAGE_META_SCHEMA, id_cols)


def audio_metadata(df: DataFrame, binary_col: str = "audio_content",
                   id_cols=(("doc_id", "string"),)) -> DataFrame:
    return _binary_op(df, binary_col, probe_audio, AUDIO_META_SCHEMA, id_cols)


def image_resize(df: DataFrame, binary_col: str = "image_content",
                 max_side: int = 256,
                 decoder: Optional[Callable] = None) -> DataFrame:
    """Resize through Arrow-batched ``mapInPandas``: per-image CPU, zero
    shuffle, zero driver pixels.

    ``decoder=None`` (the default) routes by magic bytes through the
    repo's own stdlib codecs (:func:`image_decoder`: PNG / baseline JPEG
    / GIF decode, lossless PNG re-encode); bytes neither codec can
    honestly decode yield a null image/width/height row so one stray
    WebP can't kill a corpus-wide job. An explicit ``decoder`` (e.g. a
    Pillow/native ``lambda data, max_side: (resized_bytes, w, h)`` at
    throughput scale) keeps raise-through semantics — its errors are its
    caller's contract."""
    default_route = decoder is None
    if default_route:
        decoder = image_decoder

    def run(batches) -> Iterator:
        import pandas as pd

        for pdf in batches:
            out = []
            for _, r in pdf.iterrows():
                data = r[binary_col]
                if data is None:
                    out.append({"doc_id": r["doc_id"], "seq": r["seq"],
                                "image": None, "width": None, "height": None})
                    continue
                try:
                    resized, w, h = decoder(bytes(data), max_side)
                except ValueError:
                    if not default_route:
                        raise
                    resized = w = h = None
                out.append({"doc_id": r["doc_id"], "seq": r["seq"],
                            "image": resized, "width": w, "height": h})
            yield pd.DataFrame(out)

    return df.mapInPandas(
        run, schema="doc_id string, seq long, image binary, width int, height int"
    )


def frame_sample(df: DataFrame, binary_col: str = "video_content",
                 every_n_ms: int = 1000,
                 decoder: Optional[Callable] = None) -> DataFrame:
    """Video frame sampling: one row per sampled frame
    (``doc_id, ts_ms, frame``), Arrow-batched, zero shuffle.

    ``decoder=None`` (the default) demuxes the two containers the repo
    handles natively (:mod:`.video_demux`: MJPEG-in-AVI → verbatim JPEG
    frames; animated GIF → PNG-encoded frames), sampling the first
    frame at or past each ``every_n_ms`` boundary; bytes of any other
    container produce zero rows for that document rather than killing
    the corpus job. An explicit ``decoder`` (an ffmpeg-backed
    ``lambda data, every_n_ms: [(ts_ms, frame_bytes), ...]`` at
    throughput scale) keeps raise-through semantics."""
    default_route = decoder is None
    if default_route:
        from .video_demux import video_frame_decoder
        decoder = video_frame_decoder

    def run(batches) -> Iterator:
        import pandas as pd

        for pdf in batches:
            out = []
            for _, r in pdf.iterrows():
                data = r[binary_col]
                if data is None:
                    continue
                try:
                    sampled = decoder(bytes(data), every_n_ms)
                except (ValueError, NotImplementedError):
                    if not default_route:
                        raise
                    continue
                for ts_ms, frame in sampled:
                    out.append({"doc_id": r["doc_id"], "ts_ms": ts_ms, "frame": frame})
            yield pd.DataFrame(out, columns=["doc_id", "ts_ms", "frame"])

    return df.mapInPandas(run, schema="doc_id string, ts_ms long, frame binary")


def audio_segments(meta: DataFrame, window_ms: int = 1000,
                   hop_ms: int | None = None, header_bytes: int = 44,
                   id_col: str = "doc_id") -> DataFrame:
    """Fixed-window audio segmentation PLUMBING: from probed metadata
    (``duration_ms``, ``n_bytes``, ``channels`` — :func:`audio_metadata`'s
    output), emit one row per window with its time span and the
    block-aligned BYTE RANGE inside the original binary — everything a
    downstream decode/feature-extract UDF needs to slice without
    re-parsing containers. Decode itself stays out (no codec libs in
    this image); the byte math is the real, scale-tested part.

    Offsets map time proportionally onto the payload
    (``header + t·n_data/duration`` floored to the sample block), so the
    arithmetic is integer-exact and engine-reproducible regardless of
    the container's nominal byte rate. Rows without probed duration
    (non-WAV bytes) are dropped. Windows: ``t_start = i·hop`` while
    ``t_start < duration``; the final window truncates at the end."""
    hop = int(hop_ms or window_ms)
    if hop <= 0 or window_ms <= 0:
        raise ValueError("window_ms and hop_ms must be positive")
    d = F.col("duration_ms").cast("long")
    ok = meta.filter(d.isNotNull() & (d > 0))
    n_seg = F.greatest(F.ceil(d / F.lit(hop)).cast("long"), F.lit(1))
    block = (F.col("channels").cast("long") * 2)
    n_data = F.col("n_bytes").cast("long") - header_bytes

    def at(t):  # block-aligned payload byte offset of time t
        return F.expr(
            f"(({t} * (n_bytes - {header_bytes}) DIV duration_ms)"
            f" DIV (channels * 2)) * (channels * 2)"
        )

    segs = ok.withColumn("seg", F.explode(F.sequence(F.lit(0), n_seg - 1)))
    t0 = (F.col("seg") * hop).cast("long")
    t1 = F.least(t0 + window_ms, d)
    return (
        segs.withColumn("t_start_ms", t0)
        .withColumn("t_end_ms", t1)
        .withColumn("byte_start", F.lit(header_bytes) + at("t_start_ms"))
        .withColumn(
            "byte_end",
            F.lit(header_bytes)
            + F.when(t1 == d, n_data).otherwise(at("t_end_ms")),
        )
        .select(id_col, "seg", "t_start_ms", "t_end_ms",
                "byte_start", "byte_end")
    )


def image_tiles(meta: DataFrame, tile_w: int = 256, tile_h: int = 256,
                id_col: str = "doc_id") -> DataFrame:
    """Tiling plumbing for vision pipelines (the 2-D analog of
    :func:`audio_segments`): from probed ``width``/``height``
    (:func:`image_metadata`'s output), one row per tile of a
    ``tile_w × tile_h`` grid with its pixel rectangle — edge tiles
    truncate at the image bounds. ViT-style patchification, SAM-style
    crop grids, and thumbnail pyramids all consume exactly this
    coordinate stream; the pixel decode itself stays behind the codec
    hooks. Rows without probed dimensions are dropped. Output:
    ``(id, tile_x, tile_y, x0, y0, x1, y1)`` with x1/y1 exclusive."""
    if tile_w <= 0 or tile_h <= 0:
        raise ValueError("tile_w and tile_h must be positive")
    w = F.col("width").cast("long")
    h = F.col("height").cast("long")
    ok = meta.filter(w.isNotNull() & h.isNotNull() & (w > 0) & (h > 0))
    nx = F.ceil(w / F.lit(tile_w)).cast("long")
    ny = F.ceil(h / F.lit(tile_h)).cast("long")
    g = (
        ok.withColumn("tile_x", F.explode(F.sequence(F.lit(0), nx - 1)))
        .withColumn("tile_y", F.explode(F.sequence(F.lit(0), ny - 1)))
    )
    x0 = F.col("tile_x") * tile_w
    y0 = F.col("tile_y") * tile_h
    return g.select(
        id_col, "tile_x", "tile_y",
        x0.alias("x0"), y0.alias("y0"),
        F.least(x0 + tile_w, w).alias("x1"),
        F.least(y0 + tile_h, h).alias("y1"),
    )


def png_tile_pixels(df: DataFrame, tile_w: int = 256, tile_h: int = 256,
                    binary_col: str = "image_content",
                    id_col: str = "doc_id") -> DataFrame:
    """REAL tile extraction for PNG bytes — no external codecs: decode
    once per image with the stdlib codec (:mod:`.png_codec`), crop every
    rectangle of the same grid :func:`image_tiles` emits (edge tiles
    truncate), re-encode each tile as PNG. One Arrow-batched pass;
    non-PNG/undecodable rows are dropped (the codec raises on formats it
    can't honestly decode). Output: ``(id, tile_x, tile_y, x0, y0, x1,
    y1, tile binary)``."""
    if tile_w <= 0 or tile_h <= 0:
        raise ValueError("tile_w and tile_h must be positive")

    def run(batches) -> Iterator:
        import pandas as pd

        from .png_codec import crop, decode_png, encode_png

        cols = [id_col, "tile_x", "tile_y", "x0", "y0", "x1", "y1", "tile"]
        for pdf in batches:
            out = []
            for _, r in pdf.iterrows():
                data = r[binary_col]
                if data is None:
                    continue
                try:
                    pixels, w, h, ch = decode_png(bytes(data))
                except ValueError:
                    continue
                for ty in range((h + tile_h - 1) // tile_h):
                    for tx in range((w + tile_w - 1) // tile_w):
                        x0, y0 = tx * tile_w, ty * tile_h
                        x1, y1 = min(x0 + tile_w, w), min(y0 + tile_h, h)
                        piece = crop(pixels, w, h, ch, x0, y0, x1, y1)
                        out.append({
                            id_col: r[id_col], "tile_x": tx, "tile_y": ty,
                            "x0": x0, "y0": y0, "x1": x1, "y1": y1,
                            "tile": encode_png(piece, x1 - x0, y1 - y0, ch),
                        })
            yield pd.DataFrame(out, columns=cols)

    return df.mapInPandas(
        run,
        schema=f"{id_col} string, tile_x int, tile_y int, "
               "x0 int, y0 int, x1 int, y1 int, tile binary",
    )


def decode_image_bytes(data: bytes):
    """Magic-byte routed decode to raw samples via the stdlib codecs:
    PNG (:mod:`.png_codec`) or baseline JPEG (:mod:`.jpeg_codec`).
    Returns (pixels, width, height, channels); raises ValueError for
    formats neither codec can honestly decode."""
    data = bytes(data)
    if data[:8] == b"\x89PNG\r\n\x1a\n":
        from .png_codec import decode_png

        return decode_png(data)
    if data[:3] == b"\xff\xd8\xff":
        from .jpeg_codec import decode_jpeg

        return decode_jpeg(data)
    if data[:6] in (b"GIF87a", b"GIF89a"):
        from .gif_codec import decode_gif

        return decode_gif(data)
    raise ValueError("unsupported image format (PNG, baseline JPEG, and "
                     "GIF decode natively; others need an external codec)")


def image_decoder(data: bytes, max_side: int):
    """:func:`image_resize` codec hook covering BOTH native formats:
    decode by magic, shrink (never upscale, aspect preserved), re-encode
    as PNG (lossless output side)."""
    from .png_codec import encode_png, resize_nearest

    pixels, w, h, ch = decode_image_bytes(data)
    if max(w, h) <= max_side:
        return encode_png(pixels, w, h, ch), w, h
    if w >= h:
        nw, nh = max_side, max(1, h * max_side // w)
    else:
        nw, nh = max(1, w * max_side // h), max_side
    return (encode_png(resize_nearest(pixels, w, h, ch, nw, nh), nw, nh, ch),
            nw, nh)


def image_tile_pixels(df: DataFrame, tile_w: int = 256, tile_h: int = 256,
                      binary_col: str = "image_content",
                      id_col: str = "doc_id") -> DataFrame:
    """:func:`png_tile_pixels` generalized over both native codecs: PNG
    and baseline JPEG bytes decode once per image, every grid rectangle
    crops and re-encodes as PNG tiles. Undecodable rows are dropped."""
    if tile_w <= 0 or tile_h <= 0:
        raise ValueError("tile_w and tile_h must be positive")

    def run(batches) -> Iterator:
        import pandas as pd

        from .png_codec import crop, encode_png

        cols = [id_col, "tile_x", "tile_y", "x0", "y0", "x1", "y1", "tile"]
        for pdf in batches:
            out = []
            for _, r in pdf.iterrows():
                data = r[binary_col]
                if data is None:
                    continue
                try:
                    pixels, w, h, ch = decode_image_bytes(bytes(data))
                except (ValueError, NotImplementedError):
                    continue
                for ty in range((h + tile_h - 1) // tile_h):
                    for tx in range((w + tile_w - 1) // tile_w):
                        x0, y0 = tx * tile_w, ty * tile_h
                        x1, y1 = min(x0 + tile_w, w), min(y0 + tile_h, h)
                        piece = crop(pixels, w, h, ch, x0, y0, x1, y1)
                        out.append({
                            id_col: r[id_col], "tile_x": tx, "tile_y": ty,
                            "x0": x0, "y0": y0, "x1": x1, "y1": y1,
                            "tile": encode_png(piece, x1 - x0, y1 - y0, ch),
                        })
            yield pd.DataFrame(out, columns=cols)

    return df.mapInPandas(
        run,
        schema=f"{id_col} string, tile_x int, tile_y int, "
               "x0 int, y0 int, x1 int, y1 int, tile binary",
    )
