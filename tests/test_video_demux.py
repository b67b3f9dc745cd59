"""Video demux family: AVI/MJPEG round trip, animated GIF frames, the
frame_sample operator's default routing, and the loud non-native-codec
boundaries."""

import pytest

from dataingestion_spark.operators.gif_codec import (
    decode_gif, encode_gif, encode_gif_animation, iter_gif_frames,
)
from dataingestion_spark.operators.jpeg_codec import encode_jpeg
from dataingestion_spark.operators.video_demux import (
    demux_avi, encode_avi_mjpeg, video_frame_decoder,
)

W, H = 16, 8


def _jpeg_frames(n):
    return [encode_jpeg(bytes(((i * 37 + k * 11) % 256)
                              for i in range(W * H * 3)), W, H, 3, quality=90)
            for k in range(n)]


def _gif_frames(n):
    return [bytes(b for i in range(W * H)
                  for b in ((k * 40) % 200, (i % 8) * 20, 7))
            for k in range(n)]


def test_avi_mjpeg_roundtrip_bytes_and_timestamps():
    frames = _jpeg_frames(12)
    avi = encode_avi_mjpeg(frames, W, H, fps=10)
    out = demux_avi(avi)
    assert [ts for ts, _ in out] == [i * 100 for i in range(12)]
    # frames come back VERBATIM (no re-encode at demux time)
    assert [f for _, f in out] == frames


def test_avi_demuxed_frame_decodes_through_jpeg_codec():
    from dataingestion_spark.operators.multimodal import decode_image_bytes

    avi = encode_avi_mjpeg(_jpeg_frames(3), W, H, fps=5)
    _, frame = demux_avi(avi)[1]
    _, w, h, ch = decode_image_bytes(frame)
    assert (w, h, ch) == (W, H, 3)


def test_avi_rejects_non_avi_and_foreign_codecs():
    with pytest.raises(ValueError, match="not an AVI"):
        demux_avi(b"RIFF\x04\x00\x00\x00WAVE")
    avi = bytearray(encode_avi_mjpeg(_jpeg_frames(1), W, H))
    i = avi.index(b"MJPG")  # strh fccHandler
    avi[i:i + 4] = b"H264"
    with pytest.raises(NotImplementedError, match="H264"):
        demux_avi(bytes(avi))


def test_gif_animation_roundtrip_frames_and_delays():
    frames = _gif_frames(5)
    gif = encode_gif_animation(frames, W, H, 3, delays_ms=[200] * 5)
    decoded = list(iter_gif_frames(gif))
    assert [d[0] for d in decoded] == [200] * 5
    assert [d[1] for d in decoded] == frames
    # decode_gif still returns exactly the first frame
    first, w, h, ch = decode_gif(gif)
    assert first == frames[0] and (w, h, ch) == (W, H, 3)


def test_gif_single_frame_encoder_unchanged():
    f = _gif_frames(1)[0]
    samples, w, h, ch = decode_gif(encode_gif(f, W, H, 3))
    assert samples == f and (w, h, ch) == (W, H, 3)


def test_video_frame_decoder_sampling_boundaries():
    avi = encode_avi_mjpeg(_jpeg_frames(12), W, H, fps=10)  # ts 0..1100
    # first frame at or past each multiple of every_n_ms
    assert [t for t, _ in video_frame_decoder(avi, 250)] == [0, 300, 500,
                                                             800, 1000]
    assert [t for t, _ in video_frame_decoder(avi, 1)] == \
        [i * 100 for i in range(12)]
    gif = encode_gif_animation(_gif_frames(5), W, H, 3, delays_ms=[200] * 5)
    assert [t for t, _ in video_frame_decoder(gif, 400)] == [0, 400, 800]
    with pytest.raises(ValueError, match="unsupported video container"):
        video_frame_decoder(b"\x00\x00\x00\x18ftypmp42" + b"x" * 64, 100)


def test_truncated_containers_raise_valueerror_not_crash():
    """Every truncation point of valid AVI/GIF bytes must surface as
    ValueError (the exception class the default frame_sample route
    swallows) — never struct.error / IndexError, which would kill a
    corpus job on one damaged file."""
    avi = encode_avi_mjpeg(_jpeg_frames(3), W, H, fps=5)
    gif = encode_gif_animation(_gif_frames(3), W, H, 3, delays_ms=[100] * 3)
    for blob in (avi, gif):
        for cut in range(7, len(blob), 13):
            try:
                video_frame_decoder(blob[:cut], 100)
            except ValueError:
                pass  # the contract
            # frames cleanly cut at a boundary may legitimately parse


def test_frame_sample_default_route_live(spark):
    """frame_sample with NO decoder argument runs LIVE over a mixed
    column: AVI rows yield verbatim JPEG frames, GIF rows yield PNG
    frames, foreign bytes yield zero rows without failing the job."""
    from dataingestion_spark.operators.multimodal import (
        decode_image_bytes, frame_sample,
    )

    avi = encode_avi_mjpeg(_jpeg_frames(12), W, H, fps=10)
    gif = encode_gif_animation(_gif_frames(5), W, H, 3, delays_ms=[200] * 5)
    df = spark.createDataFrame(
        [("avi", bytearray(avi)), ("gif", bytearray(gif)),
         ("mp4", bytearray(b"\x00\x00\x00\x18ftypmp42" + b"x" * 64)),
         ("nul", None)],
        "doc_id string, video_content binary",
    )
    rows = frame_sample(df, every_n_ms=400).collect()
    by_doc = {}
    for r in rows:
        by_doc.setdefault(r.doc_id, []).append(r)
    assert sorted(by_doc) == ["avi", "gif"]
    assert [r.ts_ms for r in by_doc["avi"]] == [0, 400, 800]
    assert [r.ts_ms for r in by_doc["gif"]] == [0, 400, 800]
    for r in by_doc["avi"] + by_doc["gif"]:
        _, w, h, _ = decode_image_bytes(bytes(r.frame))
        assert (w, h) == (W, H)


def test_frame_sample_explicit_decoder_raises_through(spark):
    from dataingestion_spark.operators.multimodal import frame_sample

    df = spark.createDataFrame([("d", bytearray(b"junk"))],
                               "doc_id string, video_content binary")

    def bad(data, every):
        raise ValueError("boom")

    with pytest.raises(Exception, match="boom"):
        frame_sample(df, decoder=bad).collect()


def test_avi_video_stream_not_first():
    """Audio strl before video strl: the video chunks are 01dc, and the
    demuxer must follow the strl order rather than assuming stream 00."""
    import struct

    def chunk(cid, body):
        pad = b"\x00" if len(body) & 1 else b""
        return cid + struct.pack("<I", len(body)) + body + pad

    def lst(ltype, body):
        return chunk(b"LIST", ltype + body)

    frames = _jpeg_frames(3)
    avih = struct.pack("<IIIIIIIIII4I", 100_000, 0, 0, 0x10, 3, 0, 2,
                       0, W, H, 0, 0, 0, 0)
    auds_strh = (b"auds" + b"\x00" * 4 + struct.pack(
        "<IHHIIIIIIIi", 0, 0, 0, 0, 1, 8000, 0, 100, 0, 0, 0)
        + struct.pack("<4H", 0, 0, 0, 0))
    vids_strh = (b"vids" + b"MJPG" + struct.pack(
        "<IHHIIIIIIIi", 0, 0, 0, 0, 1, 10, 0, 3, 0, 0, 0)
        + struct.pack("<4H", 0, 0, W, H))
    strf_a = b"\x01\x00" * 9  # fake WAVEFORMATEX
    strf_v = struct.pack("<IiiHH4sIiiII", 40, W, H, 1, 24, b"MJPG",
                         W * H * 3, 0, 0, 0, 0)
    hdrl = lst(b"hdrl", chunk(b"avih", avih)
               + lst(b"strl", chunk(b"strh", auds_strh) + chunk(b"strf", strf_a))
               + lst(b"strl", chunk(b"strh", vids_strh) + chunk(b"strf", strf_v)))
    movi = lst(b"movi",
               chunk(b"00wb", b"\x00" * 64)        # audio payload, stream 0
               + b"".join(chunk(b"01dc", f) for f in frames))
    body = b"AVI " + hdrl + movi
    avi = b"RIFF" + struct.pack("<I", len(body)) + body

    out = demux_avi(avi)
    assert [f for _, f in out] == frames
    assert [t for t, _ in out] == [0, 100, 200]
