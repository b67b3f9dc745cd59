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


def test_zstd_resync_rejects_embedded_magic(tmp_path):
    """A RAW-block zstd frame can carry arbitrary payload bytes —
    including the frame magic itself. A resync landing just before
    the embedded magic must skip it (structural walk or chain check
    fails) and lock onto the next REAL frame."""
    import pyarrow as pa

    from dataingestion_spark.sources.jsonl import (
        _find_zstd_frame, _read_zst_span,
    )

    # hand-build frame 1: magic, FHD (single-segment, content size
    # 1 byte), then ONE raw last-block whose payload embeds the magic
    # followed by junk that cannot complete a frame header walk
    payload = b"AA" + b"\x28\xb5\x2f\xfd" + b"\x20\x00" + b"Z" * 40
    fhd = 0x20  # single-segment, fcs 1 byte, no checksum, no dict
    blk = (len(payload) << 3) | (0 << 1) | 1  # raw, last
    f1 = (b"\x28\xb5\x2f\xfd" + bytes([fhd, len(payload)])
          + blk.to_bytes(3, "little") + payload)
    f2 = pa.Codec("zstd").compress(b'{"doc_id": 9}\n').to_pybytes()
    blob = f1 + f2
    p = str(tmp_path / "adv.jsonl.zst")
    open(p, "wb").write(blob)
    size = len(blob)

    # sanity: the REAL stream decodes (frame 1 regenerates `payload`)
    import pyarrow as _pa
    got = _pa.input_stream(_pa.py_buffer(blob),
                           compression="zstd").read()
    assert bytes(got).startswith(payload)

    class FH:
        def __init__(self, b):
            self.b, self.p = b, 0

        def seek(self, pos):
            self.p = pos

        def read(self, n=None):
            out = self.b[self.p:None if n is None else self.p + n]
            self.p += len(out)
            return out

    # resync from byte 1 (inside frame 1): must land on f2's start,
    # not the embedded magic inside the raw payload
    found = _find_zstd_frame(FH(blob), 1, size)
    assert found == len(f1), f"false resync at {found}"
    # and the span math stays exact through the adversarial frame
    assert _read_zst_span(p, 0, size, size) == blob


def test_tar_resync_ignores_unaligned_fake_header(tmp_path):
    """A checksum-VALID ustar header embedded at an UNALIGNED offset
    inside a payload must never capture a resync (candidates are only
    512-aligned); at an aligned offset the documented tar-in-tar
    caveat applies and the chain check still requires consistency."""
    from dataingestion_spark.sinks.webdataset import (
        _read_tar_span, _tar_header, build_tar_bytes,
    )

    inner = build_tar_bytes([("evil.txt", b"x" * 10)])
    # place the inner archive at an UNALIGNED offset inside a payload
    payload = b"?" * 100 + inner[:512] + b"junk" * 50
    blob = build_tar_bytes([("a.txt", payload), ("b.txt", b"ok")])
    p = str(tmp_path / "adv.tar")
    open(p, "wb").write(blob)
    size = len(blob)

    # the embedded header IS valid as bytes...
    assert _tar_header(inner[:512]) is not None
    # ...but no aligned offset inside the payload parses as one, so
    # every split boundary still partitions exactly
    want = _read_tar_span(p, 0, size, size)
    assert [n for n, _d in want] == ["a.txt", "b.txt"]
    for b in range(512, size, 512):
        got = _read_tar_span(p, 0, b, size) \
            + _read_tar_span(p, b, size, size)
        assert got == want, f"aligned boundary {b} diverged"


def _foreign_tar(tmp_path, fname, fmt, members, pax_headers=None):
    """A tar written by python's tarfile (NOT the repo's USTAR builder)
    — the foreign-shard shape read_webdataset_split must handle."""
    import io
    import tarfile

    p = str(tmp_path / fname)
    kw = {"pax_headers": pax_headers} if pax_headers else {}
    with tarfile.open(p, mode="w", format=fmt, **kw) as tf:
        for name, data in members:
            info = tarfile.TarInfo(name)
            info.size = len(data)
            tf.addfile(info, io.BytesIO(data))
    import os
    return p, os.path.getsize(p)


def _tar_members(members):
    """Mix of short names and >100-char names (forcing pax x records /
    GNU L entries) with payloads spanning 0..3 blocks."""
    out = []
    for i in range(18):
        name = (f"{'d' * 120}/{i:04d}.txt" if i % 3 == 0
                else f"{i:04d}.txt")
        out.append((name, f"body {i} ".encode() * (1 + (i * 37) % 150)))
    return out


def test_tar_pax_longname_every_aligned_boundary(tmp_path):
    """python tarfile writes PAX BY DEFAULT: >100-char member names
    become x-header + payload + real-header sequences. The split
    reader must chain through them, honor the pax `path` override,
    and keep every aligned boundary exactly-once — including when the
    x header and its real header land on opposite sides of a split."""
    import tarfile

    from dataingestion_spark.sinks.webdataset import _read_tar_span

    members = _tar_members(None)
    p, size = _foreign_tar(tmp_path, "pax.tar", tarfile.PAX_FORMAT,
                           members)
    want = _read_tar_span(p, 0, size, size)
    assert want == members  # full pax names, payloads intact
    for b in range(512, size, 512):
        got = _read_tar_span(p, 0, b, size) \
            + _read_tar_span(p, b, size, size)
        assert got == want, f"pax aligned boundary {b} diverged"
    # three-way splits cross-check the claimed-sequence skip path
    for b1, b2 in [(1536, 4096), (2048, 2560), (512, size - 512)]:
        got = (_read_tar_span(p, 0, b1, size)
               + _read_tar_span(p, b1, b2, size)
               + _read_tar_span(p, b2, size, size))
        assert got == want, f"pax 3-way split {b1},{b2} diverged"


def test_tar_gnu_longname_every_aligned_boundary(tmp_path):
    """GNU-format long names travel as typeflag-L entries (name in the
    PAYLOAD, NUL-terminated); same exactly-once contract."""
    import tarfile

    from dataingestion_spark.sinks.webdataset import _read_tar_span

    members = _tar_members(None)
    p, size = _foreign_tar(tmp_path, "gnu.tar", tarfile.GNU_FORMAT,
                           members)
    want = _read_tar_span(p, 0, size, size)
    assert want == members
    for b in range(512, size, 512):
        got = _read_tar_span(p, 0, b, size) \
            + _read_tar_span(p, b, size, size)
        assert got == want, f"gnu aligned boundary {b} diverged"


def test_tar_head_pax_global_split_differential(tmp_path):
    """HEAD-of-archive pax GLOBAL (g) members — the ``git archive``
    shape — are captured by the planner probe (r14): the raw span
    reader still refuses without planner context, but with the
    probe's globals/data_start every aligned split boundary matches
    the tarfile-backed whole-file parse exactly-once."""
    import io
    import tarfile

    import pytest

    from dataingestion_spark.sinks.data_backend import (
        LocalDataBackend,
    )
    from dataingestion_spark.sinks.webdataset import (
        _read_tar_span, _wds_sniff_meta,
    )

    members = _tar_members(None)
    p, size = _foreign_tar(
        tmp_path, "glob.tar", tarfile.PAX_FORMAT, members,
        pax_headers={"comment": "archive-wide"})

    # without planner context the g header still refuses loudly
    with pytest.raises(ValueError, match="GLOBAL"):
        _read_tar_span(p, 0, size, size)

    magic, fsize, gl, ds = _wds_sniff_meta(p, LocalDataBackend())
    assert magic == b"ustar" and fsize == size and ds > 0
    want = _read_tar_span(p, 0, size, size, globals_=gl,
                          data_start=ds)
    assert want == members  # global excluded, members intact
    for b in range(512, size, 512):
        got = (_read_tar_span(p, 0, b, size, globals_=gl,
                              data_start=ds)
               + _read_tar_span(p, b, size, size, globals_=gl,
                                data_start=ds))
        assert got == want, f"g-prefixed boundary {b} diverged"

    # whole-file tarfile parse agrees (payload-level)
    with tarfile.open(p) as tf:
        tf_members = [(i.name, tf.extractfile(i).read())
                      for i in tf.getmembers() if i.isfile()]
    assert tf_members == want


def test_tar_mid_archive_pax_global_still_raises(tmp_path):
    """A g header PAST the archive head is archive-wide state a
    byte-range task cannot see — still a loud refusal, now naming
    MID-archive."""
    import tarfile

    import pytest

    from dataingestion_spark.sinks.data_backend import (
        LocalDataBackend,
    )
    from dataingestion_spark.sinks.webdataset import (
        _next_at, _read_tar_span, _tar_header, _wds_sniff_meta,
    )

    pg, _ = _foreign_tar(
        tmp_path, "gsrc.tar", tarfile.PAX_FORMAT,
        [("b.txt", b"beta" * 40)],
        pax_headers={"comment": "archive-wide"})
    gblob = open(pg, "rb").read()
    # length of the leading g sequence = data_start of the probe
    _, _, _, gds = _wds_sniff_meta(pg, LocalDataBackend())
    gseq = gblob[:gds]

    pa_, _ = _foreign_tar(tmp_path, "asrc.tar", tarfile.USTAR_FORMAT,
                          [("a.txt", b"alpha" * 30)])
    ablob = open(pa_, "rb").read()
    # member-a sequence length: walk headers until the zero block
    off = 0
    while True:
        h = _tar_header(ablob[off:off + 512])
        if h is None:
            break
        off = _next_at(off, h[1])
    mid = ablob[:off] + gseq + gblob[gds:]
    p = str(tmp_path / "midg.tar")
    open(p, "wb").write(mid)
    with pytest.raises(ValueError, match="MID-archive"):
        _read_tar_span(p, 0, len(mid), len(mid))


def test_tar_trailing_partial_padding_resync(tmp_path):
    """A foreign tar truncated INSIDE its final padding (size not a
    multiple of the 10240 record size, < 512 bytes after the last
    member) must still let a resync validate the genuine last header
    (r12 'What's wrong' #3: the old chain check required a full block
    after the member)."""
    from dataingestion_spark.sinks.webdataset import (
        _read_tar_span, build_tar_bytes,
    )

    members = [(f"{i:04d}.txt", b"pay" * (40 + i)) for i in range(6)]
    blob = build_tar_bytes(members)
    # cut to the last member's end + 100 zero bytes: no room for
    # another header, not even the end-of-archive marker
    end_of_members = len(blob.rstrip(b"\x00"))
    end_of_members = (end_of_members + 511) // 512 * 512
    blob = blob[:end_of_members + 100]
    p = str(tmp_path / "trunc.tar")
    open(p, "wb").write(blob)
    size = len(blob)

    want = _read_tar_span(p, 0, size, size)
    assert [n for n, _d in want] == [n for n, _d in members]
    for b in range(512, size, 512):
        got = _read_tar_span(p, 0, b, size) \
            + _read_tar_span(p, b, size, size)
        assert got == want, f"truncated-padding boundary {b} diverged"


def test_tar_mixed_formats_random_splits_differential(tmp_path):
    """Seeded randomized sweep: archives in USTAR / GNU / PAX format
    (mixed short and >100-char names, payloads 0..1500 bytes, 1..20
    members) read identically whole and under random 2-way and 3-way
    byte splits — the exactly-once ownership rule must hold at ANY
    boundary, aligned or not, including inside extension sequences."""
    import random
    import tarfile

    from dataingestion_spark.sinks.webdataset import _read_tar_span

    rng = random.Random(1301)
    for case in range(12):
        fmt = (tarfile.USTAR_FORMAT, tarfile.GNU_FORMAT,
               tarfile.PAX_FORMAT)[case % 3]
        members = []
        for i in range(rng.randint(1, 20)):
            if fmt != tarfile.USTAR_FORMAT and rng.random() < 0.4:
                name = f"{'n' * rng.randint(101, 180)}/{i:03d}.txt"
            else:
                name = f"{i:03d}.txt"
            members.append(
                (name, bytes(rng.getrandbits(8)
                             for _ in range(rng.randint(0, 1500)))))
        p, size = _foreign_tar(tmp_path, f"m{case}.tar", fmt, members)
        want = _read_tar_span(p, 0, size, size)
        assert want == members, f"case {case}: whole read diverged"
        for _ in range(15):
            b = rng.randint(1, size - 1)
            got = _read_tar_span(p, 0, b, size) \
                + _read_tar_span(p, b, size, size)
            assert got == want, f"case {case}: 2-way split {b}"
        for _ in range(10):
            b1, b2 = sorted(rng.sample(range(1, size), 2))
            got = (_read_tar_span(p, 0, b1, size)
                   + _read_tar_span(p, b1, b2, size)
                   + _read_tar_span(p, b2, size, size))
            assert got == want, f"case {case}: 3-way split {b1},{b2}"


def test_tar_oversized_extension_payload_refuses(tmp_path):
    """An extension payload larger than the resync back-walk's bound
    (63 blocks) could let a LATER split boundary double- or zero-count
    its member — the split reader refuses deterministically instead
    (the tarfile-backed whole-file reader handles such archives)."""
    import io
    import tarfile

    import pytest

    from dataingestion_spark.sinks.webdataset import (
        _read_tar_span, read_webdataset,
    )

    p = str(tmp_path / "big_ext.tar")
    with tarfile.open(p, "w", format=tarfile.PAX_FORMAT) as tf:
        info = tarfile.TarInfo("a.txt")
        data = b"hello"
        info.size = len(data)
        # a single pax record well past 63 blocks (32256 bytes)
        info.pax_headers = {"comment": "x" * 40_000}
        tf.addfile(info, io.BytesIO(data))
    import os
    size = os.path.getsize(p)
    with pytest.raises(ValueError, match="exceeds the split reader"):
        _read_tar_span(p, 0, size, size)
    # the whole-file reader still reads it fine
    with tarfile.open(p) as tf:
        assert tf.getmembers()[0].name == "a.txt"


def test_tar_malformed_pax_record_names_path_and_offset(tmp_path):
    """A malformed pax payload (no "len key=val\\n" shape) must surface
    the reader's own '<path> @ byte N: malformed pax record' error, not
    a bare ValueError from bytes.index/int (r13 advice)."""
    import pytest

    from dataingestion_spark.sinks.webdataset import (
        _parse_pax, _read_tar_span, build_tar_bytes,
    )

    # unit surface: context-free payloads get the caller's `where`
    with pytest.raises(ValueError, match="shard.tar @ byte 0.*malformed"):
        _parse_pax(b"nonsense-without-space-or-digits",
                   where="shard.tar @ byte 0")
    with pytest.raises(ValueError, match="malformed pax record"):
        _parse_pax(b"xx path=foo\n")       # non-numeric length
    with pytest.raises(ValueError, match="malformed pax record"):
        _parse_pax(b"7 k=v")               # bad length/newline

    # integration: hand-build a tar whose x header carries garbage —
    # USTAR member, then rewrite its typeflag to 'x' so the split
    # reader takes the pax branch on a payload that isn't pax
    blob = bytearray(build_tar_bytes([("0000.txt", b"not a pax rec")]))
    hdr = blob[0:512]
    hdr[156] = ord("x")
    # re-checksum after the typeflag edit
    hdr[148:156] = b" " * 8
    chks = sum(hdr[:512])
    hdr[148:156] = ("%06o" % chks).encode() + b"\x00 "
    blob[0:512] = hdr
    p = str(tmp_path / "badpax.tar")
    open(p, "wb").write(bytes(blob))
    with pytest.raises(ValueError, match=r"badpax\.tar @ byte 0.*malformed"):
        _read_tar_span(p, 0, len(blob), len(blob))
