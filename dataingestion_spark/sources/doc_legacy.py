"""Native legacy ``.doc`` (Word 97–2003 binary) → ``elements`` reader.

``.doc`` is in the reference's ingestion scope
(``IngestionDocumentReader.cs:88``, ``application/msword``). The format
is two layers, both implemented here from the public specs ([MS-CFB]
and [MS-DOC]):

* **OLE2 compound file** (:class:`CompoundFile`): 512-byte header with
  the ``D0 CF 11 E0`` magic, sector FAT chained through the DIFAT,
  UTF-16 directory entries, and a mini-FAT (inside the root entry's
  mini stream) for streams under 4096 bytes;
* **Word binary**: the ``WordDocument`` stream's FIB (magic ``0xA5EC``)
  locates the Clx in the ``1Table``/``0Table`` stream (which one is
  told by FIB flag ``fWhichTblStm``); the Clx's PlcPcd maps character
  positions to text PIECES, each either 8-bit cp1252 (``fc`` bit 30
  set, offset ``fc/2``) or UTF-16LE. Pieces concatenate into the text
  stream; paragraphs split on CR (0x0D), cell/row marks (0x07) split
  table-ish lines into tab-joined paragraphs, field instructions
  (0x13…0x14 hidden part) and object placeholders are stripped.

Style/heading information lives in PAPX/stylesheet structures this
reader deliberately does not chase — the output is PARAGRAPH-level
(documented partial parity: text content complete, no header levels or
table matrices). Convert to .docx for full structure.

Spark entry point :func:`read_doc` = distributed ``binaryFile`` scan +
``mapInPandas``, like every reader in this package.
"""

from __future__ import annotations

import io
import struct
from typing import Dict, List

from ..model import ELEM_PARAGRAPH, ELEM_SECTION, element_row

_OLE_MAGIC = b"\xd0\xcf\x11\xe0\xa1\xb1\x1a\xe1"
_FREESECT = 0xFFFFFFFF
_ENDOFCHAIN = 0xFFFFFFFE


class CompoundFile:
    """Minimal [MS-CFB] reader: named streams out of an OLE2 container."""

    def __init__(self, data: bytes):
        if len(data) < 512 or not data.startswith(_OLE_MAGIC):
            raise ValueError("not an OLE2 compound file")
        (self.sector_shift,) = struct.unpack_from("<H", data, 30)
        (self.mini_shift,) = struct.unpack_from("<H", data, 32)
        self.ssz = 1 << self.sector_shift
        self.mssz = 1 << self.mini_shift
        (n_fat,) = struct.unpack_from("<I", data, 44)
        (dir_start,) = struct.unpack_from("<I", data, 48)
        (self.mini_cutoff,) = struct.unpack_from("<I", data, 56)
        (minifat_start,) = struct.unpack_from("<I", data, 60)
        (n_minifat,) = struct.unpack_from("<I", data, 64)
        (difat_start,) = struct.unpack_from("<I", data, 68)
        (n_difat,) = struct.unpack_from("<I", data, 72)
        self.data = data

        # DIFAT: 109 entries in the header, then chained DIFAT sectors
        difat = list(struct.unpack_from("<109I", data, 76))
        sec = difat_start
        for _ in range(n_difat):
            if sec in (_FREESECT, _ENDOFCHAIN):
                break
            raw = self._sector(sec)
            entries = struct.unpack(f"<{self.ssz // 4}I", raw)
            difat.extend(entries[:-1])
            sec = entries[-1]
        # FAT sectors
        fat_bytes = b"".join(
            self._sector(s) for s in difat[:n_fat] if s != _FREESECT)
        self.fat = struct.unpack(f"<{len(fat_bytes) // 4}I", fat_bytes)

        # directory
        dir_bytes = self._read_chain(dir_start)
        self.entries: Dict[str, tuple] = {}
        root = None
        for off in range(0, len(dir_bytes) - 127, 128):
            (name_len,) = struct.unpack_from("<H", dir_bytes, off + 64)
            if name_len < 2:
                continue
            name = dir_bytes[off:off + name_len - 2].decode("utf-16-le")
            obj_type = dir_bytes[off + 66]
            (start,) = struct.unpack_from("<I", dir_bytes, off + 116)
            (size,) = struct.unpack_from("<Q", dir_bytes, off + 120)
            if obj_type == 5:  # root storage → the mini stream
                root = (start, size)
            elif obj_type == 2:
                self.entries[name] = (start, size)
        # mini FAT + mini stream
        self.minifat: tuple = ()
        self.mini_stream = b""
        if n_minifat and root is not None:
            mf = self._read_chain(minifat_start)
            self.minifat = struct.unpack(f"<{len(mf) // 4}I", mf)
            self.mini_stream = self._read_chain(root[0])[:root[1]]

    def _sector(self, n: int) -> bytes:
        off = 512 + n * self.ssz
        return self.data[off:off + self.ssz]

    def _read_chain(self, start: int) -> bytes:
        out, sec, hops = [], start, 0
        while sec not in (_ENDOFCHAIN, _FREESECT) and hops < len(self.fat) + 2:
            out.append(self._sector(sec))
            if sec >= len(self.fat):
                break
            sec = self.fat[sec]
            hops += 1
        return b"".join(out)

    def _read_mini_chain(self, start: int, size: int) -> bytes:
        out, sec, hops = [], start, 0
        while sec not in (_ENDOFCHAIN, _FREESECT) and hops < len(self.minifat) + 2:
            off = sec * self.mssz
            out.append(self.mini_stream[off:off + self.mssz])
            if sec >= len(self.minifat):
                break
            sec = self.minifat[sec]
            hops += 1
        return b"".join(out)[:size]

    def stream(self, name: str) -> bytes:
        if name not in self.entries:
            raise KeyError(name)
        start, size = self.entries[name]
        if size < self.mini_cutoff:
            return self._read_mini_chain(start, size)
        return self._read_chain(start)[:size]


def _extract_text(word: bytes, table: bytes) -> str:
    """FIB → Clx → piece table → decoded character stream ([MS-DOC]
    §2.4.1 retrieving text)."""
    if len(word) < 0x200 or struct.unpack_from("<H", word, 0)[0] != 0xA5EC:
        raise ValueError("not a WordDocument stream (bad FIB magic)")
    (fc_clx,) = struct.unpack_from("<I", word, 0x01A2)
    (lcb_clx,) = struct.unpack_from("<I", word, 0x01A6)
    if lcb_clx == 0 or fc_clx + lcb_clx > len(table):
        raise ValueError("missing or out-of-range Clx")
    clx = table[fc_clx:fc_clx + lcb_clx]
    # skip Prc (0x01 marker + i16 size) entries until the Pcdt (0x02)
    i = 0
    while i < len(clx) and clx[i] == 0x01:
        (sz,) = struct.unpack_from("<h", clx, i + 1)
        i += 3 + sz
    if i >= len(clx) or clx[i] != 0x02:
        raise ValueError("no Pcdt in Clx")
    (lcb,) = struct.unpack_from("<I", clx, i + 1)
    plc = clx[i + 5:i + 5 + lcb]
    n = (lcb - 4) // 12  # n+1 CPs (4B) + n PCDs (8B)
    cps = struct.unpack_from(f"<{n + 1}I", plc, 0)
    out = []
    for k in range(n):
        pcd_off = (n + 1) * 4 + k * 8
        (fc_raw,) = struct.unpack_from("<I", plc, pcd_off + 2)
        n_chars = cps[k + 1] - cps[k]
        if fc_raw & 0x40000000:  # compressed: 8-bit cp1252 at fc/2
            fc = (fc_raw & 0x3FFFFFFF) // 2
            out.append(word[fc:fc + n_chars].decode("cp1252", "replace"))
        else:
            fc = fc_raw & 0x3FFFFFFF
            out.append(word[fc:fc + 2 * n_chars].decode("utf-16-le", "replace"))
    return "".join(out)


def _clean_paragraphs(text: str) -> List[str]:
    """Character stream → paragraph texts: strip field-instruction
    spans (0x13..0x14), control placeholders, map cell/row marks to
    tabs, split on CR / 0x0B, drop empties."""
    out_chars = []
    in_field_instr = 0
    for ch in text:
        o = ord(ch)
        if o == 0x13:
            in_field_instr += 1
            continue
        if o == 0x14:
            in_field_instr = max(0, in_field_instr - 1)
            continue
        if o == 0x15:
            continue
        if in_field_instr:
            continue
        if o == 0x07:
            out_chars.append("\t")
        elif o in (0x0B, 0x0C):
            out_chars.append("\r")
        elif o == 0x1E:
            out_chars.append("-")
        elif o == 0x1F or o == 0x00 or o == 0x01 or o == 0x08:
            continue
        else:
            out_chars.append(ch)
    paras = []
    for raw in "".join(out_chars).split("\r"):
        p = " ".join(raw.replace("\t", " ").split())
        if p:
            paras.append(p)
    return paras


def parse_doc(data: bytes, doc_id: str) -> List[dict]:
    """Parse one legacy .doc blob into elements rows (paragraph-level;
    see module docstring for the documented partial-parity scope)."""
    if not data:
        raise ValueError("content must be non-empty")
    try:
        cf = CompoundFile(data)
        word = cf.stream("WordDocument")
    except (ValueError, KeyError, struct.error) as exc:
        raise ValueError(f"{doc_id}: not a Word binary file ({exc})")
    try:
        (flags,) = struct.unpack_from("<H", word, 0x000A)
        table_name = "1Table" if flags & 0x0200 else "0Table"
        table = cf.stream(table_name)
        text = _extract_text(word, table)
    except (KeyError, ValueError, struct.error) as exc:
        raise ValueError(f"{doc_id}: malformed Word binary ({exc})")
    paras = _clean_paragraphs(text)
    if not paras:
        raise ValueError(f"{doc_id}: no extractable text")

    rows: List[dict] = []
    for i, p in enumerate(paras):
        if not rows:
            rows.append(element_row(doc_id, 0, [0], elem_type=ELEM_SECTION,
                                    markdown="\n\n".join(paras)))
        rows.append(element_row(doc_id, i + 1, [0, i],
                                elem_type=ELEM_PARAGRAPH, markdown=p, text=p))
    return rows


def parse_doc_df(df, id_col: str = "doc_id", content_col: str = "content",
                 on_error: str = "fail"):
    """mapInPandas wrapper (shared plumbing: elements_map_df)."""
    from .markdown import elements_map_df

    return elements_map_df(
        df, lambda raw, doc_id: parse_doc(bytes(raw), doc_id),
        id_col, content_col, on_error)


def read_doc(spark, path, glob: str = "*.doc", recursive: bool = False,
             on_error: str = "fail"):
    from .markdown import binary_file_scan

    files = binary_file_scan(spark, path, glob, recursive)
    return parse_doc_df(files, id_col="path", content_col="content",
                        on_error=on_error)


# -- fixture writer ----------------------------------------------------------

def build_doc(paragraphs: List[str]) -> bytes:
    """Minimal valid Word 97 binary for fixtures: one uncompressed
    UTF-16 text piece, a 1Table stream holding the Clx, both streams in
    the regular (non-mini) sector chain of a fresh OLE2 container."""
    text = "\r".join(paragraphs) + "\r"
    raw_text = text.encode("utf-16-le")
    fc_text = 0x0800  # text placed after the FIB area
    word = bytearray(fc_text) + raw_text
    struct.pack_into("<H", word, 0, 0xA5EC)      # wIdent
    struct.pack_into("<H", word, 2, 0x00C1)      # nFib (Word 97)
    struct.pack_into("<H", word, 0x000A, 0x0200)  # fWhichTblStm → 1Table
    n_chars = len(text)
    # Clx: Pcdt marker + lcb + PlcPcd(cp0, cpN, one PCD)
    pcd = struct.pack("<HIH", 0, fc_text, 0)     # fc bit30 clear → utf-16
    plc = struct.pack("<II", 0, n_chars) + pcd
    clx = b"\x02" + struct.pack("<I", len(plc)) + plc
    table = bytearray(b"\x00" * 0x20) + clx
    struct.pack_into("<I", word, 0x01A2, 0x20)       # fcClx
    struct.pack_into("<I", word, 0x01A6, len(clx))   # lcbClx
    return _build_ole({"WordDocument": bytes(word), "1Table": bytes(table)})


def _build_ole(streams: Dict[str, bytes]) -> bytes:
    """Tiny OLE2 writer: every stream padded to ≥4096 bytes so it lives
    in the regular FAT chain (no mini stream needed)."""
    ssz = 512
    sectors: List[bytes] = []
    chains: Dict[str, tuple] = {}

    def add_stream(data: bytes) -> tuple:
        data = data + b"\x00" * ((-len(data)) % ssz)
        start = len(sectors)
        for i in range(0, len(data), ssz):
            sectors.append(data[i:i + ssz])
        return start, len(data) // ssz

    padded = {name: (data + b"\x00" * max(0, 4096 - len(data)))
              for name, data in streams.items()}
    sizes = {name: len(data) for name, data in padded.items()}
    for name, data in padded.items():
        chains[name] = add_stream(data)

    # directory: root + streams
    dir_entries = bytearray()

    def dir_entry(name, obj_type, start, size, child=0xFFFFFFFF,
                  left=0xFFFFFFFF, right=0xFFFFFFFF):
        e = bytearray(128)
        enc = name.encode("utf-16-le")
        e[0:len(enc)] = enc
        struct.pack_into("<H", e, 64, len(enc) + 2)
        e[66] = obj_type
        e[67] = 1  # black
        struct.pack_into("<I", e, 68, left)
        struct.pack_into("<I", e, 72, right)
        struct.pack_into("<I", e, 76, child)
        struct.pack_into("<I", e, 116, start)
        struct.pack_into("<Q", e, 120, size)
        return e

    names = list(padded)
    # simple red-black-free tree: root's child = entry 1; entry 1's
    # right sibling = entry 2, etc. (readers here only scan linearly)
    dir_entries += dir_entry("Root Entry", 5, _ENDOFCHAIN, 0, child=1)
    for i, name in enumerate(names):
        start, _ = chains[name]
        right = i + 2 if i + 1 < len(names) else 0xFFFFFFFF
        dir_entries += dir_entry(name, 2, start, sizes[name], right=right)
    dir_start, _ = add_stream(bytes(dir_entries))

    # FAT: one chain per stream + the directory chain + the FAT sector
    n_data = len(sectors)
    fat = [_FREESECT] * (n_data + 8)
    for name in names:
        start, count = chains[name]
        for k in range(count - 1):
            fat[start + k] = start + k + 1
        fat[start + count - 1] = _ENDOFCHAIN
    # CEIL, not floor: a 5th directory entry starts a second sector, and
    # flooring left that sector out of the FAT chain — readers then lost
    # every entry past the 4th (surfaced by the 4-stream .msg fixtures)
    dcount = (len(dir_entries) + ssz - 1) // ssz or 1
    for k in range(dcount - 1):
        fat[dir_start + k] = dir_start + k + 1
    fat[dir_start + dcount - 1] = _ENDOFCHAIN
    fat_sector_index = len(sectors)
    fat[fat_sector_index] = 0xFFFFFFFD  # FATSECT
    entries = (fat + [_FREESECT] * (ssz // 4))[:ssz // 4]
    sectors.append(struct.pack(f"<{ssz // 4}I", *entries))

    header = bytearray(512)
    header[0:8] = _OLE_MAGIC
    struct.pack_into("<H", header, 24, 0x003E)   # minor version
    struct.pack_into("<H", header, 26, 0x0003)   # major version 3
    struct.pack_into("<H", header, 28, 0xFFFE)   # little-endian
    struct.pack_into("<H", header, 30, 9)        # sector shift 512
    struct.pack_into("<H", header, 32, 6)        # mini shift 64
    struct.pack_into("<I", header, 44, 1)        # one FAT sector
    struct.pack_into("<I", header, 48, dir_start)
    struct.pack_into("<I", header, 56, 4096)     # mini cutoff
    struct.pack_into("<I", header, 60, _ENDOFCHAIN)  # no mini FAT
    struct.pack_into("<I", header, 64, 0)
    struct.pack_into("<I", header, 68, _ENDOFCHAIN)  # no DIFAT chain
    struct.pack_into("<I", header, 72, 0)
    difat = [fat_sector_index] + [_FREESECT] * 108
    struct.pack_into("<109I", header, 76, *difat)
    return bytes(header) + b"".join(sectors)
