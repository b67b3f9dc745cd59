"""Native legacy ``.xls`` (Excel 97–2003, BIFF8) → ``elements`` reader.

``.xls`` is in the reference's ingestion scope
(``IngestionDocumentReader.cs`` MIME map, ``application/vnd.ms-excel``).
Reuses the [MS-CFB] OLE2 layer from :mod:`.doc_legacy`; the ``Workbook``
stream is a [MS-XLS] BIFF8 record sequence:

* globals substream: ``SST`` (shared strings — compressed-latin1 or
  UTF-16 per string, CONTINUE-record aware, rich-text/phonetic extras
  skipped) and ``BOUNDSHEET`` records naming each sheet and the offset
  of its ``BOF``;
* per-sheet substream: ``LABELSST`` (shared-string cells), ``NUMBER``
  (IEEE doubles), ``RK``/``MULRK`` (packed numbers), ``BOOLERR``,
  ``LABEL`` (inline strings), ``FORMULA`` cached string results via a
  following ``STRING`` record;
* each sheet → section + header (sheet name) + one table element with
  the first row as the header row — the same shape as the XLSX reader,
  so downstream operators see no difference between the two vintages.

Numbers render like the XLSX reader's lexical forms: integers without a
trailing ``.0``, other doubles via ``repr``.

Spark entry point :func:`read_xls` = distributed ``binaryFile`` scan +
``mapInPandas``.
"""

from __future__ import annotations

import struct
from typing import Dict, List, Tuple

from ..model import ELEM_HEADER, ELEM_SECTION, ELEM_TABLE, element_row
from .doc_legacy import CompoundFile
from .docx import _table_markdown

_SST = 0x00FC
_CONTINUE = 0x003C
_BOUNDSHEET = 0x0085
_BOF = 0x0809
_EOF = 0x000A
_LABELSST = 0x00FD
_NUMBER = 0x0203
_RK = 0x027E
_MULRK = 0x00BD
_BOOLERR = 0x0205
_LABEL = 0x0204
_FORMULA = 0x0006
_STRING = 0x0207


def _records(data: bytes, start: int = 0):
    i = start
    n = len(data)
    while i + 4 <= n:
        opcode, sz = struct.unpack_from("<HH", data, i)
        yield opcode, i + 4, sz
        i += 4 + sz
        if opcode == _EOF and start != 0:
            return


def _num_text(v: float) -> str:
    import math

    if not math.isfinite(v):
        return ""  # NaN/inf cached results render as empty, never crash
    if v == int(v) and abs(v) < 1e15:
        return str(int(v))
    return repr(v)


def _rk_value(rk: int) -> float:
    cents = rk & 0x02
    if rk & 0x01:  # int30 payload — arithmetic shift handles the sign
        val = float(struct.unpack("<i", struct.pack("<I", rk & 0xFFFFFFFF))[0] >> 2)
    else:  # top 30 bits of an IEEE double
        val = struct.unpack("<d", b"\x00\x00\x00\x00" +
                            struct.pack("<I", rk & 0xFFFFFFFC))[0]
    return val / 100.0 if cents else val


def _read_unicode_string(buf: bytes, i: int, cch: int,
                         continues: List[Tuple[int, int]]) -> Tuple[str, int]:
    """XLUnicodeRichExtendedString at buf[i]; returns (text, next_i).
    ``continues`` is unused here — SST continuation is handled by the
    caller flattening the record payloads first."""
    flags = buf[i]
    i += 1
    rich = flags & 0x08
    ext = flags & 0x04
    c_run = 0
    cb_ext = 0
    if rich:
        (c_run,) = struct.unpack_from("<H", buf, i)
        i += 2
    if ext:
        (cb_ext,) = struct.unpack_from("<i", buf, i)
        i += 4
    chars = []
    remaining = cch
    wide = flags & 0x01
    while remaining:
        if wide:
            take = remaining
            chars.append(buf[i:i + 2 * take].decode("utf-16-le", "replace"))
            i += 2 * take
        else:
            take = remaining
            chars.append(buf[i:i + take].decode("latin-1"))
            i += take
        remaining -= take
        if remaining and i >= len(buf):
            break
    i += 4 * c_run + cb_ext
    return "".join(chars), i


def _parse_sst(payload: bytes) -> List[str]:
    """SST payload (already CONTINUE-flattened with grbit re-handling
    NOT needed for the flattening approach used here: we concatenate
    payloads and rely on strings not straddling — adequate for the
    modest SSTs this reader targets; straddled wide strings degrade to
    replacement chars, never a crash)."""
    out: List[str] = []
    if len(payload) < 8:
        return out
    (_total, unique) = struct.unpack_from("<ii", payload, 0)
    i = 8
    for _ in range(unique):
        if i + 3 > len(payload):
            break
        (cch,) = struct.unpack_from("<H", payload, i)
        i += 2
        try:
            s, i = _read_unicode_string(payload, i, cch, [])
        except (struct.error, IndexError):
            break
        out.append(s)
    return out


def parse_xls(data: bytes, doc_id: str) -> List[dict]:
    """Parse one legacy .xls blob: sheets → sections + table elements
    (XLSX-reader shape)."""
    if not data:
        raise ValueError("content must be non-empty")
    try:
        cf = CompoundFile(data)
        try:
            wb = cf.stream("Workbook")
        except KeyError:
            wb = cf.stream("Book")
    except (ValueError, KeyError, struct.error) as exc:
        raise ValueError(f"{doc_id}: not an Excel binary file ({exc})")

    # globals pass: SST (+ CONTINUE) and sheet directory
    sst: List[str] = []
    sheets: List[Tuple[str, int]] = []
    pending_sst = None
    for opcode, off, sz in _records(wb):
        if opcode == _BOF and off > 4:  # first sheet BOF ends the globals
            break
        if opcode == _SST:
            pending_sst = bytearray(wb[off:off + sz])
        elif opcode == _CONTINUE and pending_sst is not None:
            # drop the continuation's leading grbit byte (string-option
            # flags restated per CONTINUE)
            pending_sst += wb[off + 1:off + sz]
        elif opcode == _BOUNDSHEET:
            (bof_off,) = struct.unpack_from("<I", wb, off)
            cch = wb[off + 6]
            flags = wb[off + 7]
            raw = wb[off + 8:off + 8 + (2 * cch if flags & 1 else cch)]
            name = raw.decode("utf-16-le" if flags & 1 else "latin-1", "replace")
            sheets.append((name, bof_off))
        elif pending_sst is not None and opcode not in (_CONTINUE,):
            sst = _parse_sst(bytes(pending_sst))
            pending_sst = None
    if pending_sst is not None:
        sst = _parse_sst(bytes(pending_sst))

    rows: List[dict] = []
    seq = [0]

    def emit(path, **kw):
        rows.append(element_row(doc_id, seq[0], path, **kw))
        seq[0] += 1
        return rows[-1]

    root_row = emit([0], elem_type=ELEM_SECTION, markdown="\x00")
    body_md: List[str] = []
    for si, (name, bof_off) in enumerate(sheets):
        grid: Dict[int, Dict[int, str]] = {}
        last_formula_cell = None
        for opcode, off, sz in _records(wb, bof_off):
            if opcode == _EOF:
                break
            if opcode == _LABELSST and sz >= 10:
                r, c, _xf, idx = struct.unpack_from("<HHHI", wb, off)
                if idx < len(sst):
                    grid.setdefault(r, {})[c] = sst[idx]
            elif opcode == _NUMBER and sz >= 14:
                r, c, _xf = struct.unpack_from("<HHH", wb, off)
                (v,) = struct.unpack_from("<d", wb, off + 6)
                grid.setdefault(r, {})[c] = _num_text(v)
            elif opcode == _RK and sz >= 10:
                r, c, _xf, rk = struct.unpack_from("<HHHI", wb, off)
                grid.setdefault(r, {})[c] = _num_text(_rk_value(rk))
            elif opcode == _MULRK and sz >= 12:
                r, c0 = struct.unpack_from("<HH", wb, off)
                n_cells = (sz - 6) // 6
                for k in range(n_cells):
                    (rk,) = struct.unpack_from("<I", wb, off + 4 + 6 * k + 2)
                    grid.setdefault(r, {})[c0 + k] = _num_text(_rk_value(rk))
            elif opcode == _BOOLERR and sz >= 8:
                r, c, _xf, val, is_err = struct.unpack_from("<HHHBB", wb, off)
                if not is_err:
                    grid.setdefault(r, {})[c] = "TRUE" if val else "FALSE"
            elif opcode == _LABEL and sz >= 9:
                r, c, _xf, cch = struct.unpack_from("<HHHH", wb, off)
                try:
                    s, _ = _read_unicode_string(wb[off:off + sz], 8, cch, [])
                    grid.setdefault(r, {})[c] = s
                except (struct.error, IndexError):
                    pass
            elif opcode == _FORMULA and sz >= 14:
                r, c = struct.unpack_from("<HH", wb, off)
                result = wb[off + 6:off + 14]
                if result[6:8] == b"\xff\xff":
                    # non-numeric cached result, typed by byte 0:
                    # 0 = string (a STRING record follows), 1 = boolean,
                    # 2 = error, 3 = blank — decoding these as a double
                    # yields NaN and used to abort the whole document
                    t = result[0]
                    if t == 0:
                        last_formula_cell = (r, c)
                    elif t == 1:
                        grid.setdefault(r, {})[c] = (
                            "TRUE" if result[2] else "FALSE")
                    # error/blank cells render as empty (omitted)
                else:
                    (v,) = struct.unpack_from("<d", result, 0)
                    txt = _num_text(v)
                    if txt:
                        grid.setdefault(r, {})[c] = txt
            elif opcode == _STRING and last_formula_cell is not None:
                (cch,) = struct.unpack_from("<H", wb, off)
                try:
                    s, _ = _read_unicode_string(wb[off:off + sz], 2, cch, [])
                    r, c = last_formula_cell
                    grid.setdefault(r, {})[c] = s
                except (struct.error, IndexError):
                    pass
                last_formula_cell = None

        emit([0, si], elem_type=ELEM_SECTION, markdown=f"## {name}",
             metadata={"sheet": name})
        emit([0, si, 0], elem_type=ELEM_HEADER, markdown=f"## {name}",
             text=name, header_level=2)
        body_md.append(f"## {name}")
        if grid:
            max_r = max(grid)
            max_c = max(max(cols) for cols in grid.values())
            cells = [
                [grid.get(r, {}).get(c, "") for c in range(max_c + 1)]
                for r in range(max_r + 1)
            ]
            cells = [r for r in cells if any(c != "" for c in r)]
            if cells:
                md = _table_markdown(cells)
                emit([0, si, 1], elem_type=ELEM_TABLE, markdown=md,
                     table_cells=cells, metadata={"sheet": name})
                body_md.append(md)
    if not sheets:
        raise ValueError(f"{doc_id}: workbook has no sheets")
    root_row["markdown"] = "\n\n".join(body_md) or "(empty workbook)"
    return rows


def parse_xls_df(df, id_col: str = "doc_id", content_col: str = "content",
                 on_error: str = "fail"):
    """mapInPandas wrapper (shared plumbing: elements_map_df)."""
    from .markdown import elements_map_df

    return elements_map_df(
        df, lambda raw, doc_id: parse_xls(bytes(raw), doc_id),
        id_col, content_col, on_error)


def read_xls(spark, path, glob: str = "*.xls", recursive: bool = False,
             on_error: str = "fail"):
    from .markdown import binary_file_scan

    files = binary_file_scan(spark, path, glob, recursive)
    return parse_xls_df(files, id_col="path", content_col="content",
                        on_error=on_error)


# -- fixture writer ----------------------------------------------------------

def build_xls(sheets: Dict[str, List[List]]) -> bytes:
    """Minimal BIFF8 workbook for fixtures: strings go to the SST,
    numbers as NUMBER records, booleans as BOOLERR."""
    from .doc_legacy import _build_ole

    strings: List[str] = []
    str_idx: Dict[str, int] = {}

    def sst_index(s: str) -> int:
        if s not in str_idx:
            str_idx[s] = len(strings)
            strings.append(s)
        return str_idx[s]

    def rec(opcode: int, payload: bytes) -> bytes:
        return struct.pack("<HH", opcode, len(payload)) + payload

    sheet_bodies = []
    for rows in sheets.values():
        body = [rec(_BOF, struct.pack("<HHHHIi", 0x0600, 0x0010, 0, 0, 0, 0))]
        for r, row in enumerate(rows):
            for c, v in enumerate(row):
                if v is None or v == "":
                    continue
                if isinstance(v, bool):
                    body.append(rec(_BOOLERR, struct.pack(
                        "<HHHBB", r, c, 0, 1 if v else 0, 0)))
                elif isinstance(v, (int, float)):
                    body.append(rec(_NUMBER, struct.pack(
                        "<HHHd", r, c, 0, float(v))))
                else:
                    body.append(rec(_LABELSST, struct.pack(
                        "<HHHI", r, c, 0, sst_index(str(v)))))
        body.append(rec(_EOF, b""))
        sheet_bodies.append(b"".join(body))

    # globals: BOF + SST + BOUNDSHEETs + EOF; sheet offsets need the
    # globals length, which needs the BOUNDSHEET count — sizes are fixed
    names = list(sheets)
    sst_payload = struct.pack("<ii", len(strings), len(strings))
    for s in strings:
        enc = s.encode("latin-1", "replace")
        sst_payload += struct.pack("<HB", len(s), 0) + enc

    def boundsheet(off: int, name: str) -> bytes:
        # lbPlyPos u32, state/type u16, cch u8, string-flags u8, name
        enc = name.encode("latin-1", "replace")
        return struct.pack("<IHB", off, 0, len(enc)) + b"\x00" + enc

    bs_len = sum(4 + len(boundsheet(0, n)) for n in names)
    globals_len = (4 + 16) + (4 + len(sst_payload)) + bs_len + (4 + 0)
    offsets = []
    pos = globals_len
    for b in sheet_bodies:
        offsets.append(pos)
        pos += len(b)
    out = [rec(_BOF, struct.pack("<HHHHIi", 0x0600, 0x0005, 0, 0, 0, 0)),
           rec(_SST, sst_payload)]
    for off, name in zip(offsets, names):
        out.append(rec(_BOUNDSHEET, boundsheet(off, name)))
    out.append(rec(_EOF, b""))
    wb = b"".join(out) + b"".join(sheet_bodies)
    return _build_ole({"Workbook": wb})
