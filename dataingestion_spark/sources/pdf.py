"""Native PDF → ``elements`` DataFrame reader (stdlib only).

The reference reads PDFs through the ``markitdown`` CLI (pdfminer under
the hood, ``MarkItDownReader.cs:13-130``) or cloud OCR services; neither
is available in this environment, so this module implements a compact
digitally-born-PDF text extractor from the PDF 1.7 spec (ISO 32000-1):

* object parser for the full COS syntax (dicts, arrays, literal/hex
  strings, names, refs, streams) — objects are discovered by scanning
  for ``N G obj`` so both classic-xref and xref-stream files work, and
  compressed object streams (``/Type/ObjStm``) are expanded;
* ``FlateDecode`` via ``zlib`` with PNG predictor support;
* page-tree walk (``/Root → /Pages → /Kids``) with inherited resources;
* content-stream interpretation of the text operators (BT/ET, Tf, Td,
  TD, Tm, T*, TL, Tj, TJ, ', ") collecting positioned spans;
* character decoding through each font's ``/ToUnicode`` CMap
  (``bfchar``/``bfrange``, 1- and 2-byte codes — what Word/LibreOffice
  emit for their subset-embedded fonts), latin-1 fallback for simple
  fonts without one;
* layout reconstruction: spans → lines (y-clustering) → blocks (leading
  gaps); the dominant body font size classifies larger lines as headers
  (level = rank of the size), lines in the bottom page margin become
  footers; each page is a section carrying ``page_number`` — the same
  page-section shape the LlamaParse reader produces
  (``LlamaParseReader.cs:128-215``);
* optional image extraction (``extract_images=True``): DCTDecode
  XObjects pass through as JPEG bytes; 8-bit Flate gray/RGB rasters are
  wrapped into a PNG (stdlib zlib+struct) — the conformance image
  contract (``DocumentReaderConformanceTests.cs:144-155``).

Grid tables ARE reconstructed geometrically (:func:`detect_grid_tables`):
a run of ≥2 consecutive lines whose non-blank segment x-anchors are
identical — the shape word processors emit for real tables, since each
cell gets its own text matrix — becomes a table element with first row
as header. Verified against the reference's real ``Sample.pdf``: the
same 5×4 milestone matrix the DOCX conformance golden pins
(``DocumentReaderConformanceTests.cs:86-99``). Borderless column
LAYOUTS that coincidentally align could in principle false-positive;
the identical-anchor + ≥2-columns + ≥2-rows requirement keeps prose and
ragged layouts out.

Spark entry point :func:`read_pdf` = distributed ``binaryFile`` scan +
``mapInPandas`` parse, like every reader in this package.
"""

from __future__ import annotations

import io
import re
import struct
import zlib
from typing import Dict, Iterator, List, Optional, Tuple

from ..model import (
    ELEM_FOOTER,
    ELEM_HEADER,
    ELEM_IMAGE,
    ELEM_PARAGRAPH,
    ELEM_SECTION,
    ELEM_TABLE,
    ELEMENTS_SCHEMA,
    element_row,
)

_WS = b"\x00\t\n\x0c\r "
_DELIM = b"()<>[]{}/%"


class _Ref(tuple):
    """Indirect reference (num, gen)."""


class _Name(str):
    """PDF name object (distinct from strings)."""


def _skip_ws(data: bytes, i: int) -> int:
    n = len(data)
    while i < n:
        c = data[i:i + 1]
        if c in (b"%",):  # comment to EOL
            while i < n and data[i] not in (10, 13):
                i += 1
        elif c in _WS:
            i += 1
        else:
            break
    return i


_NUM_RE = re.compile(rb"[+-]?(?:\d+\.?\d*|\.\d+)")
_REF_RE = re.compile(rb"(\d+)\s+(\d+)\s+R\b")
_NAME_RE = re.compile(rb"/([^\s()<>\[\]{}/%]*)")


def _parse_obj(data: bytes, i: int):
    """Parse one COS object at ``i`` → (obj, next_index)."""
    i = _skip_ws(data, i)
    c = data[i:i + 1]
    if c == b"<":
        if data[i:i + 2] == b"<<":
            d = {}
            i += 2
            while True:
                i = _skip_ws(data, i)
                if data[i:i + 2] == b">>":
                    return d, i + 2
                key, i = _parse_obj(data, i)
                val, i = _parse_obj(data, i)
                d[str(key)] = val
        # hex string
        j = data.index(b">", i)
        hx = re.sub(rb"\s", b"", data[i + 1:j])
        if len(hx) % 2:
            hx += b"0"
        return bytes.fromhex(hx.decode("ascii", "ignore")), j + 1
    if c == b"(":
        out = bytearray()
        depth = 1
        i += 1
        while depth:
            ch = data[i]
            if ch == 0x5C:  # backslash
                nxt = data[i + 1:i + 2]
                esc = {b"n": b"\n", b"r": b"\r", b"t": b"\t", b"b": b"\b",
                       b"f": b"\f", b"(": b"(", b")": b")", b"\\": b"\\"}
                if nxt in esc:
                    out += esc[nxt]
                    i += 2
                elif nxt.isdigit():  # octal, up to 3 digits
                    j = i + 1
                    while j < i + 4 and data[j:j + 1].isdigit():
                        j += 1
                    out.append(int(data[i + 1:j], 8) & 0xFF)
                    i = j
                elif nxt in (b"\n", b"\r"):  # line continuation
                    i += 2
                    if nxt == b"\r" and data[i:i + 1] == b"\n":
                        i += 1
                else:
                    i += 1
            elif ch == 0x28:
                depth += 1
                out.append(ch)
                i += 1
            elif ch == 0x29:
                depth -= 1
                if depth:
                    out.append(ch)
                i += 1
            else:
                out.append(ch)
                i += 1
        return bytes(out), i
    if c == b"[":
        arr = []
        i += 1
        while True:
            i = _skip_ws(data, i)
            if data[i:i + 1] == b"]":
                return arr, i + 1
            item, i = _parse_obj(data, i)
            arr.append(item)
    if c == b"/":
        m = _NAME_RE.match(data, i)
        raw = m.group(1)
        # #xx hex escapes in names
        name = re.sub(rb"#([0-9A-Fa-f]{2})",
                      lambda g: bytes([int(g.group(1), 16)]), raw)
        return _Name(name.decode("latin-1")), m.end()
    m = _REF_RE.match(data, i)
    if m:
        return _Ref((int(m.group(1)), int(m.group(2)))), m.end()
    m = _NUM_RE.match(data, i)
    if m:
        s = m.group(0)
        return (float(s) if b"." in s else int(s)), m.end()
    for lit, val in ((b"true", True), (b"false", False), (b"null", None)):
        if data[i:i + len(lit)] == lit:
            return val, i + len(lit)
    raise ValueError(f"cannot parse PDF object at byte {i}: {data[i:i+20]!r}")


def _png_unpredict(raw: bytes, columns: int, colors: int = 1,
                   bpc: int = 8) -> bytes:
    """Reverse PNG row predictors (used by xref/object streams)."""
    bpp = max(1, (colors * bpc) // 8)
    row_len = columns * bpp
    out = bytearray()
    prev = bytearray(row_len)
    i = 0
    while i + 1 + row_len <= len(raw) + row_len and i < len(raw):
        ft = raw[i]
        row = bytearray(raw[i + 1:i + 1 + row_len])
        i += 1 + row_len
        if ft == 1:  # Sub
            for j in range(bpp, len(row)):
                row[j] = (row[j] + row[j - bpp]) & 0xFF
        elif ft == 2:  # Up
            for j in range(len(row)):
                row[j] = (row[j] + prev[j]) & 0xFF
        elif ft == 3:  # Average
            for j in range(len(row)):
                left = row[j - bpp] if j >= bpp else 0
                row[j] = (row[j] + ((left + prev[j]) >> 1)) & 0xFF
        elif ft == 4:  # Paeth
            for j in range(len(row)):
                a = row[j - bpp] if j >= bpp else 0
                b = prev[j]
                cc = prev[j - bpp] if j >= bpp else 0
                p = a + b - cc
                pa, pb, pc = abs(p - a), abs(p - b), abs(p - cc)
                pred = a if (pa <= pb and pa <= pc) else (b if pb <= pc else cc)
                row[j] = (row[j] + pred) & 0xFF
        out += row
        prev = row
    return bytes(out)


class PdfDocument:
    """Parsed object table + resolution helpers for one PDF file."""

    def __init__(self, data: bytes):
        self.data = data
        self.objects: Dict[int, object] = {}
        self.streams: Dict[int, bytes] = {}  # raw (undecoded) stream bytes
        self._scan_objects()
        self._expand_object_streams()

    # -- object discovery ------------------------------------------------
    def _scan_objects(self) -> None:
        for m in re.finditer(rb"(\d+)\s+(\d+)\s+obj\b", self.data):
            num = int(m.group(1))
            try:
                obj, i = _parse_obj(self.data, m.end())
            except Exception:
                continue
            i = _skip_ws(self.data, i)
            if self.data[i:i + 6] == b"stream":
                i += 6
                if self.data[i:i + 2] == b"\r\n":
                    i += 2
                elif self.data[i:i + 1] in (b"\n", b"\r"):
                    i += 1
                length = obj.get("Length") if isinstance(obj, dict) else None
                if isinstance(length, _Ref):
                    length = None  # resolved after the scan completes
                if isinstance(length, int) and \
                        self.data[i + length:i + length + 20].lstrip()[:9] == b"endstream":
                    raw = self.data[i:i + length]
                else:
                    end = self.data.find(b"endstream", i)
                    raw = self.data[i:end].rstrip(b"\r\n")
                self.streams[num] = raw
            self.objects[num] = obj

    def resolve(self, obj):
        while isinstance(obj, _Ref):
            obj = self.objects.get(obj[0])
        return obj

    def stream_bytes(self, num: int) -> bytes:
        """Decoded stream content of object ``num``."""
        raw = self.streams.get(num, b"")
        d = self.resolve(self.objects.get(num))
        if not isinstance(d, dict):
            return raw
        filters = self.resolve(d.get("Filter"))
        if filters is None:
            return raw
        if not isinstance(filters, list):
            filters = [filters]
        parms = self.resolve(d.get("DecodeParms"))
        if not isinstance(parms, list):
            parms = [parms]
        out = raw
        for k, f in enumerate(filters):
            f = self.resolve(f)
            if f == "FlateDecode":
                try:
                    out = zlib.decompress(out)
                except zlib.error:
                    try:
                        out = zlib.decompressobj().decompress(out)
                    except zlib.error:
                        return b""
                pm = self.resolve(parms[k]) if k < len(parms) else None
                if isinstance(pm, dict) and self.resolve(pm.get("Predictor", 1)) >= 10:
                    out = _png_unpredict(
                        out,
                        int(self.resolve(pm.get("Columns", 1))),
                        int(self.resolve(pm.get("Colors", 1))),
                        int(self.resolve(pm.get("BitsPerComponent", 8))),
                    )
            # DCTDecode/JPXDecode are terminal image encodings — returned raw
        return out

    def _expand_object_streams(self) -> None:
        for num, obj in list(self.objects.items()):
            if isinstance(obj, dict) and self.resolve(obj.get("Type")) == "ObjStm":
                content = self.stream_bytes(num)
                n = int(self.resolve(obj.get("N", 0)))
                first = int(self.resolve(obj.get("First", 0)))
                header = content[:first].split()
                for k in range(n):
                    onum = int(header[2 * k])
                    off = int(header[2 * k + 1])
                    if onum in self.objects and onum in self.streams:
                        continue  # a directly-stored object wins
                    try:
                        val, _ = _parse_obj(content, first + off)
                    except Exception:
                        continue
                    self.objects.setdefault(onum, val)

    # -- document structure ---------------------------------------------
    def catalog(self) -> Optional[dict]:
        for obj in self.objects.values():
            obj = obj if isinstance(obj, dict) else None
            if obj and self.resolve(obj.get("Type")) == "Catalog":
                return obj
        return None

    def pages(self) -> List[dict]:
        """Page dicts in document order with inherited Resources/MediaBox."""
        cat = self.catalog()
        if not cat:
            return []
        out: List[dict] = []

        def walk(node, inherited):
            node = self.resolve(node)
            if not isinstance(node, dict):
                return
            inh = dict(inherited)
            for key in ("Resources", "MediaBox", "Rotate"):
                if key in node:
                    inh[key] = node[key]
            if self.resolve(node.get("Type")) == "Page":
                page = dict(node)
                for key, val in inh.items():
                    page.setdefault(key, val)
                out.append(page)
            else:
                for kid in self.resolve(node.get("Kids")) or []:
                    walk(kid, inh)

        walk(cat.get("Pages"), {})
        return out

    def page_content(self, page: dict) -> bytes:
        contents = self.resolve(page.get("Contents"))
        refs = contents if isinstance(contents, list) else [page.get("Contents")]
        parts = []
        for ref in refs:
            if isinstance(ref, _Ref):
                parts.append(self.stream_bytes(ref[0]))
        return b"\n".join(parts)


# -- ToUnicode CMap ------------------------------------------------------

_BF_CHAR_RE = re.compile(rb"beginbfchar(.*?)endbfchar", re.S)
_BF_RANGE_RE = re.compile(rb"beginbfrange(.*?)endbfrange", re.S)
_HEX_TOKEN_RE = re.compile(rb"<([0-9A-Fa-f]+)>")
_CODESPACE_RE = re.compile(rb"begincodespacerange(.*?)endcodespacerange", re.S)


def _utf16be(hx: bytes) -> str:
    b = bytes.fromhex(hx.decode("ascii"))
    try:
        return b.decode("utf-16-be")
    except UnicodeDecodeError:
        return ""


def parse_tounicode(cmap: bytes) -> Tuple[Dict[int, str], int]:
    """(code→text map, code byte width) from a ToUnicode CMap stream."""
    mapping: Dict[int, str] = {}
    width = 1
    m = _CODESPACE_RE.search(cmap)
    if m:
        toks = _HEX_TOKEN_RE.findall(m.group(1))
        if toks:
            width = max(1, len(toks[0]) // 2)
    for m in _BF_CHAR_RE.finditer(cmap):
        toks = _HEX_TOKEN_RE.findall(m.group(1))
        for k in range(0, len(toks) - 1, 2):
            mapping[int(toks[k], 16)] = _utf16be(toks[k + 1])
            width = max(width, len(toks[k]) // 2)
    for m in _BF_RANGE_RE.finditer(cmap):
        body = m.group(1)
        i = 0
        while True:
            mm = _HEX_TOKEN_RE.search(body, i)
            if not mm:
                break
            lo = int(mm.group(1), 16)
            w = len(mm.group(1)) // 2
            mm2 = _HEX_TOKEN_RE.search(body, mm.end())
            if not mm2:
                break
            hi = int(mm2.group(1), 16)
            i = mm2.end()
            nxt = _skip_ws(body, i)
            if body[nxt:nxt + 1] == b"[":  # explicit per-code targets
                end = body.index(b"]", nxt)
                targets = _HEX_TOKEN_RE.findall(body[nxt:end])
                for off, t in enumerate(targets):
                    mapping[lo + off] = _utf16be(t)
                i = end + 1
            else:
                mm3 = _HEX_TOKEN_RE.search(body, i)
                if not mm3:
                    break
                base = mm3.group(1)
                base_str = _utf16be(base)
                for off in range(hi - lo + 1):
                    if base_str:
                        mapping[lo + off] = base_str[:-1] + \
                            chr(ord(base_str[-1]) + off)
                i = mm3.end()
            width = max(width, w)
    return mapping, width


class _Font:
    def __init__(self, doc: PdfDocument, fdict: dict):
        fdict = doc.resolve(fdict) or {}
        self.subtype = doc.resolve(fdict.get("Subtype"))
        self.cmap: Dict[int, str] = {}
        self.width = 2 if self.subtype == "Type0" else 1
        tu = fdict.get("ToUnicode")
        if isinstance(tu, _Ref):
            self.cmap, self.width = parse_tounicode(doc.stream_bytes(tu[0]))
        elif self.subtype == "Type0":
            self.width = 2

    def decode(self, raw: bytes) -> str:
        out = []
        w = self.width
        if self.cmap:
            for i in range(0, len(raw) - w + 1, w):
                code = int.from_bytes(raw[i:i + w], "big")
                out.append(self.cmap.get(code, ""))
            return "".join(out)
        if w == 1:  # simple font without ToUnicode: latin-1 approximation
            return raw.decode("latin-1", "ignore")
        return ""  # CID font without ToUnicode: undecodable


# -- content-stream text interpreter -------------------------------------

_OPERATOR_RE = re.compile(
    rb"BT|ET|Tf|Td|TD|Tm|T\*|TL|Tj|TJ|Tc|Tw|Tz|Ts|Tr|'|\"|Do|cm|q|Q|gs|re|[fWnSsBb]\*?|c[sv]?|sc n?|g|rg|k|w|[jJMd]|h|[lm]|v|y")


def _tokenize_content(data: bytes):
    """Yield ('op', name) / ('operand', value) in stream order."""
    i, n = 0, len(data)
    while i < n:
        i = _skip_ws(data, i)
        if i >= n:
            break
        c = data[i:i + 1]
        if c in b"</([" or c == b"/" or c in b"+-." or c.isdigit():
            try:
                val, i = _parse_obj(data, i)
                yield ("operand", val)
                continue
            except Exception:
                i += 1
                continue
        m = re.match(rb"[A-Za-z'\"*]+", data[i:])
        if m:
            yield ("op", m.group(0).decode("latin-1"))
            i += m.end()
            if m.group(0) == b"BI":  # inline image: skip to EI
                j = data.find(b"EI", i)
                i = len(data) if j < 0 else j + 2
        else:
            i += 1


def extract_spans(doc: PdfDocument, page: dict) -> List[dict]:
    """Positioned text spans of one page: (x, y, size, text)."""
    res = doc.resolve(page.get("Resources")) or {}
    fonts_raw = doc.resolve(res.get("Font")) or {}
    fonts = {name: _Font(doc, f) for name, f in fonts_raw.items()}
    content = doc.page_content(page)

    spans: List[dict] = []
    stack: List[object] = []
    font: Optional[_Font] = None
    size = 12.0
    tm = [1, 0, 0, 1, 0, 0]   # text line matrix (a b c d e f)
    cur = list(tm)
    leading = 0.0

    def show(raw: bytes):
        if not isinstance(raw, bytes) or font is None:
            return
        text = font.decode(raw)
        if text:
            eff = abs(size * (cur[3] if cur[3] else 1.0))
            spans.append({"x": cur[4], "y": cur[5], "size": eff, "text": text})

    for kind, val in _tokenize_content(content):
        if kind == "operand":
            stack.append(val)
            continue
        op = val
        if op == "BT":
            tm = [1, 0, 0, 1, 0, 0]
            cur = list(tm)
        elif op == "Tf" and len(stack) >= 2:
            size = float(stack[-1])
            font = fonts.get(str(stack[-2]))
        elif op == "Tm" and len(stack) >= 6:
            tm = [float(v) for v in stack[-6:]]
            cur = list(tm)
        elif op == "Td" and len(stack) >= 2:
            tx, ty = float(stack[-2]), float(stack[-1])
            tm = [tm[0], tm[1], tm[2], tm[3],
                  tm[0] * tx + tm[2] * ty + tm[4],
                  tm[1] * tx + tm[3] * ty + tm[5]]
            cur = list(tm)
        elif op == "TD" and len(stack) >= 2:
            leading = -float(stack[-1])
            tx, ty = float(stack[-2]), float(stack[-1])
            tm = [tm[0], tm[1], tm[2], tm[3],
                  tm[0] * tx + tm[2] * ty + tm[4],
                  tm[1] * tx + tm[3] * ty + tm[5]]
            cur = list(tm)
        elif op == "TL" and stack:
            leading = float(stack[-1])
        elif op == "T*":
            tm = [tm[0], tm[1], tm[2], tm[3],
                  tm[2] * -leading + tm[4], tm[3] * -leading + tm[5]]
            cur = list(tm)
        elif op == "Tj" and stack:
            show(stack[-1])
        elif op == "'" and stack:
            tm = [tm[0], tm[1], tm[2], tm[3],
                  tm[2] * -leading + tm[4], tm[3] * -leading + tm[5]]
            cur = list(tm)
            show(stack[-1])
        elif op == '"' and len(stack) >= 3:
            tm = [tm[0], tm[1], tm[2], tm[3],
                  tm[2] * -leading + tm[4], tm[3] * -leading + tm[5]]
            cur = list(tm)
            show(stack[-1])
        elif op == "TJ" and stack and isinstance(stack[-1], list):
            for item in stack[-1]:
                if isinstance(item, bytes):
                    show(item)
                elif isinstance(item, (int, float)) and item < -150:
                    # large negative kern = a word gap the font encodes
                    # instead of a space glyph
                    if spans and not spans[-1]["text"].endswith(" "):
                        spans[-1]["text"] += " "
        stack = [] if kind == "op" else stack
    return spans


# -- layout → elements ----------------------------------------------------

def _spans_to_lines(spans: List[dict]) -> List[dict]:
    """Cluster spans into lines by y (tolerance scaled to font size).
    Each line also keeps its SEGMENTS — runs of spans sharing an x
    anchor (PDF writers emit one text matrix per table cell, so cell
    boundaries survive as distinct anchors) — which the grid-table
    detector consumes."""
    lines: List[dict] = []
    for s in sorted(spans, key=lambda s: (-s["y"], s["x"])):
        tol = max(2.0, 0.4 * s["size"])
        if lines and abs(lines[-1]["y"] - s["y"]) <= tol:
            ln = lines[-1]
            gap = s["x"] - ln["x_end"]
            joiner = " " if gap > 0.15 * s["size"] and \
                not ln["text"].endswith(" ") and ln["text"] else ""
            ln["text"] += joiner + s["text"]
            ln["size"] = max(ln["size"], s["size"])
            ln["x_end"] = max(ln["x_end"], s["x"])
            if abs(s["x"] - ln["segs"][-1][0]) <= 1.0:
                ln["segs"][-1][1] += s["text"]
            else:
                ln["segs"].append([s["x"], s["text"]])
        else:
            lines.append({"y": s["y"], "x": s["x"], "x_end": s["x"],
                          "size": s["size"], "text": s["text"],
                          "segs": [[s["x"], s["text"]]]})
    return [ln for ln in lines if ln["text"].strip()]


def _line_anchors(ln: dict) -> Optional[tuple]:
    """Column-anchor signature of a line: the rounded x starts of its
    non-blank segments, or None when the line can't be a table row
    (fewer than 2 cells)."""
    anchors = tuple(round(x / 2.0) for x, t in ln["segs"] if t.strip())
    return anchors if len(anchors) >= 2 else None


def detect_grid_tables(lines: List[dict]) -> List[tuple]:
    """Conservative grid-table detection over a page's lines: a run of
    ≥2 CONSECUTIVE lines whose non-blank segment anchors are IDENTICAL
    (each line same columns at the same x positions) is a table — the
    shape word processors emit for real tables, and one that multi-size
    prose never produces by accident. Returns [(start, end_exclusive,
    cells)] with cells[r][c] the segment texts."""
    out = []
    i = 0
    while i < len(lines):
        sig = _line_anchors(lines[i])
        if sig is None:
            i += 1
            continue
        j = i + 1
        while j < len(lines) and _line_anchors(lines[j]) == sig:
            j += 1
        if j - i >= 2:
            cells = [
                [t.strip() for x, t in lines[k]["segs"] if t.strip()]
                for k in range(i, j)
            ]
            # two-anchor runs are ambiguous with TWO-COLUMN PROSE LAYOUTS
            # (both columns left-aligned at fixed x): real 2-column
            # tables are short-celled and short; a column layout runs the
            # whole page with sentence-length "cells". Reject those.
            if len(cells[0]) == 2:
                avg_len = sum(len(c) for row in cells for c in row) / (
                    2 * len(cells))
                if j - i > 12 or avg_len > 50:
                    i = j
                    continue
            out.append((i, j, cells))
            i = j
        else:
            i += 1
    return out


def _body_size(lines: List[dict]) -> float:
    weights: Dict[float, int] = {}
    for ln in lines:
        key = round(ln["size"], 1)
        weights[key] = weights.get(key, 0) + len(ln["text"])
    # ties prefer the SMALLER size: body text is never larger than titles
    return max(weights, key=lambda s: (weights[s], -s)) if weights else 12.0


def header_level_map(lines: List[dict], body: float) -> Dict[float, int]:
    """Distinct above-body font sizes across the WHOLE document, biggest
    = level 1 — computed once so header levels stay consistent across
    pages and across the table-slice interleave."""
    header_sizes = sorted({round(ln["size"], 1) for ln in lines
                           if ln["size"] > body * 1.15 + 0.01}, reverse=True)
    return {s: min(i + 1, 9) for i, s in enumerate(header_sizes)}


def page_blocks(lines: List[dict], body: float,
                footer_margin: float = 60.0,
                level_of: Optional[Dict[float, int]] = None) -> List[dict]:
    """Lines → blocks: {kind: header|paragraph|footer, text, size}."""
    if level_of is None:
        level_of = header_level_map(lines, body)
    blocks: List[dict] = []
    after_break = False
    for ln in lines:
        s = round(ln["size"], 1)
        txt = ln["text"].strip()
        # a dashes-only line = thematic break; the next block becomes a
        # footer — the same heuristic every reader in this package applies
        # (MarkdownReader.cs:102-107,153-156)
        if txt and set(txt) <= set("-_* "):
            after_break = True
            continue
        if ln["y"] <= footer_margin or after_break:
            kind, level = "footer", None
            after_break = False
        elif s in level_of:
            kind, level = "header", level_of[s]
        else:
            kind, level = "paragraph", None
        prev = blocks[-1] if blocks else None
        # merge consecutive same-kind, same-size lines ≤ 2×leading apart
        if (prev and prev["kind"] == kind == "paragraph"
                and abs(prev.get("size", s) - s) <= 0.1 * s
                and prev["y_last"] - ln["y"] <= 2.0 * max(body, s)):
            prev["text"] += " " + ln["text"].strip()
            prev["y_last"] = ln["y"]
        else:
            blocks.append({"kind": kind, "level": level, "size": s,
                           "text": ln["text"].strip(), "y_last": ln["y"]})
    return blocks


def _extract_page_images(doc: PdfDocument, page: dict) -> List[Tuple[bytes, str]]:
    res = doc.resolve(page.get("Resources")) or {}
    xobjs = doc.resolve(res.get("XObject")) or {}
    out = []
    for _, ref in sorted(xobjs.items()):
        if not isinstance(ref, _Ref):
            continue
        x = doc.resolve(ref)
        if not isinstance(x, dict) or doc.resolve(x.get("Subtype")) != "Image":
            continue
        filters = doc.resolve(x.get("Filter"))
        if not isinstance(filters, list):
            filters = [filters]
        filters = [doc.resolve(f) for f in filters]
        raw = doc.streams.get(ref[0], b"")
        if "DCTDecode" in filters:
            out.append((raw, "image/jpeg"))
        elif "JPXDecode" in filters:
            out.append((raw, "image/jp2"))
        elif filters in ([None], ["FlateDecode"]):
            data = doc.stream_bytes(ref[0])
            w = int(doc.resolve(x.get("Width", 0)))
            h = int(doc.resolve(x.get("Height", 0)))
            bpc = int(doc.resolve(x.get("BitsPerComponent", 8)))
            cs = doc.resolve(x.get("ColorSpace"))
            ncomp = {"DeviceRGB": 3, "DeviceGray": 1}.get(str(cs), None)
            if w and h and bpc == 8 and ncomp and len(data) >= w * h * ncomp:
                out.append((_wrap_png(data, w, h, ncomp), "image/png"))
    return out


def _wrap_png(raw: bytes, width: int, height: int, ncomp: int) -> bytes:
    """Wrap raw 8-bit gray/RGB pixels into a PNG byte string."""
    def chunk(tag: bytes, payload: bytes) -> bytes:
        c = struct.pack(">I", len(payload)) + tag + payload
        return c + struct.pack(">I", zlib.crc32(tag + payload) & 0xFFFFFFFF)

    color_type = 2 if ncomp == 3 else 0
    ihdr = struct.pack(">IIBBBBB", width, height, 8, color_type, 0, 0, 0)
    stride = width * ncomp
    scan = b"".join(b"\x00" + raw[y * stride:(y + 1) * stride]
                    for y in range(height))
    return (b"\x89PNG\r\n\x1a\n" + chunk(b"IHDR", ihdr)
            + chunk(b"IDAT", zlib.compress(scan)) + chunk(b"IEND", b""))


def _grid_table_markdown(cells: List[List[str]]) -> str:
    from .docx import _table_markdown

    return _table_markdown(cells)


def parse_pdf(data: bytes, doc_id: str,
              extract_images: bool = False) -> List[dict]:
    """Parse one PDF byte blob into ``elements`` rows: a root section,
    one section per page (with ``page_number``), headers/paragraphs/
    footers from layout, images appended at page end (LlamaParse page
    shape, ``LlamaParseReader.cs:128-215``)."""
    if not data or not data.startswith(b"%PDF"):
        raise ValueError(f"{doc_id}: not a PDF file")
    if re.search(rb"/Encrypt\s+\d+\s+\d+\s+R", data):
        raise ValueError(
            f"{doc_id}: encrypted PDF — decrypt out-of-band before ingestion "
            f"(RC4/AES content streams are not supported)")
    doc = PdfDocument(data)
    pages = doc.pages()
    if not pages:
        raise ValueError(f"{doc_id}: no pages found")

    rows: List[dict] = []
    seq = 0

    def emit(path, **kw):
        nonlocal seq
        rows.append(element_row(doc_id, seq, path, **kw))
        seq += 1
        return rows[-1]

    root = emit([0], elem_type=ELEM_SECTION, markdown="\x00")
    doc_md: List[str] = []
    all_lines = [
        _spans_to_lines(extract_spans(doc, page)) for page in pages
    ]
    body = _body_size([ln for lines in all_lines for ln in lines])
    level_of = header_level_map([ln for lines in all_lines for ln in lines], body)
    for pno, (page, lines) in enumerate(zip(pages, all_lines), start=1):
        # grid tables first (consumes their lines); the remaining slices
        # go through the header/paragraph/footer classifier, with the
        # page's reading order preserved across the interleave
        tables = detect_grid_tables(lines)
        blocks: List[dict] = []
        cursor = 0
        for start, end, cells in tables:
            blocks.extend(page_blocks(lines[cursor:start], body,
                                      level_of=level_of))
            blocks.append({"kind": "table", "cells": cells,
                           "text": _grid_table_markdown(cells)})
            cursor = end
        blocks.extend(page_blocks(lines[cursor:], body, level_of=level_of))
        if not blocks and not extract_images:
            continue
        page_md = [b["text"] for b in blocks]
        psec = emit([0, pno - 1], elem_type=ELEM_SECTION,
                    markdown="\n\n".join(page_md) or f"(page {pno})",
                    page_number=pno)
        for k, b in enumerate(blocks):
            path = [0, pno - 1, k]
            if b["kind"] == "header":
                emit(path, elem_type=ELEM_HEADER,
                     markdown=f"{'#' * b['level']} {b['text']}",
                     text=b["text"], header_level=b["level"], page_number=pno)
            elif b["kind"] == "footer":
                emit(path, elem_type=ELEM_FOOTER, markdown=b["text"],
                     text=b["text"], page_number=pno)
            elif b["kind"] == "table":
                emit(path, elem_type=ELEM_TABLE, markdown=b["text"],
                     table_cells=b["cells"], page_number=pno)
            else:
                emit(path, elem_type=ELEM_PARAGRAPH, markdown=b["text"],
                     text=b["text"], page_number=pno)
        if extract_images:
            for img, mt in _extract_page_images(doc, page):
                emit([0, pno - 1, len(blocks)], elem_type=ELEM_IMAGE,
                     image_content=img, image_media_type=mt, page_number=pno)
        doc_md.extend(page_md)
    root["markdown"] = "\n\n".join(doc_md) or "(empty document)"
    return rows


def parse_pdf_df(df, id_col: str = "doc_id", content_col: str = "content",
                 on_error: str = "fail", extract_images: bool = False):
    """mapInPandas wrapper (shared plumbing: elements_map_df)."""
    from .markdown import elements_map_df

    return elements_map_df(
        df, lambda raw, doc_id: parse_pdf(bytes(raw), doc_id,
                                          extract_images=extract_images),
        id_col, content_col, on_error)

def read_pdf(spark, path, glob: str = "*.pdf", recursive: bool = False,
             on_error: str = "fail", extract_images: bool = False):
    """Distributed .pdf directory ingestion (binaryFile scan + parse)."""
    from .markdown import binary_file_scan

    files = binary_file_scan(spark, path, glob, recursive)
    return parse_pdf_df(files, id_col="path", content_col="content",
                        on_error=on_error, extract_images=extract_images)
