"""Native XLSX → ``elements`` DataFrame reader (stdlib zip+XML).

Spreadsheets are in the reference's ingestion scope through markitdown
(xlsx/xls entries in the MIME map, ``IngestionDocumentReader.cs:80-171``
— markitdown renders each sheet as a markdown table). This module reads
SpreadsheetML directly:

* ``xl/workbook.xml`` lists the sheets in workbook order; their
  relationship ids resolve to ``xl/worksheets/sheetN.xml`` via
  ``xl/_rels/workbook.xml.rels``;
* ``xl/sharedStrings.xml`` interns shared cell strings (``t`` runs
  concatenated, rich-text aware);
* each sheet becomes one SECTION (sheet name as a header child +
  metadata) holding one TABLE element: the cell matrix is laid out by
  the ``r="A1"`` cell references — gaps become empty cells, so sparse
  sheets keep their column alignment — with the first row as the header
  row (``IngestionDocument.cs:213``);
* cell values: shared/inline strings verbatim; numbers as their stored
  lexical form; booleans → TRUE/FALSE; formula cells yield their cached
  value (the ``<v>``), like every non-recalculating reader.

Merged regions (``mergeCells``) duplicate the anchor value across the
span — the same convention as the DOCX/ADI table mapping.

Spark entry point :func:`read_xlsx` = distributed ``binaryFile`` scan +
``mapInPandas``.
"""

from __future__ import annotations

import io
import re
import zipfile
from typing import Dict, List
from xml.etree import ElementTree as ET

from ..model import (
    ELEM_HEADER,
    ELEM_SECTION,
    ELEM_TABLE,
    element_row,
)
from .docx import _load_rels, _table_markdown

_S = "{http://schemas.openxmlformats.org/spreadsheetml/2006/main}"
_R = "{http://schemas.openxmlformats.org/officeDocument/2006/relationships}"
_CELL_REF_RE = re.compile(r"^([A-Z]+)(\d+)$")


def _col_index(letters: str) -> int:
    """A→0, B→1, …, AA→26."""
    n = 0
    for ch in letters:
        n = n * 26 + (ord(ch) - 64)
    return n - 1


def _si_text(si: ET.Element) -> str:
    """One shared-string item: direct <t> or rich-text <r>/<t> runs;
    phonetic guides (<rPh>, standard in Japanese workbooks) are display
    annotations, NOT cell content — including them duplicated the text."""
    parts = []
    for child in si:
        if child.tag == _S + "t":
            parts.append(child.text or "")
        elif child.tag == _S + "r":
            t = child.find(_S + "t")
            if t is not None:
                parts.append(t.text or "")
    return "".join(parts)


def _shared_strings(zf: zipfile.ZipFile) -> List[str]:
    try:
        root = ET.fromstring(zf.read("xl/sharedStrings.xml"))
    except KeyError:
        return []
    return [_si_text(si) for si in root.findall(_S + "si")]


def _cell_value(c: ET.Element, shared: List[str]) -> str:
    t = c.get("t", "n")
    if t == "inlineStr":
        return "".join(x.text or "" for x in c.iter(_S + "t"))
    v = c.find(_S + "v")
    raw = v.text if v is not None and v.text is not None else ""
    if t == "s":
        try:
            return shared[int(raw)]
        except (ValueError, IndexError):
            return ""
    if t == "b":
        return "TRUE" if raw == "1" else "FALSE"
    return raw  # n / str / e: the stored lexical form


def _sheet_cells(zf: zipfile.ZipFile, part: str,
                 shared: List[str]) -> List[List[str]]:
    root = ET.fromstring(zf.read(part))
    grid: Dict[int, Dict[int, str]] = {}
    auto_row = 0
    for row in root.iter(_S + "row"):
        r_attr = row.get("r")
        ri = int(r_attr) - 1 if r_attr else auto_row
        auto_row = ri + 1
        auto_col = 0
        for c in row.findall(_S + "c"):
            ref = c.get("r")
            m = _CELL_REF_RE.match(ref) if ref else None
            ci = _col_index(m.group(1)) if m else auto_col
            auto_col = ci + 1
            val = _cell_value(c, shared)
            if val != "":
                grid.setdefault(ri, {})[ci] = val
    # merged regions duplicate the anchor value across the span
    mc = root.find(_S + "mergeCells")
    if mc is not None:
        for m in mc.findall(_S + "mergeCell"):
            ref = m.get("ref", "")
            if ":" not in ref:
                continue
            a, b = ref.split(":")
            ma, mb = _CELL_REF_RE.match(a), _CELL_REF_RE.match(b)
            if not (ma and mb):
                continue
            r0, c0 = int(ma.group(2)) - 1, _col_index(ma.group(1))
            r1, c1 = int(mb.group(2)) - 1, _col_index(mb.group(1))
            anchor = grid.get(r0, {}).get(c0, "")
            for r in range(r0, r1 + 1):
                for cc in range(c0, c1 + 1):
                    grid.setdefault(r, {}).setdefault(cc, anchor)
    if not grid:
        return []
    max_r = max(grid)
    max_c = max(max(cols) for cols in grid.values())
    return [
        [grid.get(r, {}).get(c, "") for c in range(max_c + 1)]
        for r in range(max_r + 1)
    ]


def parse_xlsx(data: bytes, doc_id: str) -> List[dict]:
    """Parse one .xlsx byte blob into elements rows: root section, one
    section per sheet (header = sheet name), one table per non-empty
    sheet."""
    if not data:
        raise ValueError("content must be non-empty")
    try:
        zf = zipfile.ZipFile(io.BytesIO(data))
        wb = ET.fromstring(zf.read("xl/workbook.xml"))
    except (zipfile.BadZipFile, KeyError):
        raise ValueError(f"{doc_id}: not an XLSX package (no xl/workbook.xml)")
    rels = _load_rels(zf, "xl/workbook.xml")
    shared = _shared_strings(zf)

    rows: List[dict] = []
    seq = [0]

    def emit(path, **kw):
        rows.append(element_row(doc_id, seq[0], path, **kw))
        seq[0] += 1
        return rows[-1]

    root_row = emit([0], elem_type=ELEM_SECTION, markdown="\x00")
    body_md: List[str] = []
    sheets = wb.find(_S + "sheets")
    for si, sheet in enumerate(sheets.findall(_S + "sheet") if sheets is not None else []):
        name = sheet.get("name") or f"Sheet{si + 1}"
        rid = sheet.get(_R + "id")
        target = rels.get(rid, (None, False))[0] if rid else None
        if not target:
            continue
        emit([0, si], elem_type=ELEM_SECTION, markdown=f"## {name}",
             metadata={"sheet": name})
        emit([0, si, 0], elem_type=ELEM_HEADER, markdown=f"## {name}",
             text=name, header_level=2)
        body_md.append(f"## {name}")
        try:
            cells = _sheet_cells(zf, target, shared)
        except KeyError:
            cells = []
        if cells:
            md = _table_markdown(cells)
            emit([0, si, 1], elem_type=ELEM_TABLE, markdown=md,
                 table_cells=cells, metadata={"sheet": name})
            body_md.append(md)
    root_row["markdown"] = "\n\n".join(body_md) or "(empty workbook)"
    return rows


def parse_xlsx_df(df, id_col: str = "doc_id", content_col: str = "content",
                  on_error: str = "fail"):
    """mapInPandas wrapper (shared plumbing: elements_map_df)."""
    from .markdown import elements_map_df

    return elements_map_df(
        df, lambda raw, doc_id: parse_xlsx(bytes(raw), doc_id),
        id_col, content_col, on_error)

def read_xlsx(spark, path, glob: str = "*.xlsx", recursive: bool = False,
              on_error: str = "fail"):
    from .markdown import binary_file_scan

    files = binary_file_scan(spark, path, glob, recursive)
    return parse_xlsx_df(files, id_col="path", content_col="content",
                         on_error=on_error)


# -- fixture writer ----------------------------------------------------------

def build_xlsx(sheets: Dict[str, List[List]]) -> bytes:
    """Minimal SpreadsheetML writer for fixtures/round-trip tests:
    ``sheets`` maps sheet name → row-major cell values (str/int/float/
    bool/None). Strings go inline (no shared-string table needed for
    reading back); numbers/booleans use their native cell types."""
    def cell_xml(ref, v):
        if v is None or v == "":
            return ""
        if isinstance(v, bool):
            return f'<c r="{ref}" t="b"><v>{1 if v else 0}</v></c>'
        if isinstance(v, (int, float)):
            return f'<c r="{ref}"><v>{v}</v></c>'
        from xml.sax.saxutils import escape

        return (f'<c r="{ref}" t="inlineStr"><is><t xml:space="preserve">'
                f"{escape(str(v))}</t></is></c>")

    def col_letter(i):
        out = ""
        i += 1
        while i:
            i, rem = divmod(i - 1, 26)
            out = chr(65 + rem) + out
        return out

    sheet_xmls = []
    for rows in sheets.values():
        body = []
        for ri, row in enumerate(rows):
            cells = "".join(cell_xml(f"{col_letter(ci)}{ri + 1}", v)
                            for ci, v in enumerate(row))
            body.append(f'<row r="{ri + 1}">{cells}</row>')
        sheet_xmls.append(
            '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
            '<worksheet xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main">'
            f"<sheetData>{''.join(body)}</sheetData></worksheet>")

    names = list(sheets)
    wb_sheets = "".join(
        f'<sheet name="{n}" sheetId="{i + 1}" r:id="rId{i + 1}"/>'
        for i, n in enumerate(names))
    workbook = (
        '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
        '<workbook xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main" '
        'xmlns:r="http://schemas.openxmlformats.org/officeDocument/2006/relationships">'
        f"<sheets>{wb_sheets}</sheets></workbook>")
    wb_rels = (
        '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
        '<Relationships xmlns="http://schemas.openxmlformats.org/package/2006/relationships">'
        + "".join(
            f'<Relationship Id="rId{i + 1}" '
            f'Type="http://schemas.openxmlformats.org/officeDocument/2006/relationships/worksheet" '
            f'Target="worksheets/sheet{i + 1}.xml"/>' for i in range(len(names)))
        + "</Relationships>")
    content_types = (
        '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
        '<Types xmlns="http://schemas.openxmlformats.org/package/2006/content-types">'
        '<Default Extension="rels" ContentType="application/vnd.openxmlformats-package.relationships+xml"/>'
        '<Default Extension="xml" ContentType="application/xml"/>'
        '<Override PartName="/xl/workbook.xml" ContentType="application/vnd.openxmlformats-officedocument.spreadsheetml.sheet.main+xml"/>'
        + "".join(
            f'<Override PartName="/xl/worksheets/sheet{i + 1}.xml" '
            f'ContentType="application/vnd.openxmlformats-officedocument.spreadsheetml.worksheet+xml"/>'
            for i in range(len(names)))
        + "</Types>")
    root_rels = (
        '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
        '<Relationships xmlns="http://schemas.openxmlformats.org/package/2006/relationships">'
        '<Relationship Id="rId1" '
        'Type="http://schemas.openxmlformats.org/officeDocument/2006/relationships/officeDocument" '
        'Target="xl/workbook.xml"/></Relationships>')

    buf = io.BytesIO()
    with zipfile.ZipFile(buf, "w", zipfile.ZIP_DEFLATED) as zf:
        zf.writestr("[Content_Types].xml", content_types)
        zf.writestr("_rels/.rels", root_rels)
        zf.writestr("xl/workbook.xml", workbook)
        zf.writestr("xl/_rels/workbook.xml.rels", wb_rels)
        for i, xml in enumerate(sheet_xmls):
            zf.writestr(f"xl/worksheets/sheet{i + 1}.xml", xml)
    return buf.getvalue()
