"""Native OpenDocument (ODT/ODS/ODP) → ``elements`` DataFrame reader.

OpenDocument formats are in the reference's ingestion scope (``.ods``
in the MIME map, ``IngestionDocumentReader.cs:150``; ODT/ODP reach it
through markitdown). All three are zip containers sharing one
``content.xml`` vocabulary (ODF 1.2), so a single parser covers them:

* **text** (``office:text``, .odt): ``text:h`` with
  ``text:outline-level`` → headers; ``text:p`` → paragraphs with
  bold/italic span markdown (resolved through ``office:automatic-styles``
  ``fo:font-weight``/``fo:font-style``); ``text:list`` → a section of
  item paragraphs; ``table:table`` → table elements with
  ``number-columns-spanned``/``number-rows-spanned`` duplication and the
  first row as header;
* **spreadsheet** (``office:spreadsheet``, .ods): each ``table:table``
  (sheet) → section + header (sheet name) + one table element; cell
  values honour ``office:value-type`` (floats/currency via
  ``office:value`` verbatim, booleans, else display text);
  ``number-columns-repeated`` expanded (with trailing-filler clamping);
* **presentation** (``office:presentation``, .odp): each ``draw:page``
  → page-numbered section; the title frame
  (``presentation:class="title"``) → header level 1, outline/content
  frames → paragraphs; embedded tables as in text documents.

Spark entry point :func:`read_odf` = distributed ``binaryFile`` scan +
``mapInPandas``, like every reader in this package.
"""

from __future__ import annotations

import io
import zipfile
from typing import Dict, List, Optional
from xml.etree import ElementTree as ET

from ..model import (
    ELEM_HEADER,
    ELEM_PARAGRAPH,
    ELEM_SECTION,
    ELEM_TABLE,
    element_row,
)
from .docx import _table_markdown

_O = "{urn:oasis:names:tc:opendocument:xmlns:office:1.0}"
_T = "{urn:oasis:names:tc:opendocument:xmlns:text:1.0}"
_TB = "{urn:oasis:names:tc:opendocument:xmlns:table:1.0}"
_D = "{urn:oasis:names:tc:opendocument:xmlns:drawing:1.0}"
_P = "{urn:oasis:names:tc:opendocument:xmlns:presentation:1.0}"
_S = "{urn:oasis:names:tc:opendocument:xmlns:style:1.0}"
_FO = "{urn:oasis:names:tc:opendocument:xmlns:xsl-fo-compatible:1.0}"

#: practical cap on expanding number-columns-repeated (ODS pads the last
#: cell to 16k columns; real data never needs more than this)
_MAX_REPEAT = 256


def _span_styles(root: ET.Element) -> Dict[str, str]:
    """automatic-style name → '' | 'b' | 'i' | 'bi' (bold/italic)."""
    out: Dict[str, str] = {}
    styles = root.find(_O + "automatic-styles")
    for st in (styles.findall(_S + "style") if styles is not None else []):
        name = st.get(_S + "name")
        tp = st.find(_S + "text-properties")
        if name is None or tp is None:
            continue
        mark = ""
        if (tp.get(_FO + "font-weight") or "").startswith("bold"):
            mark += "b"
        if tp.get(_FO + "font-style") == "italic":
            mark += "i"
        if mark:
            out[name] = mark
    return out


def _para_text_md(p: ET.Element, spans: Dict[str, str]) -> tuple:
    """(plain, markdown) of a text:p / text:h — spans with bold/italic
    automatic styles render markdown markers."""
    plain, md = [], []

    def walk(node):
        if node.text:
            plain.append(node.text)
            md.append(node.text)
        for ch in node:
            tag = ch.tag
            if tag == _T + "span":
                mark = spans.get(ch.get(_T + "style-name") or "", "")
                open_m = ("**" if "b" in mark else "") + ("*" if "i" in mark else "")
                md.append(open_m)
                walk(ch)
                md.append(open_m[::-1])
            elif tag == _T + "s":  # explicit space run
                n = int(ch.get(_T + "c") or 1)
                plain.append(" " * n)
                md.append(" " * n)
            elif tag == _T + "tab":
                plain.append("\t")
                md.append("\t")
            elif tag == _T + "line-break":
                plain.append("\n")
                md.append("\n")
            elif tag == _T + "a":
                href = ch.get("{http://www.w3.org/1999/xlink}href") or ""
                bracket_at = len(md)
                md.append("[")
                walk(ch)
                if href:
                    md.append(f"]({href})")
                else:  # no target: drop ONLY the opening bracket marker
                    md[bracket_at] = ""
            else:
                walk(ch)
            if ch.tail:
                plain.append(ch.tail)
                md.append(ch.tail)

    walk(p)
    import re

    return (re.sub(r"[ \t]+", " ", "".join(plain)).strip(),
            re.sub(r"[ \t]+", " ", "".join(md)).strip())


def _cell_value(cell: ET.Element, spans: Dict[str, str]) -> str:
    vt = cell.get(_O + "value-type")
    if vt in ("float", "currency", "percentage"):
        return cell.get(_O + "value") or ""
    if vt == "boolean":
        return "TRUE" if cell.get(_O + "boolean-value") == "true" else "FALSE"
    paras = [md for _, md in (_para_text_md(p, spans)
                              for p in cell.findall(_T + "p")) if md]
    return "\n".join(paras)


def _table_cells(tbl: ET.Element, spans: Dict[str, str]) -> List[List[str]]:
    rows: List[List[str]] = []
    rowspans: Dict[int, tuple] = {}
    for tr in tbl.iter(_TB + "table-row"):
        row: List[str] = []
        new_spans: Dict[int, tuple] = {}
        for cell in list(tr):
            if cell.tag == _TB + "covered-table-cell":
                # covered by a span from above/left: fill from rowspan
                # bookkeeping if present, else the horizontal duplication
                # below already handled it — emit nothing extra here
                while len(row) in rowspans:
                    row.append(rowspans[len(row)][0])
                continue
            if cell.tag != _TB + "table-cell":
                continue
            while len(row) in rowspans:
                row.append(rowspans[len(row)][0])
            val = _cell_value(cell, spans)
            repeat = min(_MAX_REPEAT,
                         int(cell.get(_TB + "number-columns-repeated") or 1))
            colspan = int(cell.get(_TB + "number-columns-spanned") or 1)
            rowspan = int(cell.get(_TB + "number-rows-spanned") or 1)
            for _ in range(repeat):
                start = len(row)
                for _c in range(colspan):
                    row.append(val)
                if rowspan > 1:
                    for k in range(colspan):
                        new_spans[start + k] = (val, rowspan - 1)
        while len(row) in rowspans:
            row.append(rowspans[len(row)][0])
        # drop trailing empty filler (ODS repeats empty cells to 16k cols)
        while row and row[-1] == "":
            row.pop()
        rows.append(row)
        rowspans = {c: (t, r - 1) for c, (t, r) in rowspans.items() if r > 1}
        rowspans.update(new_spans)
    rows = [r for r in rows if any(c != "" for c in r)]
    width = max((len(r) for r in rows), default=0)
    return [r + [""] * (width - len(r)) for r in rows]


class _Emitter:
    def __init__(self, doc_id: str):
        self.doc_id = doc_id
        self.rows: List[dict] = []
        self.seq = 0
        self.body_md: List[str] = []

    def emit(self, path, **kw):
        self.rows.append(element_row(self.doc_id, self.seq, path, **kw))
        self.seq += 1
        return self.rows[-1]


def _walk_text_body(em: _Emitter, body: ET.Element, spans: Dict[str, str],
                    base_path: List[int], page_number: Optional[int] = None):
    child = 0

    def nxt():
        nonlocal child
        p = base_path + [child]
        child += 1
        return p

    for node in body:
        tag = node.tag
        if tag == _T + "h":
            plain, md = _para_text_md(node, spans)
            if not md:
                continue
            level = min(9, max(1, int(node.get(_T + "outline-level") or 1)))
            em.emit(nxt(), elem_type=ELEM_HEADER,
                    markdown=f"{'#' * level} {md}", text=plain,
                    header_level=level, page_number=page_number)
            em.body_md.append(f"{'#' * level} {md}")
        elif tag == _T + "p":
            plain, md = _para_text_md(node, spans)
            if not md:
                continue
            em.emit(nxt(), elem_type=ELEM_PARAGRAPH, markdown=md, text=plain,
                    page_number=page_number)
            em.body_md.append(md)
        elif tag == _T + "list":
            items = []
            for li in node.findall(_T + "list-item"):
                for p in li.findall(_T + "p"):
                    plain, md = _para_text_md(p, spans)
                    if md:
                        items.append((plain, md))
            if items:
                path = nxt()
                sec_md = "\n".join(f"- {md}" for _, md in items)
                em.emit(path, elem_type=ELEM_SECTION, markdown=sec_md,
                        page_number=page_number)
                for k, (plain, md) in enumerate(items):
                    em.emit(path + [k], elem_type=ELEM_PARAGRAPH,
                            markdown=md, text=plain, page_number=page_number)
                em.body_md.append(sec_md)
        elif tag == _TB + "table":
            cells = _table_cells(node, spans)
            if cells:
                md = _table_markdown(cells)
                em.emit(nxt(), elem_type=ELEM_TABLE, markdown=md,
                        table_cells=cells, page_number=page_number)
                em.body_md.append(md)


def parse_odf(data: bytes, doc_id: str) -> List[dict]:
    """Parse one ODT/ODS/ODP byte blob into elements rows (format
    auto-detected from the body element inside ``content.xml``)."""
    if not data:
        raise ValueError("content must be non-empty")
    try:
        zf = zipfile.ZipFile(io.BytesIO(data))
        content = ET.fromstring(zf.read("content.xml"))
    except (zipfile.BadZipFile, KeyError):
        raise ValueError(f"{doc_id}: not an OpenDocument package "
                         f"(no content.xml)")
    spans = _span_styles(content)
    body = content.find(_O + "body")
    if body is None:
        raise ValueError(f"{doc_id}: malformed content.xml (no office:body)")

    em = _Emitter(doc_id)
    root_row = em.emit([0], elem_type=ELEM_SECTION, markdown="\x00")

    text = body.find(_O + "text")
    sheet = body.find(_O + "spreadsheet")
    pres = body.find(_O + "presentation")
    if text is not None:
        _walk_text_body(em, text, spans, [0])
    elif sheet is not None:
        for si, tbl in enumerate(sheet.findall(_TB + "table")):
            name = tbl.get(_TB + "name") or f"Sheet{si + 1}"
            em.emit([0, si], elem_type=ELEM_SECTION, markdown=f"## {name}",
                    metadata={"sheet": name})
            em.emit([0, si, 0], elem_type=ELEM_HEADER, markdown=f"## {name}",
                    text=name, header_level=2)
            em.body_md.append(f"## {name}")
            cells = _table_cells(tbl, spans)
            if cells:
                md = _table_markdown(cells)
                em.emit([0, si, 1], elem_type=ELEM_TABLE, markdown=md,
                        table_cells=cells, metadata={"sheet": name})
                em.body_md.append(md)
    elif pres is not None:
        for pi, page in enumerate(pres.findall(_D + "page")):
            texts = []
            for frame in page.iter(_D + "frame"):
                cls = frame.get(_P + "class") or ""
                box = frame.find(_D + "text-box")
                if box is None:
                    continue
                for p in box.iter(_T + "p"):
                    plain, md = _para_text_md(p, spans)
                    if md:
                        texts.append((cls, plain, md))
            slide_md = [
                (f"# {md}" if cls == "title" else md) for cls, _, md in texts
            ]
            em.emit([0, pi], elem_type=ELEM_SECTION,
                    markdown="\n\n".join(slide_md) or f"(slide {pi + 1})",
                    page_number=pi + 1)
            for k, (cls, plain, md) in enumerate(texts):
                if cls == "title":
                    em.emit([0, pi, k], elem_type=ELEM_HEADER,
                            markdown=f"# {md}", text=plain, header_level=1,
                            page_number=pi + 1)
                else:
                    em.emit([0, pi, k], elem_type=ELEM_PARAGRAPH,
                            markdown=md, text=plain, page_number=pi + 1)
            em.body_md.extend(slide_md)
    else:
        raise ValueError(f"{doc_id}: unsupported OpenDocument body type")

    root_row["markdown"] = "\n\n".join(em.body_md) or "(empty document)"
    return em.rows


def parse_odf_df(df, id_col: str = "doc_id", content_col: str = "content",
                 on_error: str = "fail"):
    """mapInPandas wrapper (shared plumbing: elements_map_df)."""
    from .markdown import elements_map_df

    return elements_map_df(
        df, lambda raw, doc_id: parse_odf(bytes(raw), doc_id),
        id_col, content_col, on_error)


def read_odf(spark, path, glob: str = "*.od[tsp]", recursive: bool = False,
             on_error: str = "fail"):
    from .markdown import binary_file_scan

    files = binary_file_scan(spark, path, glob, recursive)
    return parse_odf_df(files, id_col="path", content_col="content",
                        on_error=on_error)


# -- fixture writer ----------------------------------------------------------

_MIMETYPES = {
    "odt": "application/vnd.oasis.opendocument.text",
    "ods": "application/vnd.oasis.opendocument.spreadsheet",
    "odp": "application/vnd.oasis.opendocument.presentation",
}


def _zip_odf(kind: str, body_xml: str, styles_xml: str = "") -> bytes:
    content = (
        '<?xml version="1.0" encoding="UTF-8"?>'
        '<office:document-content '
        'xmlns:office="urn:oasis:names:tc:opendocument:xmlns:office:1.0" '
        'xmlns:text="urn:oasis:names:tc:opendocument:xmlns:text:1.0" '
        'xmlns:table="urn:oasis:names:tc:opendocument:xmlns:table:1.0" '
        'xmlns:draw="urn:oasis:names:tc:opendocument:xmlns:drawing:1.0" '
        'xmlns:presentation="urn:oasis:names:tc:opendocument:xmlns:presentation:1.0" '
        'xmlns:style="urn:oasis:names:tc:opendocument:xmlns:style:1.0" '
        'xmlns:fo="urn:oasis:names:tc:opendocument:xmlns:xsl-fo-compatible:1.0" '
        'xmlns:xlink="http://www.w3.org/1999/xlink" office:version="1.2">'
        f"<office:automatic-styles>{styles_xml}</office:automatic-styles>"
        f"<office:body>{body_xml}</office:body></office:document-content>")
    buf = io.BytesIO()
    with zipfile.ZipFile(buf, "w", zipfile.ZIP_DEFLATED) as zf:
        zf.writestr("mimetype", _MIMETYPES[kind])
        zf.writestr("content.xml", content)
    return buf.getvalue()


def build_odt(blocks: List[tuple]) -> bytes:
    """Fixture ODT: blocks = ("h", level, text) | ("p", text) |
    ("pb", text) bold paragraph | ("list", [items]) | ("table", cells)."""
    from xml.sax.saxutils import escape

    styles = ('<style:style style:name="B1" style:family="text">'
              '<style:text-properties fo:font-weight="bold"/></style:style>')
    out = []
    for b in blocks:
        if b[0] == "h":
            out.append(f'<text:h text:outline-level="{b[1]}">{escape(b[2])}</text:h>')
        elif b[0] == "p":
            out.append(f"<text:p>{escape(b[1])}</text:p>")
        elif b[0] == "pb":
            out.append(f'<text:p>with <text:span text:style-name="B1">'
                       f"{escape(b[1])}</text:span> inside</text:p>")
        elif b[0] == "list":
            items = "".join(
                f"<text:list-item><text:p>{escape(i)}</text:p></text:list-item>"
                for i in b[1])
            out.append(f"<text:list>{items}</text:list>")
        elif b[0] == "table":
            rows = []
            for row in b[1]:
                cells = "".join(
                    f'<table:table-cell office:value-type="string">'
                    f"<text:p>{escape(str(c))}</text:p></table:table-cell>"
                    for c in row)
                rows.append(f"<table:table-row>{cells}</table:table-row>")
            out.append(f"<table:table>{''.join(rows)}</table:table>")
    return _zip_odf("odt", f"<office:text>{''.join(out)}</office:text>", styles)


def build_ods(sheets: Dict[str, List[List]]) -> bytes:
    """Fixture ODS: sheet name → row-major values (str/float/bool)."""
    from xml.sax.saxutils import escape

    tables = []
    for name, rows in sheets.items():
        trs = []
        for row in rows:
            tcs = []
            for v in row:
                if isinstance(v, bool):
                    tcs.append(f'<table:table-cell office:value-type="boolean" '
                               f'office:boolean-value="{str(v).lower()}"/>')
                elif isinstance(v, (int, float)):
                    tcs.append(f'<table:table-cell office:value-type="float" '
                               f'office:value="{v}"/>')
                else:
                    tcs.append(f'<table:table-cell office:value-type="string">'
                               f"<text:p>{escape(str(v))}</text:p></table:table-cell>")
            trs.append(f"<table:table-row>{''.join(tcs)}</table:table-row>")
        tables.append(f'<table:table table:name="{escape(name)}">'
                      f"{''.join(trs)}</table:table>")
    return _zip_odf("ods",
                    f"<office:spreadsheet>{''.join(tables)}</office:spreadsheet>")


def build_odp(slides: List[dict]) -> bytes:
    """Fixture ODP: slides = {"title": str, "points": [str]}."""
    from xml.sax.saxutils import escape

    pages = []
    for s in slides:
        frames = []
        if "title" in s:
            frames.append(
                f'<draw:frame presentation:class="title"><draw:text-box>'
                f"<text:p>{escape(s['title'])}</text:p>"
                f"</draw:text-box></draw:frame>")
        if s.get("points"):
            paras = "".join(f"<text:p>{escape(p)}</text:p>" for p in s["points"])
            frames.append(f'<draw:frame presentation:class="outline">'
                          f"<draw:text-box>{paras}</draw:text-box></draw:frame>")
        pages.append(f"<draw:page>{''.join(frames)}</draw:page>")
    return _zip_odf("odp",
                    f"<office:presentation>{''.join(pages)}</office:presentation>")
