"""Native DOCX → ``elements`` DataFrame reader (no external packages).

The reference ingests office formats by shelling out to the ``markitdown``
CLI and re-parsing its markdown (``MarkItDownReader.cs:13-130``); that
package is absent here, so this module parses WordprocessingML directly —
a .docx file is a zip whose ``word/document.xml`` holds the body as a flat
sequence of paragraphs (``w:p``) and tables (``w:tbl``) — using only
stdlib ``zipfile`` + ``xml.etree``. The element mapping mirrors what the
reference sees after the markitdown → Markdig round-trip
(``MarkdownReader.cs:129-316``) plus the conformance contract
(``test/.../Readers/DocumentReaderConformanceTests.cs:29-100``):

* ``Title`` / ``HeadingN`` paragraph styles → header elements (Title = 1);
* plain paragraphs → paragraph elements; bold/italic runs render ``**``
  / ``*`` markdown, hyperlinks render ``[text](url)``;
* a paragraph of only dashes (the way Word documents fake a rule) acts as
  a thematic break: the next paragraph becomes a FOOTER — the same
  footer-after-break heuristic the markdown reader applies
  (``MarkdownReader.cs:102-107,153-156``);
* real page footers (``w:footerReference`` → ``word/footerN.xml``) are
  appended as footer elements after the body;
* tables → a cell matrix, first row = header row
  (``IngestionDocument.cs:213``); horizontally merged cells
  (``w:gridSpan``) and vertically merged cells (``w:vMerge``) duplicate
  their value across the span, exactly like the reference's ADI cell
  handling (``DocumentIntelligenceReader.cs:314-334``); the 5×4
  conformance matrix (``DocumentReaderConformanceTests.cs:86-99``) is a
  test golden;
* consecutive list paragraphs (``w:numPr``) → one section wrapping the
  leaf items (``MarkdownReader.cs:179-204``);
* inline pictures (``w:drawing`` → ``a:blip`` → ``word/media/*``) →
  image elements with bytes + media type when ``extract_images=True``
  (the conformance suite's image contract,
  ``DocumentReaderConformanceTests.cs:144-155``).

Spark entry point :func:`read_docx` scans with the distributed
``binaryFile`` source and parses inside ``mapInPandas`` — per-file
parallelism across executors; the zip bytes never leave the executor that
read them, so a million-file corpus scales with the cluster, unlike the
reference's sequential file loop (``IngestionPipeline.cs:121``).
"""

from __future__ import annotations

import io
import re
import zipfile
from typing import Iterator, List, Optional
from xml.etree import ElementTree as ET

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
from .media_types import media_type_for

_W = "{http://schemas.openxmlformats.org/wordprocessingml/2006/main}"
_R = "{http://schemas.openxmlformats.org/officeDocument/2006/relationships}"
_A = "{http://schemas.openxmlformats.org/drawingml/2006/main}"
_REL = "{http://schemas.openxmlformats.org/package/2006/relationships}"

_HEADING_RE = re.compile(r"^heading\s*([1-9])$", re.I)
# A paragraph that is only dashes/underscores/asterisks (≥3) = thematic break.
_BREAK_TEXT_RE = re.compile(r"^\s*([-_*])(\s*\1){2,}\s*$")


def _load_rels(zf: zipfile.ZipFile, part: str) -> dict:
    """rId → target map for one package part (e.g. word/document.xml)."""
    folder, _, name = part.rpartition("/")
    rel_path = f"{folder}/_rels/{name}.rels"
    try:
        root = ET.fromstring(zf.read(rel_path))
    except KeyError:
        return {}
    out = {}
    for rel in root.findall(_REL + "Relationship"):
        target = rel.get("Target", "")
        if rel.get("TargetMode") != "External" and not target.startswith("/"):
            import posixpath

            target = posixpath.normpath(
                f"{folder}/{target}" if folder else target)
        out[rel.get("Id")] = (target, rel.get("TargetMode") == "External")
    return out


def _run_markdown(run: ET.Element) -> str:
    """One ``w:r`` → markdown text (bold/italic markers, tabs, breaks)."""
    pieces = []
    for node in run.iter():
        tag = node.tag
        if tag == _W + "t":
            pieces.append(node.text or "")
        elif tag == _W + "tab":
            pieces.append("\t")
        elif tag in (_W + "br", _W + "cr"):
            pieces.append("\n")
    text = "".join(pieces)
    if not text.strip():
        return text
    rpr = run.find(_W + "rPr")
    if rpr is not None:
        def _on(el):
            return el is not None and el.get(_W + "val", "true").lower() not in (
                "0", "false", "none")
        bold = _on(rpr.find(_W + "b"))
        italic = _on(rpr.find(_W + "i"))
        lead = text[: len(text) - len(text.lstrip())]
        trail = text[len(text.rstrip()):]
        core = text.strip()
        if bold and italic:
            core = f"***{core}***"
        elif bold:
            core = f"**{core}**"
        elif italic:
            core = f"*{core}*"
        text = f"{lead}{core}{trail}"
    return text


def _para_text_md(p: ET.Element, rels: dict) -> tuple:
    """(plain_text, markdown_inline) of a paragraph's runs, hyperlinks
    rendered as ``[text](url)`` via the part's relationship map."""
    plain, md = [], []
    for child in p:
        tag = child.tag
        if tag == _W + "r":
            plain.append("".join(
                (n.text or "") if n.tag == _W + "t"
                else "\t" if n.tag == _W + "tab"
                else "\n" if n.tag in (_W + "br", _W + "cr") else ""
                for n in child.iter()))
            md.append(_run_markdown(child))
        elif tag == _W + "hyperlink":
            inner_plain = "".join(t.text or "" for t in child.iter(_W + "t"))
            rid = child.get(_R + "id")
            target = rels.get(rid, ("", False))[0] if rid else ""
            plain.append(inner_plain)
            md.append(f"[{inner_plain}]({target})" if target else inner_plain)
    return "".join(plain), "".join(md)


def _para_style(p: ET.Element) -> Optional[str]:
    st = p.find(f"{_W}pPr/{_W}pStyle")
    return st.get(_W + "val") if st is not None else None


def _is_list_item(p: ET.Element) -> bool:
    return p.find(f"{_W}pPr/{_W}numPr") is not None


def _header_level(style: Optional[str]) -> Optional[int]:
    if style is None:
        return None
    if style == "Title":
        return 1
    m = _HEADING_RE.match(style)
    return int(m.group(1)) if m else None


def _iter_images(p: ET.Element, rels: dict, zf: zipfile.ZipFile):
    """Yield (bytes, media_type, alt_text) for each inline picture."""
    for blip in p.iter(_A + "blip"):
        rid = blip.get(_R + "embed")
        if not rid or rid not in rels:
            continue
        target, external = rels[rid]
        if external:
            continue
        try:
            data = zf.read(target)
        except KeyError:
            continue
        yield data, media_type_for(target), None


def _cell_text(tc: ET.Element, rels: dict) -> str:
    """Cell content = newline-join of its paragraphs' markdown."""
    parts = []
    for p in tc.findall(_W + "p"):
        _, md = _para_text_md(p, rels)
        if md.strip():
            parts.append(md.strip())
    return "\n".join(parts)


def _table_cells(tbl: ET.Element, rels: dict) -> List[List[str]]:
    """Row-major cell matrix with merged cells duplicated across their
    span (gridSpan → copy right, vMerge continue → copy from above),
    padded rectangular."""
    rows: List[List[str]] = []
    for tr in tbl.findall(_W + "tr"):
        row: List[str] = []
        for tc in tr.findall(_W + "tc"):
            tcpr = tc.find(_W + "tcPr")
            span = 1
            vmerge_cont = False
            if tcpr is not None:
                gs = tcpr.find(_W + "gridSpan")
                if gs is not None:
                    span = max(1, int(gs.get(_W + "val", "1")))
                vm = tcpr.find(_W + "vMerge")
                # <w:vMerge/> (no val) or val="continue" continues the
                # merge started above; val="restart" starts a new one.
                if vm is not None and vm.get(_W + "val", "continue") == "continue":
                    vmerge_cont = True
            if vmerge_cont and rows:
                above = rows[-1]
                for k in range(span):
                    col = len(row)
                    row.append(above[col] if col < len(above) else "")
            else:
                text = _cell_text(tc, rels)
                row.extend([text] * span)
        rows.append(row)
    width = max((len(r) for r in rows), default=0)
    return [r + [""] * (width - len(r)) for r in rows]


def _table_markdown(cells: List[List[str]]) -> str:
    """Pipe-table rendering, first row as the header row."""
    def render(row):
        return "| " + " | ".join(
            c.replace("|", "\\|").replace("\n", " ") for c in row) + " |"
    if not cells:
        return "| |"
    lines = [render(cells[0]), "| " + " | ".join("---" for _ in cells[0]) + " |"]
    lines += [render(r) for r in cells[1:]]
    return "\n".join(lines)


class _Ctx:
    def __init__(self, doc_id: str):
        self.doc_id = doc_id
        self.rows: List[dict] = []
        self.seq = 0

    def emit(self, section_path, **kw) -> dict:
        row = element_row(self.doc_id, self.seq, section_path, **kw)
        self.rows.append(row)
        self.seq += 1
        return row


def parse_docx(data: bytes, doc_id: str,
               extract_images: bool = False) -> List[dict]:
    """Parse one .docx byte blob into ``elements`` rows (DFS preorder,
    same schema/contract as :func:`..markdown.parse_markdown`)."""
    if not data:
        raise ValueError("content must be non-empty")
    try:
        zf = zipfile.ZipFile(io.BytesIO(data))
        doc_xml = zf.read("word/document.xml")
    except (zipfile.BadZipFile, KeyError):
        raise ValueError(f"{doc_id}: not a DOCX package (no word/document.xml)")
    rels = _load_rels(zf, "word/document.xml")
    root = ET.fromstring(doc_xml)
    body = root.find(_W + "body")
    if body is None:
        raise ValueError(f"{doc_id}: malformed document.xml (no w:body)")

    ctx = _Ctx(doc_id)
    # Root section wraps the document (MarkdownReader.cs:93-97 convention).
    root_row = ctx.emit([0], elem_type=ELEM_SECTION, markdown="\x00placeholder")
    child = 0
    previous_was_break = False
    body_md: List[str] = []

    def next_path():
        nonlocal child
        p = [0, child]
        child += 1
        return p

    children = list(body)
    i = 0
    while i < len(children):
        el = children[i]
        tag = el.tag
        if tag == _W + "p":
            # A run of consecutive list paragraphs → one section of items.
            if _is_list_item(el):
                j = i
                items = []
                while j < len(children) and children[j].tag == _W + "p" \
                        and _is_list_item(children[j]):
                    plain, md = _para_text_md(children[j], rels)
                    if md.strip():
                        items.append((plain.strip(), md.strip()))
                    j += 1
                if items:
                    sec_path = next_path()
                    sec_md = "\n".join(f"- {md}" for _, md in items)
                    ctx.emit(sec_path, elem_type=ELEM_SECTION, markdown=sec_md)
                    for k, (plain, md) in enumerate(items):
                        ctx.emit(sec_path + [k], elem_type=ELEM_PARAGRAPH,
                                 markdown=md, text=plain)
                    body_md.append(sec_md)
                previous_was_break = False
                i = j
                continue

            plain, md = _para_text_md(el, rels)
            style = _para_style(el)
            level = _header_level(style)
            images = list(_iter_images(el, rels, zf)) if extract_images else []

            if plain.strip() and _BREAK_TEXT_RE.match(plain):
                previous_was_break = True  # break renders nothing
            elif level is not None and md.strip():
                ctx.emit(next_path(), elem_type=ELEM_HEADER,
                         markdown=f"{'#' * level} {md.strip()}",
                         text=plain.strip(), header_level=level)
                body_md.append(f"{'#' * level} {md.strip()}")
                previous_was_break = False
            elif md.strip():
                etype = ELEM_FOOTER if previous_was_break else ELEM_PARAGRAPH
                ctx.emit(next_path(), elem_type=etype,
                         markdown=md.strip(), text=plain.strip())
                body_md.append(md.strip())
                previous_was_break = False
            for img_bytes, mt, alt in images:
                ctx.emit(next_path(), elem_type=ELEM_IMAGE,
                         image_content=img_bytes, image_media_type=mt,
                         image_alt_text=alt)
            i += 1
        elif tag == _W + "tbl":
            cells = _table_cells(el, rels)
            md = _table_markdown(cells)
            ctx.emit(next_path(), elem_type=ELEM_TABLE, markdown=md,
                     table_cells=cells)
            body_md.append(md)
            if extract_images:
                for tc in el.iter(_W + "tc"):
                    for p in tc.findall(_W + "p"):
                        for img_bytes, mt, alt in _iter_images(p, rels, zf):
                            ctx.emit(next_path(), elem_type=ELEM_IMAGE,
                                     image_content=img_bytes,
                                     image_media_type=mt, image_alt_text=alt)
            previous_was_break = False
            i += 1
        else:  # sectPr, bookmarks, sdt wrappers… — no content of their own
            i += 1

    # Real page footers land after the body, one footer element per
    # non-empty footer paragraph (word/footerN.xml via footerReference).
    footer_parts = sorted({
        rels[ref.get(_R + "id")][0]
        for ref in body.iter(_W + "footerReference")
        if ref.get(_R + "id") in rels
    })
    for part in footer_parts:
        try:
            froot = ET.fromstring(zf.read(part))
        except KeyError:
            continue
        frels = _load_rels(zf, part)
        for p in froot.iter(_W + "p"):
            plain, md = _para_text_md(p, frels)
            if md.strip():
                ctx.emit(next_path(), elem_type=ELEM_FOOTER,
                         markdown=md.strip(), text=plain.strip())
                body_md.append(md.strip())

    root_row["markdown"] = "\n\n".join(body_md) or "(empty document)"
    return ctx.rows


def parse_docx_df(df, id_col: str = "doc_id", content_col: str = "content",
                  on_error: str = "fail", extract_images: bool = False):
    """Parse a DataFrame of (id, docx-bytes) into elements rows (shared
    plumbing: :func:`.markdown.elements_map_df`)."""
    from .markdown import elements_map_df

    return elements_map_df(
        df, lambda raw, doc_id: parse_docx(bytes(raw), doc_id,
                                           extract_images=extract_images),
        id_col, content_col, on_error)

def read_docx(spark, path, glob: str = "*.docx", recursive: bool = False,
              on_error: str = "fail", extract_images: bool = False):
    """Distributed .docx directory ingestion: ``binaryFile`` scan →
    :func:`parse_docx_df`. Identifier = file path, matching the reference
    (``IngestionDocumentReader.cs:25-39``)."""
    from .markdown import binary_file_scan

    files = binary_file_scan(spark, path, glob, recursive)
    return parse_docx_df(files, id_col="path", content_col="content",
                         on_error=on_error, extract_images=extract_images)
