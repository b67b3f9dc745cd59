"""Native PPTX → ``elements`` DataFrame reader (stdlib zip+XML).

Presentations reach the reference through markitdown (pptx entries in
the MIME map, ``IngestionDocumentReader.cs:80-171``); this module reads
PresentationML directly:

* ``ppt/presentation.xml`` → slide order (``p:sldIdLst`` rIds resolved
  through ``ppt/_rels/presentation.xml.rels``);
* each slide → one SECTION carrying ``page_number`` — the same
  page-section shape the PDF and LlamaParse readers produce;
* shape text: a placeholder of type ``title``/``ctrTitle`` → header
  level 1, ``subTitle`` → header level 2, everything else → one
  paragraph per ``a:p`` (runs concatenated; bold/italic run properties
  render ``**``/``*`` markdown);
* graphic-frame tables (``a:tbl``) → table elements, first row =
  header, ``gridSpan``/``rowSpan`` merges duplicated like every other
  table mapping in this package;
* pictures (``p:pic`` → ``a:blip`` → ``ppt/media/*``) → image elements
  with bytes + media type when ``extract_images=True``.

Spark entry point :func:`read_pptx` = distributed ``binaryFile`` scan +
``mapInPandas``.
"""

from __future__ import annotations

import io
import zipfile
from typing import List
from xml.etree import ElementTree as ET

from ..model import (
    ELEM_HEADER,
    ELEM_IMAGE,
    ELEM_PARAGRAPH,
    ELEM_SECTION,
    ELEM_TABLE,
    element_row,
)
from .docx import _load_rels, _table_markdown
from .media_types import media_type_for

_P = "{http://schemas.openxmlformats.org/presentationml/2006/main}"
_A = "{http://schemas.openxmlformats.org/drawingml/2006/main}"
_R = "{http://schemas.openxmlformats.org/officeDocument/2006/relationships}"

_TITLE_TYPES = {"title", "ctrTitle"}


def _para_md(p: ET.Element) -> tuple:
    """(plain, markdown) of one ``a:p`` — runs and line breaks in
    document order (``a:br`` → newline, so broken lines don't fuse)."""
    plain, md = [], []
    for node in p:
        if node.tag == _A + "br":
            plain.append("\n")
            md.append("\n")
            continue
        if node.tag != _A + "r":
            continue
        t = node.find(_A + "t")
        text = t.text or "" if t is not None else ""
        if not text:
            continue
        plain.append(text)
        rpr = node.find(_A + "rPr")
        bold = rpr is not None and rpr.get("b") == "1"
        italic = rpr is not None and rpr.get("i") == "1"
        core = text.strip()
        if core and bold and italic:
            text = text.replace(core, f"***{core}***", 1)
        elif core and bold:
            text = text.replace(core, f"**{core}**", 1)
        elif core and italic:
            text = text.replace(core, f"*{core}*", 1)
        md.append(text)
    return "".join(plain).strip(), "".join(md).strip()


def _shape_ph_type(sp: ET.Element) -> str:
    ph = sp.find(f"{_P}nvSpPr/{_P}nvPr/{_P}ph")
    return ph.get("type", "body") if ph is not None else ""


def _tbl_cells(tbl: ET.Element) -> List[List[str]]:
    rows: List[List[str]] = []
    for tr in tbl.findall(_A + "tr"):
        row: List[str] = []
        for tc in tr.findall(_A + "tc"):
            if tc.get("hMerge") == "1":
                # covered continuation of a gridSpan to its left — the
                # span origin already extended the row; emitting these
                # too would double-count the merge and shift later cells
                continue
            if tc.get("vMerge") == "1":
                above = rows[-1] if rows else []
                col = len(row)
                row.append(above[col] if col < len(above) else "")
                continue
            span = int(tc.get("gridSpan", "1"))
            paras = [md for _, md in (_para_md(p) for p in tc.iter(_A + "p")) if md]
            text = "\n".join(paras)
            row.extend([text] * max(1, span))
        rows.append(row)
    width = max((len(r) for r in rows), default=0)
    return [r + [""] * (width - len(r)) for r in rows]


def parse_pptx(data: bytes, doc_id: str,
               extract_images: bool = False) -> List[dict]:
    """Parse one .pptx byte blob into elements rows (slide = numbered
    section; titles → headers; body text → paragraphs; tables; images)."""
    if not data:
        raise ValueError("content must be non-empty")
    try:
        zf = zipfile.ZipFile(io.BytesIO(data))
        pres = ET.fromstring(zf.read("ppt/presentation.xml"))
    except (zipfile.BadZipFile, KeyError):
        raise ValueError(f"{doc_id}: not a PPTX package (no ppt/presentation.xml)")
    rels = _load_rels(zf, "ppt/presentation.xml")
    slide_parts = []
    sld_lst = pres.find(_P + "sldIdLst")
    for sld in (sld_lst.findall(_P + "sldId") if sld_lst is not None else []):
        rid = sld.get(_R + "id")
        if rid and rid in rels:
            slide_parts.append(rels[rid][0])

    rows: List[dict] = []
    seq = [0]

    def emit(path, **kw):
        rows.append(element_row(doc_id, seq[0], path, **kw))
        seq[0] += 1
        return rows[-1]

    root_row = emit([0], elem_type=ELEM_SECTION, markdown="\x00")
    body_md: List[str] = []
    for pi, part in enumerate(slide_parts):
        try:
            slide = ET.fromstring(zf.read(part))
        except KeyError:
            continue
        srels = _load_rels(zf, part)
        page_no = pi + 1
        blocks: List[tuple] = []  # (kind, payload...)
        tree = slide.find(f"{_P}cSld/{_P}spTree")
        for node in (list(tree) if tree is not None else []):
            tag = node.tag
            if tag == _P + "sp":
                ph = _shape_ph_type(node)
                paras = [(_para_md(p)) for p in node.iter(_A + "p")]
                paras = [(t, m) for t, m in paras if m]
                if not paras:
                    continue
                if ph in _TITLE_TYPES:
                    blocks.append(("header", 1, paras[0]))
                    blocks.extend(("para", None, pr) for pr in paras[1:])
                elif ph == "subTitle":
                    blocks.append(("header", 2, paras[0]))
                    blocks.extend(("para", None, pr) for pr in paras[1:])
                else:
                    blocks.extend(("para", None, pr) for pr in paras)
            elif tag == _P + "graphicFrame":
                for tbl in node.iter(_A + "tbl"):
                    blocks.append(("table", None, _tbl_cells(tbl)))
            elif tag == _P + "pic" and extract_images:
                blip = node.find(f"{_P}blipFill/{_A}blip")
                rid = blip.get(_R + "embed") if blip is not None else None
                if rid and rid in srels:
                    target, external = srels[rid]
                    if not external:
                        try:
                            img = zf.read(target)
                        except KeyError:
                            continue
                        blocks.append(("image", media_type_for(target), img))

        slide_md = []
        for kind, extra, payload in blocks:
            if kind == "header":
                slide_md.append(f"{'#' * extra} {payload[1]}")
            elif kind == "para":
                slide_md.append(payload[1])
            elif kind == "table":
                slide_md.append(_table_markdown(payload))
        emit([0, pi], elem_type=ELEM_SECTION,
             markdown="\n\n".join(slide_md) or f"(slide {page_no})",
             page_number=page_no)
        for k, (kind, extra, payload) in enumerate(blocks):
            path = [0, pi, k]
            if kind == "header":
                emit(path, elem_type=ELEM_HEADER,
                     markdown=f"{'#' * extra} {payload[1]}", text=payload[0],
                     header_level=extra, page_number=page_no)
            elif kind == "para":
                emit(path, elem_type=ELEM_PARAGRAPH, markdown=payload[1],
                     text=payload[0], page_number=page_no)
            elif kind == "table":
                emit(path, elem_type=ELEM_TABLE,
                     markdown=_table_markdown(payload), table_cells=payload,
                     page_number=page_no)
            elif kind == "image":
                emit(path, elem_type=ELEM_IMAGE, image_content=payload,
                     image_media_type=extra, page_number=page_no)
        body_md.extend(slide_md)
    root_row["markdown"] = "\n\n".join(body_md) or "(empty presentation)"
    return rows


def parse_pptx_df(df, id_col: str = "doc_id", content_col: str = "content",
                  on_error: str = "fail", extract_images: bool = False):
    """mapInPandas wrapper (shared plumbing: elements_map_df)."""
    from .markdown import elements_map_df

    return elements_map_df(
        df, lambda raw, doc_id: parse_pptx(bytes(raw), doc_id,
                                           extract_images=extract_images),
        id_col, content_col, on_error)

def read_pptx(spark, path, glob: str = "*.pptx", recursive: bool = False,
              on_error: str = "fail", extract_images: bool = False):
    from .markdown import binary_file_scan

    files = binary_file_scan(spark, path, glob, recursive)
    return parse_pptx_df(files, id_col="path", content_col="content",
                         on_error=on_error, extract_images=extract_images)


# -- fixture writer ----------------------------------------------------------

def build_pptx(slides: List[dict]) -> bytes:
    """Minimal PresentationML writer for fixtures: each slide dict may
    carry ``title``, ``subtitle``, ``bullets`` (list of str), ``table``
    (row-major cells), ``image`` (png bytes)."""
    from xml.sax.saxutils import escape

    ns = ('xmlns:p="http://schemas.openxmlformats.org/presentationml/2006/main" '
          'xmlns:a="http://schemas.openxmlformats.org/drawingml/2006/main" '
          'xmlns:r="http://schemas.openxmlformats.org/officeDocument/2006/relationships"')

    def sp(ph_type, texts):
        ph = f'<p:ph type="{ph_type}"/>' if ph_type else "<p:ph/>"
        paras = "".join(
            f"<a:p><a:r><a:t>{escape(t)}</a:t></a:r></a:p>" for t in texts)
        return (f"<p:sp><p:nvSpPr><p:cNvPr id='1' name='s'/><p:cNvSpPr/>"
                f"<p:nvPr>{ph}</p:nvPr></p:nvSpPr><p:spPr/>"
                f"<p:txBody><a:bodyPr/>{paras}</p:txBody></p:sp>")

    def tbl(cells):
        trs = []
        for row in cells:
            tcs = "".join(
                f"<a:tc><a:txBody><a:bodyPr/><a:p><a:r><a:t>{escape(str(c))}"
                f"</a:t></a:r></a:p></a:txBody></a:tc>" for c in row)
            trs.append(f"<a:tr h='370840'>{tcs}</a:tr>")
        grid = "".join("<a:gridCol w='2032000'/>" for _ in cells[0])
        return (f"<p:graphicFrame><p:nvGraphicFramePr><p:cNvPr id='2' name='t'/>"
                f"<p:cNvGraphicFramePr/><p:nvPr/></p:nvGraphicFramePr>"
                f"<p:xfrm><a:off x='0' y='0'/><a:ext cx='1' cy='1'/></p:xfrm>"
                f"<a:graphic><a:graphicData uri='http://schemas.openxmlformats.org/drawingml/2006/table'>"
                f"<a:tbl><a:tblGrid>{grid}</a:tblGrid>{''.join(trs)}</a:tbl>"
                f"</a:graphicData></a:graphic></p:graphicFrame>")

    def pic(rid):
        return (f"<p:pic><p:nvPicPr><p:cNvPr id='3' name='p'/><p:cNvPicPr/>"
                f"<p:nvPr/></p:nvPicPr><p:blipFill><a:blip r:embed='{rid}'/>"
                f"</p:blipFill><p:spPr/></p:pic>")

    slide_xmls, slide_rels, media = [], [], []
    for s in slides:
        shapes = []
        rels = []
        if "title" in s:
            shapes.append(sp("title", [s["title"]]))
        if "subtitle" in s:
            shapes.append(sp("subTitle", [s["subtitle"]]))
        if s.get("bullets"):
            shapes.append(sp("", s["bullets"]))
        if s.get("table"):
            shapes.append(tbl(s["table"]))
        if s.get("image") is not None:
            media.append(s["image"])
            rid = f"rId{100 + len(media)}"
            rels.append(
                f'<Relationship Id="{rid}" '
                f'Type="http://schemas.openxmlformats.org/officeDocument/2006/relationships/image" '
                f'Target="../media/image{len(media)}.png"/>')
            shapes.append(pic(rid))
        slide_xmls.append(
            '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
            f"<p:sld {ns}><p:cSld><p:spTree>"
            f"<p:nvGrpSpPr><p:cNvPr id='0' name=''/><p:cNvGrpSpPr/><p:nvPr/></p:nvGrpSpPr><p:grpSpPr/>"
            f"{''.join(shapes)}</p:spTree></p:cSld></p:sld>")
        slide_rels.append(
            '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
            '<Relationships xmlns="http://schemas.openxmlformats.org/package/2006/relationships">'
            + "".join(rels) + "</Relationships>")

    n = len(slides)
    sld_ids = "".join(
        f'<p:sldId id="{256 + i}" r:id="rId{i + 1}"/>' for i in range(n))
    presentation = (
        '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
        f"<p:presentation {ns}><p:sldIdLst>{sld_ids}</p:sldIdLst></p:presentation>")
    pres_rels = (
        '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
        '<Relationships xmlns="http://schemas.openxmlformats.org/package/2006/relationships">'
        + "".join(
            f'<Relationship Id="rId{i + 1}" '
            f'Type="http://schemas.openxmlformats.org/officeDocument/2006/relationships/slide" '
            f'Target="slides/slide{i + 1}.xml"/>' for i in range(n))
        + "</Relationships>")
    content_types = (
        '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
        '<Types xmlns="http://schemas.openxmlformats.org/package/2006/content-types">'
        '<Default Extension="rels" ContentType="application/vnd.openxmlformats-package.relationships+xml"/>'
        '<Default Extension="xml" ContentType="application/xml"/>'
        '<Default Extension="png" ContentType="image/png"/>'
        '<Override PartName="/ppt/presentation.xml" ContentType="application/vnd.openxmlformats-officedocument.presentationml.presentation.main+xml"/>'
        + "".join(
            f'<Override PartName="/ppt/slides/slide{i + 1}.xml" '
            f'ContentType="application/vnd.openxmlformats-officedocument.presentationml.slide+xml"/>'
            for i in range(n))
        + "</Types>")
    root_rels = (
        '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
        '<Relationships xmlns="http://schemas.openxmlformats.org/package/2006/relationships">'
        '<Relationship Id="rId1" '
        'Type="http://schemas.openxmlformats.org/officeDocument/2006/relationships/officeDocument" '
        'Target="ppt/presentation.xml"/></Relationships>')

    buf = io.BytesIO()
    with zipfile.ZipFile(buf, "w", zipfile.ZIP_DEFLATED) as zf:
        zf.writestr("[Content_Types].xml", content_types)
        zf.writestr("_rels/.rels", root_rels)
        zf.writestr("ppt/presentation.xml", presentation)
        zf.writestr("ppt/_rels/presentation.xml.rels", pres_rels)
        for i, xml in enumerate(slide_xmls):
            zf.writestr(f"ppt/slides/slide{i + 1}.xml", xml)
            zf.writestr(f"ppt/slides/_rels/slide{i + 1}.xml.rels", slide_rels[i])
        for i, data in enumerate(media, start=1):
            zf.writestr(f"ppt/media/image{i}.png", data)
    return buf.getvalue()
