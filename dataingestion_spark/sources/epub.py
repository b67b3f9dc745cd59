"""Native EPUB → ``elements`` DataFrame reader (stdlib only).

EPUB is in the reference's ingestion scope (``.epub`` in the MIME map,
``IngestionDocumentReader.cs:127``). An EPUB is a zip container:
``META-INF/container.xml`` names the OPF package document, whose
``<manifest>`` + ``<spine>`` give the reading-order list of XHTML
chapters — each chapter here becomes a SECTION carrying its 1-based
spine position as ``page_number`` (the page-section shape of the
PDF/PPTX readers) and is parsed by the same block collector as
:mod:`.html_reader`, so headings/paragraphs/lists/tables/images inside
chapters map identically to standalone HTML.

Spark entry point :func:`read_epub` = distributed ``binaryFile`` scan +
``mapInPandas``.
"""

from __future__ import annotations

import io
import posixpath
import zipfile
from typing import List
from xml.etree import ElementTree as ET

from ..model import ELEM_SECTION, ELEMENTS_SCHEMA, element_row
from .html_reader import parse_html

_CNT = "{urn:oasis:names:tc:opendocument:xmlns:container}"
_OPF = "{http://www.idpf.org/2007/opf}"


def _chapter_parts(zf: zipfile.ZipFile) -> List[str]:
    """Reading-order XHTML part names from container → OPF → spine."""
    container = ET.fromstring(zf.read("META-INF/container.xml"))
    rootfile = container.find(f"{_CNT}rootfiles/{_CNT}rootfile")
    if rootfile is None:
        raise ValueError("no rootfile in META-INF/container.xml")
    opf_path = rootfile.get("full-path")
    opf = ET.fromstring(zf.read(opf_path))
    base = posixpath.dirname(opf_path)
    items = {}
    manifest = opf.find(_OPF + "manifest")
    for item in (manifest.findall(_OPF + "item") if manifest is not None else []):
        items[item.get("id")] = (item.get("href"), item.get("media-type", ""))
    out = []
    spine = opf.find(_OPF + "spine")
    for ref in (spine.findall(_OPF + "itemref") if spine is not None else []):
        href, mt = items.get(ref.get("idref"), (None, ""))
        if href and ("html" in mt or href.endswith((".xhtml", ".html", ".htm"))):
            out.append(posixpath.normpath(
                f"{base}/{href}" if base else href))
    return out


def parse_epub(data: bytes, doc_id: str,
               extract_images: bool = False) -> List[dict]:
    """Parse one .epub byte blob: root section, one section per spine
    chapter (``page_number`` = spine position), chapter content via the
    HTML block collector."""
    if not data:
        raise ValueError("content must be non-empty")
    try:
        zf = zipfile.ZipFile(io.BytesIO(data))
        chapters = _chapter_parts(zf)
    except (zipfile.BadZipFile, KeyError) as exc:
        raise ValueError(f"{doc_id}: not an EPUB container ({exc})")

    rows: List[dict] = []
    seq = [0]

    def emit(path, **kw):
        rows.append(element_row(doc_id, seq[0], path, **kw))
        seq[0] += 1
        return rows[-1]

    root_row = emit([0], elem_type=ELEM_SECTION, markdown="\x00")
    body_md: List[str] = []
    for ci, part in enumerate(chapters):
        try:
            html = zf.read(part)
        except KeyError:
            continue
        try:
            chapter_rows = parse_html(html, doc_id,
                                      extract_images=extract_images)
        except ValueError:
            continue  # empty chapter file
        # chapter_rows[0] is the chapter's own root section — reuse its
        # aggregated markdown for the chapter section row
        chap_md = chapter_rows[0]["markdown"]
        emit([0, ci], elem_type=ELEM_SECTION, markdown=chap_md,
             page_number=ci + 1, metadata={"chapter": part})
        for r in chapter_rows[1:]:
            r = dict(r)
            r["seq"] = seq[0]
            r["section_path"] = [0, ci] + r["section_path"][1:]
            r["page_number"] = ci + 1
            rows.append(r)
            seq[0] += 1
        body_md.append(chap_md)
    root_row["markdown"] = "\n\n".join(body_md) or "(empty epub)"
    return rows


def parse_epub_df(df, id_col: str = "doc_id", content_col: str = "content",
                  on_error: str = "fail", extract_images: bool = False):
    """mapInPandas wrapper (shared plumbing: elements_map_df)."""
    from .markdown import elements_map_df

    return elements_map_df(
        df, lambda raw, doc_id: parse_epub(bytes(raw), doc_id,
                                           extract_images=extract_images),
        id_col, content_col, on_error)

def read_epub(spark, path, glob: str = "*.epub", recursive: bool = False,
              on_error: str = "fail", extract_images: bool = False):
    from .markdown import binary_file_scan

    files = binary_file_scan(spark, path, glob, recursive)
    return parse_epub_df(files, id_col="path", content_col="content",
                         on_error=on_error, extract_images=extract_images)


# -- fixture writer ----------------------------------------------------------

def build_epub(chapters: List[tuple]) -> bytes:
    """Minimal EPUB writer for fixtures: ``chapters`` is a list of
    (title, html_body) pairs written in spine order."""
    opf_items = "".join(
        f'<item id="c{i}" href="chap{i}.xhtml" '
        f'media-type="application/xhtml+xml"/>'
        for i in range(len(chapters)))
    spine = "".join(f'<itemref idref="c{i}"/>' for i in range(len(chapters)))
    opf = (
        '<?xml version="1.0" encoding="UTF-8"?>'
        '<package xmlns="http://www.idpf.org/2007/opf" version="3.0" '
        'unique-identifier="id"><metadata '
        'xmlns:dc="http://purl.org/dc/elements/1.1/">'
        '<dc:identifier id="id">fixture</dc:identifier>'
        "</metadata>"
        f"<manifest>{opf_items}</manifest><spine>{spine}</spine></package>")
    container = (
        '<?xml version="1.0" encoding="UTF-8"?>'
        '<container version="1.0" '
        'xmlns="urn:oasis:names:tc:opendocument:xmlns:container">'
        '<rootfiles><rootfile full-path="OEBPS/content.opf" '
        'media-type="application/oebps-package+xml"/></rootfiles></container>')

    buf = io.BytesIO()
    with zipfile.ZipFile(buf, "w", zipfile.ZIP_DEFLATED) as zf:
        zf.writestr("mimetype", "application/epub+zip")
        zf.writestr("META-INF/container.xml", container)
        zf.writestr("OEBPS/content.opf", opf)
        for i, (title, body) in enumerate(chapters):
            zf.writestr(
                f"OEBPS/chap{i}.xhtml",
                f"<html><head><title>{title}</title></head>"
                f"<body>{body}</body></html>")
    return buf.getvalue()
