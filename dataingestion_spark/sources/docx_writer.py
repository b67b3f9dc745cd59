"""Minimal DOCX writer — build WordprocessingML packages from plain
Python structures with stdlib ``zipfile`` only.

Exists so the repo can generate its own ``Sample.docx``-style fixtures
(the reference pins its office-reader conformance goldens to a
one-page Word document with Title/Heading styles, a 5×4 table, and a
footer — ``test/.../Readers/DocumentReaderConformanceTests.cs:56-100``)
without shipping any binary fixture, and so tests can round-trip
``build_docx`` → :func:`..docx.parse_docx`.

Block forms accepted by :func:`build_docx`:

* ``("title", text)`` / ``("subtitle", text)`` / ``("h1"… "h9", text)``
  — styled paragraphs;
* ``("p", text)`` — body paragraph; ``("p", text, {"bold": True})`` /
  ``{"italic": True}`` style the whole paragraph's run;
* ``("break",)`` — a dashes-only paragraph (Word documents fake rules
  this way; readers treat it as a thematic break);
* ``("list", [item, …])`` — numbered-list paragraphs (``w:numPr``);
* ``("table", [[cell, …], …])`` — first row = header row; a cell may
  be ``(text, colspan)`` to emit ``w:gridSpan``, or the sentinel
  ``VMERGE`` to continue the vertical merge from the row above;
* ``("image", png_bytes)`` — an inline picture stored under
  ``word/media/`` and referenced through a relationship.

A ``footer`` string adds a real ``word/footer1.xml`` part wired through
``w:footerReference``.
"""

from __future__ import annotations

import io
import zipfile
from typing import List, Optional, Sequence
from xml.sax.saxutils import escape

#: sentinel cell value: continue the vertical merge from the row above
VMERGE = object()

_W_NS = ('xmlns:w="http://schemas.openxmlformats.org/wordprocessingml/2006/main" '
         'xmlns:r="http://schemas.openxmlformats.org/officeDocument/2006/relationships" '
         'xmlns:wp="http://schemas.openxmlformats.org/drawingml/2006/wordprocessingDrawing" '
         'xmlns:a="http://schemas.openxmlformats.org/drawingml/2006/main" '
         'xmlns:pic="http://schemas.openxmlformats.org/drawingml/2006/picture"')


def _run(text: str, bold: bool = False, italic: bool = False) -> str:
    rpr = ""
    if bold or italic:
        rpr = "<w:rPr>" + ("<w:b/>" if bold else "") + \
            ("<w:i/>" if italic else "") + "</w:rPr>"
    return (f'<w:r>{rpr}<w:t xml:space="preserve">{escape(text)}</w:t></w:r>')


def _para(text: str, style: Optional[str] = None, numbered: bool = False,
          bold: bool = False, italic: bool = False) -> str:
    ppr = ""
    if style or numbered:
        num = ('<w:numPr><w:ilvl w:val="0"/><w:numId w:val="1"/></w:numPr>'
               if numbered else "")
        st = f'<w:pStyle w:val="{style}"/>' if style else ""
        ppr = f"<w:pPr>{st}{num}</w:pPr>"
    return f"<w:p>{ppr}{_run(text, bold, italic)}</w:p>"


def _table(rows: Sequence[Sequence]) -> str:
    out = ["<w:tbl><w:tblPr><w:tblStyle w:val='TableGrid'/></w:tblPr>"]
    for row in rows:
        out.append("<w:tr>")
        for cell in row:
            if cell is VMERGE:
                out.append("<w:tc><w:tcPr><w:vMerge/></w:tcPr><w:p/></w:tc>")
                continue
            if isinstance(cell, tuple):
                text, span = cell
                tcpr = f'<w:tcPr><w:gridSpan w:val="{span}"/></w:tcPr>'
            else:
                text, tcpr = cell, "<w:tcPr></w:tcPr>"
            out.append(f"<w:tc>{tcpr}<w:p>{_run(str(text))}</w:p></w:tc>")
        out.append("</w:tr>")
    out.append("</w:tbl>")
    return "".join(out)


def _image(rid: str, idx: int) -> str:
    # Minimal inline drawing: just enough structure (a:blip r:embed) for
    # readers that resolve the picture through the relationship part.
    return (
        f"<w:p><w:r><w:drawing><wp:inline>"
        f"<wp:extent cx='914400' cy='914400'/>"
        f"<a:graphic><a:graphicData uri='http://schemas.openxmlformats.org/drawingml/2006/picture'>"
        f"<pic:pic><pic:blipFill><a:blip r:embed='{rid}'/></pic:blipFill></pic:pic>"
        f"</a:graphicData></a:graphic></wp:inline></w:drawing></w:r></w:p>"
    )


def build_docx(blocks: Sequence[tuple], footer: Optional[str] = None) -> bytes:
    """Assemble a .docx package (bytes) from the block list (see module
    docstring for the accepted forms)."""
    body: List[str] = []
    media: List[bytes] = []
    rels: List[str] = []
    rid_n = 10  # leave low ids free for the footer relationship

    for block in blocks:
        kind = block[0]
        if kind == "title":
            body.append(_para(block[1], style="Title"))
        elif kind == "subtitle":
            body.append(_para(block[1], style="Subtitle"))
        elif kind in ("h1", "h2", "h3", "h4", "h5", "h6", "h7", "h8", "h9"):
            body.append(_para(block[1], style=f"Heading{kind[1]}"))
        elif kind == "p":
            opts = block[2] if len(block) > 2 else {}
            body.append(_para(block[1], bold=opts.get("bold", False),
                              italic=opts.get("italic", False)))
        elif kind == "break":
            body.append(_para("-" * 39))
        elif kind == "list":
            body.extend(_para(item, numbered=True) for item in block[1])
        elif kind == "table":
            body.append(_table(block[1]))
        elif kind == "image":
            rid_n += 1
            rid = f"rId{rid_n}"
            idx = len(media) + 1
            media.append(block[1])
            rels.append(
                f'<Relationship Id="{rid}" '
                f'Type="http://schemas.openxmlformats.org/officeDocument/2006/relationships/image" '
                f'Target="media/image{idx}.png"/>')
            body.append(_image(rid, idx))
        else:
            raise ValueError(f"unknown block kind {kind!r}")

    sect = ""
    footer_parts = {}
    if footer is not None:
        rels.append(
            '<Relationship Id="rId1" '
            'Type="http://schemas.openxmlformats.org/officeDocument/2006/relationships/footer" '
            'Target="footer1.xml"/>')
        sect = ('<w:sectPr><w:footerReference w:type="default" r:id="rId1"/>'
                "</w:sectPr>")
        footer_parts["word/footer1.xml"] = (
            f'<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
            f"<w:ftr {_W_NS}>{_para(footer)}</w:ftr>")

    document = (
        '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
        f"<w:document {_W_NS}><w:body>{''.join(body)}{sect}</w:body></w:document>"
    )
    content_types = (
        '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
        '<Types xmlns="http://schemas.openxmlformats.org/package/2006/content-types">'
        '<Default Extension="rels" ContentType="application/vnd.openxmlformats-package.relationships+xml"/>'
        '<Default Extension="xml" ContentType="application/xml"/>'
        '<Default Extension="png" ContentType="image/png"/>'
        '<Override PartName="/word/document.xml" ContentType="application/vnd.openxmlformats-officedocument.wordprocessingml.document.main+xml"/>'
        + ('<Override PartName="/word/footer1.xml" ContentType="application/vnd.openxmlformats-officedocument.wordprocessingml.footer+xml"/>'
           if footer is not None else "")
        + "</Types>")
    root_rels = (
        '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
        '<Relationships xmlns="http://schemas.openxmlformats.org/package/2006/relationships">'
        '<Relationship Id="rId1" '
        'Type="http://schemas.openxmlformats.org/officeDocument/2006/relationships/officeDocument" '
        'Target="word/document.xml"/></Relationships>')
    doc_rels = (
        '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
        '<Relationships xmlns="http://schemas.openxmlformats.org/package/2006/relationships">'
        + "".join(rels) + "</Relationships>")

    buf = io.BytesIO()
    with zipfile.ZipFile(buf, "w", zipfile.ZIP_DEFLATED) as zf:
        zf.writestr("[Content_Types].xml", content_types)
        zf.writestr("_rels/.rels", root_rels)
        zf.writestr("word/document.xml", document)
        if rels:
            zf.writestr("word/_rels/document.xml.rels", doc_rels)
        for name, xml in footer_parts.items():
            zf.writestr(name, xml)
        for idx, data in enumerate(media, start=1):
            zf.writestr(f"word/media/image{idx}.png", data)
    return buf.getvalue()


#: the reference conformance table golden, 5×4
#: (DocumentReaderConformanceTests.cs:90-97)
SAMPLE_TABLE = [
    ["Milestone", "Target Date", "Department", "Indicator"],
    ["Environmental Audit", "Mar 2025", "Environmental", "Audit Complete"],
    ["Renewable Energy Launch", "Jul 2025", "Facilities", "Install Operational"],
    ["Staff Workshop", "Sep 2025", "HR", "Workshop Held"],
    ["Emissions Review", "Dec 2029", "All", "25% Emissions Cut"],
]


def sample_docx_bytes() -> bytes:
    """A repo-generated equivalent of the reference's ``Sample.docx``
    fixture (one page: title, headings, paragraphs, the 5×4 milestone
    table, a dashes rule followed by a footer line — the same shape the
    conformance suite pins, ``DocumentReaderConformanceTests.cs:60-100``)."""
    return build_docx([
        ("title", "Project Overview Sample Document"),
        ("subtitle", "For General Internal Use"),
        ("h1", "Executive Summary"),
        ("p", "This document outlines the Green Horizons Initiative, a "
              "company-wide project aimed at advancing sustainability and "
              "reducing environmental impact."),
        ("h1", "Key Milestones"),
        ("table", SAMPLE_TABLE),
        ("h1", "Summary & Next Steps"),
        ("p", "The initiative's success depends on cross-departmental "
              "effort and continued commitment."),
        ("break",),
        ("p", "Green Horizons Initiative (c) 2025"),
    ])
