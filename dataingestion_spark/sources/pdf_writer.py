"""Minimal PDF writer — classic-xref PDF 1.4 files from plain Python
structures, stdlib only. Fixture twin of :mod:`.docx_writer`: lets tests
and oracle queries generate ``Sample.pdf``-style documents (the
reference's conformance corpus shape,
``DocumentReaderConformanceTests.cs:56-100``) and round-trip them
through :func:`..pdf.parse_pdf`.

``build_pdf(pages)`` — each page is a list of line tuples
``(size, text)`` laid out top-down with 1.4×size leading, or
``("footer", text)`` placed in the bottom margin. Text is Helvetica
(standard-14, WinAnsi), shown with literal strings — exactly the simple
end of the format the reader must handle alongside the CID/ToUnicode
end that real Word PDFs exercise.
"""

from __future__ import annotations

from typing import List, Sequence, Tuple

_PAGE_W, _PAGE_H = 612, 792  # US Letter
_TOP_Y = 720.0
_FOOTER_Y = 40.0
_MARGIN_X = 72


def _esc(text: str) -> bytes:
    out = text.encode("cp1252", "replace")
    return out.replace(b"\\", b"\\\\").replace(b"(", b"\\(").replace(b")", b"\\)")


def _page_stream(lines: Sequence[Tuple]) -> bytes:
    ops = [b"BT"]
    y = _TOP_Y
    for line in lines:
        if line[0] == "footer":
            ops.append(b"/F1 10 Tf")
            ops.append(b"1 0 0 1 %d %s Tm" % (_MARGIN_X, b"%.1f" % _FOOTER_Y))
            ops.append(b"(" + _esc(line[1]) + b") Tj")
            continue
        size, text = float(line[0]), line[1]
        y -= size * 1.4
        ops.append(b"/F1 %s Tf" % (b"%.1f" % size))
        ops.append(b"1 0 0 1 %d %s Tm" % (_MARGIN_X, b"%.1f" % y))
        ops.append(b"(" + _esc(text) + b") Tj")
        y -= size * 0.4
    ops.append(b"ET")
    return b"\n".join(ops)


def build_pdf(pages: Sequence[Sequence[Tuple]]) -> bytes:
    """Assemble a PDF (bytes): ``pages`` is a list of per-page line lists
    (see module docstring)."""
    objects: List[bytes] = []

    def add(body: bytes) -> int:
        objects.append(body)
        return len(objects)

    font = add(b"<< /Type /Font /Subtype /Type1 /BaseFont /Helvetica "
               b"/Encoding /WinAnsiEncoding >>")
    page_ids = []
    content_ids = []
    for lines in pages:
        stream = _page_stream(lines)
        cid = add(b"<< /Length %d >>\nstream\n%s\nendstream"
                  % (len(stream), stream))
        content_ids.append(cid)
        page_ids.append(None)  # placeholder, filled after Pages id known
    pages_id = len(objects) + len(pages) + 1
    for k, lines in enumerate(pages):
        page_ids[k] = add(
            b"<< /Type /Page /Parent %d 0 R /MediaBox [0 0 %d %d] "
            b"/Resources << /Font << /F1 %d 0 R >> >> /Contents %d 0 R >>"
            % (pages_id, _PAGE_W, _PAGE_H, font, content_ids[k]))
    kids = b" ".join(b"%d 0 R" % p for p in page_ids)
    assert add(b"<< /Type /Pages /Kids [%s] /Count %d >>"
               % (kids, len(pages))) == pages_id
    catalog = add(b"<< /Type /Catalog /Pages %d 0 R >>" % pages_id)

    out = bytearray(b"%PDF-1.4\n%\xc2\xb5\xc2\xb5\n")
    offsets = [0]
    for num, body in enumerate(objects, start=1):
        offsets.append(len(out))
        out += b"%d 0 obj\n" % num + body + b"\nendobj\n"
    xref_at = len(out)
    out += b"xref\n0 %d\n" % (len(objects) + 1)
    out += b"0000000000 65535 f \n"
    for off in offsets[1:]:
        out += b"%010d 00000 n \n" % off
    out += (b"trailer\n<< /Size %d /Root %d 0 R >>\nstartxref\n%d\n%%%%EOF\n"
            % (len(objects) + 1, catalog, xref_at))
    return bytes(out)


def sample_pdf_bytes() -> bytes:
    """Repo-generated equivalent of the reference's ``Sample.pdf``: one
    page with a title, section headings, paragraphs, and a bottom-margin
    footer."""
    return build_pdf([[
        (24, "Project Overview Sample Document"),
        (12, "For General Internal Use"),
        (18, "Executive Summary"),
        (11, "This document outlines the Green Horizons Initiative, a"),
        (11, "company-wide project aimed at advancing sustainability."),
        (18, "Key Milestones"),
        (11, "Environmental Audit is planned for Mar 2025."),
        (18, "Summary & Next Steps"),
        (11, "The initiative's success depends on continued commitment."),
        ("footer", "Green Horizons Initiative (c) 2025"),
    ]])
