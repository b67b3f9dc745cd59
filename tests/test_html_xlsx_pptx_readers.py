"""Native HTML/XLSX/PPTX readers (sources/html_reader.py, xlsx.py,
pptx.py) — repo-generated fixtures, same element-model contract as the
DOCX/PDF readers."""

import pytest

from dataingestion_spark.sources.html_reader import parse_html, read_html
from dataingestion_spark.sources.pptx import build_pptx, parse_pptx, read_pptx
from dataingestion_spark.sources.xlsx import build_xlsx, parse_xlsx, read_xlsx

HTML = """<!DOCTYPE html><html><head><title>T</title><style>p{c:1}</style>
<script>x()</script></head><body>
<h1>Main Title</h1>
<p>First <strong>bold</strong> and <em>it</em> and <a href="http://e.com">link</a>.</p>
<h2>Two</h2>
<ul><li>alpha</li><li>beta</li></ul>
<blockquote><p>quoted</p></blockquote>
<table><tr><th>H1</th><th colspan="2">H2</th></tr>
<tr><td rowspan="2">a</td><td>b</td><td>c</td></tr><tr><td>d</td><td>e</td></tr></table>
<img src="data:image/png;base64,iVBORw0KGgo=" alt="tiny">
<footer><p>footer text</p></footer>
</body></html>"""


def test_html_structure_and_inline_markdown():
    rows = parse_html(HTML, "t.html", extract_images=True)
    types = [r["elem_type"] for r in rows]
    assert types.count("header") == 2 and "footer" in types
    p = next(r for r in rows if r["elem_type"] == "paragraph" and "bold" in r["markdown"])
    assert p["markdown"] == "First **bold** and *it* and [link](http://e.com)."
    assert p["text"] == "First bold and it and link."
    t = next(r for r in rows if r["elem_type"] == "table")
    assert t["table_cells"] == [["H1", "H2", "H2"], ["a", "b", "c"], ["a", "d", "e"]]
    img = next(r for r in rows if r["elem_type"] == "image")
    assert img["image_media_type"] == "image/png" and img["image_content"]
    assert img["image_alt_text"] == "tiny"
    # script/style/title content never leaks into any element
    assert all("x()" not in (r["markdown"] or "") for r in rows)


def test_html_lists_and_quotes_are_sections():
    rows = parse_html(HTML, "t.html")
    secs = [r for r in rows if r["elem_type"] == "section" and r["seq"] > 0]
    assert len(secs) == 2  # list + blockquote
    list_children = [r["text"] for r in rows
                     if len(r["section_path"]) == 3 and r["elem_type"] == "paragraph"
                     and r["section_path"][:2] == secs[0]["section_path"]]
    assert list_children == ["alpha", "beta"]


def test_html_rejects_empty():
    with pytest.raises(ValueError):
        parse_html("", "x")


def test_read_html_distributed(spark, tmp_path):
    (tmp_path / "a.html").write_text(HTML)
    (tmp_path / "b.html").write_text("<h1>B</h1><p>b body</p>")
    el = read_html(spark, str(tmp_path))
    assert el.select("doc_id").distinct().count() == 2
    assert el.filter("elem_type = 'table'").count() == 1


def test_xlsx_sheets_types_and_merges():
    b = build_xlsx({
        "Budget": [["Item", "Q1", "Q2"], ["Widgets", 100, 230.5],
                   ["Gadgets", True, None]],
        "Notes": [["only note"]],
    })
    rows = parse_xlsx(b, "wb.xlsx")
    tables = [r for r in rows if r["elem_type"] == "table"]
    assert tables[0]["table_cells"] == [
        ["Item", "Q1", "Q2"], ["Widgets", "100", "230.5"], ["Gadgets", "TRUE", ""]]
    assert tables[1]["table_cells"] == [["only note"]]
    headers = [r["text"] for r in rows if r["elem_type"] == "header"]
    assert headers == ["Budget", "Notes"]
    assert tables[0]["metadata"] == {"sheet": "Budget"}


def test_xlsx_rejects_non_xlsx():
    with pytest.raises(ValueError):
        parse_xlsx(b"nope", "x")


def test_read_xlsx_distributed(spark, tmp_path):
    (tmp_path / "a.xlsx").write_bytes(build_xlsx({"S": [["h"], ["v"]]}))
    el = read_xlsx(spark, str(tmp_path))
    assert el.filter("elem_type = 'table'").count() == 1


def test_pptx_slides_titles_tables_images():
    png = b"\x89PNG\r\n\x1a\n" + b"\x00" * 16
    b = build_pptx([
        {"title": "Deck Title", "subtitle": "Sub"},
        {"title": "Data", "bullets": ["p1", "p2"],
         "table": [["Q", "Rev"], ["Q1", "10"]], "image": png},
    ])
    rows = parse_pptx(b, "d.pptx", extract_images=True)
    pages = [r["page_number"] for r in rows if r["elem_type"] == "section" and r["seq"] > 0]
    assert pages == [1, 2]
    hs = {(r["header_level"], r["text"]) for r in rows if r["elem_type"] == "header"}
    assert {(1, "Deck Title"), (2, "Sub"), (1, "Data")} <= hs
    t = next(r for r in rows if r["elem_type"] == "table")
    assert t["table_cells"] == [["Q", "Rev"], ["Q1", "10"]]
    img = next(r for r in rows if r["elem_type"] == "image")
    assert img["image_content"] == png and img["page_number"] == 2


def test_pptx_rejects_non_pptx():
    with pytest.raises(ValueError):
        parse_pptx(b"PK\x03\x04nope", "x")


def test_read_pptx_distributed(spark, tmp_path):
    (tmp_path / "a.pptx").write_bytes(build_pptx([{"title": "T", "bullets": ["x"]}]))
    el = read_pptx(spark, str(tmp_path))
    assert el.filter("elem_type = 'header'").count() == 1


def test_dispatch_routes_all_native_formats(spark, tmp_path):
    from dataingestion_spark.sources.dispatch import read_documents
    from dataingestion_spark.sources.docx_writer import sample_docx_bytes
    from dataingestion_spark.sources.pdf_writer import sample_pdf_bytes

    (tmp_path / "a.md").write_text("# MD\n\nbody\n")
    (tmp_path / "b.docx").write_bytes(sample_docx_bytes())
    (tmp_path / "c.pdf").write_bytes(sample_pdf_bytes())
    (tmp_path / "d.html").write_text("<h1>H</h1><p>hp</p>")
    (tmp_path / "e.xlsx").write_bytes(build_xlsx({"S": [["a"], ["1"]]}))
    (tmp_path / "f.pptx").write_bytes(build_pptx([{"title": "P"}]))
    el = read_documents(spark, str(tmp_path))
    assert el.select("doc_id").distinct().count() == 6


def test_dispatch_routes_csv(spark, tmp_path):
    from dataingestion_spark.sources.dispatch import read_documents

    (tmp_path / "t.csv").write_text("a,b\n1,2\n")
    el = read_documents(spark, str(tmp_path))
    t = el.filter("elem_type = 'table'").collect()
    assert len(t) == 1 and t[0]["table_cells"] == [["a", "b"], ["1", "2"]]


def test_encrypted_pdf_fails_clearly():
    from dataingestion_spark.sources.pdf import parse_pdf
    from dataingestion_spark.sources.pdf_writer import sample_pdf_bytes

    data = sample_pdf_bytes().replace(
        b"/Root", b"/Encrypt 9 0 R /Root", 1)
    with pytest.raises(ValueError, match="encrypted"):
        parse_pdf(data, "enc.pdf")


RTF_FIXTURE = (
    b"{\\rtf1\\ansi\\deff0\n"
    b"{\\fonttbl{\\f0 Times;}}{\\info{\\title Hidden}}\n"
    b"\\pard\\outlinelevel0 Doc Title\\par\n"
    b"\\pard Body with \\b bold\\b0  words.\\par\n"
    b"\\trowd\\intbl A\\cell B\\cell\\row\n"
    b"\\trowd\\intbl 1\\cell 2\\cell\\row\n"
    b"\\pard Tail.\\par\n}")


def test_rtf_structure():
    from dataingestion_spark.sources.rtf import parse_rtf

    rows = parse_rtf(RTF_FIXTURE, "t.rtf")
    hs = [(r["header_level"], r["text"]) for r in rows if r["elem_type"] == "header"]
    assert hs == [(1, "Doc Title")]
    t = next(r for r in rows if r["elem_type"] == "table")
    assert t["table_cells"] == [["A", "B"], ["1", "2"]]
    assert any("**bold**" in r["markdown"] for r in rows
               if r["elem_type"] == "paragraph")
    assert not any("Hidden" in (r["markdown"] or "") for r in rows)


def test_rtf_rejects_non_rtf():
    from dataingestion_spark.sources.rtf import parse_rtf

    with pytest.raises(ValueError):
        parse_rtf(b"plain text", "x")


def test_epub_chapters_and_spine_order():
    from dataingestion_spark.sources.epub import build_epub, parse_epub

    b = build_epub([
        ("One", "<h1>Chapter One</h1><p>First text.</p>"),
        ("Two", "<h1>Chapter Two</h1><ul><li>x</li><li>y</li></ul>"),
    ])
    rows = parse_epub(b, "book.epub")
    chaps = [r for r in rows if r["elem_type"] == "section"
             and len(r["section_path"]) == 2]
    assert [c["page_number"] for c in chaps] == [1, 2]
    assert [r["text"] for r in rows if r["elem_type"] == "header"] == \
        ["Chapter One", "Chapter Two"]
    # chapter children carry the chapter's page number
    assert all(r["page_number"] == 2 for r in rows
               if r["section_path"][:2] == [0, 1])


def test_epub_rejects_non_epub():
    from dataingestion_spark.sources.epub import parse_epub

    with pytest.raises(ValueError):
        parse_epub(b"PK\x03\x04junk", "x")


def test_dispatch_routes_epub_and_rtf(spark, tmp_path):
    from dataingestion_spark.sources.dispatch import read_documents
    from dataingestion_spark.sources.epub import build_epub

    (tmp_path / "b.epub").write_bytes(
        build_epub([("C", "<h1>EC</h1><p>ep</p>")]))
    (tmp_path / "n.rtf").write_bytes(RTF_FIXTURE)
    el = read_documents(spark, str(tmp_path))
    assert el.select("doc_id").distinct().count() == 2
    hdrs = {r["text"] for r in el.filter("elem_type = 'header'").collect()}
    assert {"EC", "Doc Title"} <= hdrs


def test_html_rowspan_expires_correctly():
    """A rowspan that ends before the last row must stop filling (the
    round-3 review's confirmed bug: the span leaked into every later
    row and shifted real cells right)."""
    h = ('<table><tr><td rowspan="2">a</td><td>b</td></tr>'
         '<tr><td>c</td></tr><tr><td>d</td><td>e</td></tr></table>')
    cells = [r for r in parse_html(h, "t")
             if r["elem_type"] == "table"][0]["table_cells"]
    assert cells == [["a", "b"], ["a", "c"], ["d", "e"]]
    h3 = ('<table><tr><td rowspan="3">x</td><td>1</td></tr>'
          '<tr><td>2</td></tr><tr><td>3</td></tr>'
          '<tr><td>y</td><td>4</td></tr></table>')
    c3 = [r for r in parse_html(h3, "t")
          if r["elem_type"] == "table"][0]["table_cells"]
    assert c3 == [["x", "1"], ["x", "2"], ["x", "3"], ["y", "4"]]


def test_pptx_hmerge_continuation_cells_not_double_counted():
    """Real PowerPoint files include covered cells with hMerge="1" after
    a gridSpan origin; they must not widen the row."""
    from xml.etree import ElementTree as ET

    from dataingestion_spark.sources.pptx import _tbl_cells

    A = "http://schemas.openxmlformats.org/drawingml/2006/main"
    tbl = ET.fromstring(
        f'<a:tbl xmlns:a="{A}">'
        '<a:tr><a:tc gridSpan="2"><a:txBody><a:p><a:r><a:t>Wide</a:t>'
        '</a:r></a:p></a:txBody></a:tc><a:tc hMerge="1"/>'
        '<a:tc><a:txBody><a:p><a:r><a:t>C</a:t></a:r></a:p></a:txBody>'
        '</a:tc></a:tr>'
        '<a:tr><a:tc><a:txBody><a:p><a:r><a:t>x</a:t></a:r></a:p></a:txBody></a:tc>'
        '<a:tc><a:txBody><a:p><a:r><a:t>y</a:t></a:r></a:p></a:txBody></a:tc>'
        '<a:tc><a:txBody><a:p><a:r><a:t>z</a:t></a:r></a:p></a:txBody></a:tc>'
        '</a:tr></a:tbl>')
    assert _tbl_cells(tbl) == [["Wide", "Wide", "C"], ["x", "y", "z"]]


def test_rtf_empty_cells_keep_column_alignment():
    from dataingestion_spark.sources.rtf import parse_rtf

    rtf = (b"{\\rtf1\\ansi\n"
           b"\\trowd\\intbl A\\cell \\cell C\\cell\\row\n"
           b"\\trowd\\intbl 1\\cell 2\\cell 3\\cell\\row\n}")
    t = [r for r in parse_rtf(rtf, "t")
         if r["elem_type"] == "table"][0]["table_cells"]
    assert t == [["A", "", "C"], ["1", "2", "3"]]


def test_odf_text_spreadsheet_presentation():
    from dataingestion_spark.sources.odf import (
        build_odp,
        build_ods,
        build_odt,
        parse_odf,
    )

    rows = parse_odf(build_odt([
        ("h", 1, "T"), ("p", "body"), ("pb", "bold bit"),
        ("list", ["a", "b"]), ("table", [["k", "v"], ["x", "1"]]),
    ]), "d.odt")
    assert [(r["header_level"], r["text"]) for r in rows
            if r["elem_type"] == "header"] == [(1, "T")]
    assert any("**bold bit**" in (r["markdown"] or "") for r in rows)
    t = next(r for r in rows if r["elem_type"] == "table")
    assert t["table_cells"] == [["k", "v"], ["x", "1"]]

    rows2 = parse_odf(build_ods({"S": [["h1", "h2"], [1.5, True]]}), "d.ods")
    t2 = next(r for r in rows2 if r["elem_type"] == "table")
    assert t2["table_cells"] == [["h1", "h2"], ["1.5", "TRUE"]]
    assert t2["metadata"] == {"sheet": "S"}

    rows3 = parse_odf(build_odp(
        [{"title": "D", "points": ["p1"]}, {"title": "E"}]), "d.odp")
    assert [r["page_number"] for r in rows3
            if r["elem_type"] == "section" and r["seq"] > 0] == [1, 2]
    assert [r["text"] for r in rows3 if r["elem_type"] == "header"] == ["D", "E"]


def test_odf_rejects_non_odf():
    from dataingestion_spark.sources.odf import parse_odf

    with pytest.raises(ValueError):
        parse_odf(b"not a zip", "x")


def test_dispatch_routes_odf(spark, tmp_path):
    from dataingestion_spark.sources.dispatch import read_documents
    from dataingestion_spark.sources.odf import build_odt

    (tmp_path / "a.odt").write_bytes(build_odt([("h", 1, "OT"), ("p", "x")]))
    el = read_documents(spark, str(tmp_path))
    assert {r["text"] for r in el.filter("elem_type = 'header'").collect()} == {"OT"}


def test_zip_archive_expands_inner_documents(spark, tmp_path):
    import io
    import zipfile

    from dataingestion_spark.sources.dispatch import read_documents
    from dataingestion_spark.sources.docx_writer import sample_docx_bytes

    buf = io.BytesIO()
    with zipfile.ZipFile(buf, "w") as zf:
        zf.writestr("notes/readme.md", "# Inner MD\n\nmd body\n")
        zf.writestr("report.docx", sample_docx_bytes())
        zf.writestr("junk.bin", b"\x00\x01")  # unsupported: skipped
    (tmp_path / "bundle.zip").write_bytes(buf.getvalue())
    el = read_documents(spark, str(tmp_path))
    ids = {r["doc_id"].split("!", 1)[-1]
           for r in el.select("doc_id").distinct().collect()}
    assert ids == {"notes/readme.md", "report.docx"}
    hdrs = {r["text"] for r in el.filter("elem_type = 'header'").collect()}
    assert "Inner MD" in hdrs
    assert el.filter("elem_type = 'table'").count() == 1  # the docx table


def test_legacy_doc_text_extraction():
    from dataingestion_spark.sources.doc_legacy import build_doc, parse_doc

    b = build_doc(["First legacy paragraph.", "Second with\x13 HYPERLINK x\x14"
                   " shown text\x15 inline.", "Third."])
    paras = [r["text"] for r in parse_doc(b, "o.doc")
             if r["elem_type"] == "paragraph"]
    assert paras[0] == "First legacy paragraph."
    # field instruction (0x13..0x14) stripped, shown part kept
    assert paras[1] == "Second with shown text inline."
    assert paras[2] == "Third."


def test_legacy_doc_rejects_garbage():
    from dataingestion_spark.sources.doc_legacy import parse_doc

    with pytest.raises(ValueError):
        parse_doc(b"not ole at all", "x.doc")
    with pytest.raises(ValueError):
        parse_doc(b"\xd0\xcf\x11\xe0\xa1\xb1\x1a\xe1" + b"\x00" * 600, "x.doc")


def test_dispatch_routes_legacy_doc(spark, tmp_path):
    from dataingestion_spark.sources.dispatch import read_documents
    from dataingestion_spark.sources.doc_legacy import build_doc

    (tmp_path / "old.doc").write_bytes(build_doc(["legacy body text"]))
    el = read_documents(spark, str(tmp_path))
    assert [r["text"] for r in el.filter("elem_type = 'paragraph'").collect()] \
        == ["legacy body text"]


def test_legacy_xls_sheets_and_types():
    from dataingestion_spark.sources.xls_legacy import build_xls, parse_xls

    b = build_xls({"S": [["h1", "h2"], [1, 2.5], [True, "txt"]]})
    rows = parse_xls(b, "o.xls")
    t = next(r for r in rows if r["elem_type"] == "table")
    assert t["table_cells"] == [["h1", "h2"], ["1", "2.5"], ["TRUE", "txt"]]
    assert [r["text"] for r in rows if r["elem_type"] == "header"] == ["S"]


def test_legacy_xls_rejects_garbage():
    from dataingestion_spark.sources.xls_legacy import parse_xls

    with pytest.raises(ValueError):
        parse_xls(b"junk", "x.xls")


def test_dispatch_routes_legacy_xls(spark, tmp_path):
    from dataingestion_spark.sources.dispatch import read_documents
    from dataingestion_spark.sources.xls_legacy import build_xls

    (tmp_path / "w.xls").write_bytes(build_xls({"D": [["v"], ["42"]]}))
    el = read_documents(spark, str(tmp_path))
    t = el.filter("elem_type = 'table'").collect()
    assert len(t) == 1 and t[0]["table_cells"] == [["v"], ["42"]]


# ---------------------------------------------------------------------------
# round-3 second-review regressions
# ---------------------------------------------------------------------------


def test_html_bare_container_text_becomes_paragraphs():
    """Text directly inside <div>/<body> (the dominant shape of crawled
    HTML) must become paragraphs, not vanish."""
    rows = parse_html('<div>Important bare text.</div><p>real para</p>', "t")
    assert [r["text"] for r in rows if r["elem_type"] == "paragraph"] == \
        ["Important bare text.", "real para"]


def test_html_invalid_span_attrs_are_harmless():
    rows = parse_html(
        '<table><tr><td colspan="abc">x</td><td colspan="0">y</td>'
        '<td>z</td></tr><tr><td>1</td><td>2</td><td>3</td></tr></table>', "t")
    t = next(r for r in rows if r["elem_type"] == "table")
    assert t["table_cells"] == [["x", "y", "z"], ["1", "2", "3"]]


def test_rtf_star_destination_does_not_swallow_next_group():
    from dataingestion_spark.sources.rtf import parse_rtf

    rows = parse_rtf(
        b"{\\rtf1\\ansi{\\*\\rsidtbl \\rsid123456}{\\b Bold opening}"
        b" plain tail.\\par}", "t")
    md = [r["markdown"] for r in rows if r["elem_type"] == "paragraph"]
    assert md == ["**Bold opening** plain tail."]


def test_xls_formula_bool_and_error_results():
    import struct

    from dataingestion_spark.sources.doc_legacy import _build_ole
    from dataingestion_spark.sources.xls_legacy import parse_xls

    def rec(op, p):
        return struct.pack("<HH", op, len(p)) + p

    bof_s = rec(0x0809, struct.pack("<HHHHIi", 0x0600, 0x0010, 0, 0, 0, 0))
    boolf = rec(0x0006, struct.pack("<HHH", 1, 0, 0)
                + bytes([1, 0, 1, 0, 0, 0, 0xFF, 0xFF]) + b"\x00" * 8)
    errf = rec(0x0006, struct.pack("<HHH", 2, 0, 0)
               + bytes([2, 0, 0x07, 0, 0, 0, 0xFF, 0xFF]) + b"\x00" * 8)
    num = rec(0x0203, struct.pack("<HHHd", 0, 0, 0, 42.0))
    sheet = bof_s + num + boolf + errf + rec(0x000A, b"")
    g_bof = rec(0x0809, struct.pack("<HHHHIi", 0x0600, 0x0005, 0, 0, 0, 0))
    sst = rec(0x00FC, struct.pack("<ii", 0, 0))
    glb_probe = g_bof + sst + rec(
        0x0085, struct.pack("<IHB", 0, 0, 1) + b"\x00S") + rec(0x000A, b"")
    bs = rec(0x0085, struct.pack("<IHB", len(glb_probe), 0, 1) + b"\x00S")
    glb = g_bof + sst + bs + rec(0x000A, b"")
    rows = parse_xls(_build_ole({"Workbook": glb + sheet}), "f.xls")
    t = next(r for r in rows if r["elem_type"] == "table")
    assert t["table_cells"] == [["42"], ["TRUE"]]  # error row dropped


def test_pdf_two_column_prose_is_not_a_table():
    from dataingestion_spark.sources.pdf import detect_grid_tables

    def line(segs):
        return {"y": 0, "x": segs[0][0], "x_end": 0, "size": 11,
                "text": " ".join(t for _, t in segs),
                "segs": [list(s) for s in segs]}
    prose = [line([(72, "a long sentence of left-column prose text here"),
                   (320, "a long sentence of right-column prose text too")])
             for _ in range(20)]
    assert detect_grid_tables(prose) == []
    # short 2-col tables and any 3+-col grid still detect
    assert len(detect_grid_tables(
        [line([(72, "k"), (320, "v")]), line([(72, "a"), (320, "1")])])) == 1


def test_odf_anchor_without_href_keeps_text():
    from xml.etree import ElementTree as ET

    from dataingestion_spark.sources.odf import _para_text_md

    T = "urn:oasis:names:tc:opendocument:xmlns:text:1.0"
    p = ET.fromstring(f'<text:p xmlns:text="{T}">See '
                      f'<text:a>the appendix</text:a> now.</text:p>')
    _, md = _para_text_md(p, {})
    assert md == "See the appendix now."


def test_xlsx_phonetic_runs_not_duplicated():
    from xml.etree import ElementTree as ET

    from dataingestion_spark.sources.xlsx import _si_text

    S = "http://schemas.openxmlformats.org/spreadsheetml/2006/main"
    si = ET.fromstring(f'<si xmlns="{S}"><r><t>Tokyo</t></r>'
                       f'<rPh sb="0" eb="2"><t>phonetic</t></rPh></si>')
    assert _si_text(si) == "Tokyo"


def test_pptx_line_breaks_render_as_newlines():
    from xml.etree import ElementTree as ET

    from dataingestion_spark.sources.pptx import _para_md

    A = "http://schemas.openxmlformats.org/drawingml/2006/main"
    p = ET.fromstring(f'<a:p xmlns:a="{A}"><a:r><a:t>one</a:t></a:r>'
                      f'<a:br/><a:r><a:t>two</a:t></a:r></a:p>')
    plain, _ = _para_md(p)
    assert plain == "one\ntwo"
