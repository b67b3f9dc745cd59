"""Fuzz/property tests for the native readers: on arbitrary input every
parser must either return valid element rows or raise ValueError — never
crash with an internal error, hang, or emit rows violating the element
contract (non-empty markdown on non-image elements, monotone seq,
rectangular tables). This is the robustness face of the on_error
contract: 'skip' can only drop documents whose parsers FAIL CLEANLY."""

import pytest
from hypothesis import given, settings, strategies as st

from dataingestion_spark.sources.dispatch import parse_any
from dataingestion_spark.sources.docx import parse_docx
from dataingestion_spark.sources.html_reader import parse_html
from dataingestion_spark.sources.pdf import parse_pdf
from dataingestion_spark.sources.rtf import parse_rtf

_ALLOWED = (ValueError,)


def _check_rows(rows):
    seqs = [r["seq"] for r in rows]
    assert seqs == sorted(seqs) and len(set(seqs)) == len(seqs)
    for r in rows:
        if r["elem_type"] != "image":
            assert r["markdown"], r
        if r["table_cells"] is not None:
            widths = {len(row) for row in r["table_cells"]}
            assert len(widths) <= 1, "ragged table"


@settings(max_examples=150, deadline=None)
@given(st.binary(min_size=0, max_size=400))
def test_random_bytes_fail_cleanly_everywhere(data):
    for fn in (parse_docx, parse_pdf, parse_rtf):
        try:
            _check_rows(fn(data, "fuzz"))
        except _ALLOWED:
            pass
    for name in ("x.docx", "x.pdf", "x.rtf", "x.xlsx", "x.pptx", "x.epub",
                 "x.odt", "x.zip"):
        try:
            _check_rows(parse_any(data, name))
        except _ALLOWED:
            pass


@settings(max_examples=150, deadline=None)
@given(st.text(max_size=600))
def test_arbitrary_text_as_html_never_crashes(text):
    try:
        _check_rows(parse_html(text, "fuzz.html"))
    except _ALLOWED:
        pass


_html_bits = st.sampled_from([
    "<table>", "</table>", "<tr>", "</tr>", "<td rowspan='2'>",
    "<td colspan='3'>", "</td>", "<th>", "</th>", "<ul>", "<li>", "</ul>",
    "<h1>", "</h1>", "<p>", "</p>", "<footer>", "</footer>", "<b>", "</b>",
    "<blockquote>", "</blockquote>", "<img src='data:image/png;base64,##'>",
    "cell", "text words", "&amp;", "<br>", "<a href='u'>", "</a>",
])


@settings(max_examples=150, deadline=None)
@given(st.lists(_html_bits, max_size=40))
def test_malformed_tag_soup_never_crashes(bits):
    try:
        _check_rows(parse_html("".join(bits), "soup.html", extract_images=True))
    except _ALLOWED:
        pass


_rtf_bits = st.sampled_from([
    "{", "}", "\\par ", "\\b ", "\\b0 ", "\\i ", "\\trowd", "\\intbl",
    "\\cell ", "\\row ", "\\pard", "\\outlinelevel1 ", "\\u8211?", "\\'e9",
    "\\*", "\\fonttbl", "text ", "\\tab ", "\\line ", "\\uc2 ",
])


@settings(max_examples=150, deadline=None)
@given(st.lists(_rtf_bits, max_size=50))
def test_rtf_control_word_soup_never_crashes(bits):
    try:
        _check_rows(parse_rtf(("{\\rtf1" + "".join(bits) + "}").encode(), "s.rtf"))
    except _ALLOWED:
        pass


def test_zip_of_zips_is_bounded():
    """Nested zips: inner .zip entries recurse through parse_any but a
    malformed/deep chain ends in skip-or-ValueError, not a hang."""
    import io
    import zipfile

    inner = io.BytesIO()
    with zipfile.ZipFile(inner, "w") as zf:
        zf.writestr("note.md", "# inner\n\nbody\n")
    outer = io.BytesIO()
    with zipfile.ZipFile(outer, "w") as zf:
        zf.writestr("a.zip", inner.getvalue())
        zf.writestr("direct.md", "# outer\n\nbody\n")
    rows = parse_any(outer.getvalue(), "nested.zip")
    ids = {r["doc_id"] for r in rows}
    assert any(i.endswith("note.md") for i in ids)
    assert any(i.endswith("direct.md") for i in ids)


@settings(max_examples=150, deadline=None)
@given(st.binary(min_size=0, max_size=500))
def test_pdf_prefixed_garbage_fails_cleanly(tail):
    """Bytes that pass the magic check but contain garbage object soup
    must still end in rows-or-ValueError (exercises the COS parser and
    page-tree walk on malformed structures)."""
    try:
        _check_rows(parse_pdf(b"%PDF-1.4\n" + tail, "g.pdf"))
    except _ALLOWED:
        pass


_pdf_bits = st.sampled_from([
    b"1 0 obj", b"endobj", b"<< /Type /Page >>", b"<< /Type /Catalog ",
    b"/Pages 2 0 R >>", b"stream\n", b"endstream", b"<< /Length 5 >>",
    b"[1 2 (str) /Name]", b"(text \\( esc)", b"<48656c6c6f>", b"trailer",
    b"BT /F1 12 Tf (hi) Tj ET", b"xref\n", b"%%EOF", b"\n",
    b"<< /Kids [3 0 R] /Count 1 >>", b"3 0 obj",
])


@settings(max_examples=150, deadline=None)
@given(st.lists(_pdf_bits, max_size=30))
def test_pdf_object_soup_fails_cleanly(bits):
    try:
        _check_rows(parse_pdf(b"%PDF-1.4\n" + b"\n".join(bits), "s.pdf"))
    except _ALLOWED:
        pass


@settings(max_examples=100, deadline=None)
@given(st.binary(min_size=0, max_size=300))
def test_zip_prefixed_garbage_fails_cleanly(tail):
    for name in ("g.docx", "g.xlsx", "g.pptx", "g.epub", "g.odt", "g.zip"):
        try:
            _check_rows(parse_any(b"PK\x03\x04" + tail, name))
        except _ALLOWED:
            pass


@settings(max_examples=100, deadline=None)
@given(st.binary(min_size=0, max_size=2048))
def test_ole_prefixed_garbage_fails_cleanly(tail):
    from dataingestion_spark.sources.doc_legacy import parse_doc

    try:
        _check_rows(parse_doc(
            b"\xd0\xcf\x11\xe0\xa1\xb1\x1a\xe1" + tail, "g.doc"))
    except _ALLOWED:
        pass


@settings(max_examples=100, deadline=None)
@given(st.binary(min_size=0, max_size=2048))
def test_xls_ole_prefixed_garbage_fails_cleanly(tail):
    from dataingestion_spark.sources.xls_legacy import parse_xls

    try:
        _check_rows(parse_xls(
            b"\xd0\xcf\x11\xe0\xa1\xb1\x1a\xe1" + tail, "g.xls"))
    except _ALLOWED:
        pass


def test_on_error_quarantine_surfaces_bad_files(spark, tmp_path):
    """r4: a 100 TB crawl needs failures VISIBLE, not silently skipped —
    quarantine mode yields one elem_type='error' row per bad file in the
    same scan, and chunkers ignore it by type."""
    from dataingestion_spark.operators.chunkers import (
        ChunkerOptions, header_chunker,
    )
    from dataingestion_spark.sources.dispatch import read_documents
    from dataingestion_spark.tokenizer import WordTokenizer

    (tmp_path / "good.md").write_text("# Fine\n\nbody\n")
    (tmp_path / "bad.pdf").write_bytes(b"this is not a pdf at all")
    (tmp_path / "bad.docx").write_bytes(b"PK\x03\x04 truncated nonsense")

    el = read_documents(spark, str(tmp_path), on_error="quarantine")
    errs = {r.doc_id.rsplit("/", 1)[-1]: r
            for r in el.filter("elem_type = 'error'").collect()}
    assert set(errs) == {"bad.pdf", "bad.docx"}
    assert errs["bad.pdf"].metadata["error_type"] == "ValueError"
    assert "[ingestion error]" in errs["bad.pdf"].markdown
    # the good document is intact and chunkers ignore the error rows
    chunks = header_chunker(el, ChunkerOptions(WordTokenizer(), 100)).collect()
    assert len(chunks) == 1 and "body" in chunks[0].content
    # skip mode still drops silently; fail mode still raises
    assert read_documents(spark, str(tmp_path),
                          on_error="skip").filter("elem_type='error'").count() == 0
    import pytest as _pytest

    with _pytest.raises(Exception):
        read_documents(spark, str(tmp_path), on_error="fail").count()
