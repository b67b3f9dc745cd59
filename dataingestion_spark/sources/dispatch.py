"""Media-type reader dispatch: one directory scan, every format.

The reference pipeline picks ONE reader per run and resolves each file's
media type from its extension (``IngestionDocumentReader.cs:80-171``,
~90-entry map — mirrored in :mod:`.media_types`). At corpus scale the
natural unit is a mixed directory, so :func:`read_documents` scans once
with the distributed ``binaryFile`` source and routes every file to its
parser *inside the same* ``mapInPandas`` pass — markdown/plain text →
:func:`..markdown.parse_markdown`, .docx →
:func:`..docx.parse_docx`, .pdf → :func:`..pdf.parse_pdf` — emitting one
uniform ``elements`` DataFrame. No second scan, no driver-side routing,
and per-file parallelism across executors.

Unknown binary formats follow the ``on_error`` contract ('fail' names
the file and its media type; 'skip' drops it — the 100 TB-crawl
setting).
"""

from __future__ import annotations

import os
from typing import Iterator, List

from ..model import ELEMENTS_SCHEMA
from .doc_legacy import parse_doc
from .docx import parse_docx
from .html_reader import parse_html
from .markdown import binary_file_scan, parse_markdown
from .media_types import media_type_for
from .pdf import parse_pdf
from .epub import parse_epub
from .odf import parse_odf
from .pptx import parse_pptx
from .rtf import parse_rtf
from .xls_legacy import parse_xls
from .xlsx import parse_xlsx

#: extensions parsed as markdown / plain text
_TEXT_EXTS = {".md", ".markdown", ".txt", ".text"}


def parse_any(data: bytes, doc_id: str, extract_images: bool = False) -> List[dict]:
    """Parse one file of any supported format into elements rows,
    routed by extension (driver/test helper; the Spark path inlines the
    same routing per batch)."""
    ext = os.path.splitext(doc_id.split("?")[0])[1].lower()
    if ext == ".docx":
        return parse_docx(data, doc_id, extract_images=extract_images)
    if ext in (".doc", ".dot"):
        return parse_doc(data, doc_id)
    if ext == ".pdf":
        return parse_pdf(data, doc_id, extract_images=extract_images)
    if ext in (".html", ".htm", ".xhtml"):
        return parse_html(data, doc_id, extract_images=extract_images)
    if ext == ".xlsx":
        return parse_xlsx(data, doc_id)
    if ext in (".xls", ".xlt"):
        return parse_xls(data, doc_id)
    if ext == ".pptx":
        return parse_pptx(data, doc_id, extract_images=extract_images)
    if ext == ".epub":
        return parse_epub(data, doc_id, extract_images=extract_images)
    if ext == ".rtf":
        return parse_rtf(data, doc_id)
    if ext in (".odt", ".ods", ".odp"):
        return parse_odf(data, doc_id)
    if ext in (".csv", ".tsv"):
        from .tabular import parse_delimited

        text = data.decode("utf-8", errors="replace") \
            if isinstance(data, (bytes, bytearray)) else data
        return parse_delimited(text, doc_id, "\t" if ext == ".tsv" else ",")
    if ext == ".zip":
        return _parse_zip(data, doc_id, extract_images)
    if ext == ".ipynb":
        from .ipynb import parse_ipynb

        return parse_ipynb(data, doc_id)
    if ext == ".eml":
        from .eml import parse_eml

        return parse_eml(data, doc_id)
    if ext == ".msg":
        from .msg import parse_msg

        return parse_msg(data, doc_id)
    mt = media_type_for(doc_id)
    if mt and mt.startswith("image/"):
        from .image_reader import parse_image

        return parse_image(data, doc_id)
    if mt and mt.startswith("audio/"):
        from .audio_reader import parse_audio

        return parse_audio(data, doc_id)
    if ext in _TEXT_EXTS or not ext:
        return parse_markdown(
            data.decode("utf-8", errors="replace") if isinstance(data, (bytes, bytearray)) else data,
            doc_id)
    raise ValueError(
        f"{doc_id}: unsupported media type {media_type_for(doc_id)!r} "
        f"(native readers cover md/txt/html/doc/docx/pdf/xls/xlsx/pptx/odt/ods/odp/epub/rtf/csv/tsv; other "
        f"office formats need the markitdown backend, "
        f"sources/api_readers.py)")


def _parse_zip(data: bytes, doc_id: str, extract_images: bool) -> List[dict]:
    """Expand a .zip ARCHIVE of documents (markitdown's archive
    behavior): every supported inner entry parses through
    :func:`parse_any` with identifier ``outer.zip!inner/path``, elements
    concatenated in entry order with reassigned sequence numbers.
    Unsupported/undecodable entries are skipped — an archive is a
    container, not a document, so one odd member shouldn't kill it."""
    import io
    import zipfile

    try:
        zf = zipfile.ZipFile(io.BytesIO(data))
    except zipfile.BadZipFile:
        raise ValueError(f"{doc_id}: not a zip archive")
    out: List[dict] = []
    seq = 0
    for info in zf.infolist():
        if info.is_dir() or info.filename.startswith("__MACOSX/"):
            continue
        inner_id = f"{doc_id}!{info.filename}"
        try:
            rows = parse_any(zf.read(info), inner_id,
                             extract_images=extract_images)
        except Exception:
            continue
        for r in rows:
            r = dict(r)
            r["seq"] = seq
            seq += 1
            out.append(r)
    return out


def read_documents(spark, path, glob: str = "*", recursive: bool = False,
                   on_error: str = "fail", extract_images: bool = False):
    """Mixed-format directory ingestion → one ``elements`` DataFrame
    (shared plumbing: :func:`.markdown.elements_map_df`)."""
    from .markdown import elements_map_df

    files = binary_file_scan(spark, path, glob, recursive)
    return elements_map_df(
        files, lambda raw, doc_id: parse_any(bytes(raw), doc_id,
                                             extract_images=extract_images),
        id_col="path", content_col="content", on_error=on_error)
