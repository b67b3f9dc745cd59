"""Native HTML → ``elements`` DataFrame reader (stdlib ``html.parser``).

The reference ingests HTML through the markitdown CLI
(``MarkItDownReader.cs``, HTML entries in the MIME map
``IngestionDocumentReader.cs:80-171``); this module parses the block
structure directly so .html files flow into the same element model as
markdown/DOCX/PDF:

* ``<h1>``–``<h6>`` → header elements with level;
* ``<p>`` (and bare block text) → paragraphs, with inline markup
  rendered to markdown (``<strong>``/``<b>`` → ``**``, ``<em>``/``<i>``
  → ``*``, ``<code>`` → backticks, ``<a href>`` → ``[text](href)``);
* ``<ul>``/``<ol>`` → a section wrapping one paragraph per ``<li>``
  (the markdown reader's list shape, ``MarkdownReader.cs:179-204``);
* ``<blockquote>`` → a section of its paragraphs (``:206-221``);
* ``<table>`` → a table element: cell matrix from ``tr``/``th``/``td``,
  first row = header row, ``colspan``/``rowspan`` duplicated across the
  span (the reference's merged-cell convention,
  ``DocumentIntelligenceReader.cs:314-334``);
* ``<footer>`` content → footer elements;
* ``<img>`` → image elements — ``alt`` text always, decoded bytes for
  ``data:`` URIs when ``extract_images=True``;
* ``<script>``/``<style>``/comments ignored; entities decoded by the
  parser.

This is the STRUCTURED counterpart of
:mod:`..operators.html_extract` (expression-only visible-text + signals
for 100 TB crawl scans): use that to triage, this to build documents.

Spark entry point :func:`read_html` = distributed ``binaryFile`` scan +
``mapInPandas``, like every reader in this package.
"""

from __future__ import annotations

import base64
import re
from html.parser import HTMLParser
from typing import List, Optional

from ..model import (
    ELEM_FOOTER,
    ELEM_HEADER,
    ELEM_IMAGE,
    ELEM_PARAGRAPH,
    ELEM_SECTION,
    ELEM_TABLE,
    element_row,
)

_H_RE = re.compile(r"^h([1-6])$")
_SKIP_CONTENT = {"script", "style", "head", "template", "noscript"}
_DATA_URI_RE = re.compile(r"^data:(?P<mt>[^;,]+)(;base64)?,(?P<data>.*)$", re.S)


def _span_attr(raw) -> int:
    """HTML5 colspan/rowspan semantics: invalid, missing, or 0 → 1
    (one bad attribute must not kill the document or mis-shift a row);
    clamped so a hostile span can't allocate unbounded cells."""
    try:
        n = int(str(raw).strip())
    except (TypeError, ValueError):
        return 1
    return min(max(n, 1), 1000)


class _Collector(HTMLParser):
    """Single-pass block collector: emits a flat list of block dicts
    (kind, text/md, cells, level, ...) in document order; the caller
    turns them into element rows."""

    def __init__(self, extract_images: bool):
        super().__init__(convert_charrefs=True)
        self.extract_images = extract_images
        self.blocks: List[dict] = []
        self._skip = 0
        self._md: List[str] = []          # inline markdown accumulator
        self._text: List[str] = []        # inline plain-text accumulator
        self._inline_stack: List[str] = []
        self._href: Optional[str] = None
        self._block: Optional[str] = None  # p | h{n} | li | footer-p
        self._footer_depth = 0
        self._blockquote_depth = 0
        self._list_depth = 0
        self._list_items: List[tuple] = []
        self._quote_paras: List[tuple] = []
        # table state
        self._table: Optional[List[List[str]]] = None
        self._row: Optional[List[str]] = None
        self._rowspans: dict = {}          # col index -> (text, rows left)
        self._new_rowspans: dict = {}      # spans opened in the current row
        self._cell: Optional[dict] = None

    # -- inline text ---------------------------------------------------
    def _flush_inline(self) -> tuple:
        md = re.sub(r"\s+", " ", "".join(self._md)).strip()
        text = re.sub(r"\s+", " ", "".join(self._text)).strip()
        self._md, self._text = [], []
        return text, md

    def handle_data(self, data):
        if self._skip:
            return
        self._md.append(data)
        self._text.append(data)

    # -- tag handling --------------------------------------------------
    def handle_starttag(self, tag, attrs):
        a = dict(attrs)
        if tag in _SKIP_CONTENT:
            self._skip += 1
            return
        if self._skip:
            return
        if tag in ("strong", "b"):
            self._md.append("**")
            self._inline_stack.append("**")
        elif tag in ("em", "i"):
            self._md.append("*")
            self._inline_stack.append("*")
        elif tag == "code" and self._block is not None:
            self._md.append("`")
            self._inline_stack.append("`")
        elif tag == "a":
            self._href = a.get("href")
            if self._href:
                self._md.append("[")
                self._inline_stack.append(f"]({self._href})")
        elif tag == "br":
            self._md.append("\n")
            self._text.append("\n")
        elif tag == "img":
            self._emit_image(a)
        elif _H_RE.match(tag):
            self._open_block(tag)
        elif tag == "p":
            self._open_block("p")
        elif tag == "li":
            self._open_block("li")
        elif tag in ("ul", "ol"):
            self._flush_stray()
            if self._list_depth == 0:
                self._list_items = []
            self._list_depth += 1
        elif tag == "blockquote":
            self._flush_stray()
            if self._blockquote_depth == 0:
                self._quote_paras = []
            self._blockquote_depth += 1
        elif tag == "footer":
            self._flush_stray()
            self._footer_depth += 1
        elif tag == "table":
            self._flush_stray()
            self._table = []
            self._rowspans = {}
            self._new_rowspans = {}
        elif tag == "tr" and self._table is not None:
            self._row = []
        elif tag in ("td", "th") and self._row is not None:
            self._flush_inline()  # drop inter-cell whitespace
            self._cell = {"colspan": _span_attr(a.get("colspan")),
                          "rowspan": _span_attr(a.get("rowspan"))}

    def handle_endtag(self, tag):
        if tag in _SKIP_CONTENT:
            self._skip = max(0, self._skip - 1)
            return
        if self._skip:
            return
        if tag in ("strong", "b", "em", "i") or (tag == "code" and self._inline_stack and self._inline_stack[-1] == "`"):
            if self._inline_stack:
                self._md.append(self._inline_stack.pop())
        elif tag == "a":
            if self._inline_stack and self._inline_stack[-1].startswith("]("):
                self._md.append(self._inline_stack.pop())
            self._href = None
        elif _H_RE.match(tag) or tag in ("p", "li"):
            self._close_block()
        elif tag in ("ul", "ol"):
            self._list_depth = max(0, self._list_depth - 1)
            if self._list_depth == 0 and self._list_items:
                self.blocks.append({"kind": "list", "items": self._list_items})
                self._list_items = []
        elif tag == "blockquote":
            self._blockquote_depth = max(0, self._blockquote_depth - 1)
            if self._blockquote_depth == 0 and self._quote_paras:
                self.blocks.append({"kind": "quote", "items": self._quote_paras})
                self._quote_paras = []
        elif tag == "footer":
            self._flush_stray()
            self._footer_depth = max(0, self._footer_depth - 1)
        elif tag in ("div", "section", "article", "main", "aside", "body",
                     "html"):
            self._flush_stray()
        elif tag in ("td", "th") and self._cell is not None:
            text, md = self._flush_inline()
            cell, self._cell = self._cell, None
            row = self._row
            if row is None:
                return
            # fill pending rowspans that land before this cell (spans do
            # NOT age here — each one covers at most one slot per row;
            # aging happens once per row at </tr>)
            while len(row) in self._rowspans:
                row.append(self._rowspans[len(row)][0])
            start = len(row)
            for k in range(cell["colspan"]):
                row.append(md)
            if cell["rowspan"] > 1:
                for k in range(cell["colspan"]):
                    # spans opened THIS row start covering from the next
                    # row; stage them so this row's own aging skips them
                    self._new_rowspans[start + k] = (md, cell["rowspan"] - 1)
        elif tag == "tr" and self._table is not None and self._row is not None:
            row = self._row
            while len(row) in self._rowspans:
                row.append(self._rowspans[len(row)][0])
            self._table.append(row)
            # age the spans that covered this row; drop the exhausted
            self._rowspans = {
                c: (t, r - 1) for c, (t, r) in self._rowspans.items() if r > 1
            }
            self._rowspans.update(self._new_rowspans)
            self._new_rowspans = {}
            self._row = None
        elif tag == "table" and self._table is not None:
            rows = [r for r in self._table if r]
            if rows:
                width = max(len(r) for r in rows)
                rows = [r + [""] * (width - len(r)) for r in rows]
                self.blocks.append({"kind": "table", "cells": rows})
            self._table = None

    # -- block plumbing ------------------------------------------------
    def _flush_stray(self):
        """Bare text outside any h/p/li block (directly inside <div>,
        <body>, <td>-free containers — the dominant shape of crawled
        HTML) becomes an implicit paragraph instead of being discarded."""
        if self._block is not None or self._table is not None:
            self._flush_inline()
            return
        text, md = self._flush_inline()
        if not md:
            return
        if self._blockquote_depth:
            self._quote_paras.append((text, md))
        elif self._list_depth:
            self._list_items.append((text, md))
        elif self._footer_depth:
            self.blocks.append({"kind": "footer", "text": text, "md": md})
        else:
            self.blocks.append({"kind": "p", "text": text, "md": md})

    def _open_block(self, kind):
        self._flush_stray()
        self._block = kind

    def _close_block(self):
        text, md = self._flush_inline()
        kind, self._block = self._block, None
        if not md:
            return
        if kind == "li":
            target = self._list_items if self._list_depth else None
            if target is not None:
                target.append((text, md))
                return
            kind = "p"
        m = _H_RE.match(kind or "")
        if m:
            self.blocks.append({"kind": "header", "level": int(m.group(1)),
                                "text": text, "md": md})
        elif self._blockquote_depth:
            self._quote_paras.append((text, md))
        elif self._footer_depth:
            self.blocks.append({"kind": "footer", "text": text, "md": md})
        else:
            self.blocks.append({"kind": "p", "text": text, "md": md})

    def _emit_image(self, attrs: dict):
        src = attrs.get("src") or ""
        alt = attrs.get("alt")
        content = None
        mt = None
        m = _DATA_URI_RE.match(src)
        if m:
            mt = m.group("mt")
            if self.extract_images:
                try:
                    content = base64.b64decode(m.group("data"))
                except Exception:
                    content = None
        self.blocks.append({"kind": "image", "alt": alt, "content": content,
                            "media_type": mt, "src": src})


def parse_html(data, doc_id: str, extract_images: bool = False) -> List[dict]:
    """Parse one HTML document into ``elements`` rows (same schema and
    root-section convention as every reader in this package)."""
    text = data.decode("utf-8", errors="replace") \
        if isinstance(data, (bytes, bytearray)) else data
    if not text or not text.strip():
        raise ValueError("content must be non-empty")
    collector = _Collector(extract_images)
    collector.feed(text)
    collector.close()
    # trailing unclosed block (malformed html): flush it
    if collector._block:
        collector._close_block()

    rows: List[dict] = []
    seq = [0]

    def emit(path, **kw):
        rows.append(element_row(doc_id, seq[0], path, **kw))
        seq[0] += 1
        return rows[-1]

    root = emit([0], elem_type=ELEM_SECTION, markdown="\x00")
    body_md: List[str] = []
    child = 0
    for b in collector.blocks:
        path = [0, child]
        child += 1
        if b["kind"] == "header":
            md = f"{'#' * b['level']} {b['md']}"
            emit(path, elem_type=ELEM_HEADER, markdown=md, text=b["text"],
                 header_level=b["level"])
            body_md.append(md)
        elif b["kind"] == "p":
            emit(path, elem_type=ELEM_PARAGRAPH, markdown=b["md"], text=b["text"])
            body_md.append(b["md"])
        elif b["kind"] == "footer":
            emit(path, elem_type=ELEM_FOOTER, markdown=b["md"], text=b["text"])
            body_md.append(b["md"])
        elif b["kind"] in ("list", "quote"):
            marker = "- " if b["kind"] == "list" else "> "
            sec_md = "\n".join(f"{marker}{md}" for _, md in b["items"])
            emit(path, elem_type=ELEM_SECTION, markdown=sec_md)
            for k, (text, md) in enumerate(b["items"]):
                emit(path + [k], elem_type=ELEM_PARAGRAPH, markdown=md, text=text)
            body_md.append(sec_md)
        elif b["kind"] == "table":
            from .docx import _table_markdown

            md = _table_markdown(b["cells"])
            emit(path, elem_type=ELEM_TABLE, markdown=md, table_cells=b["cells"])
            body_md.append(md)
        elif b["kind"] == "image":
            emit(path, elem_type=ELEM_IMAGE, image_content=b["content"],
                 image_media_type=b["media_type"], image_alt_text=b["alt"])
    root["markdown"] = "\n\n".join(body_md) or "(empty document)"
    return rows


def parse_html_df(df, id_col: str = "doc_id", content_col: str = "content",
                  on_error: str = "fail", extract_images: bool = False):
    """mapInPandas wrapper (shared plumbing: elements_map_df)."""
    from .markdown import elements_map_df

    return elements_map_df(
        df, lambda raw, doc_id: parse_html(raw, doc_id,
                                           extract_images=extract_images),
        id_col, content_col, on_error)

def read_html(spark, path, glob: str = "*.html", recursive: bool = False,
              on_error: str = "fail", extract_images: bool = False):
    """Distributed .html directory ingestion (binaryFile + parse)."""
    from .markdown import binary_file_scan

    files = binary_file_scan(spark, path, glob, recursive)
    return parse_html_df(files, id_col="path", content_col="content",
                         on_error=on_error, extract_images=extract_images)
