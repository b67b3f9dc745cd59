"""Native RTF → ``elements`` DataFrame reader (stdlib only).

RTF is in the reference's ingestion scope (``.rtf`` in the MIME map,
``IngestionDocumentReader.cs:107``). The tokenizer walks the RTF group
structure (``{`` ``}`` nesting, ``\\control`` words with optional
numeric parameters, ``\\'hh`` byte escapes, ``\\uN`` unicode escapes
with skip-fallback handling):

* non-content destinations (``fonttbl``, ``colortbl``, ``stylesheet``,
  ``info``, ``pict``, and every ``{\\*...}`` group) are skipped whole;
* ``\\par`` closes a paragraph; ``\\outlinelevelN`` (0-based) marks the
  paragraph as a HEADER of level N+1 — the way Word encodes heading
  styles in RTF;
* ``\\b``/``\\i`` toggles render ``**``/``*`` markdown in place;
* table rows (``\\trowd`` … ``\\cell`` … ``\\row``) collect into one
  table element per contiguous row run, first row = header row;
* ``\\line``/``\\tab`` map to newline/tab; paragraph text is trimmed
  and empty paragraphs dropped (non-empty-markdown contract).

Spark entry point :func:`read_rtf` = distributed ``binaryFile`` scan +
``mapInPandas``.
"""

from __future__ import annotations

import re
from typing import List

from ..model import (
    ELEM_HEADER,
    ELEM_PARAGRAPH,
    ELEM_SECTION,
    ELEM_TABLE,
    element_row,
)
from .docx import _table_markdown

_TOKEN_RE = re.compile(
    rb"\\([a-z]+)(-?\d+)? ?|\\'([0-9a-fA-F]{2})|\\([^a-z])|([{}])|([^\\{}]+)",
)
_SKIP_DESTS = {b"fonttbl", b"colortbl", b"stylesheet", b"info", b"pict",
               b"header", b"footer", b"themedata", b"listtable",
               b"listoverridetable", b"generator", b"xmlnstbl"}


def _tokenize(data: bytes):
    """Yield ('ctrl', word, param) / ('char', bytes) / ('open'|'close',)."""
    for m in _TOKEN_RE.finditer(data):
        word, param, hexbyte, sym, brace, text = m.groups()
        if word is not None:
            yield ("ctrl", word, int(param) if param is not None else None)
        elif hexbyte is not None:
            yield ("char", bytes([int(hexbyte, 16)]))
        elif sym is not None:
            if sym == b"\\" or sym == b"{" or sym == b"}":
                yield ("char", sym)
            elif sym == b"~":
                yield ("char", b" ")
            elif sym in (b"\n", b"\r"):
                pass  # raw newlines in source are insignificant
            elif sym == b"*":
                yield ("star",)
        elif brace is not None:
            yield ("open",) if brace == b"{" else ("close",)
        elif text:
            yield ("char", text.replace(b"\r", b"").replace(b"\n", b""))


class _RtfState:
    __slots__ = ("bold", "italic", "outline", "in_table", "uc_skip")

    def __init__(self, bold=False, italic=False, outline=None,
                 in_table=False, uc_skip=1):
        self.bold = bold
        self.italic = italic
        self.outline = outline
        self.in_table = in_table
        self.uc_skip = uc_skip

    def copy(self):
        return _RtfState(self.bold, self.italic, self.outline,
                         self.in_table, self.uc_skip)


def parse_rtf(data: bytes, doc_id: str) -> List[dict]:
    """Parse one RTF byte blob into elements rows."""
    if not data or not data.lstrip()[:5].startswith(b"{\\rtf"):
        raise ValueError(f"{doc_id}: not an RTF file")

    blocks: List[dict] = []  # {kind: p|header|table, ...}
    cur_md: List[str] = []
    cur_text: List[str] = []
    state = _RtfState()
    stack: List[_RtfState] = []
    skip_depth = 0          # >0 → inside a skipped destination group
    # table assembly
    table_rows: List[List[str]] = []
    row_cells: List[str] = []
    pending_unicode_skip = 0

    def set_style(bold=None, italic=None):
        if bold is not None and bold != state.bold:
            cur_md.append("**")
            state.bold = bold
        if italic is not None and italic != state.italic:
            cur_md.append("*")
            state.italic = italic

    def close_styles():
        if state.bold:
            cur_md.append("**")
            state.bold = False
        if state.italic:
            cur_md.append("*")
            state.italic = False

    def flush_para(as_cell: bool = False):
        close_styles()
        md = re.sub(r"[ \t]+", " ", "".join(cur_md)).strip()
        text = re.sub(r"[ \t]+", " ", "".join(cur_text)).strip()
        cur_md.clear()
        cur_text.clear()
        if as_cell:
            # a \cell ALWAYS yields a cell, even when empty — dropping
            # empties would shift every following cell left one column
            row_cells.append(md)
            return
        if not md:
            return
        if state.in_table:
            row_cells.append(md)
        elif state.outline is not None:
            blocks.append({"kind": "header",
                           "level": min(9, state.outline + 1),
                           "md": md, "text": text})
        else:
            blocks.append({"kind": "p", "md": md, "text": text})

    def flush_table():
        nonlocal table_rows
        if table_rows:
            width = max(len(r) for r in table_rows)
            cells = [r + [""] * (width - len(r)) for r in table_rows]
            blocks.append({"kind": "table", "cells": cells})
            table_rows = []

    for tok in _tokenize(data):
        kind = tok[0]
        if kind == "open":
            if skip_depth:
                skip_depth += 1
            else:
                stack.append(state.copy())
            continue
        if kind == "close":
            if skip_depth:
                skip_depth -= 1
                if skip_depth == 0 and stack:
                    state = stack.pop()
            elif stack:
                prev = stack.pop()
                # closing a group restores formatting; emit markdown
                # closers for styles opened inside the group
                if state.bold and not prev.bold:
                    cur_md.append("**")
                if state.italic and not prev.italic:
                    cur_md.append("*")
                prev_uc = state.uc_skip
                state = prev
                state.uc_skip = state.uc_skip or prev_uc
            continue
        if kind == "star":
            # \* arrives right AFTER the '{' of its group (tokens: open,
            # star, \destination): mark the CURRENT group as a skipped
            # destination — the earlier design armed a flag consumed by
            # the NEXT '{', which both leaked this group's content and
            # swallowed the following, unrelated group
            if not skip_depth:
                skip_depth = 1
            continue
        if skip_depth:
            continue
        if kind == "ctrl":
            word, param = tok[1], tok[2]
            if word in _SKIP_DESTS:
                skip_depth = 1
                continue
            if word == b"par":
                flush_para()
                state.outline = None
            elif word == b"pard":
                state.outline = None
                state.in_table = False
            elif word == b"outlinelevel":
                state.outline = param if param is not None else 0
            elif word == b"b":
                set_style(bold=(param != 0))
            elif word == b"i":
                set_style(italic=(param != 0))
            elif word == b"line":
                cur_md.append("\n")
                cur_text.append("\n")
            elif word == b"tab":
                cur_md.append("\t")
                cur_text.append("\t")
            elif word in (b"trowd", b"intbl"):
                state.in_table = True
            elif word == b"cell":
                flush_para(as_cell=True)
            elif word == b"row":
                if cur_md:
                    flush_para()
                table_rows.append(list(row_cells))
                row_cells.clear()
            elif word == b"u":
                ch = chr(param & 0xFFFF if param >= 0 else param + 65536)
                cur_md.append(ch)
                cur_text.append(ch)
                pending_unicode_skip = state.uc_skip
            elif word == b"uc":
                state.uc_skip = param or 0
            elif word in (b"rquote", b"lquote"):
                cur_md.append("'")
                cur_text.append("'")
            elif word in (b"rdblquote", b"ldblquote"):
                cur_md.append('"')
                cur_text.append('"')
            elif word == b"emdash":
                cur_md.append("—")
                cur_text.append("—")
            elif word == b"endash":
                cur_md.append("–")
                cur_text.append("–")
            continue
        if kind == "char":
            raw = tok[1]
            if pending_unicode_skip:
                raw = raw[pending_unicode_skip:]
                pending_unicode_skip = 0
            if not raw:
                continue
            if not state.in_table and table_rows:
                flush_table()
            s = raw.decode("cp1252", errors="replace")
            cur_md.append(s)
            cur_text.append(s)

    flush_para()
    flush_table()

    rows: List[dict] = []
    seq = [0]

    def emit(path, **kw):
        rows.append(element_row(doc_id, seq[0], path, **kw))
        seq[0] += 1
        return rows[-1]

    root_row = emit([0], elem_type=ELEM_SECTION, markdown="\x00")
    body_md: List[str] = []
    for i, b in enumerate(blocks):
        path = [0, i]
        if b["kind"] == "header":
            md = f"{'#' * b['level']} {b['md']}"
            emit(path, elem_type=ELEM_HEADER, markdown=md, text=b["text"],
                 header_level=b["level"])
            body_md.append(md)
        elif b["kind"] == "table":
            md = _table_markdown(b["cells"])
            emit(path, elem_type=ELEM_TABLE, markdown=md,
                 table_cells=b["cells"])
            body_md.append(md)
        else:
            emit(path, elem_type=ELEM_PARAGRAPH, markdown=b["md"],
                 text=b["text"])
            body_md.append(b["md"])
    root_row["markdown"] = "\n\n".join(body_md) or "(empty document)"
    return rows


def parse_rtf_df(df, id_col: str = "doc_id", content_col: str = "content",
                 on_error: str = "fail"):
    """mapInPandas wrapper (shared plumbing: elements_map_df)."""
    from .markdown import elements_map_df

    return elements_map_df(
        df, lambda raw, doc_id: parse_rtf(bytes(raw), doc_id),
        id_col, content_col, on_error)

def read_rtf(spark, path, glob: str = "*.rtf", recursive: bool = False,
             on_error: str = "fail"):
    from .markdown import binary_file_scan

    files = binary_file_scan(spark, path, glob, recursive)
    return parse_rtf_df(files, id_col="path", content_col="content",
                        on_error=on_error)
