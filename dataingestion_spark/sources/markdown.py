"""Markdown → ``elements`` DataFrame reader.

Behavioral counterpart of the reference MarkdownReader
(``src/Microsoft.Extensions.DataIngestion.Markdown/MarkdownReader.cs:18-316``),
which parses with Markdig and maps blocks to the element tree. No markdown
library ships in this environment, so the block-level parser here is written
from scratch for the constructs the reference handles:

* ATX headings → header elements with level (``MarkdownReader.cs:151-155``),
* a paragraph following a thematic break → footer (``:102-107,156``),
* image-only paragraphs ``![alt](url)`` → image elements; ``data:image/png``
  URIs get their bytes base64-decoded (``:157-167``),
* pipe tables → table elements with a cell matrix, first row = header; a
  bogus all-empty first row (MarkItDown artifact) is skipped (``:264-314``),
* lists and block quotes → sections holding their leaf items (``:179-221``),
* fenced code blocks → paragraphs whose text is the code (``:168-171``),
* setext headings (``=``/``-`` underlines) → header elements level 1/2
  (Markdig parses both heading forms into the same HeadingBlock),
* nested lists → nested sections (Markdig nests ListBlocks in
  ListItemBlocks),
* link reference definitions render nothing; ``[text][label]`` inlines
  strip to their text,
* HTML blocks → paragraphs with tag-stripped text (comment-only blocks
  render nothing),
* everything else → paragraphs; a single root section wraps the document
  whose markdown is the whole file (``:93-97``).

Spark entry point :func:`read_markdown` scans files with the ``binaryFile``
source (distributed listing + reads, partitioned by file) and parses inside
``mapInPandas`` so a directory of N files parallelizes across the cluster —
unlike the reference's strictly sequential file loop
(``IngestionPipeline.cs:121``).
"""

from __future__ import annotations

import base64
import html as _html
import re
from typing import Iterator, List, Optional

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

_ATX_RE = re.compile(r"^(#{1,6})\s+(.*?)\s*#*\s*$")
_BREAK_RE = re.compile(r"^ {0,3}(?:(?:-[ \t]*){3,}|(?:\*[ \t]*){3,}|(?:_[ \t]*){3,})$")
_TABLE_SEP_RE = re.compile(r"^\s*\|?\s*:?-{3,}:?\s*(\|\s*:?-{3,}:?\s*)*\|?\s*$")
_IMAGE_RE = re.compile(r"^!\[(?P<alt>[^\]]*)\]\((?P<url>[^)]*)\)\s*$")
_LIST_ITEM_RE = re.compile(r"^ {0,3}(?:[-*+]|\d{1,9}[.)])\s+(.*)$")
_ANY_LIST_ITEM_RE = re.compile(r"^(\s*)([-*+]|\d{1,9}[.)])\s+(.*)$")
_FENCE_RE = re.compile(r"^ {0,3}(```+|~~~+)\s*(\S*)\s*$")
# Setext underline: '=' (h1) or '-' (h2) directly under paragraph content
# (CommonMark 4.3 — takes precedence over a thematic break in that position).
_SETEXT_RE = re.compile(r"^ {0,3}(=+|-+)\s*$")
# Link reference definition: renders nothing (CommonMark 4.7).
_LINKDEF_RE = re.compile(r"^ {0,3}\[[^\]]+\]:\s*\S+(\s+(\"[^\"]*\"|'[^']*'|\([^)]*\)))?\s*$")
# HTML block opener: a tag/comment/declaration at line start (CommonMark 4.6,
# reduced: the block runs to the next blank line).
_HTML_RE = re.compile(r"^ {0,3}(</?[A-Za-z][A-Za-z0-9-]*(\s|/?>|$)|<!--|<\?|<![A-Za-z])")
_TAG_STRIP_RE = re.compile(r"<!--.*?-->|<[^>]+>", re.S)
_DATA_PNG_PREFIX = "data:image/png;base64,"

# Inline markup stripped when deriving plain text from markdown
# (the reference walks Markdig's inline tree; a regex pass is equivalent
# for the inline constructs it supports: emphasis, code, links).
_INLINE_PATTERNS = [
    (re.compile(r"!\[([^\]]*)\]\([^)]*\)"), r"\1"),  # images → alt
    (re.compile(r"\[([^\]]*)\]\([^)]*\)"), r"\1"),  # links → text
    (re.compile(r"!\[([^\]]*)\]\[[^\]]*\]"), r"\1"),  # reference images → alt
    (re.compile(r"\[([^\]]*)\]\[[^\]]*\]"), r"\1"),  # reference links → text
    (re.compile(r"\*\*([^*]+)\*\*"), r"\1"),
    (re.compile(r"__([^_]+)__"), r"\1"),
    (re.compile(r"\*([^*]+)\*"), r"\1"),
    (re.compile(r"(?<![A-Za-z0-9_])_([^_]+)_(?![A-Za-z0-9_])"), r"\1"),
    (re.compile(r"`([^`]*)`"), r"\1"),
]


def inline_text(markdown: str) -> str:
    text = markdown
    for pat, rep in _INLINE_PATTERNS:
        text = pat.sub(rep, text)
    return text


def _strip_quote_marker(line: str) -> str:
    line = re.sub(r"^ {0,3}> ?", "", line)
    return line


def _split_table_row(line: str) -> List[str]:
    s = line.strip()
    if s.startswith("|"):
        s = s[1:]
    if s.endswith("|"):
        s = s[:-1]
    # Split on unescaped pipes.
    cells = re.split(r"(?<!\\)\|", s)
    return [c.strip().replace("\\|", "|") for c in cells]


class _Ctx:
    """Parser emit state: running seq counter + output rows."""

    def __init__(self, doc_id: str):
        self.doc_id = doc_id
        self.rows: List[dict] = []
        self.seq = 0

    def emit(self, section_path, **kw) -> dict:
        row = element_row(self.doc_id, self.seq, section_path, **kw)
        self.rows.append(row)
        self.seq += 1
        return row


def parse_markdown(content: str, doc_id: str) -> List[dict]:
    """Parse one markdown document into ``elements`` rows (DFS preorder).

    Line endings are normalized to ``\\n`` (the reference joins with
    Environment.NewLine and its tests ignore line-ending differences —
    SURVEY §7.3 pins us to LF)."""
    if not content:
        raise ValueError("content must be non-empty")
    content = content.replace("\r\n", "\n").replace("\r", "\n")
    ctx = _Ctx(doc_id)
    # Root section wraps the whole document (MarkdownReader.cs:93-97).
    ctx.emit([0], elem_type=ELEM_SECTION, markdown=content)
    _parse_blocks(ctx, content.split("\n"), [0], top_level=True)
    return ctx.rows


def _emit_list_items(ctx: _Ctx, block_lines: List[str], sec_path: List[int]) -> None:
    """Emit one list level: a paragraph per item at this indent, and a
    nested section (recursing) for any deeper-indented sublist inside an
    item. Same-level detection is by marker indent relative to the first
    item; non-item lines are lazy continuations of whatever they follow."""
    base = len(_ANY_LIST_ITEM_RE.match(block_lines[0]).group(1))
    # group into items: (text_lines, sub_lines)
    items: List[tuple] = []
    for ln in block_lines:
        m = _ANY_LIST_ITEM_RE.match(ln)
        if m and len(m.group(1)) <= base:
            items.append(([m.group(3)], []))
        elif m and items:
            items[-1][1].append(ln)  # deeper-indented item → sublist line
        elif items:
            if items[-1][1]:
                items[-1][1].append(ln)  # continuation inside the sublist
            else:
                items[-1][0].append(ln.strip())  # lazy continuation
        # else: malformed leading continuation — unreachable, block starts
        # with an item by construction
    k = 0
    for text_lines, sub_lines in items:
        text = "\n".join(t for t in text_lines if t)
        if text.strip():
            ctx.emit(
                sec_path + [k],
                elem_type=ELEM_PARAGRAPH,
                markdown=text,
                text=inline_text(text),
            )
            k += 1
        if sub_lines:
            sub_path = sec_path + [k]
            k += 1
            ctx.emit(sub_path, elem_type=ELEM_SECTION, markdown="\n".join(sub_lines))
            _emit_list_items(ctx, sub_lines, sub_path)


def _parse_blocks(ctx: _Ctx, lines: List[str], path: List[int], top_level: bool) -> None:
    child = sum(
        1 for r in ctx.rows if len(r["section_path"]) == len(path) + 1
        and r["section_path"][: len(path)] == path
    )
    i, n = 0, len(lines)
    previous_was_break = False

    def next_path():
        nonlocal child
        p = path + [child]
        child += 1
        return p

    while i < n:
        line = lines[i]
        if not line.strip():
            i += 1
            continue

        # Thematic break: remembered so the following paragraph becomes a
        # footer; the break itself emits nothing (MarkdownReader.cs:102-107).
        if _BREAK_RE.match(line.strip()) and not _LIST_ITEM_RE.match(line):
            previous_was_break = True
            i += 1
            continue

        # ATX heading.
        m = _ATX_RE.match(line)
        if m:
            ctx.emit(
                next_path(),
                elem_type=ELEM_HEADER,
                markdown=line.strip(),
                text=inline_text(m.group(2)),
                header_level=len(m.group(1)),
            )
            previous_was_break = False
            i += 1
            continue

        # Fenced code block → paragraph whose text is the code.
        m = _FENCE_RE.match(line)
        if m:
            fence = m.group(1)[0] * 3
            j = i + 1
            code_lines = []
            while j < n and not lines[j].strip().startswith(fence):
                code_lines.append(lines[j])
                j += 1
            block_md = "\n".join(lines[i : min(j + 1, n)])
            ctx.emit(
                next_path(),
                elem_type=ELEM_PARAGRAPH,
                markdown=block_md,
                text="\n".join(code_lines),
            )
            previous_was_break = False
            i = j + 1
            continue

        # Pipe table: current line is a row and the next is the separator.
        if "|" in line and i + 1 < n and _TABLE_SEP_RE.match(lines[i + 1]) and "|" in lines[i + 1]:
            j = i + 2
            while j < n and lines[j].strip() and "|" in lines[j]:
                j += 1
            block_lines = lines[i:j]
            header = _split_table_row(block_lines[0])
            rows = [header] + [_split_table_row(r) for r in block_lines[2:]]
            width = len(header)
            cells = [
                [(r[c] if c < len(r) and r[c] != "" else None) for c in range(width)]
                for r in rows
            ]
            # MarkItDown artifact: all-empty first row before the separator
            # is dropped (MarkdownReader.cs:293-314).
            if cells and all(c is None for c in cells[0]):
                cells = cells[1:]
            ctx.emit(
                next_path(),
                elem_type=ELEM_TABLE,
                markdown="\n".join(block_lines),
                table_cells=cells,
            )
            previous_was_break = False
            i = j
            continue

        # List → section of items; items carrying a deeper-indented sublist
        # get that sublist as a nested section (MarkdownReader.cs:179-204 —
        # Markdig nests ListBlocks inside ListItemBlocks the same way).
        if _LIST_ITEM_RE.match(line):
            j = i
            while j < n and lines[j].strip():
                j += 1
            block_lines = lines[i:j]
            sec_path = next_path()
            ctx.emit(sec_path, elem_type=ELEM_SECTION, markdown="\n".join(block_lines))
            _emit_list_items(ctx, block_lines, sec_path)
            previous_was_break = False
            i = j
            continue

        # Block quote → section of inner blocks (MarkdownReader.cs:206-221).
        if line.lstrip().startswith(">"):
            j = i
            inner: List[str] = []
            while j < n and lines[j].strip():
                inner.append(_strip_quote_marker(lines[j]))
                j += 1
            block_md = "\n".join(lines[i:j])
            sec_path = next_path()
            ctx.emit(sec_path, elem_type=ELEM_SECTION, markdown=block_md)
            _parse_blocks(ctx, inner, sec_path, top_level=False)
            previous_was_break = False
            i = j
            continue

        # Link reference definition: defines a label, renders nothing.
        if _LINKDEF_RE.match(line):
            previous_was_break = False
            i += 1
            continue

        # HTML block → paragraph whose text is the tag-stripped content;
        # a pure comment/processing-instruction block renders nothing.
        if _HTML_RE.match(line):
            j = i
            while j < n and lines[j].strip():
                j += 1
            block_md = "\n".join(lines[i:j])
            text = _html.unescape(_TAG_STRIP_RE.sub("", block_md)).strip()
            if text:
                ctx.emit(
                    next_path(),
                    elem_type=ELEM_PARAGRAPH,
                    markdown=block_md,
                    text=text,
                )
            previous_was_break = False
            i = j
            continue

        # Paragraph (may be an image-only paragraph or a footer). Lists,
        # quotes, fences, and tables interrupt a paragraph even without a
        # blank line (CommonMark interruption rules).
        def interrupts(k: int) -> bool:
            ln = lines[k]
            return bool(
                _ATX_RE.match(ln)
                or (_BREAK_RE.match(ln.strip()) and not _LIST_ITEM_RE.match(ln))
                or (k > i and _LIST_ITEM_RE.match(ln))
                or (k > i and ln.lstrip().startswith(">"))
                or (k > i and _FENCE_RE.match(ln))
                or (
                    k > i and "|" in ln and k + 1 < n
                    and _TABLE_SEP_RE.match(lines[k + 1]) and "|" in lines[k + 1]
                )
            )

        j = i
        para: List[str] = []
        setext_level = 0
        while j < n and lines[j].strip():
            # Setext underline directly under paragraph content → heading
            # (checked before interruption: '---' here is an underline, not
            # a thematic break, per CommonMark precedence).
            if j > i and _SETEXT_RE.match(lines[j]):
                setext_level = 1 if lines[j].strip()[0] == "=" else 2
                j += 1
                break
            if interrupts(j):
                break
            para.append(lines[j])
            j += 1
        if setext_level:
            heading = "\n".join(para)
            ctx.emit(
                next_path(),
                elem_type=ELEM_HEADER,
                markdown="\n".join(lines[i:j]),
                text=inline_text(heading.strip()),
                header_level=setext_level,
            )
            previous_was_break = False
            i = j
            continue
        block_md = "\n".join(para)
        img = _IMAGE_RE.match(block_md.strip())
        if img:
            url = img.group("url")
            is_png = url.startswith(_DATA_PNG_PREFIX)
            content_bytes: Optional[bytes] = None
            if is_png:
                try:
                    content_bytes = base64.b64decode(url[len(_DATA_PNG_PREFIX):])
                except Exception:
                    content_bytes = None
            ctx.emit(
                next_path(),
                elem_type=ELEM_IMAGE,
                markdown=block_md.strip(),
                image_alt_text=img.group("alt") or None,
                image_content=content_bytes,
                image_media_type="image/png" if is_png else None,
            )
        elif previous_was_break:
            ctx.emit(
                next_path(),
                elem_type=ELEM_FOOTER,
                markdown=block_md,
                text=inline_text(block_md),
            )
        else:
            ctx.emit(
                next_path(),
                elem_type=ELEM_PARAGRAPH,
                markdown=block_md,
                text=inline_text(block_md),
            )
        previous_was_break = False
        i = j

    _ = top_level  # footers may appear in nested blocks too; kept for clarity


def binary_file_scan(spark, path, glob: str = "*", recursive: bool = False):
    """Shared distributed file scan: (path, content) rows."""
    return (
        spark.read.format("binaryFile")
        .option("pathGlobFilter", glob)
        .option("recursiveFileLookup", str(recursive).lower())
        .load(str(path))
        .select("path", "content")
    )


def stream_binary_files(spark, path, glob: str = "*",
                        max_files_per_trigger=None):
    """Streaming twin of :func:`binary_file_scan`: tail a landing
    directory of binary shards with the file stream source's
    checkpointed exactly-once discovery. Feeds the same mapInPandas
    parsers as the batch scan (warc/tfrecord/avro streaming ingest).
    ``max_files_per_trigger`` paces catch-up after downtime."""
    reader = (spark.readStream.format("binaryFile")
              # streaming sources need the schema up front; binaryFile's
              # is fixed by the format
              .schema("path string, modificationTime timestamp, "
                      "length long, content binary")
              .option("pathGlobFilter", glob))
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger",
                               str(max_files_per_trigger))
    return reader.load(str(path)).select("path", "content")


def elements_map_df(df, parse_fn, id_col: str = "doc_id",
                    content_col: str = "content", on_error: str = "fail"):
    """Shared reader plumbing for EVERY parser in this package: run
    ``parse_fn(raw, doc_id) -> element rows`` over (id, content) rows
    inside ``mapInPandas``. ``on_error='fail'`` propagates parser errors
    (reference contract: bad content is an error); ``'skip'`` drops the
    offending document — the setting for a 100 TB crawl where one bad
    file must not kill the job; ``'quarantine'`` keeps the failure
    VISIBLE instead of silent: the bad document yields one ``elem_type=
    'error'`` row (error class + message in ``metadata``) in the same
    scan, so the crawl report is ``filter(elem_type = 'error')`` — no
    second pass, no side channel — while every chunker/processor ignores
    the row by its type filter. One implementation ⇒ the error contract
    is a one-place change, not N copies across readers."""
    if on_error not in ("fail", "skip", "quarantine"):
        raise ValueError("on_error must be 'fail', 'skip' or 'quarantine'")

    def run(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:  # noqa: F821
        import pandas as pd

        cols = [f.name for f in ELEMENTS_SCHEMA.fields]
        for pdf in batches:
            out: List[dict] = []
            for doc_id, raw in zip(pdf[id_col], pdf[content_col]):
                try:
                    out.extend(parse_fn(raw, str(doc_id)))
                except Exception as e:
                    if on_error == "fail":
                        raise
                    if on_error == "quarantine":
                        out.append(element_row(
                            doc_id=str(doc_id), seq=0, section_path=[0],
                            elem_type="error",
                            markdown=f"[ingestion error] {type(e).__name__}",
                            text=str(e)[:500],
                            metadata={"error_type": type(e).__name__},
                        ))
            yield pd.DataFrame(out, columns=cols) if out else pd.DataFrame(columns=cols)

    return df.mapInPandas(run, schema=ELEMENTS_SCHEMA)


def read_markdown(spark, path, glob: str = "*.md", recursive: bool = False,
                  on_error: str = "fail"):
    """Scan ``path`` with the distributed binaryFile source and parse each
    file into ``elements`` rows. Counterpart of directory ingestion
    (``IngestionPipeline.cs:47-85``) with cross-file parallelism for free.
    ``on_error='skip'`` drops undecodable/empty files instead of failing the
    job (one zero-byte file must not abort a 10k-file ingest).
    """
    files = binary_file_scan(spark, path, glob, recursive)
    return parse_markdown_df(files, id_col="path", content_col="content",
                             on_error=on_error)


def read_markdown_urls(spark, urls, timeout: int = 30, on_error: str = "fail"):
    """Ingest markdown documents from URLs (http/https/file), identifier =
    the URL — the reference's remote-ingestion surface
    (DocumentReaderConformanceTests.cs:19-27,42-54). Fetches run inside the
    executors' ``mapInPandas`` (parallel across URLs, nothing through the
    driver)."""
    src = spark.createDataFrame([(u,) for u in urls], "url string")

    def run(batches):
        import urllib.request

        import pandas as pd

        for pdf in batches:
            rows = []
            for u in pdf["url"]:
                try:
                    with urllib.request.urlopen(u, timeout=timeout) as resp:
                        rows.append((u, resp.read()))
                except Exception:
                    if on_error == "fail":
                        raise
            yield pd.DataFrame(rows, columns=["url", "content"])

    fetched = src.repartition(max(1, min(len(urls), 64))).mapInPandas(
        run, schema="url string, content binary"
    )
    return parse_markdown_df(fetched, id_col="url", content_col="content",
                             on_error=on_error)


def parse_markdown_df(df, id_col: str = "doc_id", content_col: str = "markdown",
                      on_error: str = "fail"):
    """Parse a DataFrame of (id, markdown-text|bytes) into elements rows.

    ``on_error='fail'`` propagates parser errors (reference contract: empty
    content is an error); ``'skip'`` drops undecodable/empty documents — the
    pragmatic setting for a 100 TB crawl where one bad file must not kill
    the job."""
    def parse(raw, doc_id):
        text = raw.decode("utf-8", errors="replace") \
            if isinstance(raw, (bytes, bytearray)) else raw
        return parse_markdown(text, doc_id)

    return elements_map_df(df, parse, id_col, content_col, on_error)
