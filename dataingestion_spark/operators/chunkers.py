"""Chunkers: ``elements`` DataFrame → ``chunks`` DataFrame.

Chunk packing is an inherently sequential per-document fold (token budgets,
running header stacks, table row accumulation), so the packing engine is
plain Python executed per ``doc_id`` group via ``applyInPandas`` — Arrow
batches in, Arrow batches out, one group per document. Documents are
human-scale (KBs), so per-group work is tiny and cross-document parallelism
is what matters; Spark distributes groups across executors.

Packing semantics are behavior-compatible with the reference engine:

* greedy token-budget packing with the shared ``context`` string re-prepended
  to every chunk (``ElementsChunker.cs:32-212``),
* images contribute alt-text (falling back to OCR text), never their
  markdown; images with neither are skipped (``ElementsChunker.cs:55-69``),
* oversize tables split by data rows with the header + separator row repeated
  in every chunk (``ElementsChunker.cs:77-141``),
* oversize paragraphs split at the last newline that fits, else at the token
  boundary (``ElementsChunker.cs:144-183``),
* a context (or context + table header) that alone reaches the budget is an
  error (``ElementsChunker.cs:46-50,88-92``),
* context-only chunks are never emitted (``ElementsChunker.cs:185-188``).

The header / section / markdown / token / semantic chunkers compose that
engine exactly as the reference does (HeaderChunker.cs, SectionChunker.cs,
MarkdownChunker.cs, DocumentTokenChunker.cs, SemanticSimilarityChunker.cs).
"""

from __future__ import annotations

from collections import defaultdict
from typing import Callable, Iterable, List, Optional, Sequence

from pyspark.sql import functions as F

from ..partitioning import fan_out

from ..model import CHUNKS_SCHEMA, ELEM_HEADER, ELEM_IMAGE, ELEM_SECTION, ELEM_TABLE
from ..tokenizer import default_tokenizer

MAX_HEADER_LEVEL = 10


class ChunkBudgetError(ValueError):
    """Context (+ table header) alone exceeds the token budget."""

    def __init__(self):
        super().__init__(
            "Can't fit in the current chunk. Consider increasing max tokens per chunk."
        )


class ChunkerOptions:
    """Mirror of IngestionChunkerOptions (reference :9-79): max 2000 tokens,
    overlap 500 auto-zeroed when max ≤ 500, cross-validated both ways."""

    def __init__(self, tokenizer=None, max_tokens_per_chunk: int = 2000,
                 overlap_tokens: Optional[int] = None):
        if max_tokens_per_chunk <= 0:
            raise ValueError("max_tokens_per_chunk must be positive")
        if overlap_tokens is None:
            overlap_tokens = 500 if max_tokens_per_chunk > 500 else 0
        if overlap_tokens < 0 or overlap_tokens >= max_tokens_per_chunk:
            raise ValueError("overlap_tokens must be in [0, max_tokens_per_chunk)")
        self.tokenizer = tokenizer or default_tokenizer()
        self.max_tokens_per_chunk = max_tokens_per_chunk
        self.overlap_tokens = overlap_tokens


def _semantic_content(elem: dict) -> Optional[str]:
    if elem["elem_type"] == ELEM_IMAGE:
        return elem.get("image_alt_text") or elem.get("text")
    return elem.get("markdown")


def _render_table_row(cells: Sequence[Optional[str]]) -> str:
    return "".join(f"| {c if c is not None else ''} " for c in cells) + "|\n"


def _render_separator_row(ncols: int) -> str:
    return "| --- " * ncols + "|\n"


def pack_elements(context: str, elements: Iterable[dict], options: ChunkerOptions) -> List[dict]:
    """The packing engine; returns [{'content':…, 'context':…}, …]."""
    tok = options.tokenizer
    max_tokens = options.max_tokens_per_chunk
    chunks: List[dict] = []
    context = context or ""

    ctx_tokens = tok.count(context)
    if ctx_tokens >= max_tokens:
        raise ChunkBudgetError()

    cur = context
    total = ctx_tokens

    def append(span: str):
        nonlocal cur
        cur = cur + "\n" + span if cur else span

    def commit():
        nonlocal cur, total
        chunks.append({"content": cur, "context": context})
        cur = context
        total = ctx_tokens

    for elem in elements:
        semantic = _semantic_content(elem)
        if not semantic:
            continue

        etok = tok.count(semantic)
        if etok + total <= max_tokens:
            total += etok
            append(semantic)
        elif elem["elem_type"] == ELEM_TABLE and elem.get("table_cells"):
            rows = elem["table_cells"]
            ncols = len(rows[0])
            builder = _render_table_row(rows[0]) + _render_separator_row(ncols)
            header_len = len(builder)
            header_tokens = tok.count(builder)

            if ctx_tokens + header_tokens >= max_tokens:
                raise ChunkBudgetError()
            if header_tokens + total >= max_tokens:
                commit()
            total += header_tokens
            table_len = header_len

            for ri in range(1, len(rows)):
                builder += _render_table_row(rows[ri])
                last_tokens = tok.count(builder[table_len:])
                if total + last_tokens > max_tokens:
                    if ri != 1:
                        append(builder[: table_len - 1])  # strip trailing "\n"
                    commit()
                    builder = builder[:header_len]
                    table_len = header_len
                    total += header_tokens
                    if total + last_tokens > max_tokens:
                        raise ChunkBudgetError()
                    builder += _render_table_row(rows[ri])
                table_len = len(builder)
                total += last_tokens

            append(builder[: table_len - 1])
        else:
            remaining = semantic
            while remaining:
                idx, used = tok.index_by_token_count(remaining, max_tokens - total)
                if idx > 0:
                    nl = remaining[:idx].rfind("\n")
                    if nl > 0:
                        idx = nl + 1  # keep the newline with the first part
                        used = tok.count(remaining[:idx])
                    total += used
                    append(remaining[:idx])
                    remaining = remaining[idx:]
                elif total == ctx_tokens:
                    raise ChunkBudgetError()  # a single token doesn't fit
                if remaining:
                    commit()

        if total == max_tokens:
            commit()

    if total > ctx_tokens:
        chunks.append({"content": cur, "context": context})
    return chunks


# ---------------------------------------------------------------------------
# Per-document chunking algorithms over `elements` rows (DFS order by seq).
# Each takes rows (list of dicts, ALL elements incl. sections) and returns
# chunk dicts. They are pure Python → unit-testable without Spark.
# ---------------------------------------------------------------------------

def _leaves(rows: List[dict]) -> List[dict]:
    return [r for r in sorted(rows, key=lambda r: r["seq"]) if r["elem_type"] != ELEM_SECTION]


def header_chunk_doc(rows: List[dict], options: ChunkerOptions) -> List[dict]:
    """Running header-stack chunker (reference HeaderChunker.cs:16-74)."""
    headers: List[Optional[str]] = [None] * (MAX_HEADER_LEVEL + 1)
    pending: List[dict] = []
    out: List[dict] = []

    def flush():
        if pending:
            ctx = " ".join(h for h in headers if h)
            out.extend(pack_elements(ctx, pending, options))
            pending.clear()

    for elem in _leaves(rows):
        if elem["elem_type"] == ELEM_HEADER:
            flush()
            level = min(elem.get("header_level") or 0, MAX_HEADER_LEVEL)
            headers[level] = elem["markdown"]
            for i in range(level + 1, MAX_HEADER_LEVEL + 1):
                headers[i] = None
        else:
            pending.append(elem)
    flush()
    return out


def section_chunk_doc(rows: List[dict], options: ChunkerOptions) -> List[dict]:
    """Per-section chunker with first-header context accumulation
    (reference SectionChunker.cs:14-79)."""
    ordered = sorted(rows, key=lambda r: r["seq"])
    children = defaultdict(list)
    for r in ordered:
        children[tuple(r["section_path"][:-1])].append(r)

    out: List[dict] = []

    def process(section: dict, parent_ctx: str):
        ctx = parent_ctx or ""
        pending: List[dict] = []

        def commit():
            if pending:
                out.extend(pack_elements(ctx, pending, options))
                pending.clear()

        for i, r in enumerate(children[tuple(section["section_path"])]):
            if r["elem_type"] == ELEM_HEADER and i == 0:
                ctx = r["markdown"] if not ctx else f"{ctx} {r['markdown']}"
            elif r["elem_type"] == ELEM_SECTION:
                commit()
                process(r, ctx)
            else:
                pending.append(r)
        commit()

    for top in children[()]:
        if top["elem_type"] == ELEM_SECTION:
            process(top, "")
    return out


def markdown_chunk_doc(rows: List[dict], split_level: int = 3, strip_headers: bool = True) -> List[dict]:
    """Header-level recursive-descent splitter with ``;``-joined context
    (reference MarkdownChunker.cs:18-111). No token budget.

    Bug-compatible quirk: a document whose first header is deeper than
    level 1 gets a leading ';' in its contexts (e.g. ';## Sub') — the
    reference's StringyfyContext joins an empty-string context the same way
    (MarkdownChunker.cs:93-96); we preserve it for golden parity."""
    stack = list(reversed(_leaves(rows)))
    out: List[dict] = []

    def stringify(context: Optional[str], last: Optional[str]) -> str:
        return ";".join(x for x in (context, last) if x is not None)

    def create(body_lines: List[str], context: Optional[str], last: Optional[str]):
        ctx = stringify(context, last)
        body = "\n".join(body_lines) + ("\n" if body_lines else "")
        content = body if strip_headers else ctx + body
        if content.strip():
            out.append({"content": content.rstrip("\n"), "context": ctx})

    def parse_level(level: int, context: Optional[str], last: Optional[str]):
        body: List[str] = []
        while stack:
            elem = stack.pop()
            hl = elem.get("header_level") or 0 if elem["elem_type"] == ELEM_HEADER else 0
            if hl == 0 or hl > split_level:
                body.append(elem["markdown"])
            else:
                create(body, context, last)
                body = []
                if hl == level:
                    last = elem["markdown"]
                elif hl < level:
                    stack.append(elem)
                    return
                else:
                    parse_level(level + 1, stringify(context, last), elem["markdown"])
        create(body, context, last)

    parse_level(1, None, None)
    return out


def _section_markdown(rows: List[dict], path: tuple) -> str:
    """Recomputed section markdown = newline-join of child markdowns
    (reference IngestionDocument.cs:122-147 — recomputed, not cached)."""
    ordered = sorted(rows, key=lambda r: r["seq"])
    kids = [r for r in ordered if tuple(r["section_path"][:-1]) == path]
    parts = []
    for r in kids:
        if r["elem_type"] == ELEM_SECTION:
            parts.append(_section_markdown(rows, tuple(r["section_path"])))
        elif r.get("markdown"):
            parts.append(r["markdown"])
    return "\n".join(parts)


def token_chunk_doc(rows: List[dict], options: ChunkerOptions) -> List[dict]:
    """Fixed token windows with stride max−overlap over the whole-document
    markdown (reference DocumentTokenChunker.cs:19-82)."""
    tok = options.tokenizer
    tops = [r for r in sorted(rows, key=lambda r: r["seq"])
            if r["elem_type"] == ELEM_SECTION and len(r["section_path"]) == 1]
    doc_md = "\n".join(_section_markdown(rows, tuple(t["section_path"])) for t in tops)
    ids = tok.encode(doc_md)
    stride = options.max_tokens_per_chunk - options.overlap_tokens
    out = []
    for i in range(0, len(ids), stride):
        window = ids[i : i + options.max_tokens_per_chunk]
        out.append({"content": tok.decode_raw(window), "context": None})
    return out


def semantic_chunk_doc(rows: List[dict], options: ChunkerOptions,
                       embed_fn: Callable[[List[str]], "np.ndarray"],  # noqa: F821
                       threshold_percentile: float = 95.0) -> List[dict]:
    """Split where neighbour embedding cosine distance exceeds the
    interpolated percentile threshold (reference
    SemanticSimilarityChunker.cs:17-141)."""
    import numpy as np

    if not (0.0 <= threshold_percentile <= 100.0):
        raise ValueError("threshold_percentile must be between 0 and 100")

    elems, contents = [], []
    for elem in _leaves(rows):
        semantic = _semantic_content(elem)
        if semantic:
            elems.append(elem)
            contents.append(semantic)
    if not elems:
        return []

    vecs = np.asarray(embed_fn(contents), dtype=np.float64)
    dists = np.zeros(len(elems))
    for i in range(len(elems) - 1):
        a, b = vecs[i], vecs[i + 1]
        denom = float(np.linalg.norm(a) * np.linalg.norm(b))
        cos = float(a @ b) / denom if denom else 0.0
        dists[i] = 1.0 - cos

    if len(elems) == 1:
        threshold = dists[0]
    else:
        s = np.sort(dists)
        fi = (threshold_percentile / 100.0) * (len(s) - 1)
        i0 = int(fi)
        i1 = min(i0 + 1, len(s) - 1)
        threshold = s[i0] + (fi - i0) * (s[i1] - s[i0])

    out: List[dict] = []
    acc: List[dict] = []
    for elem, dist in zip(elems, dists):
        acc.append(elem)
        if dist > threshold:
            out.extend(pack_elements("", acc, options))
            acc = []
    if acc:
        out.extend(pack_elements("", acc, options))
    return out


# ---------------------------------------------------------------------------
# Spark wrappers: elements DF → chunks DF via applyInPandas per doc_id.
# ---------------------------------------------------------------------------

def _normalize_row(r: dict) -> dict:
    """Undo pandas' nullable-int→float64 and NaN conventions at the Arrow
    boundary: ints back to int, NaN back to None, array cells to lists."""
    import math

    for k, v in r.items():
        if isinstance(v, float):
            if math.isnan(v):
                r[k] = None
            elif k in ("seq", "header_level", "page_number"):
                r[k] = int(v)
    sp = r.get("section_path")
    if sp is not None and not isinstance(sp, list):
        r["section_path"] = [int(x) for x in sp]
    tc = r.get("table_cells")
    if tc is not None and not isinstance(tc, list):
        r["table_cells"] = [list(row) for row in tc]
    return r


def _chunk_rows_out(doc_id, chunks):
    return [
        {
            "chunk_id": f"{doc_id}#{i:06d}",
            "doc_id": doc_id,
            "chunk_seq": i,
            "content": c["content"],
            "context": c.get("context"),
            "metadata": None,
        }
        for i, c in enumerate(chunks)
    ]


def _apply_colocated(elements_df, chunk_fn):
    """Chunk without a shuffle when each document's element rows are already
    co-located in one partition (true straight out of any reader, which
    emits a document's rows together). The fused scan→parse→chunk pipeline
    this enables is the high-throughput ingest path: zero exchanges between
    file read and chunk output."""
    cols = [f.name for f in CHUNKS_SCHEMA.fields]

    def run(batches):
        import pandas as pd

        pdfs = [p for p in batches if len(p)]
        if not pdfs:
            yield pd.DataFrame(columns=cols)
            return
        pdf = pd.concat(pdfs, ignore_index=True) if len(pdfs) > 1 else pdfs[0]
        out = []
        for doc_id, g in pdf.groupby("doc_id", sort=False):
            rows = [_normalize_row(r) for r in g.to_dict("records")]
            out.extend(_chunk_rows_out(doc_id, chunk_fn(rows)))
        yield pd.DataFrame(out, columns=cols) if out else pd.DataFrame(columns=cols)

    return elements_df.mapInPandas(run, schema=CHUNKS_SCHEMA)


def _apply_per_doc(elements_df, chunk_fn, colocated: bool = False):
    """Run a per-document chunking function over the elements DataFrame.

    ``colocated=False`` (default) shuffles on doc_id — correct for any input.
    ``colocated=True`` skips the shuffle via :func:`_apply_colocated` — use
    when elements come straight from a reader (rows per doc contiguous).

    ``elem_type='error'`` rows (quarantine-mode ingestion bookkeeping,
    ``sources/markdown.py::elements_map_df``) are dropped here — they are
    crawl diagnostics, never chunk content; the JVM-side filter also
    prunes whole quarantined documents before the shuffle."""
    elements_df = elements_df.filter(F.col("elem_type") != "error")
    if colocated:
        return _apply_colocated(elements_df, chunk_fn)

    def run(pdf):
        import pandas as pd

        rows = [_normalize_row(r) for r in pdf.to_dict("records")]
        out = _chunk_rows_out(rows[0]["doc_id"], chunk_fn(rows))
        cols = [f.name for f in CHUNKS_SCHEMA.fields]
        return pd.DataFrame(out, columns=cols)

    return elements_df.groupBy("doc_id").applyInPandas(run, schema=CHUNKS_SCHEMA)


def header_chunker(elements_df, options: Optional[ChunkerOptions] = None,
                   colocated: bool = False):
    options = options or ChunkerOptions()
    return _apply_per_doc(
        elements_df, lambda rows: header_chunk_doc(rows, options), colocated
    )


def section_chunker(elements_df, options: Optional[ChunkerOptions] = None,
                    colocated: bool = False):
    options = options or ChunkerOptions()
    return _apply_per_doc(
        elements_df, lambda rows: section_chunk_doc(rows, options), colocated
    )


def markdown_chunker(elements_df, split_level: int = 3, strip_headers: bool = True,
                     colocated: bool = False):
    return _apply_per_doc(
        elements_df,
        lambda rows: markdown_chunk_doc(rows, split_level, strip_headers),
        colocated,
    )


def token_chunker(elements_df, options: Optional[ChunkerOptions] = None,
                  colocated: bool = False):
    options = options or ChunkerOptions()
    return _apply_per_doc(
        elements_df, lambda rows: token_chunk_doc(rows, options), colocated
    )


def semantic_chunker(elements_df, embed_fn, options: Optional[ChunkerOptions] = None,
                     threshold_percentile: float = 95.0, colocated: bool = False):
    options = options or ChunkerOptions()
    return _apply_per_doc(
        elements_df,
        lambda rows: semantic_chunk_doc(rows, options, embed_fn, threshold_percentile),
        colocated,
    )


def parse_and_chunk(src_df, chunk_fn, id_col: str = "doc_id",
                    content_col: str = "markdown"):
    """Single-stage ingest: markdown text → chunks inside ONE mapInPandas.

    Chaining parse_markdown_df and a colocated chunker plans two Python
    operators with a JVM↔Python Arrow crossing between them; fusing them
    keeps the intermediate elements entirely in the Python worker. Use for
    the highest-throughput ingest path when the intermediate elements
    DataFrame isn't needed. ``chunk_fn``: rows → chunk dicts, e.g.
    ``lambda rows: header_chunk_doc(rows, opts)``."""
    from ..sources.markdown import parse_markdown

    cols = [f.name for f in CHUNKS_SCHEMA.fields]

    def run(batches):
        import pandas as pd

        for pdf in batches:
            out = []
            for doc_id, raw in zip(pdf[id_col], pdf[content_col]):
                text = (
                    raw.decode("utf-8", errors="replace")
                    if isinstance(raw, (bytes, bytearray)) else raw
                )
                rows = parse_markdown(text, str(doc_id))
                out.extend(_chunk_rows_out(str(doc_id), chunk_fn(rows)))
            yield pd.DataFrame(out, columns=cols) if out else pd.DataFrame(columns=cols)

    return fan_out(src_df).mapInPandas(run, schema=CHUNKS_SCHEMA)


def image_chunker(elements_df):
    """Non-string chunk content: one binary chunk per image element —
    the reference's ``IngestionChunk<DataContent>`` image-chunker pattern
    (DocumentPipelineTests.cs:152-193). Typed columns instead of generics:
    ``content_binary`` + ``content_media_type`` carry the payload, alt text
    doubles as the searchable text. Pure projection, no shuffle."""
    img = elements_df.filter(
        (F.col("elem_type") == ELEM_IMAGE) & F.col("image_content").isNotNull()
    )
    return img.select(
        F.format_string("%s#img%06d", F.col("doc_id"), F.col("seq")).alias("chunk_id"),
        F.col("doc_id"),
        F.col("seq").cast("int").alias("chunk_seq"),
        F.coalesce(F.col("image_alt_text"), F.col("text")).alias("content"),
        F.col("image_content").alias("content_binary"),
        F.col("image_media_type").alias("content_media_type"),
        F.lit(None).cast("string").alias("context"),
        F.col("metadata"),
    )


def token_chunk_text(df, text_col: str = "text", id_col: str = "doc_id",
                     max_tokens: int = 128, overlap: int = 32):
    """Relational sliding-window token chunker over a plain-text column.

    Same windowing rule as token_chunker (stride = max − overlap over
    whitespace tokens) but expressed entirely with built-in functions —
    split / sequence / slice / explode stay JVM-side with whole-stage
    codegen, so this is the 100 TB-scale path for flat text corpora.
    """
    toks = F.split(F.trim(F.col(text_col)), r"\s+")
    stride = max_tokens - overlap
    if stride <= 0:
        raise ValueError("overlap must be smaller than max_tokens")
    n = F.size(toks)
    # ceil(n/stride) windows — the same rule as token_chunk_doc's
    # range(0, n, stride); ceil((n-1)/stride) would drop the final window
    # whenever n ≡ 1 (mod stride), losing trailing tokens at overlap 0.
    starts = F.sequence(F.lit(0), F.greatest(F.ceil(n / F.lit(stride)) - 1, F.lit(0)))
    return (
        df.withColumn("_toks", toks)
        .withColumn("win", F.explode(starts))
        .select(
            F.col(id_col).cast("string").alias("doc_id"),
            F.col("win").cast("int").alias("chunk_seq"),
            F.array_join(
                F.slice(F.col("_toks"), F.col("win") * stride + 1, max_tokens), " "
            ).alias("content"),
        )
        .withColumn("chunk_id", F.format_string("%s#%06d", F.col("doc_id"), F.col("chunk_seq")))
        .select("chunk_id", "doc_id", "chunk_seq", "content")
    )
