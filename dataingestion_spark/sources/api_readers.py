"""Cloud-parser readers: MarkItDown, Azure Document Intelligence, LlamaParse.

The reference ships three readers that delegate parsing to external engines
(``MarkItDownReader.cs``, ``DocumentIntelligenceReader.cs:17-335``,
``LlamaParseReader.cs:16-232``). Their *service calls* can't run here (no
network, no markitdown package), but everything else is real and tested:

* the **response→elements mapping** is implemented as pure functions over the
  services' documented JSON shapes (section trees with JSON-pointer refs for
  ADI, page/item lists for LlamaParse), so swapping in a live HTTP call is
  only a transport change;
* the **Spark plumbing** is the standard API-reader pattern: binaryFile scan
  → repartition to bound concurrent calls → ``mapInPandas`` batch with a
  rate-limited client → elements rows.

Every reader raises a clear error when its backend is unavailable instead of
silently degrading.
"""

from __future__ import annotations

from typing import Iterator, List, Optional

from ..model import ELEMENTS_SCHEMA, element_row
from .markdown import binary_file_scan, parse_markdown

# ---------------------------------------------------------------------------
# MarkItDown: office formats → markdown → the markdown element parser
# (reference shells out to the CLI, MarkItDownReader.cs:43-89; in-process
# library call here when installed)
# ---------------------------------------------------------------------------


def markitdown_available() -> bool:
    try:
        import markitdown  # noqa: F401

        return True
    except ImportError:
        return False


def read_markitdown(spark, path, glob: str = "*", recursive: bool = False):
    """binaryFile scan → markitdown conversion → markdown parser. Requires
    the ``markitdown`` package (not in this image)."""
    if not markitdown_available():
        raise NotImplementedError(
            "MarkItDownReader needs the 'markitdown' package; convert files "
            "to markdown out-of-band and use read_markdown(), or install it."
        )
    files = binary_file_scan(spark, path, glob, recursive)

    def run(batches) -> Iterator:
        import io

        import pandas as pd
        from markitdown import MarkItDown

        md = MarkItDown()
        cols = [f.name for f in ELEMENTS_SCHEMA.fields]
        for pdf in batches:
            out: List[dict] = []
            for _, r in pdf.iterrows():
                converted = md.convert_stream(io.BytesIO(r["content"]))
                out.extend(parse_markdown(converted.text_content, str(r["path"])))
            yield pd.DataFrame(out, columns=cols) if out else pd.DataFrame(columns=cols)

    return files.mapInPandas(run, schema=ELEMENTS_SCHEMA)


# ---------------------------------------------------------------------------
# Azure Document Intelligence result mapping
# (DocumentIntelligenceReader.cs:209-334: JSON-pointer section refs,
#  paragraph roles → header/footer, '#'-count header levels, cell matrices)
# ---------------------------------------------------------------------------

_ADI_HEADER_ROLES = {"title", "sectionHeading", "pageHeader"}
_ADI_FOOTER_ROLES = {"pageFooter", "footnote"}


def adi_result_to_elements(result: dict, doc_id: str) -> List[dict]:
    """Map an ADI ``analyzeResult`` dict (prebuilt-layout, markdown output)
    to elements rows. Handles /sections|/paragraphs|/tables|/figures
    JSON-pointer refs, role-based typing, and header levels from leading
    '#' marks."""
    paragraphs = result.get("paragraphs", [])
    tables = result.get("tables", [])
    figures = result.get("figures", [])
    sections = result.get("sections", [])

    rows: List[dict] = []
    seq = [0]

    def emit(path, **kw):
        rows.append(element_row(doc_id, seq[0], path, **kw))
        seq[0] += 1

    def page_of(obj) -> Optional[int]:
        regions = obj.get("boundingRegions") or []
        return regions[0].get("pageNumber") if regions else None

    def para_element(path, p):
        content = p.get("content", "") or " "
        role = p.get("role")
        if role in _ADI_HEADER_ROLES:
            stripped = content.lstrip("#")
            level = len(content) - len(stripped) or 1
            emit(path, elem_type="header", markdown=content,
                 text=stripped.strip(), header_level=level, page_number=page_of(p))
        elif role in _ADI_FOOTER_ROLES:
            emit(path, elem_type="footer", markdown=content,
                 text=content, page_number=page_of(p))
        else:
            emit(path, elem_type="paragraph", markdown=content,
                 text=content, page_number=page_of(p))

    def table_element(path, t):
        nrows = t.get("rowCount", 0)
        ncols = t.get("columnCount", 0)
        cells: List[List[Optional[str]]] = [[None] * ncols for _ in range(nrows)]
        for cell in t.get("cells", []):
            content = cell.get("content") or None
            r0, c0 = cell.get("rowIndex", 0), cell.get("columnIndex", 0)
            # merged cells duplicated across their span (reference :314-334)
            for dr in range(cell.get("rowSpan", 1)):
                for dc in range(cell.get("columnSpan", 1)):
                    if r0 + dr < nrows and c0 + dc < ncols:
                        cells[r0 + dr][c0 + dc] = content
        md = "\n".join(
            "| " + " | ".join(c or "" for c in row) + " |" for row in cells
        ) or "| |"
        emit(path, elem_type="table", markdown=md, table_cells=cells,
             page_number=page_of(t))

    def resolve(ref: str):
        # "/paragraphs/3" → ("paragraphs", 3)
        parts = ref.strip("/").split("/")
        return parts[0], int(parts[1])

    def walk_section(section, path):
        emit(path, elem_type="section", markdown=section.get("content") or "§")
        child = 0
        for ref in section.get("elements", []):
            kind, idx = resolve(ref)
            sub_path = path + [child]
            child += 1
            if kind == "sections":
                walk_section(sections[idx], sub_path)
            elif kind == "paragraphs":
                para_element(sub_path, paragraphs[idx])
            elif kind == "tables":
                table_element(sub_path, tables[idx])
            elif kind == "figures":
                fig = figures[idx]
                emit(sub_path, elem_type="image",
                     markdown=fig.get("content") or None,
                     image_alt_text=(fig.get("caption") or {}).get("content"),
                     page_number=page_of(fig))

    if sections:
        walk_section(sections[0], [0])
    else:
        emit([0], elem_type="section", markdown=result.get("content") or "§")
        for i, p in enumerate(paragraphs):
            para_element([0, i], p)
    return rows


def _api_reader_run(spark, path, glob, recursive, transport, map_fn,
                    requests_per_second, max_concurrency, retry=None,
                    on_error: str = "fail"):
    """Shared API-reader Spark shape: binaryFile scan → ``mapInPandas``
    where each PARTITION owns one rate-limited
    :class:`~dataingestion_spark.model_client.BatchingModelClient`
    (token-bucket backpressure + decorrelated-jitter retries) wrapping
    the injectable ``transport(bytes, path) -> result dict``; results go
    through the pure ``map_fn(result, doc_id) -> element rows``. The
    repartition bounds GLOBAL concurrency at partitions ×
    ``max_concurrency`` — the knob a 10k-file ingest needs so the
    cluster doesn't stampede a rate-limited cloud parser."""
    from ..model_client import BatchingModelClient, RetryPolicy

    files = binary_file_scan(spark, path, glob, recursive)
    n_parts = 8
    retry = retry or RetryPolicy()

    def run(batches) -> Iterator:
        from concurrent.futures import ThreadPoolExecutor

        import pandas as pd

        client = BatchingModelClient(
            call_fn=lambda chunk: [transport(data, p) for data, p in chunk],
            batch_size=1,
            max_concurrency=max_concurrency,
            requests_per_second=requests_per_second,
            retry=retry,
        )
        cols = [f.name for f in ELEMENTS_SCHEMA.fields]
        # one future per DOCUMENT (each a single-chunk client call) so a
        # poisoned file that exhausts its retries fails alone —
        # on_error='skip' drops it instead of killing the whole ingest;
        # concurrency comes from this pool, rate limiting from the
        # client's shared token bucket
        pool = ThreadPoolExecutor(max_workers=max_concurrency)
        try:
            for pdf in batches:
                items = [(bytes(r["content"]), str(r["path"]))
                         for _, r in pdf.iterrows()]
                futs = [pool.submit(client, [item]) for item in items]
                out: List[dict] = []
                for (data, doc_id), fut in zip(items, futs):
                    try:
                        result = fut.result()[0]
                        out.extend(map_fn(result, doc_id))
                    except Exception:
                        if on_error == "fail":
                            raise
                yield (pd.DataFrame(out, columns=cols) if out
                       else pd.DataFrame(columns=cols))
        finally:
            pool.shutdown(wait=True)
            client.close()

    return files.repartition(n_parts).mapInPandas(run, schema=ELEMENTS_SCHEMA)


def adi_http_transport(endpoint: str, key: str,
                       model: str = "prebuilt-layout",
                       api_version: str = "2024-02-29-preview",
                       poll_interval: float = 2.0,
                       timeout: float = 300.0):
    """Azure Document Intelligence analyze transport: POST the document
    to ``{endpoint}/documentintelligence/documentModels/{model}:analyze``
    (markdown output format, as the reference configures —
    ``DocumentIntelligenceReader.cs:90``), follow the
    ``Operation-Location`` long poll until ``succeeded``, return the
    ``analyzeResult`` dict. stdlib urllib only; raises on terminal
    failure so the client's retry policy can re-drive transient ones."""
    import json as _json
    import time as _time
    import urllib.request

    def transport(data: bytes, doc_id: str) -> dict:
        url = (f"{endpoint.rstrip('/')}/documentintelligence/documentModels/"
               f"{model}:analyze?api-version={api_version}"
               f"&outputContentFormat=markdown")
        req = urllib.request.Request(
            url, data=data, method="POST",
            headers={"Ocp-Apim-Subscription-Key": key,
                     "Content-Type": "application/octet-stream"})
        # every urlopen carries a socket timeout: a half-open connection
        # must fail into the client's retry policy, not hang the task
        with urllib.request.urlopen(req, timeout=min(timeout, 120.0)) as resp:
            op_url = resp.headers["Operation-Location"]
        deadline = _time.monotonic() + timeout
        while True:
            poll = urllib.request.Request(
                op_url, headers={"Ocp-Apim-Subscription-Key": key})
            with urllib.request.urlopen(
                    poll, timeout=max(poll_interval * 5, 30.0)) as resp:
                body = _json.loads(resp.read())
            status = body.get("status")
            if status == "succeeded":
                return body.get("analyzeResult", {})
            if status in ("failed", "canceled"):
                raise RuntimeError(f"{doc_id}: analyze {status}: "
                                   f"{body.get('error')}")
            if _time.monotonic() > deadline:
                raise TimeoutError(f"{doc_id}: analyze still {status} after "
                                   f"{timeout}s")
            _time.sleep(poll_interval)

    return transport


def read_document_intelligence(spark, path, endpoint: Optional[str] = None,
                               key: Optional[str] = None, glob: str = "*",
                               recursive: bool = False, transport=None,
                               requests_per_second: float = 2.0,
                               max_concurrency: int = 4, retry=None,
                               on_error: str = "fail", **transport_kw):
    """Azure Document Intelligence reader, live transport wired through
    the rate-limited API-reader shape (``_api_reader_run``). Pass
    ``transport`` to inject a recorded-fixture fake (tests) or a custom
    HTTP stack; otherwise ``endpoint`` + ``key`` build the real
    long-polling analyze transport (:func:`adi_http_transport`)."""
    if transport is None:
        if not endpoint or not key:
            raise ValueError(
                "read_document_intelligence needs endpoint+key for the live "
                "service, or an injected transport(data, doc_id) -> "
                "analyzeResult dict")
        transport = adi_http_transport(endpoint, key, **transport_kw)
    return _api_reader_run(spark, path, glob, recursive, transport,
                           adi_result_to_elements, requests_per_second,
                           max_concurrency, retry, on_error)


# ---------------------------------------------------------------------------
# LlamaParse result mapping (LlamaParseReader.cs:128-231: page sections with
# width/height metadata, page header/footer markdown, items, per-page images)
# ---------------------------------------------------------------------------


def llamaparse_result_to_elements(result: dict, doc_id: str) -> List[dict]:
    """Map a LlamaParse JSON result ({"pages": [...]}) to elements rows."""
    rows: List[dict] = []
    seq = [0]

    def emit(path, **kw):
        rows.append(element_row(doc_id, seq[0], path, **kw))
        seq[0] += 1

    for pi, page in enumerate(result.get("pages", [])):
        page_no = page.get("page", pi + 1)
        meta = {
            k: str(page[k]) for k in ("width", "height", "confidence") if k in page
        }
        emit([pi], elem_type="section", markdown=page.get("md") or page.get("text") or "§",
             page_number=page_no, metadata=meta or None)
        child = 0

        def sub():
            nonlocal child
            p = [pi, child]
            child += 1
            return p

        if page.get("pageHeaderMarkdown"):
            emit(sub(), elem_type="header", markdown=page["pageHeaderMarkdown"],
                 text=page["pageHeaderMarkdown"], page_number=page_no)
        for item in page.get("items", []):
            kind = item.get("type")
            md = item.get("md") or item.get("value") or ""
            if not md:
                continue
            if kind == "heading":
                emit(sub(), elem_type="header", markdown=md,
                     text=item.get("value") or md,
                     header_level=item.get("lvl"), page_number=page_no)
            elif kind == "table":
                table_rows = [
                    r for r in (item.get("rows") or []) if any(c for c in r)
                ]  # empty-row workaround (reference :218-231)
                cells = [[c or None for c in r] for r in table_rows] or None
                emit(sub(), elem_type="table", markdown=md,
                     table_cells=cells, page_number=page_no)
            else:
                emit(sub(), elem_type="paragraph", markdown=md,
                     text=item.get("value") or md, page_number=page_no)
        for img in page.get("images", []):
            import base64

            raw = img.get("base64")
            emit(sub(), elem_type="image", markdown=img.get("name"),
                 image_content=base64.b64decode(raw) if raw else None,
                 image_media_type=img.get("type"), page_number=page_no)
        if page.get("pageFooterMarkdown"):
            emit(sub(), elem_type="footer", markdown=page["pageFooterMarkdown"],
                 text=page["pageFooterMarkdown"], page_number=page_no)
    return rows


def llamaparse_http_transport(api_key: str,
                              base_url: str = "https://api.cloud.llamaindex.ai",
                              poll_interval: float = 2.0,
                              timeout: float = 300.0):
    """LlamaParse transport: multipart upload to
    ``/api/parsing/upload``, poll ``/api/parsing/job/{id}`` until
    SUCCESS, fetch the ``/result/json`` payload (the {"pages": [...]}
    shape ``llamaparse_result_to_elements`` maps — reference
    ``LlamaParseReader.cs:41-48``). stdlib urllib only."""
    import json as _json
    import time as _time
    import urllib.request
    import uuid as _uuid

    def transport(data: bytes, doc_id: str) -> dict:
        boundary = _uuid.uuid4().hex
        name = doc_id.rsplit("/", 1)[-1] or "document"
        body = (
            f"--{boundary}\r\nContent-Disposition: form-data; "
            f'name="file"; filename="{name}"\r\n'
            f"Content-Type: application/octet-stream\r\n\r\n"
        ).encode() + data + f"\r\n--{boundary}--\r\n".encode()
        req = urllib.request.Request(
            f"{base_url.rstrip('/')}/api/parsing/upload", data=body,
            method="POST",
            headers={"Authorization": f"Bearer {api_key}",
                     "Content-Type": f"multipart/form-data; boundary={boundary}"})
        with urllib.request.urlopen(req, timeout=min(timeout, 120.0)) as resp:
            job = _json.loads(resp.read())["id"]
        deadline = _time.monotonic() + timeout
        while True:
            poll = urllib.request.Request(
                f"{base_url.rstrip('/')}/api/parsing/job/{job}",
                headers={"Authorization": f"Bearer {api_key}"})
            with urllib.request.urlopen(
                    poll, timeout=max(poll_interval * 5, 30.0)) as resp:
                status = _json.loads(resp.read()).get("status")
            if status == "SUCCESS":
                break
            if status in ("ERROR", "CANCELED"):
                raise RuntimeError(f"{doc_id}: parse job {status}")
            if _time.monotonic() > deadline:
                raise TimeoutError(f"{doc_id}: job still {status} after "
                                   f"{timeout}s")
            _time.sleep(poll_interval)
        res = urllib.request.Request(
            f"{base_url.rstrip('/')}/api/parsing/job/{job}/result/json",
            headers={"Authorization": f"Bearer {api_key}"})
        with urllib.request.urlopen(res, timeout=min(timeout, 120.0)) as resp:
            return _json.loads(resp.read())

    return transport


def read_llamaparse(spark, path, api_key: Optional[str] = None,
                    glob: str = "*", recursive: bool = False,
                    transport=None, requests_per_second: float = 2.0,
                    max_concurrency: int = 4, retry=None,
                    on_error: str = "fail", **transport_kw):
    """LlamaParse reader, live transport through the shared rate-limited
    API-reader shape; ``transport`` injects a recorded-fixture fake."""
    if transport is None:
        if not api_key:
            raise ValueError(
                "read_llamaparse needs api_key for the live service, or an "
                "injected transport(data, doc_id) -> result dict")
        transport = llamaparse_http_transport(api_key, **transport_kw)
    return _api_reader_run(spark, path, glob, recursive, transport,
                           llamaparse_result_to_elements,
                           requests_per_second, max_concurrency, retry,
                           on_error)
