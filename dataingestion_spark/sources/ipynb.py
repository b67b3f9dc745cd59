"""Jupyter notebook reader: ``.ipynb`` → elements via the markdown model.

markitdown's notebook conversion (the path the reference reaches through
``MarkItDownReader``, ``src/Microsoft.Extensions.DataIngestion.MarkItDown``)
renders a notebook as one markdown document — markdown cells verbatim,
code cells as fenced blocks — and this reader mirrors exactly that:
assemble the markdown deterministically from the nbformat JSON (stdlib
``json`` only), then parse it with the repo's own
:func:`..markdown.parse_markdown`, so headers inside markdown cells
become real header elements and the chunkers see the same structure they
would for a hand-written document.

Rendering rules (nbformat 4; ``source`` may be a string or list of
lines):

* markdown cell → its source, verbatim;
* code cell → fenced block tagged with the notebook language
  (``metadata.kernelspec.language`` / ``language_info.name``, default
  ``python``), followed by its TEXT outputs (``stream`` text and
  ``execute_result``/``display_data`` ``text/plain``) in an untagged
  fence — binary/rich outputs are skipped (no codecs, no base64 blobs
  in the text stream);
* raw cells → verbatim;
* cells are separated by blank lines; empty cells are skipped.
"""

from __future__ import annotations

import json
from typing import List

from .markdown import parse_markdown


def _cell_source(cell) -> str:
    src = cell.get("source", "")
    if isinstance(src, list):
        src = "".join(src)
    return src.rstrip("\n")


def _text_outputs(cell) -> List[str]:
    out: List[str] = []
    for o in cell.get("outputs", []) or []:
        ot = o.get("output_type")
        if ot == "stream":
            t = o.get("text", "")
            out.append("".join(t) if isinstance(t, list) else t)
        elif ot in ("execute_result", "display_data"):
            t = (o.get("data") or {}).get("text/plain")
            if t is not None:
                out.append("".join(t) if isinstance(t, list) else t)
        elif ot == "error":
            out.append("\n".join(o.get("traceback", [])[:1]))
    return [t.rstrip("\n") for t in out if t and t.strip()]


def notebook_markdown(data: bytes) -> str:
    """Deterministic notebook → markdown rendering (see module doc)."""
    nb = json.loads(data.decode("utf-8"))
    lang = (
        ((nb.get("metadata") or {}).get("kernelspec") or {}).get("language")
        or ((nb.get("metadata") or {}).get("language_info") or {}).get("name")
        or "python"
    )
    parts: List[str] = []
    for cell in nb.get("cells", []):
        ct = cell.get("cell_type")
        src = _cell_source(cell)
        if not src.strip() and ct != "code":
            continue
        if ct in ("markdown", "raw"):
            parts.append(src)
        elif ct == "code":
            if src.strip():
                parts.append(f"```{lang}\n{src}\n```")
            for t in _text_outputs(cell):
                parts.append(f"```\n{t}\n```")
    return "\n\n".join(p for p in parts if p.strip())


def parse_ipynb(data: bytes, doc_id: str) -> List[dict]:
    """One notebook → elements rows through the markdown parser."""
    md = notebook_markdown(bytes(data))
    if not md.strip():
        raise ValueError(f"{doc_id}: notebook has no renderable cells")
    return parse_markdown(md, doc_id)
