"""Delimited-file reader: CSV/TSV → table elements.

The reference routes csv/tsv through MarkItDown, which renders them as one
markdown pipe table per file (extension map entries at
``IngestionDocumentReader.cs:120-123``). Same contract here, without the
subprocess: a distributed binaryFile scan, python ``csv`` parsing per file,
one ``table`` element (row 0 = header) wrapped in a root section.
"""

from __future__ import annotations

import csv
import io
from typing import Iterator, List

from ..model import ELEMENTS_SCHEMA, element_row


def rows_to_markdown_table(rows: List[List[str]]) -> str:
    if not rows:
        return "| |"
    ncols = len(rows[0])
    out = ["| " + " | ".join(rows[0]) + " |", "| --- " * ncols + "|"]
    for r in rows[1:]:
        cells = list(r) + [""] * (ncols - len(r))
        out.append("| " + " | ".join(cells[:ncols]) + " |")
    return "\n".join(out)


def parse_delimited(content: str, doc_id: str, sep: str = ",") -> List[dict]:
    """One delimited document → root section + one table element."""
    parsed = [row for row in csv.reader(io.StringIO(content), delimiter=sep) if row]
    if not parsed:
        raise ValueError("empty delimited file")
    ncols = len(parsed[0])
    cells = [
        [(r[c] if c < len(r) and r[c] != "" else None) for c in range(ncols)]
        for r in parsed
    ]
    md = rows_to_markdown_table([[c or "" for c in row] for row in cells])
    return [
        element_row(doc_id, 0, [0], "section", markdown=md),
        element_row(doc_id, 1, [0, 0], "table", markdown=md, table_cells=cells),
    ]


def read_delimited(spark, path, sep: str = ",", glob: str = "*.csv",
                   recursive: bool = False, on_error: str = "fail"):
    """Distributed csv/tsv → elements scan (binaryFile + mapInPandas).
    ``on_error='skip'`` drops unparseable/empty files instead of failing."""
    from .markdown import binary_file_scan

    files = binary_file_scan(spark, path, glob, recursive)

    def run(batches) -> Iterator:
        import pandas as pd

        cols = [f.name for f in ELEMENTS_SCHEMA.fields]
        for pdf in batches:
            out: List[dict] = []
            for doc_id, raw in zip(pdf["path"], pdf["content"]):
                text = raw.decode("utf-8", errors="replace") if isinstance(raw, (bytes, bytearray)) else raw
                try:
                    out.extend(parse_delimited(text, str(doc_id), sep))
                except Exception:
                    if on_error == "fail":
                        raise
            yield pd.DataFrame(out, columns=cols) if out else pd.DataFrame(columns=cols)

    return files.mapInPandas(run, schema=ELEMENTS_SCHEMA)
