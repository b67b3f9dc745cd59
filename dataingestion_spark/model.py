"""Core relational data model: the ``elements`` and ``chunks`` DataFrames.

The reference's central abstraction is a per-document element *tree*
(``IngestionDocument`` / ``IngestionDocumentElement``, reference
``src/.../Abstractions/IngestionDocument.cs:14-250``). Spark-first, the tree
becomes a flat DataFrame with a tree *address* column so any per-document
algorithm can rebuild nesting, while all relational transforms stay columnar:

* ``doc_id``     — document identifier (reference: full file path).
* ``seq``        — document-order index: DFS preorder, the order
                   ``EnumerateContent`` yields (``IngestionDocument.cs:42-67``).
* ``section_path`` — integer tree address, e.g. ``[0, 2]`` = third child of
                   the first top-level section. Sections themselves are rows
                   (``elem_type = 'section'``); leaf enumeration simply
                   filters them out, matching EnumerateContent semantics.
* ``elem_type``  — section | paragraph | header | footer | table | image.
* ``markdown``   — canonical markdown (non-empty for non-image elements,
                   invariant from ``IngestionDocument.cs:83-86``).
* ``text``       — plain-text content (inline markup stripped).
* ``table_cells``— 2-D string matrix, row 0 = header row, None = empty cell
                   (conventions from ``IngestionDocument.cs:213-217``).
* image columns  — binary content + media type + alt text.
* ``metadata``   — open string→string bag (rich values JSON-encoded).
"""

from __future__ import annotations

from pyspark.sql import types as T

ELEM_SECTION = "section"
ELEM_PARAGRAPH = "paragraph"
ELEM_HEADER = "header"
ELEM_FOOTER = "footer"
ELEM_TABLE = "table"
ELEM_IMAGE = "image"

ELEMENTS_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.StringType(), False),
        T.StructField("seq", T.LongType(), False),
        T.StructField("section_path", T.ArrayType(T.IntegerType()), False),
        T.StructField("elem_type", T.StringType(), False),
        T.StructField("markdown", T.StringType(), True),
        T.StructField("text", T.StringType(), True),
        T.StructField("page_number", T.IntegerType(), True),
        T.StructField("header_level", T.IntegerType(), True),
        T.StructField("table_cells", T.ArrayType(T.ArrayType(T.StringType())), True),
        T.StructField("image_content", T.BinaryType(), True),
        T.StructField("image_media_type", T.StringType(), True),
        T.StructField("image_alt_text", T.StringType(), True),
        T.StructField("metadata", T.MapType(T.StringType(), T.StringType()), True),
    ]
)

# Chunker output (reference IngestionChunk<T>, Abstractions/IngestionChunk.cs:15-74).
# chunk_seq is the within-document emission order; chunk_id is deterministic
# (the reference only assigns fresh Guid keys at write time).
CHUNKS_SCHEMA = T.StructType(
    [
        T.StructField("chunk_id", T.StringType(), False),
        T.StructField("doc_id", T.StringType(), False),
        T.StructField("chunk_seq", T.IntegerType(), False),
        T.StructField("content", T.StringType(), False),
        T.StructField("context", T.StringType(), True),
        T.StructField("metadata", T.MapType(T.StringType(), T.StringType()), True),
    ]
)

# Vector table fixed columns (reference VectorStoreWriter.cs:14-19); metadata
# keys are promoted to additional lowercase top-level columns at write time.
VECTOR_FIXED_COLUMNS = ["key", "embedding", "content", "context", "documentid"]


def element_row(
    doc_id: str,
    seq: int,
    section_path: list,
    elem_type: str,
    markdown: str = None,
    text: str = None,
    page_number: int = None,
    header_level: int = None,
    table_cells: list = None,
    image_content: bytes = None,
    image_media_type: str = None,
    image_alt_text: str = None,
    metadata: dict = None,
) -> dict:
    """Build one ``elements`` row as a plain dict (parser/test helper)."""
    if elem_type != ELEM_IMAGE and not markdown:
        raise ValueError(f"markdown must be non-empty for {elem_type} elements")
    return {
        "doc_id": doc_id,
        "seq": seq,
        "section_path": list(section_path),
        "elem_type": elem_type,
        "markdown": markdown,
        "text": text,
        "page_number": page_number,
        "header_level": header_level,
        "table_cells": table_cells,
        "image_content": image_content,
        "image_media_type": image_media_type,
        "image_alt_text": image_alt_text,
        "metadata": metadata,
    }


def is_leaf(elem_type: str) -> bool:
    return elem_type != ELEM_SECTION
