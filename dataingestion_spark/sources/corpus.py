"""Deterministic markdown corpus synthesized from the ``documents`` table.

The driver's testdata has flat text documents; the ingest pipeline wants
markdown. This synthesizer (pure built-in functions, fully pushdown-friendly)
gives every document a title header, a front section, and a body section —
enough structure to exercise header/section chunking at any scale factor.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

HEAD_WORDS = 30


def documents_to_markdown(documents: DataFrame) -> DataFrame:
    """documents(doc_id, text, lang, source, …) → (doc_id string, markdown)."""
    words = F.split(F.trim(F.col("text")), r"\s+")
    head = F.array_join(F.slice(words, 1, HEAD_WORDS), " ")
    tail = F.array_join(
        F.slice(words, HEAD_WORDS + 1, F.greatest(F.size(words) - HEAD_WORDS, F.lit(0))),
        " ",
    )
    md = F.concat(
        F.lit("# Doc "), F.col("doc_id").cast("string"),
        F.lit("\n\n## Abstract\n\n"), head,
        F.when(
            F.size(words) > HEAD_WORDS, F.concat(F.lit("\n\n## Body\n\n"), tail)
        ).otherwise(F.lit("")),
        F.lit("\n\n---\n\nsource: "), F.col("source"), F.lit(" lang: "), F.col("lang"),
    )
    return documents.select(
        F.col("doc_id").cast("string").alias("doc_id"), md.alias("markdown")
    )
