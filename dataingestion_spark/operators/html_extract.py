"""HTML → text extraction, expression-only (the crawl-to-corpus step).

WARC *response* records and scraped pages carry HTML; training corpora
want the visible text plus boilerplate signals. Heavy-duty extractors
(trafilatura, jusText) are Python-per-document; this operator covers
the high-volume first pass as pure codegen'd column expressions — tag
stripping, script/style/comment removal, block-boundary newlines,
entity decoding, whitespace normalization, link/script density signals
— so 100 TB of HTML runs at scan speed with no Python in the loop.
All patterns are RE2-safe (non-greedy ``.*?`` + ``(?s)``/``(?i)``
flags only), so the same regexes run in the DuckDB oracle.

Swap in a real extractor via ``mapInPandas`` for the quality-sensitive
tail; the signals here (text ratio, link density) are how you decide
which documents deserve that costlier pass.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

# closing tags (and <br>) that delimit visible text blocks
_BLOCK_BREAK = (
    r"(?i)<(br|/p|/div|/h[1-6]|/li|/tr|/title|/ul|/ol|/table|/section"
    r"|/article|/blockquote)[^>]*>"
)

_ENTITIES = [
    ("&nbsp;", " "),
    ("&lt;", "<"),
    ("&gt;", ">"),
    ("&quot;", '"'),
    ("&#39;", "'"),
    ("&amp;", "&"),  # decode LAST so &amp;lt; does not double-decode
]


def html_to_text(html: Column) -> Column:
    """Visible text: blocks separated by single newlines, runs of
    spaces collapsed, empty lines dropped."""
    s = F.regexp_replace(html, r"(?s)<(script|style)[^>]*>.*?</(script|style)>", " ")
    s = F.regexp_replace(s, r"(?s)<!--.*?-->", " ")
    s = F.regexp_replace(s, _BLOCK_BREAK, "\n")
    s = F.regexp_replace(s, r"(?s)<[^>]+>", " ")
    for ent, rep in _ENTITIES:
        s = F.replace(s, F.lit(ent), F.lit(rep))
    s = F.regexp_replace(s, r"[ \t\r]+", " ")
    lines = F.filter(
        F.transform(F.split(s, r"\n"), lambda l: F.trim(l)),
        lambda l: F.length(l) > 0,
    )
    return F.array_join(lines, "\n")


def html_extract(df: DataFrame, html_col: str = "html",
                 id_col: str = "doc_id") -> DataFrame:
    """Extracted text + boilerplate signals per document.

    ``n_links`` / ``n_scripts`` count tags in the RAW html;
    ``text_ratio`` (visible chars / html chars) is the classic
    boilerplate tell — index pages and nav shells score low, article
    pages high. Keep-decisions belong downstream (compose with
    c4_signals / gopher_signals on the extracted text)."""
    h = F.col(html_col)
    text = html_to_text(h)
    return df.select(
        F.col(id_col).alias(id_col),
        text.alias("text"),
        F.when(F.length(text) > 0, F.size(F.split(text, r"\n")))
        .otherwise(0).cast("int").alias("n_lines"),
        F.length(text).cast("long").alias("n_chars"),
        (F.size(F.split(h, r"(?i)<a[ >]")) - 1).cast("int").alias("n_links"),
        (F.size(F.split(h, r"(?i)<script[ >]")) - 1).cast("int").alias("n_scripts"),
        (F.length(text).cast("double") / F.length(h)).alias("text_ratio"),
    )
