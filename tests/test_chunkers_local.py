"""Packing-engine goldens ported from the reference chunker test suite
(HeaderChunkerTests.cs, SectionChunkerTests.cs, MarkdownChunkerTests.cs).

Token-limit values are re-derived for the deterministic word tokenizer
(the reference uses tiktoken cl100k_base, unavailable here); the packing
ALGORITHM is identical, and limits are chosen so each golden exercises the
same code path / chunk layout as its reference counterpart.
"""

import pytest

from dataingestion_spark.model import element_row
from dataingestion_spark.operators.chunkers import (
    ChunkBudgetError,
    ChunkerOptions,
    header_chunk_doc,
    markdown_chunk_doc,
    section_chunk_doc,
    semantic_chunk_doc,
    token_chunk_doc,
)
from dataingestion_spark.tokenizer import WordTokenizer


def opts(max_tokens=2000, overlap=None):
    return ChunkerOptions(WordTokenizer(), max_tokens, overlap)


def rows_from(spec, doc="d"):
    """spec: list of (elem_type, markdown, extra) triples under a root section."""
    rows = [element_row(doc, 0, [0], "section", markdown="root")]
    for i, (etype, md, extra) in enumerate(spec):
        rows.append(element_row(doc, i + 1, [0, i], etype, markdown=md, **extra))
    return rows


H = lambda md, lvl: ("header", md, {"header_level": lvl})  # noqa: E731
P = lambda md: ("paragraph", md, {})  # noqa: E731


# --- HeaderChunker goldens (HeaderChunkerTests.cs:16-54) -------------------

NON_TRIVIAL = [
    H("Header 1", 1),
    H("Header 1_1", 2),
    P("Paragraph 1_1_1"),
    H("Header 1_1_1", 3),
    P("Paragraph 1_1_1_1"),
    P("Paragraph 1_1_1_2"),
    H("Header 1_1_2", 3),
    P("Paragraph 1_1_2_1"),
    P("Paragraph 1_1_2_2"),
    H("Header 1_2", 2),
    P("Paragraph 1_2_1"),
    H("Header 1_2_1", 3),
    P("Paragraph 1_2_1_1"),
]


def test_header_chunker_non_trivial():
    chunks = header_chunk_doc(rows_from(NON_TRIVIAL), opts())
    got = [(c["context"], c["content"]) for c in chunks]
    assert got == [
        ("Header 1 Header 1_1", "Header 1 Header 1_1\nParagraph 1_1_1"),
        (
            "Header 1 Header 1_1 Header 1_1_1",
            "Header 1 Header 1_1 Header 1_1_1\nParagraph 1_1_1_1\nParagraph 1_1_1_2",
        ),
        (
            "Header 1 Header 1_1 Header 1_1_2",
            "Header 1 Header 1_1 Header 1_1_2\nParagraph 1_1_2_1\nParagraph 1_1_2_2",
        ),
        ("Header 1 Header 1_2", "Header 1 Header 1_2\nParagraph 1_2_1"),
        (
            "Header 1 Header 1_2 Header 1_2_1",
            "Header 1 Header 1_2 Header 1_2_1\nParagraph 1_2_1_1",
        ),
    ]


LONG_ONE = [
    H("Header A", 1),
    H("Header B", 2),
    H("Header C", 3),
    P("This is a very long text. It's expressed with plenty of tokens"),
]


def test_header_chunker_respects_token_limit():
    # Context = 6 word-tokens; paragraph = 12. max=13 → 7-token budget for
    # the first slice (reference: CanRespectTokenLimit, limit re-derived).
    chunks = header_chunk_doc(rows_from(LONG_ONE), opts(max_tokens=13))
    assert len(chunks) == 2
    assert chunks[0]["context"] == "Header A Header B Header C"
    assert chunks[0]["content"].rstrip() == (
        "Header A Header B Header C\nThis is a very long text. It's"
    )
    assert chunks[1]["content"].rstrip() == (
        "Header A Header B Header C\nexpressed with plenty of tokens"
    )


def test_header_chunker_throws_when_context_too_big():
    # ThrowsWhenLimitIsTooLowToFitAnythingMoreThanContext — exact port:
    # the context is 6 tokens with both tokenizers.
    for max_tokens in (5, 6):
        with pytest.raises(ChunkBudgetError):
            header_chunk_doc(rows_from(LONG_ONE), opts(max_tokens=max_tokens))


def test_header_chunker_splits_on_newline():
    para = (
        "This is a very long text. It's expressed with plenty of tokens. "
        "And it contains a new line.\nWith some text after the new line."
    )
    rows = rows_from(
        [H("Header A", 1), H("Header B", 2), H("Header C", 3), P(para),
         P("And following paragraph.")]
    )
    # Budget forces a split inside the paragraph; the split lands on the
    # newline (CanSplitLongerParagraphsOnNewLine semantics).
    chunks = header_chunk_doc(rows, opts(max_tokens=27))
    assert len(chunks) == 2
    assert chunks[0]["content"].endswith("And it contains a new line.\n")
    assert chunks[1]["content"] == (
        "Header A Header B Header C\nWith some text after the new line.\nAnd following paragraph."
    )


# --- Table splitting goldens (HeaderChunkerTests.cs:133-265) ---------------

def large_table_rows():
    header = ["one", "two", "three", "four", "five"]
    data = [[str(r * 5 + c) for c in range(5)] for r in range(5)]
    cells = [header] + data
    table_md = "\n".join(
        ["| " + " | ".join(header) + " |", "| --- | --- | --- | --- | --- |"]
        + ["| " + " | ".join(row) + " |" for row in data]
    )
    return rows_from(
        [
            H("Header A", 1),
            P("This is some text that describes why we need the following table."),
            ("table", table_md, {"table_cells": cells}),
            P("And some follow up."),
        ]
    )


def test_table_split_multiple_rows_per_chunk():
    # Word-token counts: ctx 2, para 12, header+sep 22, row 11, tail 4.
    # max=75 → 3 data rows fit in chunk 1, remaining 2 + tail in chunk 2
    # (reference layout: CanSplitLargeTableIntoMultipleChunks_MultipleRowsPerChunk).
    chunks = header_chunk_doc(large_table_rows(), opts(max_tokens=75))
    assert len(chunks) == 2
    assert all(c["context"] == "Header A" for c in chunks)
    assert chunks[0]["content"] == (
        "Header A\n"
        "This is some text that describes why we need the following table.\n"
        "| one | two | three | four | five |\n"
        "| --- | --- | --- | --- | --- |\n"
        "| 0 | 1 | 2 | 3 | 4 |\n"
        "| 5 | 6 | 7 | 8 | 9 |\n"
        "| 10 | 11 | 12 | 13 | 14 |"
    )
    assert chunks[1]["content"] == (
        "Header A\n"
        "| one | two | three | four | five |\n"
        "| --- | --- | --- | --- | --- |\n"
        "| 15 | 16 | 17 | 18 | 19 |\n"
        "| 20 | 21 | 22 | 23 | 24 |\n"
        "And some follow up."
    )


def test_table_split_one_row_per_chunk():
    # max=40 reproduces the reference's one-row-per-chunk layout
    # (CanSplitLargeTableIntoMultipleChunks_OneRowPerChunk): 6 chunks,
    # text alone first, then header+single-row chunks, tail in the last.
    chunks = header_chunk_doc(large_table_rows(), opts(max_tokens=40))
    assert len(chunks) == 6
    assert chunks[0]["content"] == (
        "Header A\nThis is some text that describes why we need the following table."
    )
    for i in range(1, 6):
        lines = chunks[i]["content"].split("\n")
        assert lines[1] == "| one | two | three | four | five |"
        assert lines[2] == "| --- | --- | --- | --- | --- |"
        first = (i - 1) * 5
        assert lines[3] == "| " + " | ".join(str(first + c) for c in range(5)) + " |"
    assert chunks[5]["content"].endswith("And some follow up.")
    tok = WordTokenizer()
    assert all(tok.count(c["content"]) <= 40 for c in chunks)


def test_table_throws_when_header_plus_row_too_big():
    # ctx 2 + header 22 + row 11 = 35 → max=34 must throw
    # (ThrowsWhenHeaderSeparatorAndSingleRowExceedTokenLimit).
    with pytest.raises(ChunkBudgetError):
        header_chunk_doc(large_table_rows(), opts(max_tokens=34))


# --- SectionChunker goldens (SectionChunkerTests.cs) -----------------------

def nested_sections_rows():
    rows = [element_row("d", 0, [0], "section", markdown="root")]
    seq = 1

    def add(path, etype, md, **kw):
        nonlocal seq
        rows.append(element_row("d", seq, path, etype, markdown=md, **kw))
        seq += 1

    add([0, 0], "header", "# Section title")
    add([0, 1], "paragraph", "This is a paragraph in section 1.")
    add([0, 2], "paragraph", "This is another paragraph in section 1.")
    add([0, 3], "section", "sub")
    add([0, 3, 0], "header", "## Subsection title")
    add([0, 3, 1], "paragraph", "This is a paragraph in subsection 1.1.")
    add([0, 3, 2], "paragraph", "This is another paragraph in subsection 1.1.")
    add([0, 3, 3], "section", "subsub")
    add([0, 3, 3, 0], "header", "### Subsubsection title")
    add([0, 3, 3, 1], "paragraph", "This is a paragraph in subsubsection 1.1.1.")
    add([0, 3, 3, 2], "paragraph", "This is another paragraph in subsubsection 1.1.1.")
    add([0, 3, 4], "paragraph", "This is last paragraph in subsection 1.2.")
    return rows


def test_section_chunker_nested():
    chunks = section_chunk_doc(nested_sections_rows(), opts())
    got = [(c["context"], c["content"]) for c in chunks]
    assert got == [
        (
            "# Section title",
            "# Section title\nThis is a paragraph in section 1.\nThis is another paragraph in section 1.",
        ),
        (
            "# Section title ## Subsection title",
            "# Section title ## Subsection title\nThis is a paragraph in subsection 1.1.\nThis is another paragraph in subsection 1.1.",
        ),
        (
            "# Section title ## Subsection title ### Subsubsection title",
            "# Section title ## Subsection title ### Subsubsection title\nThis is a paragraph in subsubsection 1.1.1.\nThis is another paragraph in subsubsection 1.1.1.",
        ),
        (
            "# Section title ## Subsection title",
            "# Section title ## Subsection title\nThis is last paragraph in subsection 1.2.",
        ),
    ]


def test_section_chunker_two_sections():
    rows = [
        element_row("d", 0, [0], "section", markdown="s1"),
        element_row("d", 1, [0, 0], "paragraph", markdown="This is a paragraph."),
        element_row("d", 2, [0, 1], "paragraph", markdown="This is another paragraph."),
        element_row("d", 3, [1], "section", markdown="s2"),
        element_row("d", 4, [1, 0], "paragraph", markdown="This is a paragraph in section 2."),
        element_row("d", 5, [1, 1], "paragraph", markdown="This is another paragraph in section 2."),
    ]
    chunks = section_chunk_doc(rows, opts())
    assert [c["content"] for c in chunks] == [
        "This is a paragraph.\nThis is another paragraph.",
        "This is a paragraph in section 2.\nThis is another paragraph in section 2.",
    ]
    assert [c["context"] for c in chunks] == ["", ""]


# --- MarkdownChunker goldens (MarkdownChunkerTests.cs) ---------------------

COMPLEX = [
    H("# Header 1", 1),
    P("This is the content under header 1."),
    H("## Header 2", 2),
    P("This is the content under header 2."),
    H("### Header 3", 3),
    P("This is the content under header 3."),
    H("## Header 4", 2),
    P("This is the content under header 4."),
]


def test_markdown_chunker_complex():
    chunks = markdown_chunk_doc(rows_from(COMPLEX), split_level=3)
    got = [(c["context"], c["content"]) for c in chunks]
    assert got == [
        ("# Header 1", "This is the content under header 1."),
        ("# Header 1;## Header 2", "This is the content under header 2."),
        ("# Header 1;## Header 2;### Header 3", "This is the content under header 3."),
        ("# Header 1;## Header 4", "This is the content under header 4."),
    ]


def test_markdown_chunker_split_level_2_inlines_level_3():
    chunks = markdown_chunk_doc(rows_from(COMPLEX), split_level=2)
    got = [(c["context"], c["content"]) for c in chunks]
    assert got == [
        ("# Header 1", "This is the content under header 1."),
        (
            "# Header 1;## Header 2",
            "This is the content under header 2.\n### Header 3\nThis is the content under header 3.",
        ),
        ("# Header 1;## Header 4", "This is the content under header 4."),
    ]


def test_markdown_chunker_no_headers():
    chunks = markdown_chunk_doc(rows_from([P("This is a document without headers.")]))
    assert chunks == [
        {"content": "This is a document without headers.", "context": ""}
    ]


# --- DocumentTokenChunker goldens (Overlap/NoOverlapTokenChunkerTests) -----

def test_token_chunker_overlap():
    rows = rows_from([P("The quick brown fox jumps over the lazy dog")])
    chunks = token_chunk_doc(rows, opts(max_tokens=4, overlap=1))
    assert [c["content"].rstrip() for c in chunks] == [
        "The quick brown fox",
        "fox jumps over the",
        "the lazy dog",
    ]


def test_token_chunker_no_overlap_lossless():
    text = " ".join(["word"] * 600)
    rows = rows_from([P(text)])
    chunks = token_chunk_doc(rows, opts(max_tokens=512, overlap=0))
    assert len(chunks) == 2
    assert "".join(c["content"] for c in chunks) == text


# --- SemanticSimilarityChunker (SemanticSimilarityChunkerTests.cs:56-77) ---

def test_semantic_chunker_two_topics():
    import numpy as np

    topic = {
        "NET sentence one about runtimes.": [1.0, 0.0],
        "NET sentence two about libraries.": [0.9, 0.1],
        "Zeus ruled the Greek pantheon.": [0.0, 1.0],
    }

    def embed(texts):
        return np.array([topic[t] for t in texts])

    rows = rows_from([P(t) for t in topic])
    chunks = semantic_chunk_doc(rows, opts(), embed, threshold_percentile=95.0)
    assert [c["content"] for c in chunks] == [
        "NET sentence one about runtimes.\nNET sentence two about libraries.",
        "Zeus ruled the Greek pantheon.",
    ]


def test_chunker_options_validation():
    with pytest.raises(ValueError):
        ChunkerOptions(WordTokenizer(), max_tokens_per_chunk=0)
    with pytest.raises(ValueError):
        ChunkerOptions(WordTokenizer(), max_tokens_per_chunk=100, overlap_tokens=100)
    # overlap auto-zeroes when max ≤ 500 (IngestionChunkerOptions.cs:46-62)
    assert ChunkerOptions(WordTokenizer(), 400).overlap_tokens == 0
    assert ChunkerOptions(WordTokenizer(), 2000).overlap_tokens == 500
