"""Parser goldens modeled on the reference reader conformance suite
(DocumentReaderConformanceTests.cs) and FIXTURES.md §F10."""

from dataingestion_spark.sources.markdown import inline_text, parse_markdown

SAMPLE_MD = """Green Horizons Initiative

For General Internal Use

# Executive Summary

This document outlines the goals of the initiative.

# Key Milestones

| Milestone | Target Date | Department | Indicator |
| --- | --- | --- | --- |
| Environmental Audit | Mar 2025 | Operations | Baseline set |
| Policy Update | Jun 2026 | HR | Policy live |
| Training Rollout | Sep 2027 | All | 90% trained |
| Emissions Review | Dec 2029 | All | 25% Emissions Cut |

# Summary & Next Steps

We will continue the rollout.

---

Green Horizons Initiative #2025
"""


def types(rows):
    return [r["elem_type"] for r in rows]


def test_sample_doc_structure():
    rows = parse_markdown(SAMPLE_MD, "sample")
    assert types(rows) == [
        "section",  # root
        "paragraph",
        "paragraph",
        "header",
        "paragraph",
        "header",
        "table",
        "header",
        "paragraph",
        "footer",
    ]
    # seq is DFS preorder, 0-based, dense.
    assert [r["seq"] for r in rows] == list(range(10))
    # root wraps everything; children sit under path [0].
    assert rows[0]["section_path"] == [0]
    assert all(r["section_path"][:1] == [0] for r in rows[1:])


def test_sample_doc_table_matrix():
    rows = parse_markdown(SAMPLE_MD, "sample")
    table = next(r for r in rows if r["elem_type"] == "table")
    cells = table["table_cells"]
    assert len(cells) == 5 and len(cells[0]) == 4
    assert cells[0] == ["Milestone", "Target Date", "Department", "Indicator"]
    assert cells[4] == ["Emissions Review", "Dec 2029", "All", "25% Emissions Cut"]


def test_footer_after_break():
    rows = parse_markdown(SAMPLE_MD, "sample")
    footer = rows[-1]
    assert footer["elem_type"] == "footer"
    assert footer["markdown"] == "Green Horizons Initiative #2025"


def test_headers_levels_and_text():
    rows = parse_markdown("# A\n\n## B c *d*\n", "h")
    headers = [r for r in rows if r["elem_type"] == "header"]
    assert [h["header_level"] for h in headers] == [1, 2]
    assert headers[0]["markdown"] == "# A"
    assert headers[1]["text"] == "B c d"


def test_list_becomes_section_of_items():
    rows = parse_markdown("intro\n\n- item one\n- item two\n", "l")
    sec = [r for r in rows if r["elem_type"] == "section" and r["section_path"] != [0]]
    assert len(sec) == 1
    items = [r for r in rows if len(r["section_path"]) == 3]
    assert [r["markdown"] for r in items] == ["item one", "item two"]
    assert [r["text"] for r in items] == ["item one", "item two"]


def test_quote_becomes_section():
    rows = parse_markdown("> quoted text\n> more quote\n", "q")
    assert types(rows) == ["section", "section", "paragraph"]
    assert rows[2]["markdown"] == "quoted text\nmore quote"


def test_data_uri_image_decoded():
    import base64

    png = base64.b64encode(b"\x89PNG_fake").decode()
    rows = parse_markdown(f"![alt text](data:image/png;base64,{png})\n", "img")
    img = rows[1]
    assert img["elem_type"] == "image"
    assert img["image_alt_text"] == "alt text"
    assert img["image_media_type"] == "image/png"
    assert img["image_content"] == b"\x89PNG_fake"


def test_external_image_no_bytes():
    rows = parse_markdown("![alt](http://example.com/x.png)\n", "img")
    img = rows[1]
    assert img["elem_type"] == "image"
    assert img["image_content"] is None
    assert img["image_media_type"] is None


def test_bogus_first_table_row_skipped():
    md = "|  |  |\n| --- | --- |\n| a | b |\n"
    rows = parse_markdown(md, "t")
    cells = rows[1]["table_cells"]
    assert cells == [["a", "b"]]


def test_code_fence_is_paragraph_with_code_text():
    rows = parse_markdown("```py\nx = 1\n```\n", "c")
    para = rows[1]
    assert para["elem_type"] == "paragraph"
    assert para["text"] == "x = 1"
    assert para["markdown"].startswith("```py")


def test_empty_list_item_skipped():
    rows = parse_markdown("# T\n\n- first\n- \n- third\n", "l")
    items = [r for r in rows if len(r["section_path"]) == 3]
    assert [r["markdown"] for r in items] == ["first", "third"]


def test_list_interrupts_paragraph():
    rows = parse_markdown("para\n- item one\n- item two\n", "p")
    assert types(rows) == ["section", "paragraph", "section", "paragraph", "paragraph"]
    assert rows[1]["markdown"] == "para"
    assert rows[3]["markdown"] == "item one"


def test_quote_and_table_interrupt_paragraph():
    rows = parse_markdown("para\n> quoted\n", "p")
    assert types(rows) == ["section", "paragraph", "section", "paragraph"]
    rows = parse_markdown("para\n| a | b |\n| --- | --- |\n| 1 | 2 |\n", "p")
    assert types(rows) == ["section", "paragraph", "table"]
    assert rows[2]["table_cells"] == [["a", "b"], ["1", "2"]]


def test_inline_text():
    assert inline_text("**bold** and [link](http://x) and `code`") == "bold and link and code"


def test_setext_headers():
    rows = parse_markdown("Title\n=====\n\nbody\n\nSub\n---\n\nmore\n", "s")
    headers = [r for r in rows if r["elem_type"] == "header"]
    assert [(h["text"], h["header_level"]) for h in headers] == [("Title", 1), ("Sub", 2)]
    paras = [r for r in rows if r["elem_type"] == "paragraph"]
    assert [p["text"] for p in paras] == ["body", "more"]


def test_setext_dash_vs_thematic_break_footer():
    # '---' under paragraph content = setext h2; a standalone '---' is still
    # a thematic break making the NEXT paragraph a footer
    rows = parse_markdown("Heading\n---\n\nbody\n\n---\n\nthe footer\n", "s")
    assert types(rows) == ["section", "header", "paragraph", "footer"]
    assert rows[1]["header_level"] == 2
    assert rows[3]["text"] == "the footer"


def test_nested_list_nested_sections():
    md = "- top one\n  - sub a\n  - sub b\n- top two\n"
    rows = parse_markdown(md, "n")
    # root sec, list sec, 'top one', nested sec, 'sub a', 'sub b', 'top two'
    assert types(rows) == [
        "section", "section", "paragraph", "section",
        "paragraph", "paragraph", "paragraph",
    ]
    sub = [r for r in rows if len(r["section_path"]) == 4]
    assert [r["text"] for r in sub] == ["sub a", "sub b"]
    top = [r for r in rows if len(r["section_path"]) == 3 and r["elem_type"] == "paragraph"]
    assert [r["text"] for r in top] == ["top one", "top two"]
    # the nested section is a child of the list section
    nested_sec = rows[3]
    assert nested_sec["section_path"][:2] == rows[1]["section_path"]


def test_flat_list_unchanged():
    rows = parse_markdown("- a\n- b\ncont\n", "f")
    items = [r for r in rows if r["elem_type"] == "paragraph"]
    assert [r["text"] for r in items] == ["a", "b\ncont"]


def test_link_reference_definitions_render_nothing():
    md = "See [the docs][docs].\n\n[docs]: https://example.com \"Docs\"\n"
    rows = parse_markdown(md, "r")
    assert types(rows) == ["section", "paragraph"]
    assert rows[1]["text"] == "See the docs."


def test_html_block_text_stripped():
    md = "<div class=\"x\">\n<b>bold</b> words &amp; more\n</div>\n"
    rows = parse_markdown(md, "h")
    assert types(rows) == ["section", "paragraph"]
    assert rows[1]["text"] == "bold words & more"
    assert rows[1]["markdown"].startswith("<div")


def test_html_comment_renders_nothing():
    rows = parse_markdown("<!-- hidden -->\n\nvisible\n", "c")
    assert types(rows) == ["section", "paragraph"]
    assert rows[1]["text"] == "visible"
