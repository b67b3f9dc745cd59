"""API-reader response mappings, media-type map, multimodal plumbing, QA
generation, and the co-located (shuffle-free) chunker path."""

import pytest
from pyspark.sql import functions as F

from dataingestion_spark.operators.chunkers import ChunkerOptions, header_chunker
from dataingestion_spark.operators.multimodal import (
    audio_metadata,
    image_metadata,
    image_resize,
    probe_audio,
    probe_image,
)
from dataingestion_spark.operators.qa import qa_pairs
from dataingestion_spark.sources.api_readers import (
    adi_result_to_elements,
    llamaparse_result_to_elements,
    read_document_intelligence,
    read_llamaparse,
)
from dataingestion_spark.sources.media_types import media_type_col, media_type_for
from dataingestion_spark.tokenizer import WordTokenizer

PNG = (
    b"\x89PNG\r\n\x1a\n"
    + (13).to_bytes(4, "big") + b"IHDR"
    + (640).to_bytes(4, "big") + (480).to_bytes(4, "big")
    + b"\x08\x02\x00\x00\x00"
)


# --- ADI mapping (DocumentIntelligenceReader.cs semantics) -----------------

ADI_RESULT = {
    "content": "full doc",
    "paragraphs": [
        {"content": "## Heading A", "role": "sectionHeading",
         "boundingRegions": [{"pageNumber": 1}]},
        {"content": "Body text.", "boundingRegions": [{"pageNumber": 1}]},
        {"content": "Page 1 of 9", "role": "pageFooter",
         "boundingRegions": [{"pageNumber": 1}]},
    ],
    "tables": [
        {
            "rowCount": 2,
            "columnCount": 2,
            "cells": [
                {"rowIndex": 0, "columnIndex": 0, "content": "h1", "columnSpan": 2},
                {"rowIndex": 1, "columnIndex": 0, "content": "a"},
                {"rowIndex": 1, "columnIndex": 1, "content": "b"},
            ],
        }
    ],
    "figures": [{"caption": {"content": "a chart"}, "boundingRegions": [{"pageNumber": 2}]}],
    "sections": [
        {"elements": ["/sections/1", "/paragraphs/2"]},
        {"elements": ["/paragraphs/0", "/paragraphs/1", "/tables/0", "/figures/0"]},
    ],
}


def test_adi_mapping_section_tree_roles_and_cells():
    rows = adi_result_to_elements(ADI_RESULT, "adi-doc")
    types = [r["elem_type"] for r in rows]
    assert types == ["section", "section", "header", "paragraph", "table", "image", "footer"]
    header = rows[2]
    assert header["header_level"] == 2  # two leading '#'
    assert header["text"] == "Heading A"
    assert header["page_number"] == 1
    table = rows[4]
    # colspan duplicated across columns (reference :314-334)
    assert table["table_cells"] == [["h1", "h1"], ["a", "b"]]
    image = rows[5]
    assert image["image_alt_text"] == "a chart"
    assert image["page_number"] == 2
    # nested section path reflects the JSON-pointer tree
    assert rows[1]["section_path"] == [0, 0]
    assert rows[6]["section_path"] == [0, 1]  # footer under root section


# --- LlamaParse mapping ----------------------------------------------------

import base64

LP_RESULT = {
    "pages": [
        {
            "page": 1,
            "width": 612,
            "height": 792,
            "md": "page md",
            "pageHeaderMarkdown": "Running Header",
            "pageFooterMarkdown": "Running Footer",
            "items": [
                {"type": "heading", "lvl": 1, "md": "# Title", "value": "Title"},
                {"type": "text", "md": "Some text", "value": "Some text"},
                {"type": "table", "md": "| a | b |",
                 "rows": [["a", "b"], ["", ""], ["c", "d"]]},
            ],
            "images": [
                {"name": "img1.png", "type": "image/png",
                 "base64": base64.b64encode(PNG).decode()}
            ],
        }
    ]
}


def test_llamaparse_mapping():
    rows = llamaparse_result_to_elements(LP_RESULT, "lp-doc")
    types = [r["elem_type"] for r in rows]
    assert types == ["section", "header", "header", "paragraph", "table", "image", "footer"]
    sec = rows[0]
    assert sec["metadata"] == {"width": "612", "height": "792"}
    assert sec["page_number"] == 1
    table = rows[4]
    # all-empty rows dropped (reference empty-row workaround :218-231)
    assert table["table_cells"] == [["a", "b"], ["c", "d"]]
    img = rows[5]
    assert img["image_content"] == PNG
    assert img["image_media_type"] == "image/png"


def test_api_readers_fail_fast_without_credentials(spark):
    # live transports exist now (tests/test_api_transports.py drives them
    # with fixture fakes); without credentials they must fail fast with a
    # message naming the injectable transport seam
    with pytest.raises(ValueError, match="transport"):
        read_document_intelligence(spark, "/tmp/x")
    with pytest.raises(ValueError, match="transport"):
        read_llamaparse(spark, "/tmp/x")


# --- media types -----------------------------------------------------------

def test_media_type_map(spark):
    assert media_type_for("report.PDF") == "application/pdf"
    assert media_type_for("a/b/notes.md") == "text/markdown"
    assert media_type_for("x.unknownext") == ""
    df = spark.createDataFrame(
        [("f.docx",), ("f.png",), ("f.zzz",)], "path string"
    ).select(media_type_col(F.col("path")).alias("mt"))
    assert [r.mt for r in df.collect()] == [
        "application/vnd.openxmlformats-officedocument.wordprocessingml.document",
        "image/png",
        "",
    ]


# --- multimodal ------------------------------------------------------------

def test_probe_image_png_dims():
    meta = probe_image(PNG)
    assert (meta["width"], meta["height"], meta["format"]) == (640, 480, "png")
    assert meta["n_bytes"] == len(PNG)


def test_probe_audio_wav():
    import struct

    wav = (b"RIFF" + struct.pack("<I", 36 + 16000) + b"WAVE"
           + b"fmt " + struct.pack("<I", 16)
           + struct.pack("<HHIIHH", 1, 1, 8000, 16000, 2, 16)
           + b"data" + struct.pack("<I", 16000) + b"\x00" * 16000)
    meta = probe_audio(wav)
    assert meta["sample_rate"] == 8000
    assert meta["channels"] == 1
    assert meta["duration_ms"] == 1000


def test_image_metadata_distributed(spark):
    df = spark.createDataFrame(
        [("d", 1, bytearray(PNG)), ("d", 2, None)],
        "doc_id string, seq long, image_content binary",
    )
    out = {r.seq: r for r in image_metadata(df).collect()}
    assert out[1].width == 640 and out[1].format == "png"
    assert out[2].width is None


def test_image_resize_default_codec_and_injection(spark):
    # default decoder auto-routes by magic bytes (r4 VERDICT #7): PNG
    # resizes through the stdlib codec with no decoder= argument, while
    # undecodable bytes (truncated header-only PNG, fake BMP) yield null
    # rows instead of killing the job
    from dataingestion_spark.operators.png_codec import encode_png

    real_png = encode_png(bytes(range(48)) * 64, 32, 32, 3)
    df = spark.createDataFrame(
        [("d", 1, bytearray(real_png)), ("d", 2, bytearray(b"BM\x00fakebmp")),
         ("d", 3, bytearray(PNG))],
        "doc_id string, seq long, image_content binary",
    )
    out = {r.seq: r for r in image_resize(df, max_side=16).collect()}
    assert out[1].image is not None and out[1].width == 16
    assert out[2].image is None and out[2].width is None
    assert out[3].image is None  # header-only PNG: decode fails → null
    # with an injected fake codec the plumbing works end-to-end
    out = image_resize(
        df.filter("seq = 1"), decoder=lambda data, m: (data[:8], m, m)
    ).collect()
    assert out[0].width == 256 and out[0].image == real_png[:8]


def test_audio_metadata_distributed(spark):
    df = spark.createDataFrame([("d", None)], "doc_id string, audio_content binary")
    assert audio_metadata(df).collect()[0].sample_rate is None


# --- QA + colocated chunker ------------------------------------------------

def test_qa_pairs_deterministic(spark):
    chunks = spark.createDataFrame(
        [("c1", "d1", " ".join(f"w{i}" for i in range(30)))],
        "chunk_id string, doc_id string, content string",
    )
    rows = qa_pairs(chunks).orderBy("question").collect()
    assert len(rows) == 3  # ceil(29/12) = 3 windows
    assert rows[0].question == "What is w0 w1 w2?"
    assert rows[0].answer == " ".join(f"w{i}" for i in range(12))


def test_read_delimited_csv(spark, tmp_path):
    from dataingestion_spark.sources.tabular import parse_delimited, read_delimited

    rows = parse_delimited("a,b\n1,2\n3,\n", "csvdoc")
    assert rows[1]["table_cells"] == [["a", "b"], ["1", "2"], ["3", None]]
    assert rows[1]["markdown"].splitlines()[0] == "| a | b |"

    (tmp_path / "x.csv").write_text("h1,h2\nv1,v2\n")
    el = read_delimited(spark, str(tmp_path))
    got = [r for r in el.collect() if r.elem_type == "table"]
    assert len(got) == 1
    assert got[0].table_cells == [["h1", "h2"], ["v1", "v2"]]
    # a table element chunked through the packing engine renders with the
    # header repeated (reference table-splitting contract)
    from dataingestion_spark.operators.chunkers import ChunkerOptions, header_chunker
    from dataingestion_spark.tokenizer import WordTokenizer

    chunks = header_chunker(el, ChunkerOptions(WordTokenizer(), 100)).collect()
    assert len(chunks) == 1 and "| h1 | h2 |" in chunks[0].content


def test_plan_shape_regressions(spark):
    import __spark_entry__ as em
    from dataingestion_spark.observability import plan_summary

    sf = "/root/testdata/sf0.001"
    q3 = plan_summary(em.q_tpch_q3(spark, sf))
    assert q3["sort_merge_joins"] == 0  # dims broadcast
    assert any("c_mktsegment" in p for p in q3["pushed_filters"])
    q5 = plan_summary(em.q_tpch_q5(spark, sf))
    assert q5["sort_merge_joins"] == 0
    tc = plan_summary(em.q_token_chunks(spark, sf))
    # column pruning: the scan reads only doc_id + text
    assert all("lang" not in s for s in tc["read_schemas"])


def test_image_chunker_binary_content(spark):
    from dataingestion_spark.operators.chunkers import image_chunker
    from dataingestion_spark.sources.markdown import parse_markdown_df

    b64 = base64.b64encode(PNG).decode()
    md = f"# Doc\n\nintro\n\n![a chart](data:image/png;base64,{b64})\n"
    el = parse_markdown_df(
        spark.createDataFrame([("d1", md)], "doc_id string, md string"),
        id_col="doc_id", content_col="md",
    )
    rows = image_chunker(el).collect()
    assert len(rows) == 1
    assert rows[0].content == "a chart"
    assert bytes(rows[0].content_binary) == PNG
    assert rows[0].content_media_type == "image/png"


def test_plan_summary_facts(spark):
    from dataingestion_spark.observability import plan_summary, span

    df = spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet").filter(
        "l_quantity > 10"
    ).select("l_orderkey")
    facts = plan_summary(df)
    assert any("l_quantity" in p for p in facts["pushed_filters"])
    assert facts["sort_merge_joins"] == 0
    sink = {}
    with span("probe", sink):
        df.count()
    assert sink["probe"] > 0


def test_fused_parse_and_chunk_matches_two_stage(spark):
    from dataingestion_spark.operators.chunkers import (
        ChunkerOptions,
        header_chunk_doc,
        header_chunker,
        parse_and_chunk,
    )
    from dataingestion_spark.sources.markdown import parse_markdown_df
    from dataingestion_spark.tokenizer import WordTokenizer

    docs = {f"d{i}": f"# T{i}\n\nbody {i} alpha\n\n## S\n\nmore {i}" for i in range(5)}
    src = spark.createDataFrame(sorted(docs.items()), "doc_id string, markdown string")
    opts = ChunkerOptions(WordTokenizer(), 100)
    two = sorted(
        (r.chunk_id, r.context, r.content)
        for r in header_chunker(
            parse_markdown_df(src, "doc_id", "markdown"), opts
        ).collect()
    )
    fused = sorted(
        (r.chunk_id, r.context, r.content)
        for r in parse_and_chunk(
            src, lambda rows: header_chunk_doc(rows, opts)
        ).collect()
    )
    assert two == fused


def test_colocated_chunker_matches_shuffled(spark):
    from dataingestion_spark.sources.markdown import parse_markdown_df

    docs = {f"d{i}": f"# T{i}\n\nbody {i} line one\n\nbody {i} line two" for i in range(6)}
    el = parse_markdown_df(
        spark.createDataFrame(sorted(docs.items()), "doc_id string, md string"),
        id_col="doc_id", content_col="md",
    )
    opts = ChunkerOptions(WordTokenizer(), 100)
    a = sorted((r.chunk_id, r.content) for r in header_chunker(el, opts).collect())
    b = sorted(
        (r.chunk_id, r.content)
        for r in header_chunker(el, opts, colocated=True).collect()
    )
    assert a == b


def test_plan_shapes_new_tpch_queries(spark):
    import __spark_entry__ as em
    from dataingestion_spark.observability import plan_summary

    sf = "/root/testdata/sf0.001"
    # q4: EXISTS compiles to a semi-join, no cartesian anywhere
    q4 = plan_summary(em.q_tpch_q4(spark, sf))
    assert q4["nested_loop_joins"] == 0
    assert any("o_orderdate" in p for p in q4["pushed_filters"])
    # q10: returnflag filter reaches the lineitem scan, dims broadcast
    q10 = plan_summary(em.q_tpch_q10(spark, sf))
    assert any("l_returnflag" in p for p in q10["pushed_filters"])
    assert q10["broadcast_hash_joins"] >= 1
    # q14/q19: single broadcast join, no shuffle-heavy plan
    q14 = plan_summary(em.q_tpch_q14(spark, sf))
    assert q14["sort_merge_joins"] == 0
    q19 = plan_summary(em.q_tpch_q19(spark, sf))
    assert q19["sort_merge_joins"] == 0
    # q19's OR-of-ANDs stays one scan: exactly one lineitem read
    assert sum("l_quantity" in s for s in q19["read_schemas"]) == 1
    # q22: anti-join present, scalar avg is a 1-row broadcast (no SMJ)
    q22 = plan_summary(em.q_tpch_q22(spark, sf))
    assert q22["sort_merge_joins"] <= 1  # the big c×o anti-join may SMJ; dims must not


def test_audio_segments_block_alignment_and_tail(spark):
    from dataingestion_spark.operators.multimodal import audio_segments

    meta = spark.createDataFrame(
        [(1, 8000, 2, 1000, 44 + 4000),   # stereo: block 4
         (2, 8000, 1, 250, 44 + 1000),    # mono: block 2
         (3, None, None, None, 10)],      # unprobeable: dropped
        "doc_id long, sample_rate int, channels int, duration_ms long, n_bytes long",
    )
    rows = {(r.doc_id, r.seg): (r.t_start_ms, r.t_end_ms, r.byte_start, r.byte_end)
            for r in audio_segments(meta, window_ms=300, hop_ms=200).collect()}
    assert rows[(1, 1)] == (200, 500, 844, 2044)   # 4-byte aligned offsets
    assert rows[(1, 4)] == (800, 1000, 3244, 4044)  # tail ends at payload end
    assert rows[(2, 1)] == (200, 250, 844, 1044)
    assert not any(d == 3 for d, _ in rows)
    # every start offset is block-aligned relative to the payload
    assert all((bs - 44) % 4 == 0 for (d, _), (_, _, bs, _) in rows.items() if d == 1)


def test_image_tiles_grid_and_edges(spark):
    from dataingestion_spark.operators.multimodal import image_tiles

    meta = spark.createDataFrame(
        [(1, 300, 500), (2, 256, 256), (3, None, None)],
        "doc_id long, width int, height int",
    )
    rows = {(r.doc_id, r.tile_x, r.tile_y): (r.x0, r.y0, r.x1, r.y1)
            for r in image_tiles(meta, 256, 256).collect()}
    assert rows[(1, 1, 1)] == (256, 256, 300, 500)  # truncated edge tile
    assert rows[(2, 0, 0)] == (0, 0, 256, 256)      # exact fit: one tile
    assert len([k for k in rows if k[0] == 1]) == 4
    assert len([k for k in rows if k[0] == 2]) == 1
    assert not any(k[0] == 3 for k in rows)         # unprobeable dropped


# --- standalone image documents (sources/image_reader.py) ------------------

def test_parse_image_png_single_element():
    from dataingestion_spark.sources.image_reader import parse_image

    rows = parse_image(PNG, "dir/pic.png")
    assert len(rows) == 1
    r = rows[0]
    assert r["elem_type"] == "image"
    assert r["image_media_type"] == "image/png"
    assert r["image_content"] == PNG
    assert r["image_alt_text"] is None  # left for the enricher
    assert r["markdown"] == "![](pic.png)"
    assert r["metadata"]["format"] == "png"
    assert (r["metadata"]["width"], r["metadata"]["height"]) == ("640", "480")


def test_parse_image_probe_beats_lying_extension():
    from dataingestion_spark.sources.image_reader import parse_image

    r = parse_image(PNG, "mislabeled.jpg")[0]
    assert r["image_media_type"] == "image/png"  # header wins
    r2 = parse_image(b"RIFF\x28\x00\x00\x00WEBPVP8 " + bytes(16), "x.webp")[0]
    assert r2["image_media_type"] == "image/webp"  # unknown probe -> extension
    assert "width" not in r2["metadata"]


def test_dispatch_routes_images(spark, tmp_path):
    from dataingestion_spark.sources.dispatch import parse_any, read_documents

    rows = parse_any(PNG, "a.png")
    assert rows[0]["elem_type"] == "image"
    # full Spark path: scan a mixed dir with an image in it
    (tmp_path / "doc.md").write_text("# Title\n\nbody\n")
    (tmp_path / "pic.png").write_bytes(PNG)
    el = read_documents(spark, str(tmp_path))
    by_type = {r.elem_type for r in el.collect()}
    assert "image" in by_type and "header" in by_type
    img = el.filter("elem_type = 'image'").collect()[0]
    assert bytes(img.image_content) == PNG
    assert img.image_media_type == "image/png"


def test_image_document_feeds_alt_text_enricher(spark):
    from dataingestion_spark.model import ELEMENTS_SCHEMA
    from dataingestion_spark.operators.enrichers import image_alt_text_enricher
    from dataingestion_spark.sources.image_reader import parse_image

    import pandas as pd

    rows = parse_image(PNG, "pic.png")
    el = spark.createDataFrame(pd.DataFrame(rows), schema=ELEMENTS_SCHEMA)
    out = image_alt_text_enricher(el).collect()[0]
    assert out.image_alt_text == f"Image (image/png, {len(PNG)} bytes)"


# --- stdlib PNG codec (operators/png_codec.py) -----------------------------

def test_png_codec_roundtrip_all_color_types():
    from dataingestion_spark.operators.png_codec import decode_png, encode_png

    for ch in (1, 2, 3, 4):
        w, h = 5, 4
        pixels = bytes((i * 11 + ch) % 256 for i in range(w * h * ch))
        png = encode_png(pixels, w, h, ch)
        got, gw, gh, gch = decode_png(png)
        assert (gw, gh, gch) == (w, h, ch)
        assert got == pixels


def test_png_codec_decodes_filtered_rows():
    """A PNG using Sub/Up/Average/Paeth filters must decode to the same
    pixels as the filter-0 encoding (hand-built filtered scanlines)."""
    import struct
    import zlib

    from dataingestion_spark.operators.png_codec import decode_png, encode_png

    w, h, ch = 4, 5, 3
    pixels = bytes((i * 7) % 256 for i in range(w * h * ch))
    stride = w * ch

    def filt(ft, row, prev):
        bpp = ch
        out = bytearray([ft])
        for j, v in enumerate(row):
            a = row[j - bpp] if j >= bpp else 0
            b = prev[j]
            c = prev[j - bpp] if j >= bpp else 0
            if ft == 0:
                out.append(v)
            elif ft == 1:
                out.append((v - a) & 0xFF)
            elif ft == 2:
                out.append((v - b) & 0xFF)
            elif ft == 3:
                out.append((v - ((a + b) >> 1)) & 0xFF)
            else:
                p = a + b - c
                pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                pred = a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)
                out.append((v - pred) & 0xFF)
        return bytes(out)

    rows = [pixels[y * stride:(y + 1) * stride] for y in range(h)]
    scan = b""
    prev = bytes(stride)
    for y, row in enumerate(rows):
        scan += filt(y % 5, row, prev)
        prev = row

    def chunk(tag, payload):
        c = struct.pack(">I", len(payload)) + tag + payload
        return c + struct.pack(">I", zlib.crc32(tag + payload) & 0xFFFFFFFF)

    png = (b"\x89PNG\r\n\x1a\n"
           + chunk(b"IHDR", struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0))
           + chunk(b"IDAT", zlib.compress(scan)) + chunk(b"IEND", b""))
    got, gw, gh, gch = decode_png(png)
    assert got == pixels
    # and the filter-0 re-encode round-trips
    assert decode_png(encode_png(got, gw, gh, gch))[0] == pixels


def test_png_codec_palette_expands_to_rgb():
    import struct
    import zlib

    from dataingestion_spark.operators.png_codec import decode_png

    plte = bytes([255, 0, 0, 0, 255, 0, 0, 0, 255])  # red green blue
    idx = bytes([0, 1, 2, 2, 1, 0])  # 3x2
    scan = b"\x00" + idx[:3] + b"\x00" + idx[3:]

    def chunk(tag, payload):
        c = struct.pack(">I", len(payload)) + tag + payload
        return c + struct.pack(">I", zlib.crc32(tag + payload) & 0xFFFFFFFF)

    png = (b"\x89PNG\r\n\x1a\n"
           + chunk(b"IHDR", struct.pack(">IIBBBBB", 3, 2, 8, 3, 0, 0, 0))
           + chunk(b"PLTE", plte)
           + chunk(b"IDAT", zlib.compress(scan)) + chunk(b"IEND", b""))
    got, w, h, ch = decode_png(png)
    assert (w, h, ch) == (3, 2, 3)
    assert got[:3] == bytes([255, 0, 0]) and got[3:6] == bytes([0, 255, 0])


def test_image_resize_with_stdlib_png_decoder(spark):
    """VERDICT r3 #8: image_resize runs end-to-end on generated PNGs
    without external codecs."""
    from dataingestion_spark.operators.multimodal import image_resize
    from dataingestion_spark.operators.png_codec import (
        decode_png, encode_png, png_decoder,
    )

    w, h, ch = 64, 48, 3
    pixels = bytes((x % 256) for x in range(w * h * ch))
    png = encode_png(pixels, w, h, ch)
    df = spark.createDataFrame(
        [("d", 0, bytearray(png)), ("d", 1, None)],
        "doc_id string, seq long, image_content binary",
    )
    out = {r.seq: r for r in
           image_resize(df, max_side=16, decoder=png_decoder).collect()}
    assert (out[0].width, out[0].height) == (16, 12)
    rp, rw, rh, rch = decode_png(bytes(out[0].image))
    assert (rw, rh, rch) == (16, 12, 3)
    assert out[1].image is None  # null rows survive as nulls


def test_png_tile_pixels_roundtrip(spark):
    """Tile extraction is real: tiles reassemble to the original pixels."""
    from dataingestion_spark.operators.multimodal import png_tile_pixels
    from dataingestion_spark.operators.png_codec import decode_png, encode_png

    w, h, ch = 10, 7, 3
    pixels = bytes((i * 13) % 256 for i in range(w * h * ch))
    png = encode_png(pixels, w, h, ch)
    df = spark.createDataFrame([("d", bytearray(png))],
                               "doc_id string, image_content binary")
    tiles = png_tile_pixels(df, tile_w=4, tile_h=4).collect()
    assert len(tiles) == 3 * 2  # ceil(10/4) x ceil(7/4)
    # reassemble
    canvas = bytearray(w * h * ch)
    for t in tiles:
        tp, tw, th, tch = decode_png(bytes(t.tile))
        assert (tw, th) == (t.x1 - t.x0, t.y1 - t.y0)
        for y in range(th):
            src = tp[y * tw * ch:(y + 1) * tw * ch]
            off = ((t.y0 + y) * w + t.x0) * ch
            canvas[off:off + tw * ch] = src
    assert bytes(canvas) == pixels


# --- notebook / email / audio documents ------------------------------------

def test_parse_ipynb_structure():
    import json

    from dataingestion_spark.sources.ipynb import parse_ipynb

    nb = {"cells": [
        {"cell_type": "markdown", "source": ["# T\n", "\n", "body"]},
        {"cell_type": "code", "source": "x = 1",
         "outputs": [{"output_type": "execute_result",
                      "data": {"text/plain": ["1"]}},
                     {"output_type": "display_data",
                      "data": {"image/png": "not-text-skipped"}}]},
        {"cell_type": "raw", "source": "raw text"},
        {"cell_type": "code", "source": ""},  # empty code cell: skipped
    ], "metadata": {"language_info": {"name": "julia"}}}
    rows = parse_ipynb(json.dumps(nb).encode(), "n.ipynb")
    kinds = [(r["elem_type"], r["markdown"]) for r in rows]
    assert ("header", "# T") in kinds
    assert ("paragraph", "```julia\nx = 1\n```") in kinds
    assert ("paragraph", "```\n1\n```") in kinds
    assert ("paragraph", "raw text") in kinds
    assert not any("image/png" in (r["markdown"] or "") for r in rows)
    with pytest.raises(ValueError, match="no renderable cells"):
        parse_ipynb(b'{"cells": []}', "empty.ipynb")


def test_parse_eml_subject_body_attachment():
    from dataingestion_spark.sources.eml import parse_eml

    eml = (b"From: a@x.com\r\nSubject: =?utf-8?q?caf=C3=A9?=\r\n"
           b"MIME-Version: 1.0\r\n"
           b"Content-Type: multipart/mixed; boundary=B\r\n\r\n"
           b"--B\r\nContent-Type: text/plain\r\n\r\nplain body\r\n\r\n"
           b"--B\r\nContent-Type: text/markdown; name=a.md\r\n"
           b"Content-Disposition: attachment; filename=a.md\r\n\r\n"
           b"# Att\r\n\r\nattached text\r\n"
           b"--B--\r\n")
    rows = parse_eml(eml, "m.eml")
    headers = [r["markdown"] for r in rows if r["elem_type"] == "header"]
    assert "# café" in headers  # RFC 2047 decoding via stdlib policy
    assert any(r["doc_id"] == "m.eml!a.md" for r in rows)  # recursed
    assert any((r["markdown"] or "") == "plain body" for r in rows)


def test_parse_eml_html_body_falls_back():
    from dataingestion_spark.sources.eml import parse_eml

    eml = (b"Subject: H\r\nMIME-Version: 1.0\r\n"
           b"Content-Type: text/html\r\n\r\n"
           b"<html><body><h2>Inner</h2><p>html para</p></body></html>\r\n")
    rows = parse_eml(eml, "h.eml")
    assert any((r["markdown"] or "") == "## Inner" for r in rows)
    assert any("html para" in (r["markdown"] or "") for r in rows)


def test_parse_audio_document_and_dispatch():
    import struct

    from dataingestion_spark.sources.audio_reader import parse_audio
    from dataingestion_spark.sources.dispatch import parse_any

    wav = (b"RIFF" + struct.pack("<I", 36 + 8000) + b"WAVE"
           + b"fmt " + struct.pack("<I", 16)
           + struct.pack("<HHIIHH", 1, 2, 16000, 64000, 4, 16)
           + b"data" + struct.pack("<I", 8000) + b"\x00" * 8000)
    rows = parse_audio(wav, "x.wav")
    assert len(rows) == 1 and rows[0]["elem_type"] == "paragraph"
    assert rows[0]["metadata"]["sample_rate"] == "16000"
    assert rows[0]["metadata"]["channels"] == "2"
    assert "2 channels" in rows[0]["markdown"]
    # dispatch routes by audio/* media type
    assert parse_any(wav, "x.wav")[0]["metadata"]["sha256"] == \
        rows[0]["metadata"]["sha256"]
    # notebooks route too
    assert parse_any(b'{"cells":[{"cell_type":"markdown","source":"# N"}]}',
                     "n.ipynb")[0]["elem_type"] in ("section", "header")


def test_parse_msg_properties_and_html_fallback():
    from dataingestion_spark.sources.dispatch import parse_any
    from dataingestion_spark.sources.msg import build_msg, parse_msg

    m = build_msg("Subj", "plain body", sender="A", to="B")
    rows = parse_msg(m, "x.msg")
    md = [(r["elem_type"], r["markdown"]) for r in rows]
    assert ("header", "# Subj") in md
    assert ("paragraph", "plain body") in md
    assert any("**From:** A" in (r["markdown"] or "") for r in rows)
    # html body path (no plain body property)
    h = build_msg("H", "", html=b"<html><body><h2>In</h2><p>hp</p></body></html>")
    rows = parse_msg(h, "h.msg")
    assert any((r["markdown"] or "") == "## In" for r in rows)
    # dispatch routes .msg; a .doc OLE2 without MAPI streams raises loudly
    assert parse_any(m, "x.msg")[0]["doc_id"] == "x.msg"
    import pytest as _pytest

    from dataingestion_spark.sources.doc_legacy import build_doc

    with _pytest.raises(ValueError, match="MAPI"):
        parse_msg(build_doc(["not a mail"]), "not.msg")


def test_build_ole_directory_spans_sectors():
    """r4 regression: >4 directory entries span a second sector; the FAT
    chain must include it (ceil, not floor)."""
    from dataingestion_spark.sources.doc_legacy import CompoundFile, _build_ole

    streams = {f"S{i}": f"data{i}".encode() for i in range(7)}
    cfb = CompoundFile(_build_ole(streams))
    assert set(cfb.entries) == set(streams)
    for name in streams:
        assert cfb.stream(name).rstrip(b"\x00") == streams[name]


# --- baseline JPEG codec (operators/jpeg_codec.py) -------------------------

def _gradient_rgb(w, h):
    import numpy as np

    x = np.linspace(0, 255, w)
    y = np.linspace(0, 255, h)
    r = np.tile(x, (h, 1))
    g = np.tile(y[:, None], (1, w))
    return np.stack([r, g, (r + g) / 2], -1).astype(np.uint8)


def test_jpeg_roundtrip_444_and_420():
    import numpy as np

    from dataingestion_spark.operators.jpeg_codec import decode_jpeg, encode_jpeg

    w, h = 37, 21  # not multiples of 8 or 16: partial blocks + crop
    rgb = _gradient_rgb(w, h)
    for sub, tol in (("444", 6), ("420", 16)):
        jp = encode_jpeg(rgb.tobytes(), w, h, 3, quality=90, subsampling=sub)
        pix, dw, dh, ch = decode_jpeg(jp)
        assert (dw, dh, ch) == (w, h, 3)
        err = np.abs(np.frombuffer(pix, np.uint8).reshape(h, w, 3).astype(float)
                     - rgb.astype(float))
        assert err.max() <= tol, (sub, err.max())


def test_jpeg_grayscale_and_probe_dims():
    import numpy as np

    from dataingestion_spark.operators.jpeg_codec import (
        decode_jpeg, encode_jpeg, probe_jpeg_dimensions,
    )
    from dataingestion_spark.operators.multimodal import probe_image

    w, h = 24, 16
    gray = _gradient_rgb(w, h)[..., 1].copy()
    jp = encode_jpeg(gray.tobytes(), w, h, 1, quality=90)
    assert probe_jpeg_dimensions(jp) == (w, h)
    meta = probe_image(jp)  # probe_image now reports real JPEG dims
    assert (meta["format"], meta["width"], meta["height"]) == ("jpeg", w, h)
    pix, dw, dh, ch = decode_jpeg(jp)
    assert (dw, dh, ch) == (w, h, 1)
    err = np.abs(np.frombuffer(pix, np.uint8).reshape(h, w).astype(float)
                 - gray.astype(float))
    assert err.max() <= 4


def test_jpeg_progressive_raises_loudly():
    import pytest as _pytest

    from dataingestion_spark.operators.jpeg_codec import decode_jpeg

    # minimal stream with an SOF2 marker
    bad = (b"\xff\xd8\xff\xc2\x00\x0b\x08\x00\x10\x00\x10\x01\x01\x11\x00"
           b"\xff\xd9")
    with _pytest.raises(NotImplementedError, match="baseline"):
        decode_jpeg(bad)


def test_image_resize_routes_jpeg_and_png(spark):
    from dataingestion_spark.operators.jpeg_codec import encode_jpeg
    from dataingestion_spark.operators.multimodal import image_decoder, image_resize
    from dataingestion_spark.operators.png_codec import decode_png, encode_png

    w, h = 64, 32
    rgb = _gradient_rgb(w, h)
    png = encode_png(rgb.tobytes(), w, h, 3)
    jpg = encode_jpeg(rgb.tobytes(), w, h, 3, quality=90)
    df = spark.createDataFrame(
        [("p", 0, bytearray(png)), ("j", 1, bytearray(jpg))],
        "doc_id string, seq long, image_content binary",
    )
    out = {r.doc_id: r for r in
           image_resize(df, max_side=16, decoder=image_decoder).collect()}
    for k in ("p", "j"):
        assert (out[k].width, out[k].height) == (16, 8)
        _, rw, rh, rch = decode_png(bytes(out[k].image))
        assert (rw, rh, rch) == (16, 8, 3)


def test_image_resize_no_decoder_roundtrip_all_formats(spark):
    """r4 VERDICT #7 done-criterion: resize round-trips PNG, baseline
    JPEG, and GIF with NO decoder= argument."""
    from dataingestion_spark.operators.gif_codec import encode_gif
    from dataingestion_spark.operators.jpeg_codec import encode_jpeg
    from dataingestion_spark.operators.multimodal import image_resize
    from dataingestion_spark.operators.png_codec import decode_png, encode_png

    w, h = 64, 32
    rgb = _gradient_rgb(w, h)
    # GIF is indexed: build a ≤256-distinct-color variant for that row
    idx = bytes(b for y in range(h) for x in range(w)
                for b in ((x // 8) * 32, (y // 8) * 32, 0))
    df = spark.createDataFrame(
        [("png", 0, bytearray(encode_png(rgb.tobytes(), w, h, 3))),
         ("jpg", 1, bytearray(encode_jpeg(rgb.tobytes(), w, h, 3, quality=90))),
         ("gif", 2, bytearray(encode_gif(idx, w, h, 3)))],
        "doc_id string, seq long, image_content binary",
    )
    out = {r.doc_id: r for r in image_resize(df, max_side=16).collect()}
    assert set(out) == {"png", "jpg", "gif"}
    for k, r in out.items():
        assert (r.width, r.height) == (16, 8), k
        _, rw, rh, _ = decode_png(bytes(r.image))
        assert (rw, rh) == (16, 8), k


def test_image_tile_pixels_jpeg(spark):
    import numpy as np

    from dataingestion_spark.operators.jpeg_codec import encode_jpeg
    from dataingestion_spark.operators.multimodal import image_tile_pixels
    from dataingestion_spark.operators.png_codec import decode_png

    w, h = 20, 12
    rgb = _gradient_rgb(w, h)
    jpg = encode_jpeg(rgb.tobytes(), w, h, 3, quality=95)
    df = spark.createDataFrame([("d", bytearray(jpg))],
                               "doc_id string, image_content binary")
    tiles = image_tile_pixels(df, tile_w=8, tile_h=8).collect()
    assert len(tiles) == 3 * 2
    # reassembled tiles approximate the original within jpeg loss
    canvas = np.zeros((h, w, 3))
    for t in tiles:
        tp, tw, th, ch = decode_png(bytes(t.tile))
        canvas[t.y0:t.y1, t.x0:t.x1] = np.frombuffer(
            tp, np.uint8).reshape(th, tw, 3)
    assert np.abs(canvas - rgb.astype(float)).max() <= 8


def test_image_directory_to_vector_records_e2e(spark, tmp_path):
    """The reference user journey for a directory with images: one scan →
    image documents → alt-text enricher → image chunker (the
    IngestionChunk<DataContent> shape) — binary payload intact end to
    end, searchable text from the enricher."""
    from dataingestion_spark.operators.chunkers import image_chunker
    from dataingestion_spark.operators.enrichers import image_alt_text_enricher
    from dataingestion_spark.operators.png_codec import encode_png
    from dataingestion_spark.sources.dispatch import read_documents

    png = encode_png(bytes((i * 3) % 256 for i in range(8 * 6 * 3)), 8, 6, 3)
    (tmp_path / "pic.png").write_bytes(png)
    (tmp_path / "note.md").write_text("# Note\n\nwith ![inline](x.png) text\n")
    el = read_documents(spark, str(tmp_path))
    enriched = image_alt_text_enricher(el)
    chunks = image_chunker(enriched).collect()
    assert len(chunks) == 1  # the standalone image (inline one has no bytes)
    c = chunks[0]
    assert bytes(c.content_binary) == png
    assert c.content_media_type == "image/png"
    assert c.content == f"Image (image/png, {len(png)} bytes)"
    assert c.metadata["sha256"]


def test_probe_webp_and_tiff_dimensions():
    import struct

    from dataingestion_spark.operators.multimodal import probe_image

    # VP8L lossless: 0x2F then 14-bit (w-1), 14-bit (h-1) little-endian
    wm1, hm1 = 639, 359
    bits = wm1 | (hm1 << 14)
    vp8l = (b"RIFF" + struct.pack("<I", 20) + b"WEBP" + b"VP8L"
            + struct.pack("<I", 5) + b"\x2f" + bits.to_bytes(4, "little"))
    m = probe_image(vp8l)
    assert (m["format"], m["width"], m["height"]) == ("webp", 640, 360)

    # VP8X extended: 24-bit canvas minus one at offset 24
    vp8x = (b"RIFF" + struct.pack("<I", 22) + b"WEBP" + b"VP8X"
            + struct.pack("<I", 10) + b"\x00" * 4
            + (799).to_bytes(3, "little") + (449).to_bytes(3, "little"))
    m = probe_image(vp8x)
    assert (m["width"], m["height"]) == (800, 450)

    # VP8 lossy key frame: sync 9D 01 2A then 14-bit dims
    vp8 = (b"RIFF" + struct.pack("<I", 24) + b"WEBP" + b"VP8 "
           + struct.pack("<I", 12) + b"\x00" * 3 + b"\x9d\x01\x2a"
           + struct.pack("<HH", 320, 240) + b"\x00" * 2)
    m = probe_image(vp8)
    assert (m["width"], m["height"]) == (320, 240)

    # TIFF little- and big-endian IFD0
    def tiff(bo, magic):
        ifd = struct.pack(f"{bo}H", 2)
        ifd += struct.pack(f"{bo}HHI", 256, 3, 1) + struct.pack(f"{bo}H", 123) + b"\x00\x00"
        ifd += struct.pack(f"{bo}HHI", 257, 4, 1) + struct.pack(f"{bo}I", 456)
        ifd += struct.pack(f"{bo}I", 0)
        return magic + struct.pack(f"{bo}I", 8) + ifd

    for bo, magic in (("<", b"II*\x00"), (">", b"MM\x00*")):
        m = probe_image(tiff(bo, magic))
        assert (m["format"], m["width"], m["height"]) == ("tiff", 123, 456)


# --- GIF codec (operators/gif_codec.py) ------------------------------------

def test_gif_roundtrip_exact_and_alpha():
    from dataingestion_spark.operators.gif_codec import decode_gif, encode_gif

    w, h = 13, 9
    px = bytes(b for i in range(w * h)
               for b in ((i * 5) % 256, (i * 11) % 128, 200))
    got, gw, gh, ch = decode_gif(encode_gif(px, w, h, 3))
    assert (gw, gh, ch) == (w, h, 3) and got == px  # indexed = lossless

    px4 = bytes(b for i in range(w * h)
                for b in ((i * 3) % 200, 10, 30, 0 if i % 7 == 0 else 255))
    got4, _, _, ch4 = decode_gif(encode_gif(px4, w, h, 4))
    assert ch4 == 4
    assert all((got4[4 * i + 3] == 0) == (i % 7 == 0) for i in range(w * h))


def test_gif_lzw_width_growth_and_reset():
    import hashlib

    from dataingestion_spark.operators.gif_codec import decode_gif, encode_gif

    w, h = 120, 90  # ~10.8k pixels: 9->12 bit codes + table reset
    vals = bytearray()
    seed = b"gif"
    while len(vals) < w * h:
        seed = hashlib.md5(seed).digest()
        vals += seed
    px = bytes(b for i in range(w * h)
               for b in (vals[i] % 250, (vals[i] * 3) % 250, (vals[i] * 7) % 250))
    got, gw, gh, ch = decode_gif(encode_gif(px, w, h, 3))
    assert got == px


def test_gif_interlaced_decode():
    """Hand-built interlaced frame: rows stored in pass order must come
    back in natural order."""
    import struct

    from dataingestion_spark.operators.gif_codec import _lzw_encode, decode_gif

    w, h = 4, 10
    natural = [bytes([r] * w) for r in range(h)]  # row index as color index
    order = (list(range(0, h, 8)) + list(range(4, h, 8))
             + list(range(2, h, 4)) + list(range(1, h, 2)))
    stored = b"".join(natural[r] for r in order)
    palette = bytearray(256 * 3)
    for i in range(h):
        palette[3 * i:3 * i + 3] = bytes([i, i * 2, i * 3])
    gif = bytearray(b"GIF89a")
    gif += struct.pack("<HHBBB", w, h, 0x80 | 7, 0, 0)
    gif += palette
    gif += b"\x2c" + struct.pack("<HHHHB", 0, 0, w, h, 0x40)  # interlaced
    gif += bytes([8])
    lzw = _lzw_encode(stored, 8)
    for i in range(0, len(lzw), 255):
        chunk = lzw[i:i + 255]
        gif += bytes([len(chunk)]) + chunk
    gif += b"\x00\x3b"
    got, gw, gh, ch = decode_gif(bytes(gif))
    for r in range(h):
        assert got[r * w * 3:r * w * 3 + 3] == bytes([r, r * 2, r * 3])


def test_gif_too_many_colors_raises():
    import pytest as _pytest

    from dataingestion_spark.operators.gif_codec import encode_gif

    w, h = 32, 16  # 512 distinct colors
    px = bytes(b for i in range(w * h) for b in (i % 256, i // 256, 0))
    with _pytest.raises(ValueError, match="256 distinct"):
        encode_gif(px, w, h, 3)


def test_image_pipeline_routes_gif(spark):
    from dataingestion_spark.operators.gif_codec import encode_gif
    from dataingestion_spark.operators.multimodal import (
        image_decoder, image_resize, image_tile_pixels,
    )
    from dataingestion_spark.operators.png_codec import decode_png

    w, h = 24, 16
    px = bytes(b for i in range(w * h)
               for b in ((i * 5) % 200, (i * 7) % 200, 99))
    gif = encode_gif(px, w, h, 3)
    df = spark.createDataFrame([("g", 0, bytearray(gif))],
                               "doc_id string, seq long, image_content binary")
    out = image_resize(df, max_side=8, decoder=image_decoder).collect()[0]
    assert (out.width, out.height) == (8, 5)
    assert decode_png(bytes(out.image))[3] == 3
    tiles = image_tile_pixels(
        df.select("doc_id", "image_content"), tile_w=8, tile_h=8).collect()
    assert len(tiles) == 3 * 2
    # exact reassembly: GIF decode is lossless
    canvas = bytearray(w * h * 3)
    for t in tiles:
        tp, tw, th, ch = decode_png(bytes(t.tile))
        for y in range(th):
            off = ((t.y0 + y) * w + t.x0) * 3
            canvas[off:off + tw * 3] = tp[y * tw * 3:(y + 1) * tw * 3]
    assert bytes(canvas) == px
