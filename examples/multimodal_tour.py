"""Multimodal tour: the r4 surface end to end on one mixed directory.

* dispatch a directory containing markdown + PNG + JPEG + WAV + a
  Jupyter notebook + an .eml + an Outlook .msg through ONE binaryFile
  scan;
* standalone images become Image-element documents; the alt-text
  enricher captions them; the image chunker emits binary chunks (the
  reference's ``IngestionChunk<DataContent>`` shape);
* the stdlib codecs do REAL pixel work: resize every image to ≤64 px
  and extract an 8×8 tile grid — no Pillow, no external libraries;
* audio files surface probe metadata; live stateful streaming (state
  API v2 over the mini protobuf runtime) is in `tests/test_tws.py`.

Run: python examples/multimodal_tour.py
"""

import json
import os
import struct
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from dataingestion_spark.operators.chunkers import image_chunker
from dataingestion_spark.operators.enrichers import image_alt_text_enricher
from dataingestion_spark.operators.jpeg_codec import encode_jpeg
from dataingestion_spark.operators.multimodal import (
    image_decoder,
    image_resize,
    image_tile_pixels,
)
from dataingestion_spark.operators.png_codec import encode_png
from dataingestion_spark.session import get_spark
from dataingestion_spark.sources.dispatch import read_documents
from dataingestion_spark.sources.msg import build_msg


def main() -> None:
    spark = get_spark("multimodal-tour", cpus="4", shuffle_partitions=8)
    spark.sparkContext.setLogLevel("ERROR")
    d = tempfile.mkdtemp(prefix="mm_tour_")

    pixels = bytes((i * 7) % 256 for i in range(96 * 64 * 3))
    open(os.path.join(d, "photo.png"), "wb").write(encode_png(pixels, 96, 64, 3))
    open(os.path.join(d, "photo.jpg"), "wb").write(
        encode_jpeg(pixels, 96, 64, 3, quality=85, subsampling="420"))
    wav = (b"RIFF" + struct.pack("<I", 36 + 16000) + b"WAVE"
           + b"fmt " + struct.pack("<I", 16)
           + struct.pack("<HHIIHH", 1, 1, 8000, 16000, 2, 16)
           + b"data" + struct.pack("<I", 16000) + b"\x00" * 16000)
    open(os.path.join(d, "clip.wav"), "wb").write(wav)
    open(os.path.join(d, "note.md"), "w").write("# Mixed dir\n\nprose here\n")
    nb = {"cells": [{"cell_type": "markdown", "source": "# NB\n\ncell"},
                    {"cell_type": "code", "source": "print(1)"}],
          "metadata": {}, "nbformat": 4}
    open(os.path.join(d, "analysis.ipynb"), "w").write(json.dumps(nb))
    open(os.path.join(d, "mail.eml"), "wb").write(
        b"Subject: Hello\r\n\r\nmail body\r\n")
    open(os.path.join(d, "memo.msg"), "wb").write(
        build_msg("Memo", "msg body", sender="A", to="B"))

    elements = read_documents(spark, d)
    print("--- elements per document/type")
    elements.groupBy("doc_id", "elem_type").count().orderBy(
        "doc_id", "elem_type").show(40, truncate=60)

    enriched = image_alt_text_enricher(elements)
    chunks = image_chunker(enriched)
    print("--- binary image chunks (IngestionChunk<DataContent> shape)")
    chunks.select("chunk_id", "content", "content_media_type",
                  F.length("content_binary").alias("bytes")).show(truncate=60)

    imgs = elements.filter("image_content is not null").select(
        "doc_id", F.col("seq"), F.col("image_content"))
    print("--- real resize to <=64 px (stdlib codecs)")
    image_resize(imgs, max_side=64, decoder=image_decoder).select(
        "doc_id", "width", "height", F.length("image").alias("bytes")
    ).show()

    print("--- real 32x32 tile pixels")
    image_tile_pixels(imgs.withColumnRenamed("seq", "_s"), tile_w=32,
                      tile_h=32).groupBy("doc_id").count().show()


if __name__ == "__main__":
    main()
