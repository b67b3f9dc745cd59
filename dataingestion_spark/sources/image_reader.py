"""Standalone image documents: one file → one Image-element document.

The reference's extension→MIME map covers a dozen image types
(``Abstractions/IngestionDocumentReader.cs:80-171``) and its image story
is bytes + media type + LLM alternative text: ``IngestionDocumentImage``
carries ``Content``/``MediaType``/``AlternativeText``
(``IngestionDocument.cs:225-250``) and ``ImageAlternativeTextEnricher``
is the consumer. A user pointing the engine at an arbitrary directory
hits images first among the formats the office/web parsers don't claim,
so images route through the same one-scan dispatcher
(:mod:`.dispatch`) as a document of exactly one Image element:

* ``image_content`` — the raw bytes, decode-free (opaque binary column,
  the multimodal contract);
* ``image_media_type`` — from the extension map, refined by the real
  header probe (:func:`..operators.multimodal.probe_image` parses PNG
  IHDR / GIF / BMP headers and recognizes JPEG SOI) when the extension
  lies about the content;
* ``metadata`` — EXIF-free structural facts only (format, width,
  height, byte count, sha256), all derived from the header probe;
* ``image_alt_text`` — None, left for the alt-text enricher
  (``operators/enrichers.py``), matching the reference's skip-if-present
  contract.
"""

from __future__ import annotations

import os
from typing import List

from ..model import ELEM_IMAGE, element_row
from ..operators.multimodal import probe_image
from .media_types import media_type_for

#: probe format → canonical media type (overrides a lying extension)
_FORMAT_MEDIA = {
    "png": "image/png",
    "gif": "image/gif",
    "bmp": "image/bmp",
    "jpeg": "image/jpeg",
}


def parse_image(data: bytes, doc_id: str) -> List[dict]:
    """One image file → one-element document (list of one elements row)."""
    data = bytes(data)
    probe = probe_image(data)
    media = _FORMAT_MEDIA.get(probe["format"])
    if media is None:
        mt = media_type_for(doc_id)
        media = mt if mt and mt.startswith("image/") else "application/octet-stream"
    name = os.path.basename(doc_id.split("?")[0])
    meta = {"format": probe["format"], "n_bytes": str(probe["n_bytes"]),
            "sha256": probe["sha256"]}
    if probe["width"] is not None:
        meta["width"] = str(probe["width"])
        meta["height"] = str(probe["height"])
    return [element_row(
        doc_id=doc_id,
        seq=0,
        section_path=[0],
        elem_type=ELEM_IMAGE,
        markdown=f"![]({name})",
        image_content=data,
        image_media_type=media,
        image_alt_text=None,
        metadata=meta,
    )]
