"""Standalone audio documents: one file → one metadata-paragraph document.

The reference's document model has no audio element (images only,
``IngestionDocument.cs:225-250``); markitdown's audio story is
"structural metadata + optional transcription" rendered as text. Mirror
the codec-free half: the real RIFF/WAV header probe
(:func:`..operators.multimodal.probe_audio`) becomes a deterministic
metadata paragraph, with the probe facts also in the element's metadata
map so downstream filters never re-parse the text. The raw bytes stay
OUT of the document tree — at corpus scale audio payloads belong in a
binary column driven by the multimodal operators
(``audio_metadata``/``audio_segments``), not in chunker input.
Transcription is a model seam, same as summary/alt-text enrichment.
"""

from __future__ import annotations

import os
from typing import List

from ..model import ELEM_PARAGRAPH, element_row
from ..operators.multimodal import probe_audio
from .media_types import media_type_for


def parse_audio(data: bytes, doc_id: str) -> List[dict]:
    data = bytes(data)
    probe = probe_audio(data)
    name = os.path.basename(doc_id.split("?")[0])
    mt = media_type_for(doc_id) or "application/octet-stream"
    bits = [f"Audio file {name} ({mt}, {probe['n_bytes']} bytes"]
    if probe["duration_ms"] is not None:
        bits.append(f", {probe['duration_ms'] / 1000:.3f} s")
    if probe["sample_rate"] is not None:
        bits.append(f", {probe['sample_rate']} Hz")
    if probe["channels"] is not None:
        bits.append(f", {probe['channels']} channel"
                    + ("s" if probe["channels"] != 1 else ""))
    text = "".join(bits) + ")"
    meta = {"media_type": mt, "n_bytes": str(probe["n_bytes"]),
            "sha256": probe["sha256"]}
    for k in ("sample_rate", "channels", "duration_ms"):
        if probe[k] is not None:
            meta[k] = str(probe[k])
    return [element_row(
        doc_id=doc_id,
        seq=0,
        section_path=[0],
        elem_type=ELEM_PARAGRAPH,
        markdown=text,
        text=text,
        metadata=meta,
    )]
