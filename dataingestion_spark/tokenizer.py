"""Tokenizers used for token-budgeted chunking.

The reference engine counts tokens with ``Microsoft.ML.Tokenizers``'
Tiktoken (cl100k_base; see reference ``src/Samples/Program.cs:32``).
``tiktoken`` is not available in this environment, so the default is a
deterministic whitespace tokenizer: every token is a maximal run of
non-whitespace characters *plus its trailing whitespace*, which makes
encode→window→decode lossless (windows concatenate back to the original
text, as the reference's DocumentTokenChunker tests require).

A real BPE can be slotted in via :class:`TiktokenTokenizer` when the
``tiktoken`` package is importable; all chunkers take the tokenizer as a
parameter, mirroring the reference's ``IngestionChunkerOptions.Tokenizer``
(reference ``src/.../Chunkers/IngestionChunkerOptions.cs:9-79``).
"""

from __future__ import annotations

import re
from typing import List, Tuple

# A token is a word (non-space run) with its trailing whitespace attached.
_TOKEN_RE = re.compile(r"\S+\s*")

# GPT-2-style pretokenizer pattern, used only for *counting* BPE-ish tokens
# in text analytics (`operators/text_analysis.py`), not for chunking.
BPEISH_RE = re.compile(
    r"'(?:s|t|re|ve|m|ll|d)| ?[A-Za-z]+| ?[0-9]+| ?[^\sA-Za-z0-9]+|\s+"
)


class WordTokenizer:
    """Deterministic, lossless whitespace tokenizer.

    ``encode`` returns string spans instead of integer ids; ``decode`` is
    concatenation. Token *counts* (what drives every packing decision in the
    chunkers) are the number of spans.
    """

    name = "word"

    def encode(self, text: str) -> List[str]:
        return _TOKEN_RE.findall(text)

    def decode(self, spans: List[str]) -> str:
        # Strip the trailing whitespace of the last span so windows look like
        # natural text; concatenation across overlap-0 windows stays lossless
        # only when windows are decoded with keep_tail=True (see decode_raw).
        return "".join(spans).rstrip()

    def decode_raw(self, spans: List[str]) -> str:
        return "".join(spans)

    def count(self, text: str) -> int:
        # equivalent to len(_TOKEN_RE.findall(text)) — str.split is ~5×
        # faster and counting dominates the chunk-packing hot loop
        return len(text.split())

    def index_by_token_count(self, text: str, max_tokens: int) -> Tuple[int, int]:
        """Char index covering at most ``max_tokens`` tokens, and the count.

        Mirror of ``Tokenizer.GetIndexByTokenCount`` used by the reference's
        ElementsChunker text-split path (``ElementsChunker.cs:149-155``).
        """
        if max_tokens <= 0:
            return 0, 0
        n = 0
        end = 0
        for m in _TOKEN_RE.finditer(text):
            n += 1
            end = m.end()
            if n >= max_tokens:
                break
        return end, n


class TiktokenTokenizer:
    """cl100k_base adapter; requires the ``tiktoken`` package."""

    name = "cl100k_base"

    def __init__(self, encoding: str = "cl100k_base"):
        import tiktoken  # gated import: not in the default environment

        self._enc = tiktoken.get_encoding(encoding)

    def encode(self, text: str) -> List[int]:
        return self._enc.encode(text)

    def decode(self, ids: List[int]) -> str:
        return self._enc.decode(ids)

    decode_raw = decode

    def count(self, text: str) -> int:
        return len(self._enc.encode(text))

    def index_by_token_count(self, text: str, max_tokens: int) -> Tuple[int, int]:
        ids = self._enc.encode(text)
        if max_tokens <= 0 or not ids:
            return 0, 0
        take = ids[:max_tokens]
        return len(self._enc.decode(take)), len(take)


def default_tokenizer():
    """Best-available reference parity: the ``tiktoken`` package when
    importable; else, if a ``.tiktoken`` vocab file is provided via
    ``SPARK_GRAFT_BPE_VOCAB``, the self-contained BPE engine (``bpe.py``)
    with identical counts; else the word tokenizer (keeps all goldens
    deterministic without any external file)."""
    import os

    # Explicit configuration outranks auto-detection: a user-set vocab is
    # honored even where tiktoken happens to be importable, and load
    # errors propagate rather than degrading to other counts.
    if os.environ.get("SPARK_GRAFT_BPE_VOCAB"):
        from .bpe import default_bpe_tokenizer

        return default_bpe_tokenizer()
    # Best-effort: tiktoken may be installed yet unable to fetch its
    # encoding files offline — any failure here falls through.
    try:
        return TiktokenTokenizer()
    except Exception:
        pass
    return WordTokenizer()
