"""Self-contained byte-level BPE: trainer, tiktoken-format vocab loader,
and a tokenizer-protocol adapter for the chunkers.

The reference counts tokens with ``Microsoft.ML.Tokenizers``' Tiktoken
(cl100k_base — reference ``src/Samples/Program.cs:32``); the ``tiktoken``
package is absent in this environment, so this module implements the same
byte-pair-merge algorithm from scratch:

- :func:`encode` — greedy lowest-rank pair merging per pretokenizer piece,
  the exact algorithm BPE inference requires (merge order is fully
  determined by the rank table, so any correct implementation agrees).
- :func:`load_tiktoken_file` — reads the public ``.tiktoken`` format
  (``<base64 token> <rank>`` per line): drop a real ``cl100k_base.tiktoken``
  next to the repo (or point ``SPARK_GRAFT_BPE_VOCAB`` at it) and token
  counts match the reference bit-for-bit.
- :func:`train_bpe` — deterministic BPE training (highest pair count wins,
  ties broken by byte order) so tests and offline runs have a real subword
  vocabulary without any external file.

Everything is pure python + the ``regex`` module (needed for ``\\p{L}``
classes in the cl100k pretokenizer pattern).
"""

from __future__ import annotations

import base64
import os
from typing import Dict, Iterable, List, Optional, Tuple

import regex as _re

# The cl100k_base pretokenizer pattern (public, from the tiktoken OSS
# registry). Python's `regex` accepts the possessive quantifiers as-is.
CL100K_PATTERN = (
    r"""'(?i:[sdmt]|ll|ve|re)|[^\r\n\p{L}\p{N}]?+\p{L}+|\p{N}{1,3}"""
    r"""| ?[^\s\p{L}\p{N}]++[\r\n]*|\s*[\r\n]|\s+(?!\S)|\s+"""
)

Ranks = Dict[bytes, int]


def _pretokenize(pattern) -> "_re.Pattern":
    return _re.compile(pattern)


def byte_pair_merge(piece: bytes, ranks: Ranks) -> List[bytes]:
    """Split one pretokenized piece into BPE tokens.

    Standard greedy algorithm: start from single bytes, repeatedly merge the
    adjacent pair with the lowest rank until no mergeable pair remains."""
    parts: List[bytes] = [piece[i : i + 1] for i in range(len(piece))]
    if len(parts) < 2:
        return parts
    while True:
        best_rank = None
        best_i = -1
        for i in range(len(parts) - 1):
            r = ranks.get(parts[i] + parts[i + 1])
            if r is not None and (best_rank is None or r < best_rank):
                best_rank, best_i = r, i
        if best_rank is None:
            return parts
        parts[best_i : best_i + 2] = [parts[best_i] + parts[best_i + 1]]


class BPE:
    """Byte-level BPE codec over a rank table (token bytes → id).

    Ranks double as ids, exactly like the ``.tiktoken`` format. All 256
    single bytes must be present so any input is encodable."""

    def __init__(self, ranks: Ranks, pattern: str = CL100K_PATTERN):
        missing = 256 - len({b for b in ranks if len(b) == 1})
        if missing:
            raise ValueError(f"rank table lacks {missing} single-byte tokens")
        self.ranks = ranks
        self._decode = {v: k for k, v in ranks.items()}
        if len(self._decode) != len(ranks):
            raise ValueError("duplicate ranks in vocab")
        self._pat = _pretokenize(pattern)
        self.pattern = pattern

    def encode(self, text: str) -> List[int]:
        ids: List[int] = []
        ranks = self.ranks
        for m in self._pat.finditer(text):
            piece = m.group().encode("utf-8")
            tok = ranks.get(piece)
            if tok is not None:
                ids.append(tok)
            else:
                ids.extend(ranks[p] for p in byte_pair_merge(piece, ranks))
        return ids

    def decode_bytes(self, ids: Iterable[int]) -> bytes:
        return b"".join(self._decode[i] for i in ids)

    def decode(self, ids: Iterable[int]) -> str:
        # A prefix of a valid stream can end mid-codepoint (byte-level BPE);
        # 'replace' keeps decode total, like tiktoken's decode.
        return self.decode_bytes(ids).decode("utf-8", errors="replace")


def load_tiktoken_file(path: str, pattern: str = CL100K_PATTERN) -> BPE:
    """Load a ``.tiktoken`` vocab (``<base64> <rank>`` lines)."""
    ranks: Ranks = {}
    with open(path, "rb") as f:
        for line in f:
            line = line.strip()
            if not line:
                continue
            tok_b64, rank = line.split()
            ranks[base64.b64decode(tok_b64)] = int(rank)
    return BPE(ranks, pattern)


def dump_tiktoken(ranks: Ranks) -> bytes:
    return b"".join(
        base64.b64encode(tok) + b" " + str(rank).encode() + b"\n"
        for tok, rank in sorted(ranks.items(), key=lambda kv: kv[1])
    )


def piece_counts(corpus: Iterable[str],
                 pattern: str = CL100K_PATTERN) -> Dict[Tuple[bytes, ...], int]:
    """Pretokenized piece-frequency table: piece (as a tuple of single
    bytes) → occurrence count. This is the only corpus-size-dependent
    step of BPE training — the distributed twin is
    ``operators/bpe_train.py::word_piece_counts`` (a groupBy count)."""
    pat = _pretokenize(pattern)
    freq: Dict[Tuple[bytes, ...], int] = {}
    for text in corpus:
        for m in pat.finditer(text):
            key = tuple(bytes([b]) for b in m.group().encode("utf-8"))
            if key:
                freq[key] = freq.get(key, 0) + 1
    return freq


def train_bpe(corpus: Iterable[str], vocab_size: int,
              pattern: str = CL100K_PATTERN) -> Ranks:
    """Deterministic BPE training.

    Ids 0-255 are the single bytes; each merge appends one token. The most
    frequent adjacent pair wins each round, ties broken by the pair's bytes
    (lexicographic), so training is reproducible on any machine."""
    return train_bpe_from_counts(piece_counts(corpus, pattern), vocab_size)


def train_bpe_from_counts(freq: Dict[Tuple[bytes, ...], int],
                          vocab_size: int) -> Ranks:
    """The merge loop of :func:`train_bpe`, decoupled from corpus scanning:
    trains from a piece-frequency table (piece bytes → count). Merge order
    depends only on this table, so counting pieces distributed (one Spark
    groupBy — see ``operators/bpe_train.py``) and merging here is exactly
    equivalent to single-process training; the table is bounded by the
    number of DISTINCT pieces (≈ vocabulary of the corpus), not its size."""
    if vocab_size < 256:
        raise ValueError("vocab_size must be ≥ 256")
    ranks: Ranks = {bytes([i]): i for i in range(256)}
    words = sorted(freq.items())  # deterministic iteration order
    while len(ranks) < vocab_size:
        counts: Dict[Tuple[bytes, bytes], int] = {}
        for word, n in words:
            for i in range(len(word) - 1):
                pair = (word[i], word[i + 1])
                counts[pair] = counts.get(pair, 0) + n
        if not counts:
            break
        best = min(counts.items(), key=lambda kv: (-kv[1], kv[0]))[0]
        merged = best[0] + best[1]
        if merged in ranks:  # already a token (same pair re-derived); stop
            break
        ranks[merged] = len(ranks)
        new_words = []
        for word, n in words:
            if len(word) > 1:
                out: List[bytes] = []
                i = 0
                while i < len(word):
                    if i + 1 < len(word) and word[i] == best[0] and word[i + 1] == best[1]:
                        out.append(merged)
                        i += 2
                    else:
                        out.append(word[i])
                        i += 1
                word = tuple(out)
            new_words.append((word, n))
        words = new_words
    return ranks


class BPETokenizer:
    """Tokenizer-protocol adapter (encode/decode/count/index_by_token_count)
    so BPE slots into every chunker exactly like ``WordTokenizer`` —
    mirroring the reference's ``IngestionChunkerOptions.Tokenizer``
    (``IngestionChunkerOptions.cs:9-79``)."""

    def __init__(self, bpe: BPE, name: str = "bpe"):
        self.bpe = bpe
        self.name = name

    def encode(self, text: str) -> List[int]:
        return self.bpe.encode(text)

    def decode(self, ids: List[int]) -> str:
        return self.bpe.decode(ids)

    decode_raw = decode

    def count(self, text: str) -> int:
        return len(self.bpe.encode(text))

    def index_by_token_count(self, text: str, max_tokens: int) -> Tuple[int, int]:
        """Char index covering at most ``max_tokens`` tokens, and the count
        (the reference's ``Tokenizer.GetIndexByTokenCount``,
        ``ElementsChunker.cs:149-155``). A byte-level token prefix can end
        mid-codepoint; the trailing partial char is excluded from the index."""
        if max_tokens <= 0:
            return 0, 0
        ids = self.bpe.encode(text)
        take = ids[:max_tokens]
        prefix = self.bpe.decode_bytes(take)
        return len(prefix.decode("utf-8", errors="ignore")), len(take)


_DEFAULT_TRAIN_VOCAB = 1024

_SEED_CORPUS = [
    "the quick brown fox jumps over the lazy dog",
    "data ingestion pipelines chunk documents into tokens",
    "spark executes distributed queries over parquet tables",
    "markdown headers sections tables and code fences",
    "embedding vectors support similarity search and dedup",
]


def seed_bpe_tokenizer() -> BPETokenizer:
    """The built-in deterministic vocab — always identical on any machine
    (training ties break by byte order), so it can anchor cross-engine
    goldens the way md5 anchors the hash-based operators."""
    return BPETokenizer(BPE(train_bpe(_SEED_CORPUS, _DEFAULT_TRAIN_VOCAB)),
                        name="seed-bpe")


def default_bpe_tokenizer(vocab_path: Optional[str] = None) -> BPETokenizer:
    """A real-vocab tokenizer when a ``.tiktoken`` file is available
    (``SPARK_GRAFT_BPE_VOCAB`` or an explicit path), else the seed vocab.

    An explicitly configured vocab that cannot be honored RAISES — silently
    degrading to seed counts would move every chunk boundary while claiming
    reference parity."""
    path = vocab_path or os.environ.get("SPARK_GRAFT_BPE_VOCAB")
    if path:
        if not os.path.isfile(path):
            raise FileNotFoundError(
                f"BPE vocab configured but not found: {path} "
                "(unset SPARK_GRAFT_BPE_VOCAB to use the built-in seed vocab)"
            )
        return BPETokenizer(load_tiktoken_file(path), name=os.path.basename(path))
    return seed_bpe_tokenizer()
