"""Distributed BPE vocabulary training.

BPE training has exactly one corpus-size-dependent step: counting
pretokenized pieces. Everything after — the iterative pair-merge loop —
operates on the piece-frequency table, whose size is the number of
DISTINCT pieces (the corpus vocabulary, ~10⁶-10⁷ rows at web scale), not
the corpus. So the Spark-first shape is:

1. :func:`word_piece_counts` — one explode + groupBy count over the
   corpus (map-side combine; at 100 TB this is a single shuffle of
   (piece, partial-count) rows, exactly the word-count topology);
2. collect the counts table to the driver (bounded by distinct pieces)
   and run the deterministic merge loop
   (:func:`~dataingestion_spark.bpe.train_bpe_from_counts`) — the same
   split HuggingFace tokenizers / SentencePiece use for their
   parallel trainers.

Equivalence to single-process :func:`~dataingestion_spark.bpe.train_bpe`
is exact (merge order depends only on the frequency table) and pinned in
``tests/test_bpe.py``.

Two pretokenizer modes:

* ``pattern=None`` — whitespace pieces, **expression-only** (JVM split +
  explode; no Python in the scan) and SQL-oracle-checkable;
* ``pattern=<regex>`` (e.g. the cl100k pattern) — ``mapInPandas`` with
  the ``regex`` module and per-batch local Counters, since RE2-based
  engines (Spark, DuckDB) cannot run its possessive quantifiers.

The reference repo only CONSUMES a trained vocabulary
(Microsoft.ML.Tokenizers Tiktoken, reference ``src/Samples/Program.cs:32``);
training one from the corpus is part of the beyond-reference
training-data surface.
"""

from __future__ import annotations

from typing import Dict, Optional, Tuple

from pyspark.sql import DataFrame, functions as F

from ..bpe import CL100K_PATTERN, Ranks, train_bpe_from_counts


def word_piece_counts(df: DataFrame, text_col: str = "text",
                      pattern: Optional[str] = None) -> DataFrame:
    """(piece string, cnt long) — the distributed pretoken count.

    ``pattern=None``: whitespace-delimited pieces via JVM split+explode
    (codegen, no UDF). Otherwise: the given ``regex``-module pattern via
    ``mapInPandas`` with a per-batch Counter, so the shuffle input is
    already (piece, partial-count), not one row per occurrence."""
    if pattern is None:
        return (
            df.select(
                F.explode(F.split(F.trim(F.col(text_col)), r"\s+")).alias("piece")
            )
            .filter(F.col("piece") != "")
            .groupBy("piece")
            .agg(F.count("*").alias("cnt"))
        )

    def scan(batches):
        from collections import Counter

        import pandas as pd
        import regex as re

        pat = re.compile(pattern)
        for pdf in batches:
            c: Counter = Counter()
            for text in pdf[text_col].dropna():
                c.update(m.group() for m in pat.finditer(text))
            if c:
                items = sorted(c.items())
                yield pd.DataFrame(
                    {"piece": [k for k, _ in items],
                     "cnt": [v for _, v in items]}
                )

    partial = df.select(text_col).mapInPandas(scan, "piece string, cnt long")
    return partial.groupBy("piece").agg(F.sum("cnt").alias("cnt"))


def pair_counts(counts: DataFrame) -> DataFrame:
    """Round-1 adjacent character-pair counts from a piece-count table —
    the statistic the first BPE merge maximizes, expression-only
    (equals byte pairs for ASCII pieces; the training loop itself is
    byte-level regardless). Output: (pair string, n long)."""
    p = F.col("piece")
    pairs = F.transform(
        F.sequence(F.lit(1), F.length(p) - 1),
        lambda i: p.substr(i, F.lit(2)),
    )
    return (
        counts.filter(F.length(p) >= 2)
        .select(F.explode(pairs).alias("pair"), "cnt")
        .groupBy("pair")
        .agg(F.sum("cnt").alias("n"))
    )


DEFAULT_MAX_PIECES = 5_000_000


def train_bpe_distributed(df: DataFrame, vocab_size: int,
                          text_col: str = "text",
                          pattern: Optional[str] = CL100K_PATTERN,
                          max_pieces: Optional[int] = DEFAULT_MAX_PIECES) -> Ranks:
    """Distributed-count BPE training; returns the same rank table
    ``train_bpe`` would produce on the concatenated corpus.

    ``max_pieces`` caps the driver-side table to the most frequent pieces
    (ties broken by piece) — the standard frequency-floor approximation
    for corpora whose long tail of singleton pieces would dominate the
    collect. The cap DEFAULTS ON (5M pieces ≈ low-hundreds of MB of
    driver state) so the safe behavior is opt-out: on a web-scale corpus
    the distinct-piece long tail is unbounded, and an uncapped collect is
    a driver OOM, not a training improvement — singleton pieces cannot
    influence any merge ranked above the frequency floor. Pass ``None``
    for the exact (unbounded) collect on corpora known to be small.
    When the cap binds, the truncation is logged via the observability
    hook so the approximation is visible, not silent."""
    counts = word_piece_counts(df, text_col, pattern)
    if max_pieces is not None:
        # collect one extra row: its presence IS the truncation signal,
        # without a separate count job over the piece table
        rows = counts.orderBy(F.desc("cnt"), F.asc("piece")).limit(
            max_pieces + 1).collect()
        if len(rows) > max_pieces:
            from ..observability import record_event

            record_event("bpe_train.pieces_truncated",
                         {"max_pieces": max_pieces,
                          "floor_cnt": int(rows[max_pieces]["cnt"])})
            rows = rows[:max_pieces]
    else:
        rows = counts.collect()
    freq: Dict[Tuple[bytes, ...], int] = {}
    for row in rows:
        key = tuple(bytes([b]) for b in row["piece"].encode("utf-8"))
        if key:
            freq[key] = freq.get(key, 0) + row["cnt"]
    return train_bpe_from_counts(freq, vocab_size)


def bpe_encode_df(df: DataFrame, ranks: Ranks, text_col: str = "text",
                  out_col: str = "token_ids",
                  pattern: Optional[str] = CL100K_PATTERN) -> DataFrame:
    """Distributed BPE ENCODE: the apply side of the train→tokenize→pack
    pipeline — adds ``out_col`` (``array<int>`` token ids) and
    ``n_tokens`` to every row.

    The rank table rides to executors ONCE via a Spark broadcast (a
    cl100k-scale vocab is ~2 MB — closure-pickling it into every task
    would re-ship it per task), and each Arrow batch is encoded with the
    repo's own merge loop (:class:`~dataingestion_spark.bpe.BPE`, the
    tiktoken algorithm). Python-per-row is irreducible here — BPE's
    greedy merge has no relational form — so this is the documented
    Pandas-UDF slow path: Arrow batch transfer, zero driver involvement,
    linear in corpus bytes, embarrassingly parallel (no shuffle at all).

    decode(encode(x)) == x for any text (byte-level BPE is lossless);
    the driver query pins that round trip externally, golden-id tests
    pin exact tokenizations."""
    from pyspark.sql import types as T

    spark = df.sparkSession
    bc = spark.sparkContext.broadcast((dict(ranks), pattern))
    fields = df.schema.fields

    def encode_batches(batches):
        import pandas as pd

        from dataingestion_spark.bpe import BPE

        rk, pat = bc.value
        enc = BPE(rk, pattern=pat) if pat is not None else BPE(rk)
        for pdf in batches:
            texts = pdf[text_col].astype(object)
            ids = [enc.encode(t) if isinstance(t, str) else []
                   for t in texts]
            pdf[out_col] = pd.Series(ids, index=pdf.index, dtype=object)
            pdf["n_tokens"] = [len(i) for i in ids]
            yield pdf

    schema = T.StructType(
        list(fields)
        + [T.StructField(out_col, T.ArrayType(T.IntegerType())),
           T.StructField("n_tokens", T.IntegerType())]
    )
    return df.mapInPandas(encode_batches, schema=schema)


def bpe_decode_df(df: DataFrame, ranks: Ranks,
                  ids_col: str = "token_ids",
                  out_col: str = "decoded",
                  pattern: Optional[str] = CL100K_PATTERN) -> DataFrame:
    """Inverse of :func:`bpe_encode_df`: ``out_col`` holds the UTF-8
    decode of each row's token ids (lossless for ids produced by the
    same rank table). Same broadcast + Arrow-batch shape."""
    from pyspark.sql import types as T

    spark = df.sparkSession
    bc = spark.sparkContext.broadcast((dict(ranks), pattern))
    fields = df.schema.fields

    def decode_batches(batches):
        from dataingestion_spark.bpe import BPE

        rk, pat = bc.value
        enc = BPE(rk, pattern=pat) if pat is not None else BPE(rk)
        for pdf in batches:
            pdf[out_col] = [
                enc.decode(list(ids)) if ids is not None else None
                for ids in pdf[ids_col]
            ]
            yield pdf

    schema = T.StructType(list(fields)
                          + [T.StructField(out_col, T.StringType())])
    return df.mapInPandas(decode_batches, schema=schema)
