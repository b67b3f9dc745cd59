"""Sequence packing for training-batch construction.

The last hop of a pretraining data pipeline: turn curated, sharded
documents into fixed-length training sequences. The reference stops at
chunk-level vector records (``VectorStoreWriter.cs`` writes one row per
chunk); packing documents into model sequences is left to the trainer.
At 100 TB that step is itself a distributed job, in two standard flavors:

* :func:`concat_chunk_spans` — GPT-style "concatenate everything and cut
  every ``seq_len`` tokens". Documents cross sequence boundaries; each
  document's placement is a closed-form function of its exclusive global
  prefix sum, so the operator is ONE range shuffle
  (``sharding.exclusive_prefix_sum``) plus expression math — no state,
  no second pass, any engine agrees on the output.
* :func:`pack_sequences` — document-boundary packing ("no doc is ever
  split"): greedy first-fit in a deterministic order WITHIN each shard.
  The greedy recurrence (running fill that resets when the budget would
  overflow) is inherently sequential, so the shard is the parallelism
  unit: one hash shuffle on ``shard_col``, then a state-carrying
  ``applyInPandas`` loop per shard. Shards are token-budget-bounded by
  construction (``assign_shards``), so no task ever sees more than one
  shard's rows.

Scale shape: both operators carry only (ids, token counts) through the
shuffle if the caller projects first — text/embeddings stay in the scan.
``pack_sequences``'s per-shard loop is O(rows-in-shard) numpy, not
per-row Python.
"""

from __future__ import annotations

from typing import Sequence

import pandas as pd

from pyspark.sql import DataFrame, functions as F, types as T

from .sharding import exclusive_prefix_sum

__all__ = ["concat_chunk_spans", "pack_sequences", "pack_sequences_sql"]


def concat_chunk_spans(df: DataFrame, token_col: str, seq_len: int,
                       order_cols: Sequence[str] = ("doc_id",),
                       num_partitions: int | None = None) -> DataFrame:
    """Concat-and-chunk placement: adds ``seq_first``, ``seq_last``,
    ``n_seqs``, ``offset_in_first`` for cutting the concatenated token
    stream (in ``order_cols`` order) every ``seq_len`` tokens.

    A document with ``t`` tokens starting at exclusive prefix ``p`` spans
    sequences ``floor(p/L) .. floor((p+t-1)/L)`` and begins ``p mod L``
    tokens into the first one. Zero-token documents sit at their boundary
    (``seq_last = seq_first``, ``n_seqs = 1``) rather than producing a
    negative span. Integer arithmetic throughout — no float, no rounding
    divergence between engines."""
    if seq_len <= 0:
        raise ValueError("seq_len must be positive")
    out = exclusive_prefix_sum(df, token_col, order_cols, num_partitions)
    p = F.col("_prior")
    t = F.col(token_col).cast("long")
    last_tok = p + F.greatest(t - 1, F.lit(0))
    return (
        out.withColumn("seq_first", F.floor(p / seq_len).cast("long"))
        .withColumn("seq_last", F.floor(last_tok / seq_len).cast("long"))
        .withColumn("n_seqs", (F.col("seq_last") - F.col("seq_first") + 1))
        .withColumn("offset_in_first", (p % seq_len))
        .drop("_prior")
    )


def pack_sequences(df: DataFrame, token_col: str, seq_len: int,
                   shard_col: str, order_cols: Sequence[str] = ("doc_id",),
                   ) -> DataFrame:
    """Document-boundary greedy packing per shard.

    Within each shard, documents are visited in ``order_cols`` order and
    appended to the current sequence while they fit; a document that
    would overflow starts a new sequence. A document longer than
    ``seq_len`` gets a sequence of its own (it fills past the budget, so
    the next document necessarily opens a fresh one) — the caller decides
    whether to truncate or concat-split such docs upstream.

    Adds ``seq_in_shard`` (0-based) and ``offset_in_seq`` (fill before
    placing). The (shard, order) pair fully determines the output — the
    recurrence has no ties to partitioning or timing. Mirrored by the
    :func:`pack_sequences_sql` recursive-CTE oracle."""
    if seq_len <= 0:
        raise ValueError("seq_len must be positive")
    cols = list(order_cols)
    out_schema = T.StructType(
        list(df.schema.fields)
        + [T.StructField("seq_in_shard", T.LongType()),
           T.StructField("offset_in_seq", T.LongType())]
    )

    def pack(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(cols, kind="mergesort").reset_index(drop=True)
        # Arrow hands nullable ints over as float64+NaN — normalize before
        # the integer recurrence (NaN is truthy in comparisons' presence)
        toks = pdf[token_col].fillna(0).astype("int64").to_numpy()
        seq = 0
        fill = 0
        seqs = []
        offs = []
        for t in toks:
            t = int(t)
            if fill > 0 and fill + t > seq_len:
                seq += 1
                fill = 0
            seqs.append(seq)
            offs.append(fill)
            fill += t
        return pdf.assign(seq_in_shard=seqs, offset_in_seq=offs)

    return df.groupBy(shard_col).applyInPandas(pack, out_schema)


def pack_sequences_sql(table: str, token_col: str, seq_len: int,
                       shard_expr: str, order_col: str,
                       cols: str) -> str:
    """The identical packing as a DuckDB recursive CTE.

    One iteration advances every shard by one row, so the depth is the
    LARGEST shard's row count, not the corpus size — the oracle-side
    analogue of shard-parallelism. ``cols`` must include ``{order_col}``.
    """
    L = int(seq_len)
    return f"""
WITH RECURSIVE base AS (
  SELECT {cols}, {shard_expr} AS shard_id,
         CAST({token_col} AS BIGINT) AS _tok,
         ROW_NUMBER() OVER (
           PARTITION BY {shard_expr} ORDER BY {order_col}) AS _rn
  FROM {table}
),
pack AS (
  SELECT *, CAST(0 AS BIGINT) AS seq_in_shard,
         CAST(0 AS BIGINT) AS offset_in_seq, _tok AS _fill
  FROM base WHERE _rn = 1
  UNION ALL
  SELECT b.*,
         CASE WHEN p._fill > 0 AND p._fill + b._tok > {L}
              THEN p.seq_in_shard + 1 ELSE p.seq_in_shard END,
         CASE WHEN p._fill > 0 AND p._fill + b._tok > {L}
              THEN CAST(0 AS BIGINT) ELSE p._fill END,
         CASE WHEN p._fill > 0 AND p._fill + b._tok > {L}
              THEN b._tok ELSE p._fill + b._tok END
  FROM pack p JOIN base b
    ON b.shard_id = p.shard_id AND b._rn = p._rn + 1
)
SELECT * EXCLUDE (_tok, _rn, _fill) FROM pack
"""


def pack_token_ids(df: DataFrame, ids_col: str = "token_ids",
                   seq_len: int = 512,
                   order_cols: Sequence[str] = ("documentid",),
                   drop_partial: bool = True) -> DataFrame:
    """Materialize GPT-style training sequences of ACTUAL token ids (the
    id-level twin of :func:`concat_chunk_spans`, which only places
    counts): concatenate every document's ``ids_col`` in the
    deterministic ``order_cols`` order and cut every ``seq_len`` tokens,
    documents crossing boundaries freely.

    Relational end to end: one distributed exclusive prefix sum over
    token counts (:func:`..sharding.exclusive_prefix_sum` — one range
    shuffle), then ``posexplode`` assigns every token its global
    position; ``seq_id = pos div seq_len`` and one groupBy rebuilds each
    sequence with ``array_sort(collect_list(struct(pos, id)))`` — order
    is explicit in the data, not an accident of partitioning, so any
    engine reproduces the exact sequences. The explode is linear in
    corpus tokens and the only wide exchange is the seq_id groupBy —
    the minimal cost of physically building training rows.

    ``drop_partial`` drops the trailing short sequence (standard
    pretraining practice). Returns (seq_id, tokens, n)."""
    from .sharding import exclusive_prefix_sum

    counted = df.select(*order_cols, ids_col).withColumn(
        "_n", F.size(F.col(ids_col)))
    based = exclusive_prefix_sum(counted, "_n", order_cols=list(order_cols))
    toks = (
        based.select("_prior", F.posexplode(ids_col).alias("_p", "_id"))
        .select(((F.col("_prior") + F.col("_p")) / seq_len)
                .cast("long").alias("seq_id"),
                ((F.col("_prior") + F.col("_p")) % seq_len).alias("_pos"),
                "_id")
    )
    seqs = (
        toks.groupBy("seq_id")
        .agg(F.array_sort(F.collect_list(F.struct("_pos", "_id")))
             .alias("_packed"))
        .select(
            "seq_id",
            F.transform("_packed", lambda s: s["_id"]).alias("tokens"),
            F.size("_packed").alias("n"),
        )
    )
    if drop_partial:
        seqs = seqs.filter(F.col("n") == seq_len)
    return seqs
