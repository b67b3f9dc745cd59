"""QA generation: the reference's custom QAWriter sample as an operator.

The reference's FAQ sample (``src/Samples/FAQ.cs:10-72``) asks a chat model
for up to 10 question/answer pairs per chunk (structured output) and upserts
one record per pair, embedding the *question*. Relationally that is: chunk →
array<struct<question, answer>> → explode → vector records.

``chat_fn=None`` uses a deterministic local generator expressed with
built-in functions (window the content into 12-word answer spans, derive the
question from each span's head) — SQL-reproducible and JVM-fast; a real
deployment passes an Arrow-batched structured-output model call.
"""

from __future__ import annotations

from typing import Callable, Optional

from pyspark.sql import DataFrame, functions as F

ANSWER_WORDS = 12
MAX_PAIRS = 10


def qa_pairs(chunks_df: DataFrame, content_col: str = "content",
             chat_fn: Optional[Callable] = None) -> DataFrame:
    """chunks → one row per generated (question, answer) pair."""
    if chat_fn is not None:
        import pandas as pd

        @F.pandas_udf("array<struct<question string, answer string>>")
        def gen(s: "pd.Series") -> "pd.Series":
            return pd.Series(chat_fn(s.tolist()))

        pairs = gen(F.col(content_col))
    else:
        words = F.split(F.trim(F.col(content_col)), r"\s+")
        n = F.size(words)
        # ceil(n/k) spans (cap MAX_PAIRS) so trailing words always land in
        # an answer; ceil((n-1)/k) would skip the last span at n ≡ 1 (mod k)
        starts = F.sequence(
            F.lit(0),
            F.least(
                F.greatest(F.ceil(n / F.lit(ANSWER_WORDS)) - 1, F.lit(0)),
                F.lit(MAX_PAIRS - 1),
            ),
        )
        pairs = F.transform(
            starts,
            lambda i: F.struct(
                F.concat(
                    F.lit("What is "),
                    F.array_join(F.slice(words, i * ANSWER_WORDS + 1, 3), " "),
                    F.lit("?"),
                ).alias("question"),
                F.array_join(
                    F.slice(words, i * ANSWER_WORDS + 1, ANSWER_WORDS), " "
                ).alias("answer"),
            ),
        )
    exploded = chunks_df.withColumn("qa", F.explode(pairs))
    return exploded.select(
        F.col("chunk_id"),
        F.col("doc_id"),
        F.col("qa.question").alias("question"),
        F.col("qa.answer").alias("answer"),
    )


def qa_records(chunks_df: DataFrame, embed=None, chat_fn: Optional[Callable] = None) -> DataFrame:
    """QAWriter record shape: key per pair, embedding from the *question*
    (FAQ.cs:41-47), answer as content, documentid for replace semantics."""
    from ..sinks.vector_store import fake_embedding

    embed = embed or (lambda c: fake_embedding(c, dims=8))
    pairs = qa_pairs(chunks_df, chat_fn=chat_fn)
    return pairs.select(
        F.concat_ws("#", "chunk_id", F.md5("question")).alias("key"),
        embed(F.col("question")).alias("embedding"),
        F.col("question"),
        F.col("answer").alias("content"),
        F.col("doc_id").alias("documentid"),
    )
