"""Chunk/element enrichers: the LLM-metadata operators, Spark-first.

The reference's four chunk enrichers each make one chat-model call per chunk
and add one metadata key, never touching content (``Processors/
SummaryEnricher.cs``, ``KeywordEnricher.cs``, ``ClassificationEnricher.cs``,
``SentimentEnricher.cs``); ``ImageAlternativeTextEnricher`` fills missing
image alt text (``Processors/ImageAlternativeTextEnricher.cs:15-73``).

Here each enricher adds a *promoted column* (the relational form of the
reference's metadata bag — the vector writer promotes metadata to columns
anyway, ``VectorStoreWriter.cs:111-149``) and comes in two flavours:

* ``chat_fn=None`` → a deterministic local model expressed with **built-in
  SQL functions only** (JVM-side, codegen, reproducible across engines) —
  the moral equivalent of the reference tests' deterministic fakes
  (``test/.../Utils``), but scale-ready;
* ``chat_fn=callable`` → an Arrow-batched pandas UDF that calls the model
  once per chunk batch (batching + injectability replace the reference's
  per-chunk serialized IChatClient calls).

A real deployment plugs a rate-limited remote client into ``chat_fn``.
"""

from __future__ import annotations

from typing import Callable, List, Optional, Sequence

import pandas as pd  # module-level: PySpark resolves UDF type hints here

from pyspark.sql import Column, DataFrame, functions as F

TOKEN_SPLIT = r"\s+"

POSITIVE_WORDS = ("fast", "small", "good", "great", "excellent")
NEGATIVE_WORDS = ("slow", "big", "bad", "poor", "terrible")


def _words(col: Column) -> Column:
    return F.split(F.trim(col), TOKEN_SPLIT)


def _batched_udf(fn: Callable[[List[str]], List], out_type: str):
    # NB: `from __future__ import annotations` stringifies the hints and
    # PySpark resolves them via the module's globals — pandas must be
    # importable there as `pd`, not inside this function.
    def udf(s: pd.Series) -> pd.Series:
        return pd.Series(fn(s.tolist()))

    return F.pandas_udf(udf, out_type)


def summary_enricher(df: DataFrame, content_col: str = "content",
                     chat_fn: Optional[Callable] = None, max_words: int = 100,
                     out_col: str = "summary") -> DataFrame:
    """Summary ≤ max_words (reference prompt "Write a summary text for this
    text with less than {N} words", SummaryEnricher.cs:56). Fake: the first
    min(10, max_words) words — a deterministic "summary"."""
    if chat_fn is not None:
        return df.withColumn(out_col, _batched_udf(chat_fn, "string")(F.col(content_col)))
    n = min(10, max_words)
    return df.withColumn(out_col, F.array_join(F.slice(_words(F.col(content_col)), 1, n), " "))


def keyword_enricher(df: DataFrame, content_col: str = "content",
                     chat_fn: Optional[Callable] = None, max_keywords: int = 5,
                     min_word_len: int = 5, out_col: str = "keywords") -> DataFrame:
    """Up to ``max_keywords`` keywords as array<string> (KeywordEnricher.cs:
    20-88, structured string[] output). Fake: the most frequent words of
    length ≥ min_word_len, ties broken by the word itself — all relational:
    explode → count → rank window → collect, shuffles on (id, word) only."""
    if chat_fn is not None:
        return df.withColumn(out_col, _batched_udf(chat_fn, "array<string>")(F.col(content_col)))

    # Array-native: filter short words, count duplicates per distinct word,
    # sort by (-count, word), take the head. Stays inside one projection —
    # no explode/shuffle at all, the whole thing is codegen'd per row.
    words = F.filter(_words(F.col(content_col)), lambda x: F.length(x) >= min_word_len)
    distinct = F.array_distinct(words)
    scored = F.transform(
        distinct,
        lambda w: F.struct(
            F.size(F.filter(words, lambda x: x == w)).alias("n"), w.alias("w")
        ),
    )
    # array_sort on structs orders ascending by field order; encode count
    # descending via negation.
    ordered = F.array_sort(
        F.transform(scored, lambda s: F.struct((-s["n"]).alias("negn"), s["w"].alias("w")))
    )
    top = F.slice(F.transform(ordered, lambda s: s["w"]), 1, max_keywords)
    return df.withColumn(out_col, top)


def classification_enricher(df: DataFrame, classes: Sequence[str],
                            content_col: str = "content",
                            chat_fn: Optional[Callable] = None,
                            fallback: str = "Unknown",
                            out_col: str = "classification") -> DataFrame:
    """Single most relevant class from a closed list, fallback when none
    applies (ClassificationEnricher.cs:19-77). Fake: the class whose name
    occurs most often as a whole word; ties → earlier class in the list."""
    if chat_fn is not None:
        return df.withColumn(out_col, _batched_udf(chat_fn, "string")(F.col(content_col)))
    words = _words(F.col(content_col))

    # Single-parameter lambdas only: a second parameter would be bound to the
    # array index by PySpark, shadowing a default-arg closure.
    def eq_fn(cls: str):
        return lambda x: x == F.lit(cls)

    counts = [F.size(F.filter(words, eq_fn(c))) for c in classes]
    best = F.greatest(*counts) if len(counts) > 1 else counts[0]
    # Earlier class wins ties: build the WHEN chain in list order.
    expr = F.lit(fallback)
    for c, cnt in reversed(list(zip(classes, counts))):
        expr = F.when((best > 0) & (cnt == best), F.lit(c)).otherwise(expr)
    return df.withColumn(out_col, expr)


def sentiment_enricher(df: DataFrame, content_col: str = "content",
                       chat_fn: Optional[Callable] = None,
                       out_col: str = "sentiment") -> DataFrame:
    """Positive/Negative/Neutral (SentimentEnricher.cs:19-65; the reference
    returns Unknown below a confidence threshold — the fake is always
    confident). Fake: lexicon hit counts, Positive iff pos>neg."""
    if chat_fn is not None:
        return df.withColumn(out_col, _batched_udf(chat_fn, "string")(F.col(content_col)))
    words = _words(F.col(content_col))
    pos = F.size(F.filter(words, lambda x: x.isin(*POSITIVE_WORDS)))
    neg = F.size(F.filter(words, lambda x: x.isin(*NEGATIVE_WORDS)))
    return df.withColumn(
        out_col,
        F.when(pos > neg, "Positive").when(neg > pos, "Negative").otherwise("Neutral"),
    )


def image_alt_text_enricher(elements_df: DataFrame,
                            caption_fn: Optional[Callable] = None) -> DataFrame:
    """Fill ``image_alt_text`` for images that have bytes + media type but no
    alt text yet; existing alt text is never overwritten
    (ImageAlternativeTextEnricher.cs:35-60 — skip-if-present guard).

    The expensive model runs only on the filtered image rows (relational form
    of the reference's skip-work guard). Fake caption: byte length + media
    type, built-ins only."""
    needs = (
        (F.col("elem_type") == "image")
        & F.col("image_alt_text").isNull()
        & F.col("image_content").isNotNull()
        & F.col("image_media_type").isNotNull()
    )
    if caption_fn is None:
        caption = F.concat(
            F.lit("Image ("),
            F.col("image_media_type"),
            F.lit(", "),
            F.length(F.col("image_content")).cast("string"),
            F.lit(" bytes)"),
        )
        return elements_df.withColumn(
            "image_alt_text", F.when(needs, caption).otherwise(F.col("image_alt_text"))
        )
    # A Python UDF inside when() is EXTRACTED by Catalyst and evaluated on
    # every row (nulls included) — the model must only ever see the filtered
    # image rows, so caption them separately and join back on (doc_id, seq).
    captions = (
        elements_df.filter(needs)
        .select(
            "doc_id", "seq",
            _batched_udf(caption_fn, "string")(F.col("image_content")).alias("_cap"),
        )
    )
    return (
        elements_df.join(captions, ["doc_id", "seq"], "left")
        .withColumn("image_alt_text", F.coalesce(F.col("image_alt_text"), F.col("_cap")))
        .drop("_cap")
    )
