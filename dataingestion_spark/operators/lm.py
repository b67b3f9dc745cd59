"""N-gram language-model perplexity filtering (CCNet-style).

CCNet (Wenzek et al. 2020, "CCNet: Extracting High Quality Monolingual
Datasets from Web Crawl Data") filters web text by the perplexity of a
language model trained on a trusted corpus: low-perplexity documents look
like the reference distribution, high-perplexity ones are noise. The
reference repo has no LM scoring (its quality axis is the LLM enrichers,
`src/Microsoft.Extensions.DataIngestion/Processors/*.cs`); this module is
part of the beyond-reference training-data surface.

The model here is a word-bigram LM with add-k smoothing — small enough to
be exactly SQL-expressible (so the whole train→score path is oracle-checked
against DuckDB) while exercising the real distributed shape:

* **train** = one explode + two groupBy counts over the reference corpus
  (map-side combine; the model is a DataFrame, not driver state);
* **score** = per-doc bigram counts joined against the model (equi-join on
  the gram key), then a sorted deterministic float fold per document.

At 100 TB the reference corpus is a curated sample, so the model table is
millions of rows (≪ 8 GB) → broadcast to score without shuffling the
corpus; if the model outgrows broadcast, the gram join is a plain shuffle
equi-join on (w1, w2) and AQE handles skew (stopword-headed grams are the
skewed keys). The corpus text itself is never shuffled — only (doc_id,
w1, w2, cnt) gram rows.

Determinism: log-probabilities are ``ln`` of ratios of exact integers and
the dyadic k=0.5 (ln verified bit-identical across engines by the BM25
oracle); per-doc totals fold in sorted (w1, w2) order with a 0.0 initial
accumulator, matching DuckDB's ``list_reduce(list(s ORDER BY w1, w2))``
exactly (0.0 + s == s in IEEE). We report **log-perplexity (nats per
bigram)** rather than exp(nll) to keep the oracle free of exp().
"""

from __future__ import annotations

from typing import Optional

from pyspark.sql import DataFrame, functions as F

_WS = r"\s+"


def _words(text_col: str):
    """Whitespace tokens of lowercased, trimmed text — identical semantics
    to ``regexp_split_to_array(trim(lower(text)), '\\s+')`` in the oracle
    and to operators/text_analysis.py's normalization."""
    return F.split(F.trim(F.lower(F.col(text_col))), _WS)


def _doc_bigrams(df: DataFrame, text_col: str, id_col: str) -> DataFrame:
    """One row per (doc, w1, w2) bigram *type* with its occurrence count.
    Pure map + one groupBy keyed (doc, gram); the shuffle carries compact
    gram rows, never the document text.

    NOT fanned: the zip-with-tail gram build is array-slice-speed (like
    collocations' bigram build, reverted in r14) and the groupBy pays its
    own exchange right after the explode — the r15 tight-ABBA A/B read
    ON−OFF +0.296 s median, 5/6 positive (plans/r15/ab_fanout_sites.txt),
    confirming the r14 driver's lm_perplexity 0.57×/builder 0.83×."""
    w = _words(text_col)
    # zip the word array with its own tail: each slice is evaluated once per
    # row, so building the gram list is O(len). (The tempting alternative —
    # element_at(w, i+2) inside a transform lambda — re-evaluates the split
    # per element: O(len²) per document, ~4× slower end-to-end at sf0.1.)
    n1 = F.greatest(F.size(w) - 1, F.lit(0))
    grams = F.zip_with(
        F.slice(w, 1, n1), F.slice(w, 2, n1),
        lambda x, y: F.struct(x.alias("w1"), y.alias("w2")),
    )
    return (
        df.select(F.col(id_col), F.explode(grams).alias("g"))
        .select(id_col, F.col("g.w1").alias("w1"), F.col("g.w2").alias("w2"))
        .groupBy(id_col, "w1", "w2")
        .agg(F.count("*").alias("cnt"))
    )


def train_bigram_lm(ref: DataFrame, text_col: str = "text",
                    id_col: str = "doc_id") -> DataFrame:
    """Count model from the reference corpus: one row per observed bigram
    ``(w1, w2, c2)`` — conditional counts; unigram (context) counts and the
    vocabulary size are derived by :func:`lm_log_perplexity` from this same
    table, so the model is a single broadcastable DataFrame."""
    return (
        _doc_bigrams(ref, text_col, id_col)
        .groupBy("w1", "w2")
        .agg(F.sum("cnt").alias("c2"))
    )


def lm_log_perplexity(df: DataFrame, model: DataFrame,
                      text_col: str = "text", id_col: str = "doc_id",
                      add_k: float = 0.5,
                      broadcast_model: Optional[bool] = None) -> DataFrame:
    """Score every document with ≥ 1 bigram against the bigram LM:
    ``(id_col, n_bigrams, nll)`` where nll is the add-k smoothed negative
    log-likelihood per bigram token (nats) —

        P(w2|w1) = (c(w1,w2) + k) / (c(w1·) + k·V)

    with V = |vocabulary of model contexts ∪ successors| and c(w1·) the
    total count of bigrams starting at w1. Unseen w1 degrades to the
    uniform 1/V. Lower nll = more reference-like; filter with
    ``nll < threshold`` (CCNet keeps the head/middle of the distribution).

    ``broadcast_model=True`` forces a broadcast gram join (model ≪ 8 GB —
    the normal case: the model comes from a curated sample);
    ``False`` forces shuffle; ``None`` lets AQE choose.
    """
    # context totals c1 and vocabulary size from the model itself
    ctx = model.groupBy("w1").agg(F.sum("c2").alias("c1"))
    vocab = (
        model.select(F.col("w1").alias("w")).union(model.select("w2"))
        .agg(F.countDistinct("w").alias("v"))
    )
    grams = _doc_bigrams(df, text_col, id_col)
    m = model
    c = ctx
    if broadcast_model is True:
        m, c = F.broadcast(m), F.broadcast(c)
    scored = (
        grams.join(m, ["w1", "w2"], "left")
        .join(c, "w1", "left")
        .crossJoin(F.broadcast(vocab))
    )
    k = F.lit(float(add_k))
    logp = F.log(
        (F.coalesce(F.col("c2"), F.lit(0)).cast("double") + k)
        / (F.coalesce(F.col("c1"), F.lit(0)).cast("double") + k * F.col("v"))
    )
    s = (F.col("cnt").cast("double") * logp).alias("_s")
    per_gram = scored.select(id_col, "w1", "w2", "cnt", s)
    return per_gram.groupBy(id_col).agg(
        F.sum("cnt").alias("n_bigrams"),
        (
            -F.aggregate(
                F.sort_array(F.collect_list(F.struct("w1", "w2", "_s"))),
                F.lit(0.0),
                lambda acc, x: acc + x["_s"],
            )
            / F.sum("cnt")
        ).alias("nll"),
    )


def perplexity_filter(df: DataFrame, model: DataFrame, threshold: float,
                      text_col: str = "text", id_col: str = "doc_id",
                      add_k: float = 0.5,
                      broadcast_model: Optional[bool] = None) -> DataFrame:
    """CCNet-style keep decision: documents whose per-bigram nll is below
    ``threshold`` (reference-like text). Returns (id_col, n_bigrams,
    nll, keep); join back to the corpus on id to materialize kept text."""
    scored = lm_log_perplexity(
        df, model, text_col, id_col, add_k, broadcast_model
    )
    return scored.withColumn("keep", F.col("nll") < F.lit(float(threshold)))


def dsir_log_weights(df: DataFrame, target_model: DataFrame,
                     raw_model: DataFrame, text_col: str = "text",
                     id_col: str = "doc_id", add_k: float = 0.5,
                     broadcast_model: Optional[bool] = None) -> DataFrame:
    """DSIR importance weights (Xie et al. 2023, "Data Selection for
    Language Models via Importance Resampling"): score every document
    under a LM of the TARGET distribution (trusted corpus) and a LM of
    the RAW distribution (the crawl itself); the importance weight is

        log w(x) = log p_target(x) − log p_raw(x)
                 = (nll_raw − nll_target) · n_bigrams

    Documents that look more like the target than like typical crawl text
    get positive log-weights; sampling ∝ w(x) reshapes the raw corpus
    toward the target. DSIR uses hashed n-gram models — ours are exact
    bigram tables (same estimator, no hash collisions; the hashing trick
    lives in ``operators/classifier.py`` for the feature-bucketed
    variant).

    Output: ``(id_col, n_bigrams, log_weight)``. Scale shape = two
    :func:`lm_log_perplexity` passes sharing the exploded gram frame via
    plan reuse; both models broadcast in the normal (sampled-reference)
    case."""
    t = lm_log_perplexity(df, target_model, text_col, id_col, add_k,
                          broadcast_model)
    r = lm_log_perplexity(df, raw_model, text_col, id_col, add_k,
                          broadcast_model)
    return (
        t.select(id_col, "n_bigrams", F.col("nll").alias("_nll_t"))
        .join(r.select(id_col, F.col("nll").alias("_nll_r")), id_col)
        .select(
            id_col, "n_bigrams",
            ((F.col("_nll_r") - F.col("_nll_t")) * F.col("n_bigrams"))
            .alias("log_weight"),
        )
    )


def dsir_select(weights: DataFrame, n: int, id_col: str = "doc_id") -> DataFrame:
    """Deterministic top-n selection by importance weight (the greedy
    analog of DSIR's Gumbel resampling — reproducibility over sampling
    noise): adds ``selected`` = rank ≤ n with ties broken by id."""
    from pyspark.sql import Window

    w = Window.orderBy(F.desc("log_weight"), F.asc(id_col))
    return (
        weights.withColumn("_rk", F.row_number().over(w))
        .withColumn("selected", F.col("_rk") <= n)
        .drop("_rk")
    )
