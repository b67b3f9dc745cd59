"""Training-data curation: the end-to-end funnel the dedup / quality /
analysis operators exist for.

The reference stops at chunks-into-a-vector-store; a 100 TB pretraining
pipeline needs the curation stage in front: language filter → quality
filter → exact dedup → near-dup cluster dedup → token accounting. This
module composes those operators with deterministic keep decisions
(canonical = MIN doc id everywhere), so the same corpus always curates to
the same result — a property the correctness oracle exploits.

Plan shape at scale: lang/quality are pure projections + filters (codegen,
no shuffle); exact dedup is one shuffle of (hash, id); near-dup adds the
MinHash-LSH banding join and the component propagation over the candidate
graph only. Stages that are consumed more than once (the annotated input,
the post-exact-dedup set) carry a LAZY local checkpoint: nothing runs at
composition time, but the first action materializes them once instead of
re-deriving the full lineage per downstream branch.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import List, Optional, Tuple

from pyspark.sql import DataFrame, functions as F

from .operators import dedup as D
from .operators import text_analysis as TA


@dataclass(frozen=True)
class CurationConfig:
    keep_langs: tuple = ("en",)
    min_quality: float = 0.5
    min_words: int = 5
    neardup: bool = True
    num_hashes: int = 16
    bands: int = 4
    # opt-in heuristic web filters (both pure projections — adding them
    # costs no shuffle): C4 line-punctuation rules, Gopher quality bands
    c4: bool = False
    gopher: bool = False


def _stages(df: DataFrame, text_col: str, id_col: str,
            cfg: CurationConfig) -> List[Tuple[str, DataFrame]]:
    """The funnel, one (name, DataFrame) per stage — the SINGLE definition
    of the keep logic, consumed by both :func:`curate` (last stage) and
    :func:`curation_funnel` (per-stage counts), so the reported funnel can
    never diverge from what curate actually keeps."""
    lang = TA.lang_id(df, text_col, id_col).select(id_col, "detected_lang")
    qual = TA.quality_score(df, text_col, id_col).select(
        id_col, "quality", "n_words"
    )
    annotated = (
        df.join(lang, id_col).join(qual, id_col)
        # reused by every stage branch below — materialize once, lazily.
        # (token_counts is NOT here: the funnel's counts don't need the
        # most expensive per-doc regex in the codebase; curate() adds it
        # over the final kept set only.)
        .localCheckpoint(eager=False)
    )
    s1 = annotated.filter(F.col("detected_lang").isin(*cfg.keep_langs))
    s2 = s1.filter(
        (F.col("quality") >= cfg.min_quality) & (F.col("n_words") >= cfg.min_words)
    )
    heuristics = [("2_quality", s2)]
    if cfg.c4:
        c4k = TA.c4_signals(df, text_col, id_col).select(id_col, "c4_keep")
        nxt = heuristics[-1][1].join(c4k, id_col).filter("c4_keep").drop("c4_keep")
        heuristics.append(("2b_c4", nxt))
    if cfg.gopher:
        gk = TA.gopher_signals(df, text_col, id_col).select(id_col, "gopher_keep")
        nxt = heuristics[-1][1].join(gk, id_col).filter("gopher_keep").drop("gopher_keep")
        heuristics.append(("2c_gopher", nxt))
    s2 = heuristics[-1][1]
    exact = D.exact_dedup(s2, text_col, id_col)
    s3 = s2.join(
        exact.filter(F.col(id_col) == F.col("canonical_id")).select(
            id_col, "content_hash"  # hash already computed by exact_dedup
        ),
        id_col,
    ).localCheckpoint(eager=False)  # consumed by neardup AND the output/count
    stages = [("0_input", annotated), ("1_lang", s1)] + heuristics + [
        ("3_exact_dedup", s3)
    ]
    if cfg.neardup:
        clusters = D.neardup_clusters(
            s3, text_col, id_col, num_hashes=cfg.num_hashes, bands=cfg.bands
        )
        losers = clusters.filter(F.col(id_col) != F.col("canonical_id")).select(id_col)
        stages.append(("4_neardup", s3.join(losers, id_col, "left_anti")))
    return stages


def curate(df: DataFrame, text_col: str = "text", id_col: str = "doc_id",
           config: Optional[CurationConfig] = None) -> DataFrame:
    """The kept corpus, annotated: input columns + detected_lang, quality,
    n_words, n_tokens_bpeish, content_hash. Drop order mirrors standard
    curation stacks (cheap filters first, expensive dedup last):

    1. language ∈ ``keep_langs``
    2. quality ≥ ``min_quality`` and n_words ≥ ``min_words``
    3. exact dedup — keep the minimum doc id per content hash
    4. near-dup clusters (MinHash-LSH + connected components) — keep the
       minimum doc id per cluster
    """
    cfg = config or CurationConfig()
    kept = _stages(df, text_col, id_col, cfg)[-1][1]
    return _with_tokens(kept, text_col, id_col)


def _with_tokens(kept: DataFrame, text_col: str, id_col: str) -> DataFrame:
    toks = TA.token_counts(kept, text_col, id_col).select(id_col, "n_tokens_bpeish")
    return kept.join(toks, id_col)


def curate_with_report(df: DataFrame, text_col: str = "text",
                       id_col: str = "doc_id",
                       config: Optional[CurationConfig] = None
                       ) -> tuple[DataFrame, DataFrame]:
    """(kept corpus, funnel counts) from ONE shared stage set — use this
    when you want both, so the annotate/dedup/cluster work (and its
    checkpoints) runs once instead of twice."""
    cfg = config or CurationConfig()
    stages = _stages(df, text_col, id_col, cfg)
    counts = [
        s.agg(
            F.lit(name).alias("stage"),
            F.count("*").alias("docs_kept"),
            F.coalesce(F.sum("n_words"), F.lit(0)).alias("words_kept"),
        )
        for name, s in stages
    ]
    funnel = counts[0]
    for c in counts[1:]:
        funnel = funnel.unionByName(c)
    return _with_tokens(stages[-1][1], text_col, id_col), funnel


def curation_funnel(df: DataFrame, text_col: str = "text", id_col: str = "doc_id",
                    config: Optional[CurationConfig] = None) -> DataFrame:
    """Stage-by-stage accounting: (stage, docs_kept, words_kept) for input →
    lang → quality → exact-dedup → near-dup. Shares :func:`_stages` with
    :func:`curate`, so the counts describe exactly the pipeline that
    produces the curated output."""
    return curate_with_report(df, text_col, id_col, config)[1]
