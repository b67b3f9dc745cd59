"""Persisted inverted text index: BM25 search without re-tokenizing the corpus.

``text_search.bm25_topk`` tokenizes the corpus on every call — right for
ad-hoc curation, wrong for a serving path asked thousands of queries
against a 100 TB corpus. The standard answer (and the text twin of the
persisted IVF vector index in ``vector_index.py``) is to materialize the
postings once:

* ``postings/`` — (term, doc_id, tf) parquet **partitioned by
  ``tb = crc32(term) % 64``**: a query's terms hash to a handful of
  buckets, so term selection becomes partition pruning and the scan
  reads ~|query terms|/64 of the postings, not all of them. Files are
  term-sorted so parquet min/max row-group stats prune further inside a
  bucket.
* ``doclens/`` — (doc_id, dl): document lengths for the BM25 length
  normalization. Corpus stats (N, avgdl) are aggregated from this
  narrow table at query time instead of being tracked in a meta file —
  one cheap two-column scan that can never drift out of sync with the
  data under concurrent appends.

Appends are O(batch): new posting/doclen files land beside the old ones
(same term → several (doc, tf) rows across files, which BM25 handles
naturally since tf is per-document).

Search replays ``bm25_topk``'s exact scoring expression (idf, length
norm, sorted-term float fold) over the stored postings, so an index
search returns bit-identical results to the from-scratch operator on the
same corpus — which is also how the driver oracle pins it.

Query terms are collected driver-side to build literal pruning
predicates: a query batch is user input (thousands of rows at most),
metadata-scale by construction — same stance as the centroid collects in
``similarity.py``.
"""

from __future__ import annotations

import os
import zlib
from concurrent.futures import ThreadPoolExecutor

from pyspark.sql import DataFrame, Window, functions as F

_WS = r"\s+"
_N_TERM_BUCKETS = 64

__all__ = ["write_text_index", "append_text_index", "search_text_index"]


def _tokens(text_col: str):
    return F.split(F.trim(F.col(text_col)), _WS)


def _term_bucket(term_col) -> F.Column:
    return (F.crc32(term_col.cast("binary")) % _N_TERM_BUCKETS).cast("int")


def _write(docs: DataFrame, path: str, text_col: str, id_col: str,
           mode: str) -> None:
    # NOT fanned: this frame feeds TWO jobs (postings + doclens), so a
    # fan-out shuffle would run twice, and the postings job already pays
    # a groupBy exchange right after the tokenize-explode (interleaved
    # A/B at sf0.1: 2.28s plain vs 2.90s fanned, min-of-4).
    words = _tokens(text_col)
    postings = (docs.select(F.col(id_col).alias("doc_id"),
                            F.explode(words).alias("term"))
                .groupBy("doc_id", "term").agg(F.count("*").alias("tf"))
                .withColumn("tb", _term_bucket(F.col("term"))))
    # repartition carries doc_id so write parallelism tracks the cluster
    # (repartition("tb") alone would cap the job at 64 tasks forever);
    # partitionBy still routes rows to their bucket directory, and the
    # within-task sort keeps every output file term-ordered for
    # row-group-stat pruning.
    def _write_postings():
        (postings.repartition("tb", "doc_id")
         .sortWithinPartitions("tb", "term")
         .write.mode(mode).partitionBy("tb")
         .parquet(os.path.join(path, "postings")))

    def _write_doclens():
        (docs.select(F.col(id_col).alias("doc_id"), F.size(words).alias("dl"))
         .write.mode(mode).parquet(os.path.join(path, "doclens")))

    # The two writes land in DISJOINT directories and share no state, so
    # they are independent jobs the driver was serializing for no reason;
    # submit both from a 2-thread pool (§2.6) so the cheap doclens scan
    # back-fills the postings job's shuffle/write tail. Work and results
    # are identical — this only overlaps wall-clock.
    with ThreadPoolExecutor(max_workers=2) as pool:
        pf, df_ = pool.submit(_write_postings), pool.submit(_write_doclens)
        pf.result()
        df_.result()


def write_text_index(docs: DataFrame, path: str, text_col: str = "text",
                     id_col: str = "doc_id") -> None:
    """Build the index: ONE tokenize+count pass over the corpus."""
    _write(docs, path, text_col, id_col, "overwrite")


def append_text_index(docs: DataFrame, path: str, text_col: str = "text",
                      id_col: str = "doc_id") -> None:
    """O(batch) append. Documents must be NEW ids (re-indexing an id
    would double-count its postings — delete/compact is the lakehouse
    store's job, not this demo index's)."""
    _write(docs, path, text_col, id_col, "append")


def search_text_index(spark, path: str, queries: DataFrame, k: int = 10,
                      query_id_col: str = "query_id",
                      query_text_col: str = "query_text",
                      k1: float = 1.2, b: float = 0.75) -> DataFrame:
    """Top-k BM25 per query over the stored postings:
    ``(query_id, rank, doc_id, score)`` — bit-identical to
    ``text_search.bm25_topk`` on the same corpus (same idf, same length
    norm, same sorted-term deterministic float fold)."""
    qterms = queries.select(
        F.col(query_id_col),
        F.explode(F.array_distinct(F.split(F.trim(F.col(query_text_col)),
                                           _WS))).alias("term"))
    doclens = spark.read.parquet(os.path.join(path, "doclens"))
    terms = sorted({r["term"] for r in qterms.select("term").distinct().collect()})
    if not terms:
        # empty schema mirrors the live one — doc_id keeps the INDEX's id
        # type, not a hardcoded long
        id_type = doclens.schema["doc_id"].dataType
        return (qterms.select(query_id_col)
                .withColumn("rank", F.lit(0))
                .withColumn("doc_id", F.lit(None).cast(id_type))
                .withColumn("score", F.lit(0.0)).limit(0))
    buckets = sorted({zlib.crc32(t.encode()) % _N_TERM_BUCKETS for t in terms})

    stats = doclens.agg(F.count("*").alias("n_docs"),
                        F.sum("dl").alias("sum_dl"))
    rel = (spark.read.parquet(os.path.join(path, "postings"))
           .filter(F.col("tb").isin([int(x) for x in buckets]))   # partition pruning
           .filter(F.col("term").isin(list(terms)))               # row-group stats
           .select("doc_id", "term", "tf"))
    dfreq = rel.groupBy("term").agg(F.countDistinct("doc_id").alias("df"))

    avgdl = F.col("sum_dl").cast("double") / F.col("n_docs")
    idf = F.log(F.lit(1.0) + (F.col("n_docs") - F.col("df") + F.lit(0.5))
                / (F.col("df") + F.lit(0.5)))
    denom = F.col("tf") + F.lit(k1) * (F.lit(1.0 - b)
                                       + F.lit(b) * (F.col("dl") / avgdl))
    s = idf * ((F.col("tf") * F.lit(k1 + 1.0)) / denom)
    scored = (rel.join(F.broadcast(qterms), "term")
              .join(F.broadcast(dfreq), "term")
              .join(doclens, "doc_id")
              .crossJoin(F.broadcast(stats))
              .select(query_id_col, "doc_id", "term", s.alias("_s")))
    total = scored.groupBy(query_id_col, "doc_id").agg(
        F.aggregate(F.sort_array(F.collect_list(F.struct("term", "_s"))),
                    F.lit(0.0), lambda acc, x: acc + x["_s"]).alias("score"))
    w = Window.partitionBy(query_id_col).orderBy(F.desc("score"),
                                                 F.asc("doc_id"))
    return (total.withColumn("rank", F.row_number().over(w))
            .filter(F.col("rank") <= k)
            .select(query_id_col, "rank", "doc_id", "score"))


def hybrid_search_indexed(spark, text_path: str, ivf_path: str,
                          text_queries: DataFrame, vec_queries: DataFrame,
                          k: int = 10, per_side_k: int = 20,
                          n_probe: int = 4, k0: int = 60) -> DataFrame:
    """Hybrid retrieval served ENTIRELY from persisted indexes: BM25
    top-``per_side_k`` from the inverted index (partition+row-group
    pruned postings) fused with ANN top-``per_side_k`` from the IVF
    index (probe-as-partition-pruning) by reciprocal-rank fusion —
    neither side rescans the corpus, so serve cost tracks query load,
    not table size. With ``n_probe`` >= the index's centroid count the
    result is bit-identical to the non-indexed
    ``bm25_topk``+``topk_cosine``+``rrf_fuse`` composition (pinned in
    tests); lower ``n_probe`` trades vector-side recall for pruning,
    leaving the BM25 side exact. Output: (query_id, rank, doc_id,
    rrf_score)."""
    from concurrent.futures import ThreadPoolExecutor

    from ..operators.text_search import rrf_fuse
    from .vector_index import search_ivf_index

    # The two sides are independent until the fuse, and each blocks the
    # driver on its own small prep jobs while it is CONSTRUCTED (the
    # BM25 side collects the distinct query terms for pruning literals;
    # the IVF side checkpoints + collects its probe set). Building them
    # from two driver threads overlaps those jobs (§2.6 — Spark runs
    # concurrent jobs fine; FIFO back-fills the idle slots), so serve
    # latency pays max(side preps) instead of their sum. Frame
    # construction only — the fused query itself stays one plan/action.
    with ThreadPoolExecutor(max_workers=2) as pool:
        bm_f = pool.submit(search_text_index, spark, text_path,
                           text_queries, k=per_side_k)
        cos_f = pool.submit(search_ivf_index, spark, ivf_path,
                            vec_queries, k=per_side_k, n_probe=n_probe)
        bm = bm_f.result()
        cos = cos_f.result().select(
            "query_id", F.col("vec_id").alias("doc_id"), "rank")
    return rrf_fuse(bm, cos, k0=k0, k=k)
