"""Persisted IVF index: build once, search many, read only probed lists.

``topk_cosine_ivf`` recomputes assignment per call — right for one-shot
queries, wasteful for a serving table. This module persists the index as
plain parquet PARTITIONED BY the inverted-list id, which turns probe
selection into *partition pruning*: a search with ``n_probe=4`` of 256
lists physically reads ~4/256 of the corpus bytes (the scan's
PartitionFilters prune before any IO — asserted in tests). Centroids
live in a JSON sidecar (C × dim floats — driver-sized by construction).

Layout::

    <path>/centroids.json      [[centroid_id, [floats...]], ...]
    <path>/lists/centroid_id=<c>/part-*.parquet   (vec_id, embedding)

Build cost is the standard one corpus×C assignment pass + one shuffle to
co-locate lists. Rebuild to re-center; the index is immutable otherwise
(pair with the manifest store's versioning if transactional swaps are
needed).

Reference parity: the reference's vector store scans every record page
by page (``VectorStoreWriter.cs:159`` MaxTopCount=1000 paging); this is
the sublinear path its design lacks.
"""

from __future__ import annotations

import json
import os
from typing import List, Optional, Tuple

from pyspark.sql import DataFrame, SparkSession, Window, functions as F

from ..operators.similarity import cosine_sim, ivf_assign, train_centroids

Centroid = Tuple[int, List[float]]


def build_ivf_index(corpus: DataFrame, path: str, n_centroids: int = 16,
                    iters: int = 5, corpus_id: str = "vec_id",
                    corpus_vec: str = "embedding",
                    centroids: Optional[List[Centroid]] = None,
                    max_list_size: Optional[int] = None) -> int:
    """Cluster (or accept ``centroids``), assign, persist. Returns the
    number of inverted lists written."""
    cents = centroids or train_centroids(
        corpus, n_centroids=n_centroids, iters=iters,
        corpus_id=corpus_id, corpus_vec=corpus_vec,
    )
    cdf = corpus.sparkSession.createDataFrame(cents, ["centroid_id", "cvec"])
    assigned = ivf_assign(corpus, cdf, corpus_id, corpus_vec, max_list_size)
    (
        assigned.repartition("centroid_id")
        .write.mode("overwrite").partitionBy("centroid_id")
        .parquet(os.path.join(path, "lists"))
    )
    from .commit_backend import backend_for

    backend_for(path).put_atomic(
        f"{path.rstrip('/')}/centroids.json",
        json.dumps([[int(c), list(map(float, v))] for c, v in cents]))
    return len(cents)


def load_centroids(path: str) -> List[Centroid]:
    from .commit_backend import backend_for

    text = backend_for(path).read_text(f"{path.rstrip('/')}/centroids.json")
    if text is None:
        raise FileNotFoundError(f"no centroids.json under {path}")
    return [(int(c), [float(x) for x in v]) for c, v in json.loads(text)]


def search_ivf_index(spark: SparkSession, path: str, queries: DataFrame,
                     k: int = 10, n_probe: int = 4,
                     corpus_id: str = "vec_id", corpus_vec: str = "embedding",
                     query_id: str = "query_id",
                     query_vec: str = "query_vec",
                     allowed: "DataFrame" = None) -> DataFrame:
    """Top-k over the persisted index: pick each query's ``n_probe``
    nearest centroids, then scan ONLY those list partitions (the
    ``centroid_id`` filter prunes at the file-listing level). Output:
    (query_id, rank, corpus_id, score) — identical to
    ``topk_cosine_ivf`` with the same centroids and probes.

    ``allowed`` (a one-column frame of permitted ``corpus_id`` values —
    e.g. the ids passing a metadata predicate on the source table)
    restricts results to that set: POST-FILTER semantics, applied to
    the probed lists before scoring, the standard filtered-ANN shape
    (Milvus/pgvector). A selective filter thins candidate lists, so
    raise ``n_probe`` to hold recall — with all centroids probed the
    result is exactly the filtered exact top-k."""
    from ..operators.similarity import _rank_topk

    cents = load_centroids(path)
    cdf = spark.createDataFrame(cents, ["centroid_id", "cvec"])
    probe_w = Window.partitionBy(query_id).orderBy(
        F.desc("csim"), F.asc("centroid_id")
    )
    probes = (
        queries.crossJoin(F.broadcast(cdf))
        .withColumn("csim", cosine_sim(F.col(query_vec), F.col("cvec")))
        .withColumn("crk", F.row_number().over(probe_w))
        .filter(F.col("crk") <= n_probe)
        .select(query_id, query_vec, "centroid_id")
        .localCheckpoint(eager=True)  # reused for pruning ids AND the join
    )
    probe_ids = sorted(
        {int(r[0]) for r in probes.select("centroid_id").distinct().collect()}
    )
    lists = (
        spark.read.parquet(os.path.join(path, "lists"))
        .filter(F.col("centroid_id").isin(probe_ids))
    )
    if allowed is not None:
        # no broadcast hint: the allowed set can be anywhere from a
        # handful of ids to most of the corpus — AQE picks the join
        # strategy from its actual size
        lists = lists.join(
            allowed.withColumnRenamed(allowed.columns[0], corpus_id),
            corpus_id, "semi")
    scored = lists.join(F.broadcast(probes), "centroid_id").select(
        F.col(query_id),
        F.col(corpus_id),
        cosine_sim(F.col(corpus_vec), F.col(query_vec)).alias("score"),
    )
    return _rank_topk(scored, k, query_id, corpus_id)


def append_ivf_index(new_vectors: DataFrame, path: str,
                     corpus_id: str = "vec_id",
                     corpus_vec: str = "embedding") -> None:
    """Online index maintenance: assign a NEW batch to the existing
    centroids and append its rows to the affected list partitions —
    O(batch) writes, no rebuild, centroids untouched. Because assignment
    is deterministic given the centroids, searching after any sequence
    of appends equals searching an index built from the union in one
    shot (pinned in tests). Rebuild when drift degrades recall (track it
    with ``operators/similarity.recall_at_k`` on a probe query set)."""
    spark = new_vectors.sparkSession
    cents = load_centroids(path)
    cdf = spark.createDataFrame(cents, ["centroid_id", "cvec"])
    assigned = ivf_assign(
        new_vectors.select(corpus_id, corpus_vec), cdf, corpus_id, corpus_vec
    )
    (
        assigned.repartition("centroid_id")
        .write.mode("append").partitionBy("centroid_id")
        .parquet(os.path.join(path, "lists"))
    )


# ---------------------------------------------------------------------------
# Persisted IVF-PQ: the on-disk Faiss-IVFADC layout — partition-pruned
# inverted lists whose rows carry m-byte PQ codes instead of float vectors.
# ---------------------------------------------------------------------------

def build_ivfpq_index(corpus: DataFrame, path: str, n_centroids: int = 16,
                      iters: int = 5, m: int = 8, k_codes: int = 16,
                      pq_iters: int = 3, corpus_id: str = "vec_id",
                      corpus_vec: str = "embedding",
                      centroids: Optional[List[Centroid]] = None,
                      codebooks=None,
                      max_list_size: Optional[int] = None) -> int:
    """Build the combined index: coarse inverted lists bound WHAT a query
    scans (``n_probe``/``n_centroids`` of the corpus, physically pruned
    at the file listing), PQ codes bound what each scanned candidate
    COSTS (m small ints + m LUT lookups — no float vector is ever read
    at serve time). At a billion vectors the list payload is ~m bytes
    per vector vs 4·dim for :func:`build_ivf_index` — the difference
    between an index that fits in page cache and one that doesn't.

    Codes quantize RAW vectors (not residuals): encode then needs no
    list context, which is what keeps :func:`append_ivfpq_index` an
    O(batch) operation and lets ONE LUT per query serve every probed
    list. Residual IVFADC (better recall per byte, list-coupled
    appends) stays the in-memory ``operators.pq.topk_ivf_pq`` variant.

    Layout::

        <path>/centroids.json   [[centroid_id, [floats...]], ...]
        <path>/codebooks.json   [m][k_codes][dim/m] floats
        <path>/lists/centroid_id=<c>/part-*.parquet   (vec_id, pq_code)
    """
    from ..operators.pq import pq_encode, pq_train

    cents = centroids or train_centroids(
        corpus, n_centroids=n_centroids, iters=iters,
        corpus_id=corpus_id, corpus_vec=corpus_vec,
    )
    if codebooks is None:
        codebooks = pq_train(corpus, m=m, k=k_codes, iters=pq_iters,
                             corpus_id=corpus_id, corpus_vec=corpus_vec)
    cdf = corpus.sparkSession.createDataFrame(cents, ["centroid_id", "cvec"])
    assigned = ivf_assign(corpus.select(corpus_id, corpus_vec), cdf,
                          corpus_id, corpus_vec, max_list_size)
    encoded = pq_encode(assigned, codebooks, corpus_vec).select(
        corpus_id, "centroid_id", "pq_code"
    )
    (
        encoded.repartition("centroid_id")
        .write.mode("overwrite").partitionBy("centroid_id")
        .parquet(os.path.join(path, "lists"))
    )
    from .commit_backend import backend_for

    be = backend_for(path)
    be.put_atomic(
        f"{path.rstrip('/')}/centroids.json",
        json.dumps([[int(c), list(map(float, v))] for c, v in cents]))
    be.put_atomic(
        f"{path.rstrip('/')}/codebooks.json",
        json.dumps([[[float(x) for x in cw] for cw in book]
                    for book in codebooks]))
    return len(cents)


def load_ivfpq_codebooks(path: str):
    from .commit_backend import backend_for

    text = backend_for(path).read_text(f"{path.rstrip('/')}/codebooks.json")
    if text is None:
        raise FileNotFoundError(f"no codebooks.json under {path}")
    return json.loads(text)


def search_ivfpq_index(spark: SparkSession, path: str, queries: DataFrame,
                       k: int = 10, n_probe: int = 4,
                       corpus_id: str = "vec_id",
                       query_id: str = "query_id",
                       query_vec: str = "query_vec") -> DataFrame:
    """ADC top-k over the persisted lists: probe selection against the
    sidecar centroids (driver-sized), partition pruning down to the
    probed lists, then the broadcast probe×LUT equi-join — identical
    scoring to ``operators.pq.topk_ivf_pq(residual=False)`` with the
    same centroids/codebooks (pinned in tests)."""
    from ..operators.pq import _adc_lut_df, _adc_total
    from ..operators.similarity import _rank_topk

    cents = load_centroids(path)
    codebooks = load_ivfpq_codebooks(path)
    cdf = spark.createDataFrame(cents, ["centroid_id", "cvec"])
    probe_w = Window.partitionBy(query_id).orderBy(
        F.desc("csim"), F.asc("centroid_id")
    )
    probes = (
        queries.crossJoin(F.broadcast(cdf))
        .withColumn("csim", cosine_sim(F.col(query_vec), F.col("cvec")))
        .withColumn("crk", F.row_number().over(probe_w))
        .filter(F.col("crk") <= n_probe)
        .select(query_id, "centroid_id")
        .localCheckpoint(eager=True)  # reused for pruning ids AND the join
    )
    probe_ids = sorted(
        {int(r[0]) for r in probes.select("centroid_id").distinct().collect()}
    )
    lists = (
        spark.read.parquet(os.path.join(path, "lists"))
        .filter(F.col("centroid_id").isin(probe_ids))
    )
    qluts = _adc_lut_df(queries, codebooks, query_id, query_vec)
    scored = lists.join(
        F.broadcast(probes.join(F.broadcast(qluts), query_id)), "centroid_id"
    ).select(
        F.col(query_id), F.col(corpus_id),
        (-_adc_total(len(codebooks), "pq_code")).alias("score"),
    )
    return _rank_topk(scored, k, query_id, corpus_id)


def append_ivfpq_index(new_vectors: DataFrame, path: str,
                       corpus_id: str = "vec_id",
                       corpus_vec: str = "embedding") -> None:
    """O(batch) maintenance, same contract as :func:`append_ivf_index`:
    assign against the stored centroids, encode against the stored
    codebooks (raw-vector codes need no list context — the reason this
    index skips residual encoding), append to the affected partitions.
    Search-after-append equals search of a one-shot build (pinned in
    tests); rebuild when drift degrades recall."""
    from ..operators.pq import pq_encode

    spark = new_vectors.sparkSession
    cents = load_centroids(path)
    codebooks = load_ivfpq_codebooks(path)
    cdf = spark.createDataFrame(cents, ["centroid_id", "cvec"])
    assigned = ivf_assign(
        new_vectors.select(corpus_id, corpus_vec), cdf, corpus_id, corpus_vec
    )
    encoded = pq_encode(assigned, codebooks, corpus_vec).select(
        corpus_id, "centroid_id", "pq_code"
    )
    (
        encoded.repartition("centroid_id")
        .write.mode("append").partitionBy("centroid_id")
        .parquet(os.path.join(path, "lists"))
    )


def compact_index_lists(spark: SparkSession, path: str,
                        max_files_per_list: int = 4) -> int:
    """Index maintenance for the small-file growth of per-batch appends
    (both layouts: float-vector IVF and IVF-PQ lists). When any list
    partition holds more than ``max_files_per_list`` parquet files, the
    whole ``lists/`` tree is rewritten one-file-per-list and swapped in
    via a staging directory (insert-before-delete, like the plain
    vector-table writer — local/dev semantics; at object-store scale
    rebuild into a fresh index path and flip the serving pointer, or
    keep lists on the manifest store). Search results are unchanged by
    construction — only the file layout moves. Returns the number of
    list partitions that were over the threshold (0 = nothing to do)."""
    import shutil
    import uuid as _uuid

    scheme = path.split("://", 1)[0] if "://" in path else ""
    if scheme not in ("", "file"):
        raise NotImplementedError(
            "compact_index_lists swaps directories with os-level renames "
            f"(local/dev); for scheme '{scheme}' rebuild into a fresh index "
            "path and flip the serving pointer instead.")
    lists_dir = os.path.join(path, "lists")
    over = 0
    for d in os.listdir(lists_dir):
        if not d.startswith("centroid_id="):
            continue
        n = sum(1 for f in os.listdir(os.path.join(lists_dir, d))
                if f.endswith(".parquet"))
        if n > max_files_per_list:
            over += 1
    if not over:
        return 0
    df = spark.read.parquet(lists_dir)
    tmp = f"{lists_dir}.__staging__{_uuid.uuid4().hex[:8]}"
    (
        df.repartition("centroid_id")
        .write.mode("overwrite").partitionBy("centroid_id").parquet(tmp)
    )
    old = f"{lists_dir}.__old__{_uuid.uuid4().hex[:8]}"
    os.rename(lists_dir, old)
    os.rename(tmp, lists_dir)
    shutil.rmtree(old, ignore_errors=True)
    return over
