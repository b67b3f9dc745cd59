"""Tour of the vector-search family, end to end: the migration path a
serving table takes as it grows — exact scan → int8 quantization →
IVF probing → persisted partition-pruned index → PQ codes → two-stage
re-rank → the on-disk IVF-PQ layout with O(batch) appends and
compaction.

Run: python examples/search_tour.py [sf_dir]
(defaults to /root/testdata/sf0.001)
"""

import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from dataingestion_spark.operators.pq import (
    pq_encode, pq_train, topk_pq_adc, topk_pq_rerank,
)
from dataingestion_spark.operators.similarity import (
    recall_at_k, topk_cosine, topk_cosine_ivf, topk_cosine_quantized,
    train_centroids,
)
from dataingestion_spark.session import get_spark
from dataingestion_spark.sinks.vector_index import (
    append_ivfpq_index, build_ivf_index, build_ivfpq_index,
    compact_index_lists, search_ivf_index, search_ivfpq_index,
)

sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
spark = get_spark("search-tour")
spark.sparkContext.setLogLevel("ERROR")
emb = spark.read.parquet(f"{sf}/embeddings.parquet")
queries = emb.filter(F.col("vec_id") < 5).select(
    F.col("vec_id").alias("query_id"), F.col("embedding").alias("query_vec"))

# 1. Exact cosine — the ground truth every approximation is judged by.
exact = topk_cosine(emb, queries, k=10)
print("exact top-1:", exact.filter("rank = 1").count(), "rows")

# 2. int8 scalar quantization — 4x less vector IO, near-exact order.
quant = topk_cosine_quantized(emb, queries, k=10)
print("quantized rows:", quant.count())

# 3. IVF — probe n of C lists instead of scanning the corpus.
cents = train_centroids(emb, n_centroids=8, iters=2)
ivf = topk_cosine_ivf(emb, queries, k=10, n_centroids=8, n_probe=2,
                      centroids=cents)
print("ivf rows:", ivf.count())

# 4. Persist it — probing becomes partition pruning on disk.
idx = os.path.join(tempfile.mkdtemp(prefix="tour_ivf_"), "idx")
build_ivf_index(emb, idx, centroids=cents)
served = search_ivf_index(spark, idx, queries, k=10, n_probe=2)
print("persisted ivf rows:", served.count())

# 5. PQ — 8 bytes per vector at scoring time; recall is budget-bound...
books = pq_train(emb, m=4, k=16, iters=2)
enc = pq_encode(emb.select("vec_id", "embedding"), books)
adc = topk_pq_adc(enc, books, queries, k=10)

# 6. ...so production serves two-stage: ADC shortlist + exact re-rank.
rerank = topk_pq_rerank(enc, books, queries, emb, k=10, candidates=100)
r = recall_at_k(exact, rerank, 10).agg(F.avg("recall")).first()[0]
print("pq rerank recall@10 vs exact:", round(r, 3))

# 7. The combined on-disk layout: pruned lists of codes, O(batch) appends,
#    compaction when small files accumulate.
idx2 = os.path.join(tempfile.mkdtemp(prefix="tour_ivfpq_"), "idx")
build_ivfpq_index(emb.filter(F.col("vec_id") < 1000), idx2,
                  centroids=cents, codebooks=books)
append_ivfpq_index(emb.filter(F.col("vec_id") >= 1000), idx2)
out = search_ivfpq_index(spark, idx2, queries, k=10, n_probe=3)
print("persisted ivf-pq rows:", out.count(),
      "| compacted lists:", compact_index_lists(spark, idx2))
print("search tour done")
