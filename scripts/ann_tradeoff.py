"""Measured recall/cost tradeoff for the ANN serving paths (r5).

Sweeps n_probe over the persisted IVF and IVF-PQ indexes at sf0.1 and
reports, per point: recall@10 against the exact cosine top-10, the
fraction of inverted lists probed (= the fraction of corpus bytes a
partition-pruned scan reads), and warm serve seconds. This turns the
"probe reads ~n_probe/C of the corpus" claim into a measured
recall-vs-IO curve — the number a capacity planner actually needs.

Usage: python scripts/ann_tradeoff.py [sf_dir]
Prints one JSON line per (index, n_probe) point; paste into SCALE.md.
"""

from __future__ import annotations

import json
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

N_CENT = 16
K = 10
N_QUERIES = 50


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    from pyspark.sql import functions as F

    from dataingestion_spark.operators.pq import pq_train
    from dataingestion_spark.operators.similarity import topk_cosine, train_centroids
    from dataingestion_spark.session import get_spark
    from dataingestion_spark.sinks.vector_index import (
        build_ivf_index, build_ivfpq_index, search_ivf_index,
        search_ivfpq_index,
    )

    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    spark = get_spark("ann-tradeoff", cpus=cpus, shuffle_partitions=int(cpus),
                      driver_mem=os.environ.get("SPARK_DRIVER_MEM", "48g"))
    spark.sparkContext.setLogLevel("ERROR")

    e = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    queries = e.filter(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("query_vec"))

    truth = {}
    for r in topk_cosine(e, queries, k=K).collect():
        truth.setdefault(r["query_id"], set()).add(r["vec_id"])

    cents = train_centroids(e, n_centroids=N_CENT, iters=3)
    books = pq_train(e, m=8, k=16, iters=3)
    tmp = tempfile.mkdtemp(prefix="ann_tradeoff_")
    ivf = os.path.join(tmp, "ivf", "idx")
    ivfpq = os.path.join(tmp, "ivfpq", "idx")
    build_ivf_index(e, ivf, centroids=cents)
    build_ivfpq_index(e, ivfpq, centroids=cents, codebooks=books)

    def recall(rows):
        hit = tot = 0
        got = {}
        for r in rows:
            got.setdefault(r["query_id"], set()).add(r["vec_id"])
        for q, want in truth.items():
            hit += len(want & got.get(q, set()))
            tot += len(want)
        return hit / tot if tot else 0.0

    for name, path, search in (("ivf", ivf, search_ivf_index),
                               ("ivf_pq", ivfpq, search_ivfpq_index)):
        for n_probe in (1, 2, 4, 8, 16):
            # warm once, then time
            search(spark, path, queries, k=K, n_probe=n_probe).collect()
            t0 = time.perf_counter()
            rows = search(spark, path, queries, k=K, n_probe=n_probe).collect()
            sec = time.perf_counter() - t0
            print(json.dumps({
                "index": name, "n_probe": n_probe,
                "scan_fraction": round(n_probe / N_CENT, 3),
                "recall_at_10": round(recall(rows), 3),
                "serve_sec": round(sec, 2),
            }), flush=True)


if __name__ == "__main__":
    main()
