"""sf1 scale probe for the search/index family (VERDICT r4 #8).

Mirrors scripts/scale_probe_dedup.py for the five index kernels whose
100 TB claims deserve a measured curve:

* ivf_build — k-means-free stride-centroid IVF build (assign + one
  partitioned write; expect ~linear in vectors, floor-bound here),
* ivf_serve — persisted-index probe (reads ~n_probe/C of the lists via
  partition pruning; expect ~flat while the probed fraction's data cost
  stays under the per-job floor),
* bm25_build — inverted-index build (explode + groupBy shuffle; ~linear
  in corpus tokens),
* bm25_serve — persisted BM25 probe (partition+row-group pruned postings
  for the broadcast query-term set; expect ~flat),
* pq_encode_adc — PQ stride-codebook train + encode + ADC top-k (encode
  is map-only ~linear; ADC scans all codes at 8 B/vector).

The 10x corpora are deterministic: each copy k shifts ids by k*10M;
document copies append a copy token (keeps shingle/posting structure per
copy), embedding copies add k/1000 to the first dimension (keeps vectors
distinct but the space's shape unchanged).

Prints one JSON line per kernel with rows, min-of-N seconds at each
scale, and the measured ratio; paste the table into SCALE.md.

Usage: python scripts/scale_probe_index.py [reps]
"""

from __future__ import annotations

import json
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    reps = int(sys.argv[1]) if len(sys.argv) > 1 else 3
    from pyspark.sql import functions as F

    import __spark_entry__ as em
    from dataingestion_spark.operators.pq import pq_encode, pq_train, topk_pq_adc
    from dataingestion_spark.session import get_spark
    from dataingestion_spark.sinks.text_index import (
        search_text_index, write_text_index,
    )
    from dataingestion_spark.sinks.vector_index import (
        build_ivf_index, search_ivf_index,
    )

    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    spark = get_spark("index-scale-probe", cpus=cpus,
                      shuffle_partitions=int(cpus),
                      driver_mem=os.environ.get("SPARK_DRIVER_MEM", "48g"))
    spark.sparkContext.setLogLevel("ERROR")

    sf_dir = "/root/testdata/sf0.1"
    docs_small = spark.read.parquet(f"{sf_dir}/documents.parquet")
    emb_small = spark.read.parquet(f"{sf_dir}/embeddings.parquet")

    tmp = tempfile.mkdtemp(prefix="idx_probe_")
    copies = spark.range(10).select(F.col("id").alias("copy"))

    docs_big_dir = os.path.join(tmp, "documents_sf1")
    (docs_small.crossJoin(copies)
     .select((F.col("doc_id") + F.col("copy") * 10_000_000).alias("doc_id"),
             F.concat(F.col("text"), F.lit(" copytoken"),
                      F.col("copy").cast("string")).alias("text"),
             "lang", "source", (F.col("n_chars") + 10).alias("n_chars"))
     .repartition(int(cpus))
     .write.mode("overwrite").parquet(docs_big_dir))
    docs_big = spark.read.parquet(docs_big_dir)

    emb_big_dir = os.path.join(tmp, "embeddings_sf1")
    (emb_small.crossJoin(copies)
     .select((F.col("vec_id") + F.col("copy") * 10_000_000).alias("vec_id"),
             F.concat(
                 F.array((F.element_at("embedding", 1)
                          + F.col("copy").cast("float") / 1000.0)),
                 F.slice("embedding", 2, 10_000),
             ).alias("embedding"),
             "label")
     .repartition(int(cpus))
     .write.mode("overwrite").parquet(emb_big_dir))
    emb_big = spark.read.parquet(emb_big_dir)

    counts = {"docs_small": docs_small.count(), "docs_big": docs_big.count(),
              "emb_small": emb_small.count(), "emb_big": emb_big.count()}
    print(json.dumps({"corpora": counts}), flush=True)

    def queries_of(emb):
        return emb.filter(F.col("vec_id") < 5).select(
            F.col("vec_id").alias("query_id"),
            F.col("embedding").alias("query_vec"))

    def force(df):
        df.write.format("noop").mode("overwrite").save()

    def run(label, small_fn, big_fn):
        def best_of(fn):
            best = None
            for _ in range(reps):
                t0 = time.perf_counter()
                fn()
                el = time.perf_counter() - t0
                best = el if best is None else min(best, el)
            return best

        s, b = best_of(small_fn), best_of(big_fn)
        print(json.dumps({"kernel": label, "sf0.1_sec": round(s, 2),
                          "sf1_sec": round(b, 2),
                          "ratio": round(b / s, 2)}), flush=True)

    # --- ivf_build: fresh index dir per run (build cost only)
    def ivf_build(emb):
        def go():
            build_ivf_index(emb, os.path.join(tempfile.mkdtemp(prefix="ivf_"),
                                              "idx"), n_centroids=16, iters=2)
        return go

    run("ivf_build", ivf_build(emb_small), ivf_build(emb_big))

    # --- ivf_serve: prebuilt index, probe-only timing
    paths = {}
    for name, emb in (("small", emb_small), ("big", emb_big)):
        p = os.path.join(tmp, f"ivf_{name}", "idx")
        build_ivf_index(emb, p, n_centroids=16, iters=2)
        paths[name] = p

    run("ivf_serve",
        lambda: force(search_ivf_index(spark, paths["small"],
                                       queries_of(emb_small), k=10, n_probe=4)),
        lambda: force(search_ivf_index(spark, paths["big"],
                                       queries_of(emb_big), k=10, n_probe=4)))

    # --- bm25_build: fresh index dir per run
    def bm25_build(docs):
        def go():
            write_text_index(docs, os.path.join(
                tempfile.mkdtemp(prefix="bm25_"), "idx"))
        return go

    run("bm25_build", bm25_build(docs_small), bm25_build(docs_big))

    # --- bm25_serve: prebuilt
    tpaths = {}
    for name, docs in (("small", docs_small), ("big", docs_big)):
        p = os.path.join(tmp, f"bm25_{name}", "idx")
        write_text_index(docs, p)
        tpaths[name] = p

    run("bm25_serve",
        lambda: force(search_text_index(spark, tpaths["small"],
                                        em._bm25_queries_df(spark), k=10)),
        lambda: force(search_text_index(spark, tpaths["big"],
                                        em._bm25_queries_df(spark), k=10)))

    # --- pq_encode_adc: stride train + encode + ADC top-k, end to end
    def pq_all(emb):
        def go():
            books = pq_train(emb, m=8, k=16, iters=0, init="stride")
            enc = pq_encode(emb.select("vec_id", "embedding"), books)
            force(topk_pq_adc(enc, books, queries_of(emb), k=10))
        return go

    run("pq_encode_adc", pq_all(emb_small), pq_all(emb_big))


if __name__ == "__main__":
    main()
