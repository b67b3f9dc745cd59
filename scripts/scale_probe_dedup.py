"""sf1 scale probe for the dedup family (VERDICT r3 #9).

Builds a deterministic sf1-sized documents corpus (10x the sf0.1 table:
each copy keeps the text's shingle structure but gets a copy-specific id
offset and a deterministic per-copy token appended, so duplicate pairs
stay within copies rather than exploding quadratically across them) and
measures wall time of the three core dedup kernels at sf0.1 vs sf1:

* minhash signatures (per-doc map work — expect ~linear),
* LSH candidate pairs via xxhash64 fast banding (shuffle on band
  buckets — expect ~linear while bands stay unskewed),
* n-gram Jaccard verification on LSH candidates (candidate-local —
  linear in candidate count).

Prints one JSON line per kernel with rows, seconds at each scale, and
the measured ratio; paste the table into SCALE.md. min-of-N like
bench.py (same host-noise argument).

Usage: python scripts/scale_probe_dedup.py [reps]
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

    from dataingestion_spark.operators import dedup
    from dataingestion_spark.session import get_spark

    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    spark = get_spark("dedup-scale-probe", cpus=cpus,
                      shuffle_partitions=int(cpus),
                      driver_mem=os.environ.get("SPARK_DRIVER_MEM", "48g"))
    spark.sparkContext.setLogLevel("ERROR")

    base = spark.read.parquet("/root/testdata/sf0.1/documents.parquet")
    n_base = base.count()

    # deterministic 10x corpus: copy k shifts ids by k*10M and appends a
    # copy token so cross-copy texts differ in one shingle
    sf1_dir = os.path.join(tempfile.mkdtemp(prefix="sf1_docs_"), "documents")
    copies = spark.range(10).select(F.col("id").alias("copy"))
    (base.crossJoin(copies)
     .select(
         (F.col("doc_id") + F.col("copy") * 10_000_000).alias("doc_id"),
         F.concat(F.col("text"), F.lit(" copytoken"),
                  F.col("copy").cast("string")).alias("text"),
         "lang", "source", (F.col("n_chars") + 10).alias("n_chars"))
     .repartition(int(cpus))
     .write.mode("overwrite").parquet(sf1_dir))
    sf1 = spark.read.parquet(sf1_dir)
    n_sf1 = sf1.count()

    def kernels(df):
        return {
            "minhash_signatures": lambda: dedup.minhash_signature(
                df, num_hashes=16),
            "lsh_pairs_fast": lambda: dedup.minhash_lsh_pairs_fast(
                df, num_hashes=16, bands=4),
            "ngram_jaccard_verify": lambda: dedup.ngram_jaccard_pairs(
                df, num_hashes=16, bands=4, threshold=0.5),
        }

    def run(fn):
        best = None
        for _ in range(reps):
            t0 = time.perf_counter()
            fn().write.format("noop").mode("overwrite").save()
            el = time.perf_counter() - t0
            best = el if best is None else min(best, el)
        return best

    print(json.dumps({"corpus_rows": {"sf0.1": n_base, "sf1": n_sf1}}))
    for name in kernels(base):
        t_small = run(kernels(base)[name])
        t_large = run(kernels(sf1)[name])
        print(json.dumps({
            "kernel": name,
            "sf0.1_sec": round(t_small, 2),
            "sf1_sec": round(t_large, 2),
            "ratio": round(t_large / t_small, 2),
            "rows_ratio": round(n_sf1 / n_base, 1),
        }))


if __name__ == "__main__":
    main()
