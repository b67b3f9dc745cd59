"""sf1 scale probe for the incremental corpus publish (r10) —
quantifies the claim that keeping a published corpus fresh is
O(changed shards), not O(corpus).

Kernels, at sf0.1 vs a deterministic 10× documents corpus:

* full_export — from-scratch zstd-JSONL publish (64 shards; scales
  with corpus bytes),
* incr_export — incremental publish after touching ~40 keys (merge
  n_chars bump on a narrow slice): change feed → affected shard ids →
  rewrite only those. The rewrite SCAN is the snapshot filtered to
  affected shards, so wall should grow far slower than the corpus —
  and the byte-identity property (tests) means the cheap path is
  exactly as correct as the expensive one.

Prints one JSON line per kernel; paste into SCALE.md.

Usage: python scripts/scale_probe_export.py [reps]
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

    from dataingestion_spark.session import get_spark
    from dataingestion_spark.sinks import manifest_store as ms
    from dataingestion_spark.sinks.corpus_export import (
        export_corpus, export_corpus_incremental,
    )

    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    spark = get_spark("export-scale-probe", cpus=cpus,
                      shuffle_partitions=int(cpus),
                      driver_mem=os.environ.get("SPARK_DRIVER_MEM", "48g"))
    spark.sparkContext.setLogLevel("ERROR")

    base = spark.read.parquet("/root/testdata/sf0.1/documents.parquet")
    tmp = tempfile.mkdtemp(prefix="exp_probe_")
    copies = spark.range(10).select(F.col("id").alias("copy"))
    big = (base.crossJoin(copies)
           .select((F.col("doc_id") + F.col("copy") * 10_000_000)
                   .alias("doc_id"),
                   F.concat(F.col("text"), F.lit(" c"),
                            F.col("copy").cast("string")).alias("text"),
                   "n_chars"))

    def docs_of(label):
        if label == "sf0.1":
            df = base.select("doc_id", "text", "n_chars")
        else:
            df = big
        return df.select(F.col("doc_id").cast("string").alias("documentid"),
                         "text", "n_chars")

    results = {}
    for label in ("sf0.1", "sf1"):
        table = os.path.join(tmp, f"t_{label}")
        ms.write_table(docs_of(label), table)
        r = {}
        best = None
        for i in range(reps):
            out = os.path.join(tmp, f"full_{label}_{i}")
            t0 = time.perf_counter()
            export_corpus(spark, table, out, fmt="jsonl_zst", shards=64,
                          key="documentid")
            dt = time.perf_counter() - t0
            best = dt if best is None else min(best, dt)
        r["full_export"] = round(best, 3)
        # incremental: one narrow merge (~40 keys) per rep, then publish
        out = os.path.join(tmp, f"inc_{label}")
        export_corpus(spark, table, out, fmt="jsonl_zst", shards=64,
                      key="documentid")
        best = None
        for i in range(reps):
            did = F.col("documentid").cast("long")
            batch = (docs_of(label).filter(did % 1237 == i)
                     .limit(40)
                     .withColumn("n_chars", F.col("n_chars") + 1 + i))
            ms.merge_table(batch, table)
            t0 = time.perf_counter()
            st = export_corpus_incremental(spark, table, out)
            dt = time.perf_counter() - t0
            best = dt if best is None else min(best, dt)
            r["rewritten_shards"] = len(st["rewritten"])
        r["incr_export"] = round(best, 3)
        results[label] = r

    for k in ("full_export", "incr_export"):
        a, b = results["sf0.1"][k], results["sf1"][k]
        print(json.dumps({
            "kernel": k, "sf0.1_s": a, "sf1_s": b,
            "ratio": round(b / a, 2) if a else None,
            "rewritten_shards": [results["sf0.1"].get("rewritten_shards"),
                                 results["sf1"].get("rewritten_shards")],
            "reps": reps,
        }))


if __name__ == "__main__":
    main()
