"""sf1 scale probe for the Iceberg interop + Avro codec (r10) —
quantifies the claims that export/mirror are O(live files)/O(changed
files) driver-side metadata, and measures the pure-python Avro codec's
shard-parallel throughput.

Kernels, at sf0.1 vs a deterministic 10× documents corpus:

* iceberg_export — full export (copy mode: metadata build + byte copy
  per file; scales with corpus bytes),
* mirror_noop   — a no-change sync: walks the current snapshot's
  manifests and diffs basenames, writes nothing (should stay near
  flat — it scales with FILE COUNT, not bytes),
* mirror_incr   — append ~40 docs then sync: one new snapshot, one new
  manifest, unchanged manifests carried by reference (O(changed)),
* iceberg_read  — full read-back count through manifest-list walk,
* avro_roundtrip — write_avro(16 shards) + read_avro count (per-value
  python codec, parallelism = shard count).

Prints one JSON line per kernel; paste into SCALE.md.

Usage: python scripts/scale_probe_iceberg.py [reps]
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

    from dataingestion_spark.interop.iceberg import (
        export_iceberg, mirror_iceberg, read_iceberg,
    )
    from dataingestion_spark.session import get_spark
    from dataingestion_spark.sinks import manifest_store as ms
    from dataingestion_spark.sources.avro import read_avro, write_avro

    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    spark = get_spark("iceberg-scale-probe", cpus=cpus,
                      shuffle_partitions=int(cpus),
                      driver_mem=os.environ.get("SPARK_DRIVER_MEM", "48g"))
    spark.sparkContext.setLogLevel("ERROR")

    base = spark.read.parquet("/root/testdata/sf0.1/documents.parquet")
    tmp = tempfile.mkdtemp(prefix="ice_probe_")
    copies = spark.range(10).select(F.col("id").alias("copy"))
    big = (base.crossJoin(copies)
           .select((F.col("doc_id") + F.col("copy") * 10_000_000)
                   .alias("doc_id"),
                   F.concat(F.col("text"), F.lit(" c"),
                            F.col("copy").cast("string")).alias("text"),
                   "lang", "n_chars"))

    def docs_of(label):
        df = base if label == "sf0.1" else big
        return df.select(
            F.col("doc_id").cast("string").alias("documentid"),
            "text", "lang", F.col("n_chars").cast("long").alias("n_chars"))

    results = {}
    for label in ("sf0.1", "sf1"):
        docs = docs_of(label)
        table = os.path.join(tmp, f"t_{label}")
        ms.write_table(docs, table)
        r = {}

        best = None
        for i in range(reps):
            dst = os.path.join(tmp, f"exp_{label}_{i}")
            t0 = time.perf_counter()
            export_iceberg(spark, table, dst)
            dt = time.perf_counter() - t0
            best = dt if best is None else min(best, dt)
        r["iceberg_export"] = round(best, 3)

        mirror = os.path.join(tmp, f"mir_{label}")
        mirror_iceberg(spark, table, mirror)
        best = None
        for _ in range(reps):
            t0 = time.perf_counter()
            mirror_iceberg(spark, table, mirror)
            best_t = time.perf_counter() - t0
            best = best_t if best is None else min(best, best_t)
        r["mirror_noop"] = round(best, 3)

        best = None
        for i in range(reps):
            extra = docs.limit(40).select(
                (F.col("documentid").cast("long")
                 + (i + 1) * 100_000_000).cast("string")
                .alias("documentid"), "text", "lang", "n_chars")
            ms.append_table(extra, table)
            t0 = time.perf_counter()
            mirror_iceberg(spark, table, mirror)
            dt = time.perf_counter() - t0
            best = dt if best is None else min(best, dt)
        r["mirror_incr"] = round(best, 3)

        best = None
        for _ in range(reps):
            t0 = time.perf_counter()
            read_iceberg(spark, mirror).write.format("noop") \
                .mode("overwrite").save()
            dt = time.perf_counter() - t0
            best = dt if best is None else min(best, dt)
        r["iceberg_read"] = round(best, 3)

        best = None
        for i in range(reps):
            out = os.path.join(tmp, f"avro_{label}_{i}")
            t0 = time.perf_counter()
            write_avro(docs, out, shards=16, order_by="documentid")
            read_avro(spark, out).write.format("noop") \
                .mode("overwrite").save()
            dt = time.perf_counter() - t0
            best = dt if best is None else min(best, dt)
        r["avro_roundtrip"] = round(best, 3)
        results[label] = r

    for k in ("iceberg_export", "mirror_noop", "mirror_incr",
              "iceberg_read", "avro_roundtrip"):
        a, b = results["sf0.1"][k], results["sf1"][k]
        print(json.dumps({
            "kernel": k, "sf0.1_s": a, "sf1_s": b,
            "ratio": round(b / a, 2) if a else None, "reps": reps,
        }))


if __name__ == "__main__":
    main()
