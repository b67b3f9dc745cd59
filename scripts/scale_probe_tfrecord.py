"""sf1 scale probe for the TFRecord source/sink (r10) — the same
measured-amplification treatment the scd2/manifest/dedup paths have
(r9 verdict #7).

Kernels, at sf0.1 vs a deterministic 10× documents corpus:

* tfr_write — hash-sharded tf.train.Example export (one task per
  shard; shards scale 4 → 16 with the corpus so per-task bytes stay
  comparable, which is also how a real export would scale),
* tfr_read — full read-back with per-record CRC verification (the
  r10-vectorized `_crc32c_many` batched sweep),
* tfr_read_gz — same over gzip shards (decompress + verify per file).

Wall should scale ≈ linearly in bytes once per-task floors amortize;
sub-linear is expected at these sizes because the sf0.1 number is
floor-bound (Spark job bring-up per kernel).

Prints one JSON line per kernel (min-of-N secs at both scales +
ratio); paste into SCALE.md.

Usage: python scripts/scale_probe_tfrecord.py [reps]
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
    from dataingestion_spark.sources.tfrecord import (
        read_tfrecord, write_tfrecord,
    )

    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    spark = get_spark("tfrecord-scale-probe", cpus=cpus,
                      shuffle_partitions=int(cpus),
                      driver_mem=os.environ.get("SPARK_DRIVER_MEM", "48g"))
    spark.sparkContext.setLogLevel("ERROR")

    base = spark.read.parquet("/root/testdata/sf0.1/documents.parquet")
    tmp = tempfile.mkdtemp(prefix="tfr_probe_")
    big_dir = os.path.join(tmp, "documents_sf1")
    copies = spark.range(10).select(F.col("id").alias("copy"))
    (base.crossJoin(copies)
     .select((F.col("doc_id") + F.col("copy") * 10_000_000).alias("doc_id"),
             F.concat(F.col("text"), F.lit(" c"),
                      F.col("copy").cast("string")).alias("text"))
     .repartition(int(cpus))
     .write.mode("overwrite").parquet(big_dir))

    features = {"doc_id": "int64", "text": "bytes"}

    def docs_of(path):
        df = spark.read.parquet(path)
        return df.select(F.col("doc_id").cast("long").alias("doc_id"),
                         F.col("text").cast("binary").alias("text"))

    scales = {
        "sf0.1": (docs_of("/root/testdata/sf0.1/documents.parquet"), 4),
        "sf1": (docs_of(big_dir), 16),
    }

    def timed(fn):
        best = None
        for _ in range(reps):
            t0 = time.perf_counter()
            fn()
            dt = time.perf_counter() - t0
            best = dt if best is None else min(best, dt)
        return round(best, 3)

    results: dict = {}
    for label, (docs, shards) in scales.items():
        docs = docs.localCheckpoint()  # isolate source-read cost
        out = os.path.join(tmp, f"shards_{label}")
        out_gz = os.path.join(tmp, f"shards_gz_{label}")
        r = {}
        r["tfr_write"] = timed(
            lambda: write_tfrecord(docs, features, out, shards=shards))
        write_tfrecord(docs, features, out_gz, shards=shards,
                       compression="gzip")
        r["tfr_read"] = timed(
            lambda: read_tfrecord(spark, out, features)
            .write.format("noop").mode("overwrite").save())
        r["tfr_read_gz"] = timed(
            lambda: read_tfrecord(spark, out_gz, features)
            .write.format("noop").mode("overwrite").save())
        raw = sum(os.path.getsize(os.path.join(out, n))
                  for n in os.listdir(out))
        r["bytes_mb"] = round(raw / 1e6, 1)
        results[label] = r

    for k in ("tfr_write", "tfr_read", "tfr_read_gz"):
        a, b = results["sf0.1"][k], results["sf1"][k]
        print(json.dumps({
            "kernel": k, "sf0.1_s": a, "sf1_s": b,
            "ratio": round(b / a, 2) if a else None,
            "mb": [results["sf0.1"]["bytes_mb"], results["sf1"]["bytes_mb"]],
            "reps": reps,
        }))


if __name__ == "__main__":
    main()
