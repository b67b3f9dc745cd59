"""sf0.1 -> sf1 scale probe for SCD Type 2 merges and manifest deltas.

Measures the three-batch scd2 lifecycle (seed every key, re-observe all
keys with 1/3 changed, partial snapshot changing 1/2) on the customer
dimension at sf0.1 and at a deterministic 10x key count, plus the
manifest bytes a steady-state append commit writes at each scale —
the write-amplification claim the delta-manifest encoding makes.

Expected shapes: scd2 wall ~flat-to-linear (fixed job barriers dominate
until the batch is large; the change-detection join and DV write scale
with the batch), append delta bytes O(new files), NOT O(table).

Prints one JSON line per kernel; paste the table into SCALE.md.

Usage: python scripts/scale_probe_scd2.py [reps]
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    reps = int(sys.argv[1]) if len(sys.argv) > 1 else 3
    from pyspark.sql import functions as F

    from dataingestion_spark.session import get_spark
    from dataingestion_spark.sinks import manifest_store as ms
    from dataingestion_spark.sinks.commit_backend import backend_for
    from dataingestion_spark.sinks.scd import scd2_merge

    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    spark = get_spark("scd2-scale-probe", cpus=cpus,
                      shuffle_partitions=int(cpus),
                      driver_mem=os.environ.get("SPARK_DRIVER_MEM", "48g"))
    spark.sparkContext.setLogLevel("ERROR")

    base = spark.read.parquet("/root/testdata/sf0.1/customer.parquet")
    copies = spark.range(10).select(F.col("id").alias("copy"))
    dims = {
        "sf0.1": base.select(
            F.col("c_custkey").cast("string").alias("documentid"),
            F.col("c_mktsegment").alias("segment"),
            F.round("c_acctbal", 2).alias("balance")),
        "sf1": base.crossJoin(copies).select(
            (F.col("c_custkey") + F.col("copy") * 10_000_000)
            .cast("string").alias("documentid"),
            F.col("c_mktsegment").alias("segment"),
            F.round("c_acctbal", 2).alias("balance")),
    }
    counts = {k: df.count() for k, df in dims.items()}

    def lifecycle(df):
        key = F.col("documentid").cast("long")
        bal2 = F.col("balance") + F.when(key % 3 == 0, 100.0).otherwise(0.0)
        table = tempfile.mkdtemp(prefix="scd2_probe_") + "/dim"
        scd2_merge(df.withColumn("effective_ts", F.lit(1.0)),
                   table, tracked=["segment", "balance"])
        scd2_merge(df.withColumn("balance", bal2)
                   .withColumn("effective_ts", F.lit(2.0)),
                   table, tracked=["segment", "balance"])
        scd2_merge(df.withColumn("balance", bal2)
                   .withColumn("segment", F.lit("CHURNED"))
                   .withColumn("effective_ts", F.lit(3.0))
                   .filter(key % 2 == 0),
                   table, tracked=["segment", "balance"])
        return table

    results = {}
    for name, df in dims.items():
        df = df.localCheckpoint()  # pin the input; time the merges only
        best = None
        for _ in range(reps):
            t0 = time.time()
            table = lifecycle(df)
            el = time.time() - t0
            best = el if best is None else min(best, el)
            shutil.rmtree(os.path.dirname(table), ignore_errors=True)
        results[name] = best
    print(json.dumps({"kernel": "scd2_3batch_lifecycle",
                      "rows": counts, "sec": results,
                      "ratio": round(results["sf1"] / results["sf0.1"], 2)}))

    # append-commit manifest bytes vs table file count: grow a table
    # from 64 to ~1k files, then land a SMALL append — the delta must
    # stay O(new files) while the full (checkpoint) manifest grows with
    # the table. This is the write-amplification claim.
    amp = {}
    for n_appends, label in ((4, "~320_files"), (14, "~960_files")):
        df = dims["sf0.1"]
        table = tempfile.mkdtemp(prefix="amp_probe_") + "/t"
        ms.write_table(df, table)
        for i in range(1, n_appends + 1):
            ms.append_table(df.limit(2000).withColumn(
                "documentid", F.concat(F.lit(f"x{i}-"), "documentid")), table)
        small = df.limit(10).withColumn(
            "documentid", F.concat(F.lit("tiny-"), "documentid"))
        ms.append_table(small, table)  # the measured steady-state commit
        be = backend_for(table)
        v = ms.current_version(table)
        files = sum(len(x) for x in ms.read_manifest(table)["buckets"].values())
        ckpt = max(w for w in range(v + 1)
                   if w % ms._CHECKPOINT_EVERY == 0)
        amp[label] = {
            "live_files": files,
            "checkpoint_manifest_bytes":
                len(be.read_text(ms._manifest_path(table, ckpt))),
            "small_append_delta_bytes":
                len(be.read_text(ms._manifest_path(table, v))),
        }
        shutil.rmtree(os.path.dirname(table), ignore_errors=True)
    print(json.dumps({"kernel": "append_commit_manifest_bytes", **amp}))


if __name__ == "__main__":
    main()
