"""Phase decomposition of the lakehouse merge lifecycles (r15 item 4).

Times every driver-blocking `DataFrame.collect()` (the precheck job and
the `_write_bucket_files` commit job are the only two Spark jobs a
merge runs) inside one steady-state `scd2_merge` and one `merge_table`
call, so the per-merge wall splits into:

  precheck job | commit (write) job | driver residue (manifest IO,
  physical planning, commit bookkeeping)

— the §1 "measure first" step before deciding whether the §2.6 overlap
lever (run independent prechecks from a thread pool) can pay: only the
precheck slice is overlappable, the commit jobs are order-pinned by the
declared lifecycles.

Usage: python scripts/profile_lakehouse_phases.py [reps]
"""
from __future__ import annotations

import os
import statistics
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    reps = int(sys.argv[1]) if len(sys.argv) > 1 else 5
    from pyspark.sql import DataFrame, functions as F

    from dataingestion_spark.session import get_spark
    from dataingestion_spark.sinks import manifest_store as ms
    from dataingestion_spark.sinks.scd import scd2_merge

    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    sf = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark("lakehouse-phase-profile", cpus=cpus,
                      shuffle_partitions=int(cpus),
                      driver_mem=os.environ.get("SPARK_DRIVER_MEM", "48g"))
    spark.sparkContext.setLogLevel("ERROR")

    # Spark 4: the concrete class is pyspark.sql.classic.dataframe.
    # DataFrame, which OVERRIDES collect — patch it, not the ABC.
    from pyspark.sql.classic.dataframe import DataFrame as CDataFrame

    prof: list = []
    orig_collect = CDataFrame.collect

    def timed_collect(self):
        t0 = time.monotonic()
        r = orig_collect(self)
        prof.append(round(time.monotonic() - t0, 3))
        return r

    CDataFrame.collect = timed_collect

    cust = spark.read.parquet(os.path.join(sf, "customer.parquet")).select(
        F.col("c_custkey").cast("string").alias("documentid"),
        F.col("c_mktsegment").alias("segment"),
        (F.round("c_acctbal", 2) + F.lit(0.0)).alias("balance"))

    # ---- steady-state scd2 merge (the bench's scd2_steady shape)
    dim = tempfile.mkdtemp(prefix="prof_scd2_") + "/dim"
    scd2_merge(cust.withColumn("effective_ts", F.lit(1.0)), dim,
               tracked=["segment", "balance"])
    key = F.col("documentid").cast("long")
    stamp = 2.0
    rows = []
    for i in range(reps):
        stamp += 1.0
        batch = (cust.withColumn(
            "balance", F.col("balance")
            + F.when(key % 5 == 0, stamp * 10).otherwise(0.0))
            .withColumn("effective_ts", F.lit(stamp)))
        prof.clear()
        t0 = time.monotonic()
        scd2_merge(batch, dim, tracked=["segment", "balance"])
        wall = time.monotonic() - t0
        rows.append((wall, list(prof)))
        print(f"scd2_steady rep{i}: wall={wall:.3f} collects={prof} "
              f"residue={wall - sum(prof):.3f}", flush=True)
    walls = [r[0] for r in rows]
    print(f"scd2_steady: wall med={statistics.median(walls):.3f} "
          f"min={min(walls):.3f}")

    # ---- merge_table upsert (the bench's merge_upsert shape, merge 1)
    docs = spark.read.parquet(os.path.join(sf, "documents.parquet")).select(
        F.col("doc_id").cast("string").alias("documentid"),
        "text", "lang", "n_chars")
    rows = []
    for i in range(reps):
        table = tempfile.mkdtemp(prefix="prof_mrg_") + "/t"
        ms.write_table(docs.filter(F.col("doc_id") % 3 != 0), table)
        src1 = (docs.filter(F.col("doc_id") % 2 == 0)
                .withColumn("text", F.concat(F.lit("v2 "), F.col("text")))
                .withColumn("n_chars", F.col("n_chars") + F.lit(3)))
        prof.clear()
        t0 = time.monotonic()
        ms.merge_table(src1, table,
                       matched_condition="target.n_chars % 2 = 0")
        wall = time.monotonic() - t0
        rows.append((wall, list(prof)))
        print(f"merge_upsert rep{i}: wall={wall:.3f} collects={prof} "
              f"residue={wall - sum(prof):.3f}", flush=True)
    walls = [r[0] for r in rows]
    print(f"merge_upsert(merge1): wall med={statistics.median(walls):.3f} "
          f"min={min(walls):.3f} load1={os.getloadavg()[0]:.2f}")

    CDataFrame.collect = orig_collect
    spark.stop()


if __name__ == "__main__":
    main()
