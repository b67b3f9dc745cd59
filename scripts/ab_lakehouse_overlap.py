import os, sys, statistics, tempfile, time
sys.path.insert(0, "/root/repo")
from concurrent.futures import ThreadPoolExecutor
from pyspark.sql import functions as F
from dataingestion_spark.session import get_spark
from dataingestion_spark.sinks import manifest_store as ms
from dataingestion_spark.sinks.scd import scd2_merge
import __spark_entry__ as em

spark = get_spark("ab-lakehouse", cpus="32", shuffle_partitions=32, driver_mem="48g")
spark.sparkContext.setLogLevel("ERROR")
SF = "/root/testdata/sf0.1"

def scd2_seq(spark, sf):
    cust = em._t(spark, sf, "customer").select(
        F.col("c_custkey").cast("string").alias("documentid"),
        F.col("c_mktsegment").alias("segment"),
        (F.round("c_acctbal", 2) + F.lit(0.0)).alias("balance"))
    key = F.col("documentid").cast("long")
    bal2 = F.col("balance") + F.when(key % 3 == 0, 100.0).otherwise(0.0)
    table = tempfile.mkdtemp(prefix="scd2_seq_") + "/dim"
    scd2_merge(cust.withColumn("effective_ts", F.lit(1.0)), table, tracked=["segment", "balance"])
    scd2_merge(cust.withColumn("balance", bal2).withColumn("effective_ts", F.lit(2.0)), table, tracked=["segment", "balance"])
    scd2_merge(cust.withColumn("balance", bal2).withColumn("segment", F.lit("CHURNED"))
               .withColumn("effective_ts", F.lit(3.0)).filter(key % 2 == 0), table, tracked=["segment", "balance"])
    return ms.read_table(spark, table).select("documentid", "segment", "balance", "valid_from", "valid_to", "is_current")

def merge_seq(spark, sf):
    docs = em._t(spark, sf, "documents").select(
        F.col("doc_id").cast("string").alias("documentid"), "text", "lang", "n_chars")
    table = tempfile.mkdtemp(prefix="merge_seq_") + "/t"
    ms.write_table(docs.filter(F.col("doc_id") % 3 != 0), table)
    src1 = (docs.filter(F.col("doc_id") % 2 == 0)
            .withColumn("text", F.concat(F.lit("v2 "), F.col("text")))
            .withColumn("n_chars", F.col("n_chars") + F.lit(3)))
    ms.merge_table(src1, table, matched_condition="target.n_chars % 2 = 0")
    src2 = docs.filter(F.col("doc_id") % 7 == 0).select("documentid")
    ms.merge_table(src2, table, when_matched="delete", when_not_matched=None)
    return ms.read_table(spark, table).select("documentid", "text", "lang", "n_chars")

cases = {"scd2_merge": (em.q_lakehouse_scd2, scd2_seq),
         "merge_upsert": (em.q_lakehouse_merge, merge_seq)}
PAIRS = 5
def run(fn):
    t0 = time.monotonic()
    fn(spark, SF).write.format("noop").mode("overwrite").save()
    return time.monotonic() - t0
for name, (new, old) in cases.items():
    run(new); run(old)
    on, off = [], []
    for p in range(PAIRS):
        order = [(new, on), (old, off)] if p % 2 == 0 else [(old, off), (new, on)]
        for fn, acc in order:
            acc.append(run(fn))
    d = [a-b for a, b in zip(on, off)]
    print(f"{name}: overlapped min={min(on):.3f} med={statistics.median(on):.3f} | sequential min={min(off):.3f} med={statistics.median(off):.3f} | paired new-old med={statistics.median(d):+.3f} pos={sum(1 for x in d if x>0)}/{len(d)} all={[round(x,3) for x in d]} load1={os.getloadavg()[0]:.2f}", flush=True)
spark.stop()
