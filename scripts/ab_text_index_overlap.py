"""Tight-ABBA A/B: overlapped vs sequential postings+doclens writes in
text_index._write (guide §2.6), at the bench bm25_index_build shape
(write_text_index + append_text_index over sf0.1 documents)."""
import os, statistics, sys, tempfile, time
sys.path.insert(0, "/root/repo")
from pyspark.sql import functions as F

from dataingestion_spark.session import get_spark
from dataingestion_spark.sinks import text_index as ti
import __spark_entry__ as em

spark = get_spark("ab-text-overlap", cpus="32", shuffle_partitions=32,
                  driver_mem="48g")
spark.sparkContext.setLogLevel("ERROR")
SF = "/root/testdata/sf0.1"


def _seq_write(docs, path, text_col, id_col, mode):
    # byte-for-byte the pre-change sequential body
    words = ti._tokens(text_col)
    postings = (docs.select(F.col(id_col).alias("doc_id"),
                            F.explode(words).alias("term"))
                .groupBy("doc_id", "term").agg(F.count("*").alias("tf"))
                .withColumn("tb", ti._term_bucket(F.col("term"))))
    (postings.repartition("tb", "doc_id").sortWithinPartitions("tb", "term")
     .write.mode(mode).partitionBy("tb")
     .parquet(os.path.join(path, "postings")))
    (docs.select(F.col(id_col).alias("doc_id"), F.size(words).alias("dl"))
     .write.mode(mode).parquet(os.path.join(path, "doclens")))


def build(write_fn):
    path = tempfile.mkdtemp(prefix="ab_text_") + "/idx"
    docs = em._t(spark, SF, "documents")
    t0 = time.monotonic()
    write_fn(docs.filter(F.col("doc_id") % 5 != 0), path, "text", "doc_id",
             "overwrite")
    write_fn(docs.filter(F.col("doc_id") % 5 == 0), path, "text", "doc_id",
             "append")
    return time.monotonic() - t0


new = lambda: build(ti._write)
old = lambda: build(_seq_write)

PAIRS = int(os.environ.get("PAIRS", "6"))
new(); old()  # warm
on, off = [], []
for p in range(PAIRS):
    order = [(new, on), (old, off)] if p % 2 == 0 else [(old, off), (new, on)]
    for fn, acc in order:
        acc.append(fn())
d = [a - b for a, b in zip(on, off)]
print(f"bm25_index_build-shape: overlapped min={min(on):.3f} "
      f"med={statistics.median(on):.3f} | sequential min={min(off):.3f} "
      f"med={statistics.median(off):.3f} | paired new-old "
      f"med={statistics.median(d):+.3f} pos={sum(1 for x in d if x > 0)}/{len(d)} "
      f"all={[round(x, 3) for x in d]} load1={os.getloadavg()[0]:.2f}",
      flush=True)
spark.stop()
