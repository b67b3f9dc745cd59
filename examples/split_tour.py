"""Scale-IN tour: every row-major interchange format in the repo reads
as BYTE-RANGE SPLITS, so one oversized foreign shard fans out across
executors (parallelism = bytes / split_mb, not shard count) — and each
reader routes through the range-read DataBackend, so the same code
path works on object storage (emulated here with MemoryDataBackend).

Formats and their split mechanisms:
  avro        sync-marker scan (spec-designed for splitting)
  tfrecord    header-CRC resync chained to the next header
  warc/wet    gzip member magic validated by decompress-to-WARC/
  jsonl.zst   RFC 8878 structural frame walk (zero decompression)
  arrow ipc   footer block index (true random access, no heuristics)
  tar (wds)   checksum-validated 512-aligned headers

Run: python examples/split_tour.py
"""
import hashlib
import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

from pyspark.sql import functions as F

from dataingestion_spark.session import get_spark
from dataingestion_spark.sinks.data_backend import MemoryDataBackend
from dataingestion_spark.sinks.webdataset import (
    read_webdataset, read_webdataset_split, write_webdataset,
)
from dataingestion_spark.sources import jsonl
from dataingestion_spark.sources.arrow_ipc import (
    read_arrow_ipc, read_arrow_ipc_split, write_arrow_ipc,
)
from dataingestion_spark.sources.avro import (
    read_avro, read_avro_split, write_avro,
)
from dataingestion_spark.sources.tfrecord import (
    read_tfrecord, read_tfrecord_split, write_tfrecord,
)
from dataingestion_spark.sources.warc import (
    read_warc, read_warc_split, wet_record_bytes,
)

spark = get_spark("split-tour", cpus="8", shuffle_partitions=8)
spark.sparkContext.setLogLevel("ERROR")

N = 4000
docs = spark.range(N).select(
    F.col("id").alias("doc_id"),
    F.concat(F.sha2(F.col("id").cast("string"), 256),
             F.lit("-"), F.sha2(F.concat(F.col("id").cast("string"),
                                         F.lit("x")), 256)).alias("text"))
want = {(r["doc_id"], r["text"]) for r in docs.collect()}
td = tempfile.mkdtemp(prefix="split_tour_")


def check(name, got_df, key=("doc_id", "text")):
    got = {tuple(r[k] for k in key) for r in got_df.collect()}
    assert got == want, f"{name}: split read diverged"
    print(f"{name:28s} OK  ({len(got)} rows)")


# 1. avro: ONE oversized shard, 1 MB sync-marker splits
d = td + "/avro"
write_avro(docs, d, shards=1, order_by="doc_id", block_rows=32)
check("avro sync-marker splits", read_avro_split(spark, d, split_mb=1))
# r14 mapInArrow interchange: same splits, decoded columns cross as
# Arrow batches with no pandas round-trip
check("avro splits (arrow mode)",
      read_avro_split(spark, d, split_mb=1, arrow=True))

# 2. tfrecord: CRC resync
d = td + "/tf"
write_tfrecord(docs.select("doc_id",
                           F.encode("text", "utf-8").alias("text")),
               {"doc_id": "int64", "text": "bytes"}, d, shards=1)
got = read_tfrecord_split(spark, d, {"doc_id": "int64",
                                     "text": "bytes"}, split_mb=1)
check("tfrecord CRC resync splits",
      got.select("doc_id", F.decode("text", "utf-8").alias("text")))

# 3. wet: member-per-record gzip
import gzip

d = td + "/wet"
os.makedirs(d)
pdf = docs.toPandas().sort_values("doc_id")
members = [gzip.compress(wet_record_bytes(
    f"https://x.test/{int(i)}", t.encode()))
    for i, t in zip(pdf["doc_id"], pdf["text"])]
open(os.path.join(d, "seg.wet.gz"), "wb").write(b"".join(members))
got = read_warc_split(spark, d, split_mb=1).select(
    F.regexp_extract("target_uri", r"/(\d+)$", 1).cast("long")
     .alias("doc_id"), F.col("payload").alias("text"))
check("warc gzip-member splits", got)

# 4. jsonl.zst: frame-aligned multi-frame shard
d = td + "/zst"
from pyspark.sql import types as T
schema = T.StructType([T.StructField("doc_id", T.LongType()),
                       T.StructField("text", T.StringType())])
jsonl.write_jsonl_zst(docs, d, shards=1, order_by="doc_id",
                      frame_lines=64)
check("jsonl.zst frame splits",
      jsonl.read_jsonl_zst_split(spark, d, schema, split_mb=1))

# 5. arrow ipc: footer-indexed batches — THROUGH the object-store
# emulation end to end (footer + batches via ranged reads)
d = td + "/ipc"
write_arrow_ipc(docs, d, shards=1, order_by="doc_id", batch_rows=128)
mem = MemoryDataBackend()
for n in os.listdir(d):
    mem.write_bytes(f"bucket/ipc/{n}",
                    open(os.path.join(d, n), "rb").read())
check("arrow footer splits (mem)",
      read_arrow_ipc_split(spark, "bucket/ipc", split_mb=1,
                           backend=mem))

# 6. tar (webdataset): checksum-aligned headers
d = td + "/wds"
write_webdataset(docs.select(F.lit(0).alias("shard_id"),
                             F.format_string("%09d", "doc_id")
                              .alias("key"),
                             "text",
                             F.lit(None).cast("string").alias("meta")),
                 d, meta_col=None).collect()
got = read_webdataset_split(spark, d, split_mb=1).select(
    F.col("key").cast("long").alias("doc_id"),
    F.col("payload").alias("text"))
check("tar checksum-header splits", got)

print("\nsplit tour complete ✓  (6 formats, all byte-range splittable)")
