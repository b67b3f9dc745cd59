import os, sys, statistics, tempfile, time
sys.path.insert(0, "/root/repo")
from pyspark.sql import functions as F
from dataingestion_spark.session import get_spark
from dataingestion_spark.sources.avro import read_avro, read_avro_split, write_avro
from dataingestion_spark.sources.arrow_ipc import read_arrow_ipc, read_arrow_ipc_split, write_arrow_ipc

SF = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
spark = get_spark("ab-arrow", cpus="32", shuffle_partitions=32, driver_mem="48g")
spark.sparkContext.setLogLevel("ERROR")
docs = spark.read.parquet(os.path.join(SF, "documents.parquet")).select(
    "doc_id", "text", "lang", "source", "n_chars")
print("rows:", docs.count())
av = tempfile.mkdtemp() + "/av"; write_avro(docs, av, shards=1, order_by="doc_id")
ai = tempfile.mkdtemp() + "/ai"; write_arrow_ipc(docs, ai, shards=1, order_by="doc_id")

cases = {
  "read_avro": lambda arrow: read_avro(spark, av, arrow=arrow),
  "read_avro_split": lambda arrow: read_avro_split(spark, av, split_mb=1, arrow=arrow),
  "read_ipc": lambda arrow: read_arrow_ipc(spark, ai, arrow=arrow),
  "read_ipc_split": lambda arrow: read_arrow_ipc_split(spark, ai, split_mb=1, arrow=arrow),
}
PAIRS = 6
def run(fn, arrow):
    t0 = time.monotonic()
    fn(arrow).write.format("noop").mode("overwrite").save()
    return time.monotonic() - t0
for name, fn in cases.items():
    run(fn, True); run(fn, False)
    on, off = [], []
    for p in range(PAIRS):
        order = [True, False] if p % 2 == 0 else [False, True]
        for a in order:
            (on if a else off).append(run(fn, a))
    d = [a-b for a,b in zip(on,off)]
    print(f"{name}: arrow min={min(on):.3f} med={statistics.median(on):.3f} | pandas min={min(off):.3f} med={statistics.median(off):.3f} | paired arrow-pandas med={statistics.median(d):+.3f} pos={sum(1 for x in d if x>0)}/{len(d)} all={[round(x,3) for x in d]} load1={os.getloadavg()[0]:.2f}", flush=True)
spark.stop()
