"""Scale probe: ivf_assign rank-1 as max(struct) aggregation vs window
formulation on a synthetic corpus (deterministic vectors), where the
corpus x C expansion actually stresses the shuffle. Results discarded."""
import os, statistics, sys, time
sys.path.insert(0, "/root/repo")
from pyspark.sql import Window, functions as F

from dataingestion_spark.session import get_spark
from dataingestion_spark.operators.similarity import cosine_sim, ivf_assign
from dataingestion_spark.partitioning import fan_out

spark = get_spark("probe-ivf-assign", cpus="32", shuffle_partitions=32,
                  driver_mem="48g")
spark.sparkContext.setLogLevel("ERROR")

N = int(os.environ.get("N", "500000"))
DIM, C = 32, 16
vec = F.array(*[((F.col("id") * (i + 3)) % 97).cast("double")
                for i in range(DIM)])
corpus = spark.range(N).select(F.col("id").alias("vec_id"),
                               vec.alias("embedding"))
cents_rows = [(i + 1, [float(((7 * (i + 1)) * (j + 3)) % 97)
                       for j in range(DIM)]) for i in range(C)]
cdf = spark.createDataFrame(cents_rows, ["centroid_id", "cvec"])


def assign_old(corpus, cents):
    w = Window.partitionBy("vec_id").orderBy(F.desc("csim"),
                                             F.asc("centroid_id"))
    return (fan_out(corpus).crossJoin(F.broadcast(cents))
            .withColumn("csim", cosine_sim(F.col("embedding"), F.col("cvec")))
            .withColumn("crk", F.row_number().over(w))
            .filter(F.col("crk") == 1)
            .select("vec_id", "embedding", "centroid_id"))


def run(fn):
    t0 = time.monotonic()
    fn(corpus, cdf).write.format("noop").mode("overwrite").save()
    return time.monotonic() - t0


a = sorted(map(tuple, ivf_assign(corpus.limit(5000), cdf, "vec_id",
                                 "embedding").collect()))
b = sorted(map(tuple, assign_old(corpus.limit(5000), cdf).collect()))
assert a == b, "DIFFER"
print(f"identity OK at 5k rows; probing N={N} C={C}", flush=True)

new = lambda: run(lambda c, d: ivf_assign(c, d, "vec_id", "embedding"))
old = lambda: run(assign_old)
new(); old()
on, off = [], []
for p in range(4):
    order = [(new, on), (old, off)] if p % 2 == 0 else [(old, off), (new, on)]
    for fn, acc in order:
        acc.append(fn())
print(f"N={N}: agg min={min(on):.3f} med={statistics.median(on):.3f} | "
      f"window min={min(off):.3f} med={statistics.median(off):.3f} | "
      f"paired med={statistics.median([x-y for x,y in zip(on,off)]):+.3f} "
      f"load1={os.getloadavg()[0]:.2f}", flush=True)
spark.stop()
