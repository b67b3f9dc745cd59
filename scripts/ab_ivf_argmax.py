"""Tight-ABBA A/B: (a) ivf_assign rank-1 as max(struct) aggregation +
(b) stride-centroid frame materialized once, vs the old window + lazy
cents (inlined below), at the ann_recall and ivf_build bench shapes."""
import os, statistics, sys, tempfile, time
sys.path.insert(0, "/root/repo")
from pyspark.sql import Window, functions as F

from dataingestion_spark.session import get_spark
from dataingestion_spark.operators import similarity
from dataingestion_spark.operators.similarity import (
    _rank_topk, _stride_centroid_rows, cosine_sim, recall_at_k,
)
from dataingestion_spark.partitioning import fan_out
from dataingestion_spark.sinks.vector_index import build_ivf_index
import __spark_entry__ as em

spark = get_spark("ab-ivf-argmax", cpus="32", shuffle_partitions=32,
                  driver_mem="48g")
spark.sparkContext.setLogLevel("ERROR")
SF = "/root/testdata/sf0.1"


def ivf_assign_old(corpus, cents, corpus_id, corpus_vec):
    # pre-change rank-1 branch: window + filter crk == 1
    assign_w = Window.partitionBy(corpus_id).orderBy(
        F.desc("csim"), F.asc("centroid_id"))
    return (fan_out(corpus).crossJoin(F.broadcast(cents))
            .withColumn("csim", cosine_sim(F.col(corpus_vec), F.col("cvec")))
            .withColumn("crk", F.row_number().over(assign_w))
            .filter(F.col("crk") == 1)
            .select(corpus_id, corpus_vec, "centroid_id"))


def topk_cosine_ivf_old(corpus, queries, k, n_centroids, n_probe):
    # pre-change: lazy cents (broadcast subtree executes twice) + window
    n = corpus.count()
    cents = _stride_centroid_rows(corpus, "vec_id", "embedding",
                                  n_centroids, n)
    assigned = ivf_assign_old(corpus, cents, "vec_id", "embedding")
    probe_w = Window.partitionBy("query_id").orderBy(
        F.desc("csim"), F.asc("centroid_id"))
    probes = (queries.crossJoin(F.broadcast(cents))
              .withColumn("csim", cosine_sim(F.col("query_vec"), F.col("cvec")))
              .withColumn("crk", F.row_number().over(probe_w))
              .filter(F.col("crk") <= n_probe)
              .select("query_id", "query_vec", "centroid_id"))
    scored = assigned.join(F.broadcast(probes), "centroid_id").select(
        F.col("query_id"), F.col("vec_id"),
        cosine_sim(F.col("embedding"), F.col("query_vec")).alias("score"))
    return _rank_topk(scored, k, "query_id", "vec_id")


def ann_shape(ivf_fn):
    e = em._t(spark, SF, "embeddings")
    t0 = time.monotonic()
    queries = e.filter(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("query_vec"))
    exact = similarity.topk_cosine(e, queries, k=10)
    approx = ivf_fn(e, queries, k=10, n_centroids=8, n_probe=2)
    recall_at_k(exact, approx, 10).write.format("noop").mode("overwrite").save()
    return time.monotonic() - t0


def build_ivf_old(path):
    # bench build_ivf with the old assignment (explicit centroids)
    cs = _bench_centroids()
    corpus = em._t(spark, SF, "embeddings")
    cdf = spark.createDataFrame(cs, ["centroid_id", "cvec"])
    assigned = ivf_assign_old(corpus, cdf, "vec_id", "embedding")
    (assigned.repartition("centroid_id")
     .write.mode("overwrite").partitionBy("centroid_id")
     .parquet(os.path.join(path, "lists")))


def _bench_centroids():
    from pyspark.sql import Window as W
    e = em._t(spark, SF, "embeddings")
    n = e.count()
    stride = max(1, n // 8)
    rows = (e.withColumn("rn", F.row_number().over(W.orderBy(F.asc("vec_id"))))
            .filter((F.col("rn") - 1) % stride == 0)
            .orderBy("rn").limit(8).select("rn", "embedding").collect())
    return [(int(r["rn"]), [float(x) for x in r["embedding"]]) for r in rows]


def build_shape_new():
    path = tempfile.mkdtemp(prefix="ab_ivf_") + "/idx"
    t0 = time.monotonic()
    build_ivf_index(em._t(spark, SF, "embeddings"), path,
                    centroids=_bench_centroids())
    return time.monotonic() - t0


def build_shape_old():
    path = tempfile.mkdtemp(prefix="ab_ivf_") + "/idx"
    t0 = time.monotonic()
    build_ivf_old(path)
    return time.monotonic() - t0


# result identity of the new vs old ivf path at the ann shape
e = em._t(spark, SF, "embeddings")
q = e.filter(F.col("vec_id") < 5).select(
    F.col("vec_id").alias("query_id"), F.col("embedding").alias("query_vec"))
a = sorted(map(tuple, similarity.topk_cosine_ivf(
    e, q, k=10, n_centroids=8, n_probe=2).collect()))
b = sorted(map(tuple, topk_cosine_ivf_old(e, q, 10, 8, 2).collect()))
assert a == b, "IVF RESULTS DIFFER"
print("result identity (ann shape): OK", flush=True)

cases = {
    "ann_recall": (lambda: ann_shape(similarity.topk_cosine_ivf),
                   lambda: ann_shape(topk_cosine_ivf_old)),
    "ivf_build": (build_shape_new, build_shape_old),
}
PAIRS = int(os.environ.get("PAIRS", "6"))
for name, (new, old) in cases.items():
    new(); old()
    on, off = [], []
    for p in range(PAIRS):
        order = [(new, on), (old, off)] if p % 2 == 0 else [(old, off), (new, on)]
        for fn, acc in order:
            acc.append(fn())
    d = [x - y for x, y in zip(on, off)]
    print(f"{name}: new min={min(on):.3f} med={statistics.median(on):.3f} | "
          f"old min={min(off):.3f} med={statistics.median(off):.3f} | paired "
          f"med={statistics.median(d):+.3f} pos={sum(1 for x in d if x > 0)}/{len(d)} "
          f"all={[round(x, 3) for x in d]} load1={os.getloadavg()[0]:.2f}",
          flush=True)
spark.stop()
