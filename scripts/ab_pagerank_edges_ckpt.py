"""Tight-ABBA A/B: checkpoint the edge list once at the top of pagerank()
(new) vs re-executing the caller's edge-build join for each derived
checkpoint (old, inlined below), at the q_pagerank_nations bench shape."""
import os, statistics, sys, time
sys.path.insert(0, "/root/repo")
from pyspark.sql import functions as F

from dataingestion_spark.session import get_spark
from dataingestion_spark.operators.graph import pagerank as pagerank_new
import __spark_entry__ as em

spark = get_spark("ab-pagerank", cpus="32", shuffle_partitions=32,
                  driver_mem="48g")
spark.sparkContext.setLogLevel("ERROR")
SF = "/root/testdata/sf0.1"


def pagerank_old(edges, src="src", dst="dst", iters=5, damping=0.85):
    # byte-for-byte the pre-change body (checkpoint=True, no seeds)
    nodes = (edges.select(F.col(src).alias("node"))
             .union(edges.select(F.col(dst).alias("node"))).distinct()
             .localCheckpoint(eager=True))
    n = nodes.count()
    outdeg = edges.groupBy(src).agg(F.count("*").alias("_outdeg"))
    e = edges.join(outdeg, src).select(
        F.col(src).alias("_src"), F.col(dst).alias("_dst"), "_outdeg"
    ).localCheckpoint(eager=True)
    base = F.lit((1.0 - damping) / n)
    ranks = nodes.select("node", F.lit(1.0 / n).alias("rank"))
    for _ in range(iters):
        contribs = e.join(ranks, e["_src"] == ranks["node"]).select(
            "_src", "_dst", (F.col("rank") / F.col("_outdeg")).alias("_c"))
        summed = contribs.groupBy("_dst").agg(
            F.aggregate(F.array_sort(F.collect_list(F.struct("_src", "_c"))),
                        F.lit(0.0), lambda acc, x: acc + x["_c"]).alias("_in"))
        ranks = nodes.join(summed, nodes["node"] == summed["_dst"], "left").select(
            "node",
            (base + F.lit(damping) * F.coalesce("_in", F.lit(0.0))).alias("rank"),
        ).localCheckpoint(eager=True)
    return ranks


def q_shape(pr_fn):
    li, o = em._t(spark, SF, "lineitem"), em._t(spark, SF, "orders")
    c, s = em._t(spark, SF, "customer"), em._t(spark, SF, "supplier")
    edges = (li.join(o, li.l_orderkey == o.o_orderkey)
             .join(c, o.o_custkey == c.c_custkey)
             .join(s, li.l_suppkey == s.s_suppkey)
             .filter(F.col("c_nationkey") != F.col("s_nationkey"))
             .select(F.col("c_nationkey").alias("src"),
                     F.col("s_nationkey").alias("dst")).distinct())
    t0 = time.monotonic()  # construction included: eager ckpts run here
    ranks = pr_fn(edges, iters=3)
    n = em._t(spark, SF, "nation")
    (ranks.join(n, ranks.node == n.n_nationkey)
     .select(F.col("n_name").alias("nation"), F.round("rank", 12).alias("rank_r"))
     .write.format("noop").mode("overwrite").save())
    return time.monotonic() - t0


new = lambda: q_shape(pagerank_new)
old = lambda: q_shape(pagerank_old)

# result identity first
def rows(pr_fn):
    li, o = em._t(spark, SF, "lineitem"), em._t(spark, SF, "orders")
    c, s = em._t(spark, SF, "customer"), em._t(spark, SF, "supplier")
    edges = (li.join(o, li.l_orderkey == o.o_orderkey)
             .join(c, o.o_custkey == c.c_custkey)
             .join(s, li.l_suppkey == s.s_suppkey)
             .filter(F.col("c_nationkey") != F.col("s_nationkey"))
             .select(F.col("c_nationkey").alias("src"),
                     F.col("s_nationkey").alias("dst")).distinct())
    n = em._t(spark, SF, "nation")
    r = pr_fn(edges, iters=3)
    return sorted(map(tuple, r.join(n, r.node == n.n_nationkey)
                  .select("n_name", F.round("rank", 12)).collect()))

assert rows(pagerank_new) == rows(pagerank_old), "RESULTS DIFFER"
print("result identity: OK", flush=True)

PAIRS = int(os.environ.get("PAIRS", "6"))
new(); old()
on, off = [], []
for p in range(PAIRS):
    order = [(new, on), (old, off)] if p % 2 == 0 else [(old, off), (new, on)]
    for fn, acc in order:
        acc.append(fn())
d = [x - y for x, y in zip(on, off)]
print(f"pagerank-shape: new min={min(on):.3f} med={statistics.median(on):.3f} | "
      f"old min={min(off):.3f} med={statistics.median(off):.3f} | paired "
      f"med={statistics.median(d):+.3f} pos={sum(1 for x in d if x > 0)}/{len(d)} "
      f"all={[round(x, 3) for x in d]} load1={os.getloadavg()[0]:.2f}", flush=True)
spark.stop()
