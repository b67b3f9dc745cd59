"""Tight-ABBA interleaved fan-out A/B over arbitrary bench entries.

r15 re-adjudication of every fan-out site the r14 driver artifact
flagged as a regression outside the load-recheck window (bm25_hybrid,
pq_adc, pq_rerank, quantized_topk, emb_neardup) plus the ivf/ivfpq
builds and the load-contaminated entries needing a calm re-measure
(lm_perplexity, boilerplate_lines, simhash). Protocol identical to
scripts/ab_fanout_tail.py (the one that correctly overturned the
rake/collocations calls in r14): per entry, tight back-to-back
alternation on,off / off,on so position effects cancel pair-by-pair;
paired per-rep deltas reported; `quality_checks` rides along as the
jitter control (its plan carries no fan-out, so any apparent ON/OFF
difference it shows is the harness's noise floor).

Usage: python scripts/ab_fanout_sites.py [pairs] [entry,entry,...]
"""
import os
import statistics
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = os.environ.get("SPARK_GRAFT_CPUS", "32")
PAIRS = int(sys.argv[1]) if len(sys.argv) > 1 else 6
ONLY = [e for e in (sys.argv[2].split(",") if len(sys.argv) > 2 else []) if e]


def main():
    from pyspark.sql import functions as F
    from pyspark.sql import Window as W

    import __spark_entry__ as em
    from dataingestion_spark.session import get_spark
    from dataingestion_spark.sinks.vector_index import (
        build_ivf_index, build_ivfpq_index, search_ivf_index,
        search_ivfpq_index,
    )

    spark = get_spark(
        "ab-fanout-sites", cpus=CPUS, shuffle_partitions=int(CPUS),
        driver_mem="48g",
    )
    spark.sparkContext.setLogLevel("ERROR")

    def _ivf_centroids(spark, sf):
        e = em._t(spark, sf, "embeddings")
        n = e.count()
        stride = max(1, n // 8)
        rows = (
            e.withColumn("rn", F.row_number().over(W.orderBy(F.asc("vec_id"))))
            .filter((F.col("rn") - 1) % stride == 0)
            .orderBy("rn").limit(8).select("rn", "embedding").collect()
        )
        return [(int(r["rn"]), [float(x) for x in r["embedding"]]) for r in rows]

    cents = _ivf_centroids(spark, SF_DIR)

    def ivf_build(spark, sf):
        path = tempfile.mkdtemp(prefix="ab_ivf_") + "/idx"
        build_ivf_index(em._t(spark, sf, "embeddings"), path, centroids=cents)
        return spark.range(1)

    def ivfpq_build(spark, sf):
        path = tempfile.mkdtemp(prefix="ab_ivfpq_") + "/idx"
        build_ivfpq_index(em._t(spark, sf, "embeddings"), path,
                          centroids=cents, m=8, k_codes=16, pq_iters=2)
        return spark.range(1)

    # prebuilt serve-side indexes (fan-out state at build time is
    # irrelevant to the serve entries being measured)
    ivf_path = tempfile.mkdtemp(prefix="ab_ivf_srv_") + "/idx"
    build_ivf_index(em._t(spark, SF_DIR, "embeddings"), ivf_path,
                    centroids=cents)
    ivfpq_path = tempfile.mkdtemp(prefix="ab_ivfpq_srv_") + "/idx"
    build_ivfpq_index(em._t(spark, SF_DIR, "embeddings"), ivfpq_path,
                      centroids=cents, m=8, k_codes=16, pq_iters=2)

    def _queries(spark, sf):
        e = em._t(spark, sf, "embeddings")
        return e.filter(F.col("vec_id") < 5).select(
            F.col("vec_id").alias("query_id"),
            F.col("embedding").alias("query_vec"))

    def ivf_persisted(spark, sf):
        return search_ivf_index(spark, ivf_path, _queries(spark, sf),
                                k=10, n_probe=2)

    def ivfpq_persisted(spark, sf):
        return search_ivfpq_index(spark, ivfpq_path, _queries(spark, sf),
                                  k=10, n_probe=2)

    entries = {
        "bm25_hybrid": em.q_hybrid_rrf,
        "pq_adc": em.q_topk_pq,
        "pq_rerank": em.q_topk_pq_rerank,
        "quantized_topk": em.q_topk_quantized,
        "emb_neardup": em.q_emb_neardup,
        "emb_topk": em.q_emb_topk,
        "ann_recall": em.q_recall_ivf,
        "semantic_dedup": em.q_semantic_dedup,
        "lm_perplexity": em.q_lm_perplexity,
        "boilerplate_lines": em.q_boilerplate_lines,
        "simhash": em.q_simhash,
        "ivf_build": ivf_build,
        "ivfpq_build": ivfpq_build,
        "ivf_persisted": ivf_persisted,
        "ivfpq_persisted": ivfpq_persisted,
        "quality_checks": em.q_quality_constraints,   # jitter control
    }
    if ONLY:
        entries = {n: entries[n] for n in ONLY}

    def run(fn, arm):
        os.environ["SPARK_GRAFT_FANOUT"] = "1" if arm == "on" else "0"
        t0 = time.monotonic()
        fn(spark, SF_DIR).write.format("noop").mode("overwrite").save()
        return time.monotonic() - t0

    for name, fn in entries.items():
        run(fn, "on"), run(fn, "off")   # warm-up both arms, untimed
        on, off = [], []
        for p in range(PAIRS):
            order = ["on", "off"] if p % 2 == 0 else ["off", "on"]
            for arm in order:
                spark.sparkContext.setJobDescription(f"{name}:{arm}:p{p}")
                (on if arm == "on" else off).append(run(fn, arm))
        deltas = [a - b for a, b in zip(on, off)]
        print(f"{name}: ON  min={min(on):.3f} med={statistics.median(on):.3f} "
              f"all={[round(x, 3) for x in on]}")
        print(f"{name}: OFF min={min(off):.3f} med={statistics.median(off):.3f} "
              f"all={[round(x, 3) for x in off]}")
        print(f"{name}: paired ON-OFF deltas "
              f"med={statistics.median(deltas):+.3f} "
              f"pos={sum(1 for d in deltas if d > 0)}/{len(deltas)} "
              f"all={[round(d, 3) for d in deltas]} "
              f"load1={os.getloadavg()[0]:.2f}", flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
