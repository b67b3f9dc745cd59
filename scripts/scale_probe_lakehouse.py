"""sf1 scale probe for the lakehouse family (r5) — completes the
measured-scaling story next to scale_probe_dedup.py (r4) and
scale_probe_index.py (r5).

Kernels, at sf0.1 vs a deterministic 10× documents corpus:

* table_write — bucketed manifest-store write (one shuffle + per-bucket
  parquet emit; ~linear in rows, floor-bound at these sizes),
* merge_upsert — conditional update-merge of a half-corpus batch
  (precheck + range-pruned target read + one write job; the batch grows
  10× with the corpus here, so this is the worst case — real
  incremental merges hold batch size constant),
* dv_read — DV-applying full read after an unconditional delete merge,
* skipping_read — read_table_where over three range-disjoint commits
  (file-list pruning before footer IO; wall should stay ~flat because
  the pruned fraction is constant).

Prints one JSON line per kernel (min-of-N secs at both scales + ratio);
paste into SCALE.md.

Usage: python scripts/scale_probe_lakehouse.py [reps]
"""

from __future__ import annotations

import json
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    reps = int(sys.argv[1]) if len(sys.argv) > 1 else 3
    from pyspark.sql import functions as F

    from dataingestion_spark.session import get_spark
    from dataingestion_spark.sinks import manifest_store as ms

    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    spark = get_spark("lakehouse-scale-probe", cpus=cpus,
                      shuffle_partitions=int(cpus),
                      driver_mem=os.environ.get("SPARK_DRIVER_MEM", "48g"))
    spark.sparkContext.setLogLevel("ERROR")

    base = spark.read.parquet("/root/testdata/sf0.1/documents.parquet")
    tmp = tempfile.mkdtemp(prefix="lh_probe_")
    big_dir = os.path.join(tmp, "documents_sf1")
    copies = spark.range(10).select(F.col("id").alias("copy"))
    (base.crossJoin(copies)
     .select((F.col("doc_id") + F.col("copy") * 10_000_000).alias("doc_id"),
             F.concat(F.col("text"), F.lit(" c"),
                      F.col("copy").cast("string")).alias("text"),
             "lang", "source", (F.col("n_chars") + 3).alias("n_chars"))
     .repartition(int(cpus))
     .write.mode("overwrite").parquet(big_dir))

    def docs_of(path):
        return spark.read.parquet(path).select(
            F.col("doc_id").cast("string").alias("documentid"),
            "text", "lang", F.col("n_chars").cast("long").alias("n_chars"),
            F.col("doc_id").alias("_id"))

    small = docs_of("/root/testdata/sf0.1/documents.parquet")
    big = docs_of(big_dir)
    print(json.dumps({"rows": {"sf0.1": small.count(), "sf1": big.count()}}),
          flush=True)

    def best_of(fn):
        best = None
        for _ in range(reps):
            t0 = time.perf_counter()
            fn()
            el = time.perf_counter() - t0
            best = el if best is None else min(best, el)
        return best

    def run(label, small_fn, big_fn):
        s, b = best_of(small_fn), best_of(big_fn)
        print(json.dumps({"kernel": label, "sf0.1_sec": round(s, 2),
                          "sf1_sec": round(b, 2),
                          "ratio": round(b / s, 2)}), flush=True)

    def cols(df):
        return df.select("documentid", "text", "lang", "n_chars")

    # table_write: fresh table per rep
    run("table_write",
        lambda: ms.write_table(cols(small),
                               tempfile.mkdtemp(dir=tmp) + "/t"),
        lambda: ms.write_table(cols(big),
                               tempfile.mkdtemp(dir=tmp) + "/t"))

    # merge_upsert: prebuilt base (2/3 of corpus), merge the even half
    tables = {}
    for name, df in (("small", small), ("big", big)):
        t = tempfile.mkdtemp(dir=tmp) + "/t"
        ms.write_table(cols(df.filter(F.col("_id") % 3 != 0)), t)
        tables[name] = (t, df)

    def do_merge(name):
        t, df = tables[name]
        src = (df.filter(F.col("_id") % 2 == 0)
               .withColumn("text", F.concat(F.lit("v2 "), F.col("text"))))
        ms.merge_table(cols(src), t,
                       matched_condition="target.n_chars % 2 = 0")

    run("merge_upsert",
        lambda: do_merge("small"), lambda: do_merge("big"))

    # dv_read: delete-merge once, then time the DV-applying read
    for name in ("small", "big"):
        t, df = tables[name]
        ms.merge_table(df.filter(F.col("_id") % 7 == 0).select("documentid"),
                       t, when_matched="delete", when_not_matched=None)

    run("dv_read",
        lambda: ms.read_table(spark, tables["small"][0])
        .write.format("noop").mode("overwrite").save(),
        lambda: ms.read_table(spark, tables["big"][0])
        .write.format("noop").mode("overwrite").save())

    # skipping_read: three range-disjoint commits, predicate on the top band
    skips = {}
    for name, df in (("small", small), ("big", big)):
        t = tempfile.mkdtemp(dir=tmp) + "/t"
        ms.write_table(cols(df.filter("n_chars < 150")), t)
        ms.append_table(cols(df.filter("n_chars >= 150 and n_chars < 300")), t)
        ms.append_table(cols(df.filter("n_chars >= 300")), t)
        skips[name] = t

    run("skipping_read",
        lambda: ms.read_table_where(spark, skips["small"],
                                    [("n_chars", ">=", 300)])
        .write.format("noop").mode("overwrite").save(),
        lambda: ms.read_table_where(spark, skips["big"],
                                    [("n_chars", ">=", 300)])
        .write.format("noop").mode("overwrite").save())


if __name__ == "__main__":
    main()
