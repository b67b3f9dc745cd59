"""Measure the r14 mapInArrow interchange for the vectorized Avro
reader (VERDICT r13 item 4; the r13 struct probe recorded an
"arrow-native floor" of 8.2x vs the shipped 4.9x — the pandas
crossing was ~40% of remaining decode cost, and mapInPandas pays a
SECOND pandas->Arrow conversion in Spark's serializer on top).

Kernels, end-to-end through a real local SparkSession (count() after
a narrow projection, forcing the full decode + executor->JVM
transfer):

* pandas — read_avro(...)            (mapInPandas contract)
* arrow  — read_avro(..., arrow=True) (mapInArrow opt-in)

over three shapes: flat strings+longs (documents-ish), array<float>
(embeddings-ish), and a nullable struct (the r14 decode).

Prints one JSON line per shape; paste into SCALE.md.

Usage: python scripts/scale_probe_avro_arrow.py [reps] [rows]
"""

from __future__ import annotations

import json
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _time(fn, reps):
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        fn()
        best = min(best, time.perf_counter() - t0)
    return best


def main() -> None:
    reps = int(sys.argv[1]) if len(sys.argv) > 1 else 3
    n = int(sys.argv[2]) if len(sys.argv) > 2 else 1_000_000

    from pyspark.sql import SparkSession, functions as F

    from dataingestion_spark.sources.avro import read_avro, write_avro

    spark = (SparkSession.builder.master("local[4]")
             .config("spark.sql.shuffle.partitions", "8")
             .config("spark.ui.enabled", "false").getOrCreate())
    spark.sparkContext.setLogLevel("ERROR")

    base = spark.range(n).select(
        F.col("id").alias("doc_id"),
        F.sha2(F.col("id").cast("string"), 256).alias("text"),
        (F.col("id") % 1000).alias("bucket"))
    shapes = {
        "flat_strings": base,
        "embeddings": spark.range(n // 4).select(
            F.col("id").alias("doc_id"),
            F.array(*[F.rand(seed=i) for i in range(16)])
            .cast("array<float>").alias("emb")),
        "nullable_struct": base.select(
            "doc_id",
            F.when(F.col("doc_id") % 3 != 0, F.struct(
                F.col("text").alias("t"),
                F.col("bucket").alias("b"))).alias("meta")),
    }
    for shape, df in shapes.items():
        d = tempfile.mkdtemp(prefix=f"arrow_probe_{shape}_") + "/s"
        write_avro(df, d, shards=4, order_by="doc_id")
        pd_s = _time(lambda: read_avro(spark, d)
                     .agg(F.count("*")).collect(), reps)
        ar_s = _time(lambda: read_avro(spark, d, arrow=True)
                     .agg(F.count("*")).collect(), reps)
        # row-for-row equality on a slice (cheap spot check per shape)
        a = read_avro(spark, d).orderBy("doc_id").limit(200).collect()
        b = read_avro(spark, d, arrow=True).orderBy("doc_id") \
            .limit(200).collect()
        assert a == b, f"{shape}: arrow diverges from pandas"
        print(json.dumps({
            "kernel": f"avro_arrow_interchange_{shape}",
            "rows": df.count(),
            "pandas_s": round(pd_s, 3), "arrow_s": round(ar_s, 3),
            "speedup": round(pd_s / ar_s, 2)}))
    spark.stop()


if __name__ == "__main__":
    main()
