"""sf1 scale probe for the streaming table source and Delta interop —
extends the measured-scaling series (dedup r4, index r5, lakehouse r5,
zorder r6).

Claims under test (SCALE.md "Round-6 continuation"):
* `stream_table` snapshot cost is O(data) with per-file parallelism and
  O(manifest) planning — 10x rows should cost well under 10x wall on 32
  cores (tiny files at sf0.1 underuse the cores);
* the TAIL drain is O(new data) + fixed streaming-query startup — a 10x
  larger TABLE with the same-size append must cost ~the same;
* `export_delta` metadata is O(live files) and `mirror_delta` is
  O(changed files) — a 10x table with the same-size change must mirror
  in ~the same time.

Usage: python scripts/scale_probe_stream_delta.py [reps]
"""

import os
import sys
import tempfile
import time

from pyspark.sql import functions as F

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from dataingestion_spark.interop.delta import (  # noqa: E402
    export_delta, mirror_delta, read_delta,
)
from dataingestion_spark.session import get_spark  # noqa: E402
from dataingestion_spark.sinks import manifest_store as ms  # noqa: E402
from dataingestion_spark.streaming.table_source import stream_table  # noqa: E402


def main():
    reps = int(sys.argv[1]) if len(sys.argv) > 1 else 3
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    spark = get_spark("stream-delta-scale-probe", cpus=cpus,
                      shuffle_partitions=int(cpus),
                      driver_mem=os.environ.get("SPARK_DRIVER_MEM", "48g"))
    spark.sparkContext.setLogLevel("ERROR")

    docs = (spark.read.parquet("/root/testdata/sf0.1/documents.parquet")
            .select(F.col("doc_id").cast("string").alias("documentid"),
                    "lang", "n_chars"))
    tmp = tempfile.mkdtemp(prefix="sd_probe_")
    copies = spark.range(10).select(F.col("id").alias("copy"))
    big_dir = os.path.join(tmp, "docs_sf1")
    (docs.crossJoin(copies)
     .select(F.concat("documentid", F.lit("#"), "copy").alias("documentid"),
             "lang", "n_chars")
     .repartition(int(cpus))
     .write.mode("overwrite").parquet(big_dir))
    big = spark.read.parquet(big_dir)

    def run(fn):
        best = None
        for _ in range(reps):
            t0 = time.perf_counter()
            fn()
            dt = time.perf_counter() - t0
            best = dt if best is None else min(best, dt)
        return best

    # the appended slice is the SAME SIZE at both scales: O(new data)
    # claims are about the delta, not the table
    append_slice = docs.filter(F.col("doc_id") % 10 == 0) \
        .select(F.concat("documentid", F.lit("#a")).alias("documentid"),
                "lang", "n_chars")

    results = {}
    for label, base in (("sf0.1", docs), ("sf1", big)):
        t = os.path.join(tmp, f"t_{label.replace('.', '_')}")
        ms.write_table(base, t)
        n_files = sum(len(v) for v in ms.read_manifest(t)["buckets"].values())
        r = {"rows": base.count(), "files": n_files}

        def snapshot():
            root = tempfile.mkdtemp(prefix="sd_snap_")
            q = (stream_table(spark, t)
                 .writeStream.format("parquet")
                 .option("path", root + "/sink")
                 .option("checkpointLocation", root + "/ckpt")
                 .trigger(availableNow=True).start())
            q.awaitTermination()

        r["stream_snapshot"] = run(snapshot)

        # steady tail: drain snapshot once, then time append+drain
        root = tempfile.mkdtemp(prefix="sd_tail_")
        sink, ckpt = root + "/sink", root + "/ckpt"

        def drain():
            q = (stream_table(spark, t)
                 .writeStream.format("parquet").option("path", sink)
                 .option("checkpointLocation", ckpt)
                 .trigger(availableNow=True).start())
            q.awaitTermination()

        drain()
        seq = [0]

        def tail():
            seq[0] += 1
            ms.append_table(
                append_slice.select(
                    F.concat("documentid", F.lit(f"#{seq[0]}"))
                    .alias("documentid"), "lang", "n_chars"), t)
            drain()

        r["append_tail"] = run(tail)

        dst = os.path.join(tmp, f"delta_{label.replace('.', '_')}")
        t_exp0 = time.perf_counter()
        export_delta(spark, t, dst, mode="copy")
        r["delta_export"] = time.perf_counter() - t_exp0

        def mirror():
            seq[0] += 1
            ms.append_table(
                append_slice.select(
                    F.concat("documentid", F.lit(f"#m{seq[0]}"))
                    .alias("documentid"), "lang", "n_chars"), t)
            mirror_delta(spark, t, dst)

        r["mirror_incr"] = run(mirror)
        t_rd0 = time.perf_counter()
        read_delta(spark, dst).count()
        r["delta_read_count"] = time.perf_counter() - t_rd0
        results[label] = r
        print(label, {k: (round(v, 3) if isinstance(v, float) else v)
                      for k, v in r.items()}, flush=True)

    a, b = results["sf0.1"], results["sf1"]
    print("\nratios sf1/sf0.1 (rows x%.1f):" % (b["rows"] / a["rows"]))
    for k in ("stream_snapshot", "append_tail", "delta_export",
              "mirror_incr", "delta_read_count"):
        print(f"  {k}: {b[k] / a[k]:.2f}x")
    spark.stop()


if __name__ == "__main__":
    main()
