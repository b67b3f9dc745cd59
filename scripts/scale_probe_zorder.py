"""sf1 scale probe for the round-6 lakehouse ops (zorder / clone /
restore) — extends the measured-scaling series (scale_probe_dedup r4,
scale_probe_index r5, scale_probe_lakehouse r5).

Kernels, at sf0.1 events (100k rows) vs a deterministic 10x corpus:

* zorder_optimize — the O(data) clustered rewrite (bucket repartition +
  per-slice emit; expect ~linear wall),
* zorder_box_read — 2-d box read on the clustered table; the CANDIDATE
  FILE FRACTION should stay ~constant (quadrant files only) and wall
  should grow with the matching-row count, not the corpus,
* clone_meta / restore_meta — shallow clone and rollback; both are
  O(manifest) commits, so wall must stay ~FLAT at 10x data. This
  flatness is the entire point of the design.

Prints one JSON line per kernel; paste into SCALE.md.

Usage: python scripts/scale_probe_zorder.py [reps]
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
    spark = get_spark("zorder-scale-probe", cpus=cpus,
                      shuffle_partitions=int(cpus),
                      driver_mem=os.environ.get("SPARK_DRIVER_MEM", "48g"))
    spark.sparkContext.setLogLevel("ERROR")

    ev = (spark.read.parquet("/root/testdata/sf0.1/events.parquet")
          .select(F.col("event_id").cast("string").alias("documentid"),
                  F.col("user_id").cast("long").alias("user_id"),
                  "value"))
    tmp = tempfile.mkdtemp(prefix="z_probe_")
    big_dir = os.path.join(tmp, "events_sf1")
    copies = spark.range(10).select(F.col("id").alias("copy"))
    (ev.crossJoin(copies)
     .select(F.concat("documentid", F.lit("#"), "copy").alias("documentid"),
             # shift ids so the value surface stays realistic per copy
             (F.col("user_id") + F.col("copy") * 1000).alias("user_id"),
             "value")
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

    results = {}
    for label, df, ubound in (("sf0.1", ev, 150), ("sf1", big, 10150)):
        table = os.path.join(tempfile.mkdtemp(prefix=f"z_{label}_"), "t")
        ms.write_table(df, table)

        t_opt = run(lambda: ms.optimize_zorder(
            spark, table, ["user_id", "value"], files_per_bucket=8))
        conds = [("user_id", "<", ubound // 5), ("value", ">=", 100.0)]
        _, chosen = ms.candidate_files_where(table, conds)
        n_cand = sum(len(v) for v in chosen.values())
        n_files = ms.table_stats(table)["n_files"]
        t_read = run(lambda: ms.read_table_where(spark, table, conds)
                     .write.format("noop").mode("overwrite").save())

        def clone():
            dst = os.path.join(tempfile.mkdtemp(prefix="zc_"), "t")
            ms.clone_table(table, dst)
            return dst

        t_clone = run(clone)
        dst = clone()
        ms.append_table(df.limit(10), dst)
        t_restore = run(lambda: ms.restore_table(dst, 0))

        results[label] = {
            "optimize_sec": round(t_opt, 2),
            "box_read_sec": round(t_read, 2),
            "candidate_files": f"{n_cand}/{n_files}",
            "clone_sec": round(t_clone, 3),
            "restore_sec": round(t_restore, 3),
        }

    a, b = results["sf0.1"], results["sf1"]
    for k in ("optimize_sec", "box_read_sec", "clone_sec", "restore_sec"):
        print(json.dumps({
            "kernel": k.rsplit("_sec", 1)[0],
            "sf0.1_sec": a[k], "sf1_sec": b[k],
            "ratio_at_10x_rows": round(b[k] / a[k], 2) if a[k] else None,
        }))
    print(json.dumps({"candidates": {"sf0.1": a["candidate_files"],
                                     "sf1": b["candidate_files"]}}))


if __name__ == "__main__":
    main()
