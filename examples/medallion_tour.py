"""Medallion pipeline tour: bronze -> silver -> gold, all incremental.

The standard lakehouse shape for a continuously-fed training corpus:

* **bronze** — raw document batches land as append commits on a manifest
  table (the ingest side; in production this is the ingestion pipeline's
  sink, here three synthetic batches with overlapping ids).
* **silver** — a Structured Streaming job TAILS bronze through
  ``stream_table`` (streaming/table_source.py — commit versions as
  checkpointed offsets), cleans/filters each micro-batch with plain
  DataFrame ops, and applies it as an exactly-once MERGE into the silver
  table (``merge_table`` inside ``foreachBatch``, ``(app, epoch)`` txn
  guard). Re-running the stream after new bronze commits processes ONLY
  those commits — O(new data), never O(table).
* **gold** — an incrementally-maintained aggregate view over silver
  (sinks/matview.py): per-language row counts and token sums, refreshed
  in O(delta).

Run: python examples/medallion_tour.py
"""

import os
import shutil
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from dataingestion_spark.session import get_spark
from dataingestion_spark.sinks import manifest_store as ms
from dataingestion_spark.sinks import matview
from dataingestion_spark.streaming.table_source import stream_table


def batch(spark, lo, hi, rev):
    """Synthetic raw docs; ids overlap across batches (rev bumps text)."""
    return spark.range(lo, hi).select(
        F.col("id").cast("string").alias("documentid"),
        F.concat(F.lit(f"rev{rev} body text for doc "),
                 F.col("id")).alias("text"),
        F.when(F.col("id") % 3 == 0, "en").otherwise("de").alias("lang"),
    )


def run_silver_job(spark, bronze, silver, ckpt):
    """One availableNow pass: tail bronze commits, clean, merge upsert."""

    def apply_batch(df, epoch):
        cleaned = (
            df.withColumn("text", F.trim("text"))
            .withColumn("n_tokens", F.size(F.split("text", r"\s+")))
            .filter(F.col("n_tokens") >= 3)  # quality gate
            .select("documentid", "text", "lang", "n_tokens")
        )
        if cleaned.isEmpty():
            return
        ms.merge_table(cleaned, silver, txn=("medallion-silver", epoch))

    q = (
        stream_table(spark, bronze)
        .writeStream.foreachBatch(apply_batch)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()


def main():
    spark = get_spark("medallion_tour", cpus=8)
    root = tempfile.mkdtemp(prefix="medallion_")
    bronze, silver = root + "/bronze", root + "/silver"
    gold, ckpt = root + "/gold", root + "/ckpt"
    try:
        # -- bronze: two initial raw batches land as commits
        ms.write_table(batch(spark, 0, 400, rev=1), bronze)
        ms.append_table(batch(spark, 400, 700, rev=1), bronze)
        print(f"bronze v{ms.current_version(bronze)}: "
              f"{ms.read_table(spark, bronze).count()} raw rows")

        # -- silver: snapshot batch + merge (first stream run)
        run_silver_job(spark, bronze, silver, ckpt)
        n1 = ms.read_table(spark, silver).count()
        print(f"silver v{ms.current_version(silver)}: {n1} cleaned rows")
        assert n1 == 700, n1

        # -- gold: first refresh is full, as expected
        mode = matview.refresh(spark, silver, gold, ["lang"],
                               [("n_tokens", "sum"), ("documentid", "count")])
        print(f"gold refresh #1: {mode}")
        assert mode == "full", mode

        # -- more bronze lands: overlapping ids get rev2 text (updates)
        #    plus genuinely new documents
        ms.append_table(batch(spark, 600, 900, rev=2), bronze)
        run_silver_job(spark, bronze, silver, ckpt)  # processes ONLY v2
        sv = ms.read_table(spark, silver)
        n2 = sv.count()
        rev2 = sv.filter(F.col("text").startswith("rev2")).count()
        print(f"silver after tail: {n2} rows, {rev2} updated to rev2")
        assert n2 == 900 and rev2 == 300, (n2, rev2)

        # -- gold absorbs the churn incrementally (merge = non-append
        #    commit, so the view recomputes or folds the change feed
        #    depending on the spec; count/sum specs fold)
        mode = matview.refresh(spark, silver, gold, ["lang"],
                               [("n_tokens", "sum"), ("documentid", "count")])
        view = matview.read_view(spark, gold)
        print(f"gold refresh #2: {mode}")
        view.show()
        total = view.agg(F.sum("n_rows")).collect()[0][0]
        assert total == 900, total

        # -- exactly-once: re-running the stream with no new bronze
        #    commits changes nothing
        v_before = ms.current_version(silver)
        run_silver_job(spark, bronze, silver, ckpt)
        assert ms.current_version(silver) == v_before
        print("idempotent re-run OK (no new commits, no new version)")
        print("medallion tour PASSED")
    finally:
        shutil.rmtree(root, ignore_errors=True)
        spark.stop()


if __name__ == "__main__":
    main()
