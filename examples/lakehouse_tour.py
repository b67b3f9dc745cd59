"""Lakehouse tour: the manifest store's transactional surface end to end.

    python examples/lakehouse_tour.py

Walks one table through write → append → conditional MERGE → change
feed → incrementally-maintained aggregate view → time travel → compact
→ vacuum, printing what each commit cost (files touched) along the way.
Everything is plain parquet + JSON manifests — no table-format jars.
"""

import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from dataingestion_spark.session import get_spark
from dataingestion_spark.sinks import manifest_store as ms
from dataingestion_spark.sinks import matview as mv


def n_files(table):
    m = ms.read_manifest(table)
    return sum(len(v) for v in m["buckets"].values())


def main():
    spark = get_spark("lakehouse_tour", cpus=8)
    work = tempfile.mkdtemp(prefix="lakehouse_tour_")
    table, view = f"{work}/events_docs", f"{work}/by_lang"

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet").select(
        F.col("doc_id").cast("string").alias("documentid"),
        "text", "lang", "n_chars",
    )

    v0 = ms.write_table(docs.filter(F.col("documentid").cast("long") < 300), table)
    print(f"v{v0}: initial write, {n_files(table)} files")

    v1 = ms.append_table(
        docs.filter(F.col("documentid").cast("long").between(300, 399)), table
    )
    print(f"v{v1}: append (no old file rewritten), {n_files(table)} files")

    src = (
        docs.filter(F.col("documentid").cast("long") < 450)
        .withColumn("n_chars", F.col("n_chars") + 1)
        .withColumn("text", F.concat(F.lit("v2 "), "text"))
    )
    v2 = ms.merge_table(src, table, matched_condition="target.n_chars % 2 = 0")
    print(f"v{v2}: MERGE (update-if-stored-even + insert), one DV commit")

    feed = ms.table_diff(spark, table, v1, v2)
    print("  change feed v1->v2:",
          feed.groupBy("_change_type").count().orderBy("_change_type").collect())

    spec = (["lang"], [("n_chars", "count"), ("n_chars", "sum")])
    print("  view refresh #1:", mv.refresh(spark, table, view, *spec))
    ms.append_table(
        docs.filter(F.col("documentid").cast("long") >= 450), table
    )
    print("  view refresh #2:", mv.refresh(spark, table, view, *spec),
          "(only the appended files were scanned)")
    mv.read_view(spark, view).orderBy("lang").show()

    old = ms.read_table(spark, table, version=v0).count()
    new = ms.read_table(spark, table).count()
    print(f"time travel: v{v0} had {old} rows; live has {new}")

    # data skipping: per-column [min,max] recorded at write time prune the
    # file list before any footer is opened
    _, chosen = ms.candidate_files_where(table, [("n_chars", ">=", 300)])
    print("skipping-read candidates:",
          sum(len(v) for v in chosen.values()), "of", n_files(table), "files;",
          ms.read_table_where(spark, table, [("n_chars", ">=", 300)]).count(),
          "rows")

    # CDF-driven replication: a downstream replica applies only the feed
    replica = tempfile.mkdtemp(prefix="tour_replica_") + "/t"
    ms.sync_table(spark, table, replica)          # bootstrap
    ms.delete_documents(spark, table, ["7", "14"])
    ms.sync_table(spark, table, replica)          # applies just the deletes
    print("replica in sync:",
          ms.read_table(spark, replica).count()
          == ms.read_table(spark, table).count())

    ms.compact(spark, table, max_files_per_bucket=2)
    removed = ms.vacuum(table, keep_versions=1, min_file_age_seconds=0)
    print(f"compact+vacuum: {len(removed)} unreachable files removed, "
          f"{n_files(table)} live")

    # --- round-6 ops ---

    # CHECK constraint: a bad batch is rejected atomically
    ms.add_constraint(spark, table, "chars_nonneg", "n_chars >= 0")
    try:
        ms.append_table(
            docs.limit(3).withColumn("documentid",
                                     F.concat(F.lit("bad-"), "documentid"))
            .withColumn("n_chars", F.lit(-1)), table)
    except ms.ConstraintViolation as e:
        print("constraint rejected bad batch:", str(e)[:80], "...")

    # zero-copy branch: experiment on a clone, prod untouched
    dev = tempfile.mkdtemp(prefix="tour_dev_") + "/t"
    ms.clone_table(table, dev)
    import os as _os

    print("shallow clone: data files copied =",
          len(_os.listdir(_os.path.join(dev, "files"))))
    ms.delete_documents(spark, dev, ["20", "21", "22"])
    print("dev diverged:", ms.read_table(spark, dev).count(),
          "rows vs prod", ms.read_table(spark, table).count())

    # RESTORE: undo the dev deletes as a metadata-only commit
    ms.restore_table(dev, 0)
    print("dev restored:", ms.read_table(spark, dev).count(), "rows")

    # policy maintenance: metadata-only decisions, data moves on triggers
    rep = ms.maintain_table(spark, table, min_file_age_seconds=0)
    print("maintenance report:", rep["actions"] or "healthy, no-op")

    # --- round-6 continuation ops ---

    # SQL over the lakehouse: snapshot views + time travel in one query
    ms.register_table(spark, table, "prod")
    ms.register_table(spark, dev, "dev_v0", version=0)
    print("SQL join:", spark.sql(
        "SELECT COUNT(*) AS both FROM prod p JOIN dev_v0 d "
        "ON p.documentid = d.documentid").collect()[0].both, "shared ids")

    # metadata-answered aggregates: zero data IO on the clean path
    print("metadata COUNT/MIN/MAX:", ms.metadata_count(spark, table),
          ms.metadata_minmax(None, table, ["n_chars"])["n_chars"])

    # SCD Type 2 dimension: change-detected version histories
    from dataingestion_spark.sinks.scd import scd2_at, scd2_current, scd2_merge

    dim = tempfile.mkdtemp(prefix="tour_scd_") + "/dim"
    snap = docs.limit(20).select("documentid", "lang",
                                 F.lit(1.0).alias("effective_ts"))
    scd2_merge(snap, dim, tracked=["lang"])
    scd2_merge(snap.withColumn("lang", F.lit("zz"))
               .withColumn("effective_ts", F.lit(2.0))
               .filter(F.col("documentid").cast("long") % 4 == 0),
               dim, tracked=["lang"])
    print("SCD2: current rows =", scd2_current(spark, dim).count(),
          "| as-of t=1.5 =", scd2_at(spark, dim, 1.5).count(),
          "| history rows =", ms.read_table(spark, dim).count())


if __name__ == "__main__":
    main()
