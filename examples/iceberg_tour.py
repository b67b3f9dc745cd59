"""Tour of the Iceberg interop (interop/iceberg.py): a curated corpus
published as an Apache Iceberg v2 table any engine can read, then kept
fresh by incremental mirroring —

  write_table → export_iceberg (manifests with field-id-keyed bounds)
  → read_iceberg (+bounds pruning) → deletes shipped as EQUALITY
  DELETE files (zero data rewrite) → append + mirror (one snapshot,
  unchanged manifests carried by reference) → time travel → vacuum.

Run: python examples/iceberg_tour.py [sf_dir]
(defaults to /root/testdata/sf0.001)
"""

import json
import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    from dataingestion_spark.interop.iceberg import (
        export_iceberg, mirror_iceberg, read_iceberg, vacuum_iceberg,
    )
    from dataingestion_spark.session import get_spark
    from dataingestion_spark.sinks import manifest_store as ms

    spark = get_spark("iceberg-tour", cpus="8", shuffle_partitions=8)
    spark.sparkContext.setLogLevel("ERROR")
    docs = (spark.read.parquet(f"{sf_dir}/documents.parquet")
            .select(F.col("doc_id").cast("string").alias("documentid"),
                    "text", "lang",
                    F.col("n_chars").cast("long").alias("n_chars")))
    tmp = tempfile.mkdtemp(prefix="iceberg_tour_")
    table = os.path.join(tmp, "corpus")
    ms.write_table(docs, table)
    n0 = docs.count()

    # one-shot export: a self-contained Iceberg table, identity-
    # partitioned on the store's bucketing column
    ice = os.path.join(tmp, "iceberg")
    export_iceberg(spark, table, ice, mode="copy",
                   partition_by=("doc_bucket",))
    back = read_iceberg(spark, ice)
    assert back.count() == n0
    meta = json.load(open(os.path.join(ice, "metadata",
                                       "v1.metadata.json")))
    print(f"exported {n0} docs as Iceberg v2: snapshot "
          f"{meta['current-snapshot-id']}, "
          f"{len(meta['schemas'][0]['fields'])} columns with field-ids, "
          f"identity-partitioned on doc_bucket")

    # partition pruning straight off the manifests: the identity tuple
    # is an exact fact, so one bucket's predicate scans one bucket's
    # files; an out-of-range bounds probe plans ZERO scans
    full_files = len(set(back.inputFiles()))
    one = read_iceberg(spark, ice, where=("doc_bucket", "==", 3))
    zero = read_iceberg(spark, ice, where=("documentid", ">", "￿"))
    print(f"where=(doc_bucket == 3): plans "
          f"{len(set(one.inputFiles()))}/{full_files} file scans; "
          f"out-of-range bounds probe: "
          f"{len(set(zero.inputFiles()))}/{full_files}")

    # continuous mirror: deletes ship as equality delete files
    mirror = os.path.join(tmp, "mirror")
    v = mirror_iceberg(spark, table, mirror, dv_mode="equality")
    doomed = [r[0] for r in docs.limit(5).collect()]
    ms.delete_documents(spark, table, doomed)
    v = mirror_iceberg(spark, table, mirror, dv_mode="equality")
    live = read_iceberg(spark, mirror)
    assert live.count() == n0 - 5
    print(f"\nmirror v{v}: 5 deletes shipped as an equality delete "
          f"file (no data rewrite) — {live.count()} live rows")

    # append new docs; unchanged manifests carry by reference
    extra = docs.limit(30).select(
        (F.col("documentid").cast("long") + 10 ** 6).cast("string")
        .alias("documentid"), "text", "lang", "n_chars")
    ms.append_table(extra, table)
    v = mirror_iceberg(spark, table, mirror, dv_mode="equality")
    snaps = json.load(open(os.path.join(
        mirror, "metadata", f"v{v}.metadata.json")))["snapshots"]
    print(f"mirror v{v}: +30 docs in one snapshot "
          f"({len(snaps)} snapshots retained)")

    # maintenance: merge the per-sync manifests (metadata-only)
    from dataingestion_spark.interop.iceberg import compact_manifests
    cv = compact_manifests(mirror)
    assert read_iceberg(spark, mirror).count() == n0 - 5 + 30
    print(f"compact_manifests → v{cv}: one manifest per content "
          "class, rows unchanged")

    # time travel, then expire history
    snaps = json.load(open(os.path.join(
        mirror, "metadata", f"v{cv}.metadata.json")))["snapshots"]
    first = snaps[0]["snapshot-id"]
    n_then = read_iceberg(spark, mirror, snapshot_id=first).count()
    gone = vacuum_iceberg(mirror, keep_snapshots=1)
    n_now = read_iceberg(spark, mirror).count()
    print(f"time travel to snapshot {first}: {n_then} rows; "
          f"vacuum expired {len(snaps) - 1} snapshots, "
          f"removed {len(gone)} files; current read: {n_now} rows")
    assert n_then == n0 and n_now == n0 - 5 + 30

    # renamed columns: files keep the frozen physical spelling; the
    # export records the rename (schema history + name-mapping) and
    # the reader resolves it — values surface under the CURRENT name
    ms.rename_column(table, "lang", "language")
    renamed_dst = os.path.join(os.path.dirname(mirror), "ice_renamed")
    export_iceberg(spark, table, renamed_dst, mode="copy",
                   dv_mode="equality")
    back = read_iceberg(spark, renamed_dst)
    assert "language" in back.columns and "lang" not in back.columns
    langs = back.select("language").distinct().count()
    pruned = read_iceberg(spark, renamed_dst,
                          where=[("n_chars", ">=", 0),
                                 ("n_chars", "<=", 10 ** 9)])
    assert pruned.count() == back.count()
    print(f"renamed lang→language, re-exported: {back.count()} rows, "
          f"{langs} languages, resolved via schema history")

    print("\niceberg tour complete ✓")
    spark.stop()


if __name__ == "__main__":
    main()
