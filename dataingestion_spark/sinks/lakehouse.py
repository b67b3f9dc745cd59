"""Delta Lake backend for the vector table — same contract as
``manifest_store`` (versioned commits, O(changed-data) replace, time
travel), delegated to a transactional table format when its jars are on
the classpath.

The manifest store (``manifest_store.py``) IS the design for plain
parquet; this module is the drop-in swap it was designed for (see its
module docstring). On a cluster where Delta Lake is provisioned
(``io.delta:delta-spark`` jars + the SQL extension), these writers give
the same semantics with production-grade concurrency: optimistic commits
arbitrated by the log store instead of our single-writer `_CURRENT`
rename, vacuum with retention checks, and streaming reads of the change
feed for free.

Everything is gated behind a capability probe — this image ships no
Delta jars, so every entry point raises :class:`DeltaUnavailable` with
the exact provisioning hint, and the pure helpers (predicate builder,
session options) are unit-tested offline.

Reference parity: replace-by-documentid mirrors
``VectorStoreWriter.cs:76-108`` insert-before-delete — a single
``replaceWhere`` overwrite commit is atomic, so readers never observe
the gap between delete and insert at all.
"""

from __future__ import annotations

from typing import List, Optional, Sequence

from pyspark.sql import DataFrame, SparkSession

__all__ = [
    "DeltaUnavailable",
    "delta_available",
    "delta_session_builder_options",
    "replace_predicate",
    "write_vector_table_delta",
    "incremental_replace_delta",
    "read_vector_table_delta",
    "vacuum_delta",
]


class DeltaUnavailable(RuntimeError):
    """Raised when a Delta entry point runs without the Delta jars."""

    def __init__(self) -> None:
        super().__init__(
            "Delta Lake is not on this session's classpath. Provision it "
            "with spark.jars.packages=io.delta:delta-spark_2.13:<version> "
            "plus the configs from delta_session_builder_options(), or use "
            "the plain-parquet manifest store (sinks.manifest_store), which "
            "implements the same contract without extra jars."
        )


def delta_session_builder_options() -> dict:
    """The two session configs Delta requires, for the cluster that has
    the jars. Pure data — safe to call anywhere."""
    return {
        "spark.sql.extensions": "io.delta.sql.DeltaSparkSessionExtension",
        "spark.sql.catalog.spark_catalog":
            "org.apache.spark.sql.delta.catalog.DeltaCatalog",
    }


def delta_available(spark: SparkSession) -> bool:
    """True iff the Delta core classes are loadable in this JVM."""
    try:
        spark._jvm.java.lang.Class.forName(  # type: ignore[union-attr]
            "org.apache.spark.sql.delta.DeltaLog"
        )
        return True
    except Exception:
        return False


def _require(spark: SparkSession) -> None:
    if not delta_available(spark):
        raise DeltaUnavailable()


def _sql_quote(s: str) -> str:
    return "'" + s.replace("\\", "\\\\").replace("'", "\\'") + "'"


def replace_predicate(doc_ids: Sequence[str],
                      buckets: Optional[Sequence[int]] = None) -> str:
    """The ``replaceWhere`` predicate for replace-by-documentid.

    Leading with the ``doc_bucket`` partition term makes the overwrite
    prune to the touched partitions at planning time (partition columns
    are in the Delta log, no file listing); the ``documentid`` term keeps
    untouched documents that share a bucket. Same O(changed-buckets)
    shape as ``manifest_store.incremental_replace``.
    """
    if not doc_ids:
        raise ValueError("replace_predicate needs at least one documentid")
    parts = []
    if buckets:
        parts.append(
            "doc_bucket IN (%s)" % ", ".join(str(int(b)) for b in sorted(set(buckets)))
        )
    parts.append(
        "documentid IN (%s)" % ", ".join(_sql_quote(d) for d in sorted(set(doc_ids)))
    )
    return " AND ".join(parts)


def write_vector_table_delta(records: DataFrame, path: str) -> None:
    """Full-table write, partitioned by ``doc_bucket`` (the same layout
    key as the parquet writers, so switching backends keeps locality)."""
    _require(records.sparkSession)
    (records.write.format("delta").mode("overwrite")
     .partitionBy("doc_bucket").save(path))


def incremental_replace_delta(records: DataFrame, path: str) -> None:
    """Replace-by-documentid in ONE atomic commit via arbitrary
    ``replaceWhere``: rows matching the predicate are deleted and the new
    rows inserted in the same transaction — no reader ever sees the
    insert-before-delete window the reference has to order by hand."""
    spark = records.sparkSession
    _require(spark)
    # two actions consume records (key collect + write) — persist so the
    # upstream pipeline lineage runs once, not twice
    records.persist()
    try:
        keys = [
            (r["documentid"], r["doc_bucket"])
            for r in records.select("documentid", "doc_bucket").distinct().collect()
        ]
        if not keys:
            return
        pred = replace_predicate([k[0] for k in keys], [k[1] for k in keys])
        (records.write.format("delta").mode("overwrite")
         .option("replaceWhere", pred).partitionBy("doc_bucket").save(path))
    finally:
        records.unpersist()


def read_vector_table_delta(spark: SparkSession, path: str,
                            version: Optional[int] = None) -> DataFrame:
    """Snapshot read; ``version`` time-travels like
    ``manifest_store.read_table(version=...)``."""
    _require(spark)
    reader = spark.read.format("delta")
    if version is not None:
        reader = reader.option("versionAsOf", int(version))
    return reader.load(path)


def vacuum_delta(spark: SparkSession, path: str,
                 retain_hours: float = 168.0) -> None:
    _require(spark)
    from delta.tables import DeltaTable  # gated: ships with the jars

    DeltaTable.forPath(spark, path).vacuum(retain_hours)
