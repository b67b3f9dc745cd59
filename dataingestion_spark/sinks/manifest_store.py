"""Manifest-based versioned vector table: O(changed-buckets) incremental
replace on plain parquet.

The plain-parquet replace in ``vector_store.py`` rewrites the whole table.
This store removes that limit with the core idea of transactional table
formats (Delta/Iceberg), reduced to what the replace-by-document contract
needs:

* data files live under ``<table>/files/`` named ``b{bucket}-{uuid}.parquet``,
  one or more per doc_bucket (bucket = crc32(documentid) % N_BUCKETS, the
  same layout key the writer already uses);
* a manifest ``manifest-{version}.json`` lists the files of each bucket for
  that version; ``_CURRENT`` names the live manifest and is swapped with an
  atomic rename;
* incremental replace reads ONLY the buckets containing replaced documents,
  anti-joins the old rows, writes fresh files for those buckets, and commits
  a manifest that reuses every untouched file — old versions stay readable
  (time travel) until vacuumed.

Crash-safety ordering matches the reference's insert-before-delete
(``VectorStoreWriter.cs:76-108``): new files are fully written before the
manifest swap; nothing is deleted at commit time (``vacuum`` is explicit).
"""

from __future__ import annotations

import json
import os
import shutil
import uuid
from typing import Dict, List, Optional

from pyspark.sql import DataFrame, functions as F

from .vector_store import N_BUCKETS  # single source for the layout constant

_CURRENT = "_CURRENT"


def _bucket_col() -> F.Column:
    # must stay identical to vector_store.build_vector_records' doc_bucket
    # and get_document's zlib.crc32 — all three derive from N_BUCKETS above
    return (F.crc32(F.col("documentid").cast("binary")) % N_BUCKETS).cast("int")


def _manifest_path(table: str, version: int) -> str:
    return os.path.join(table, f"manifest-{version:06d}.json")


def current_version(table: str) -> Optional[int]:
    try:
        with open(os.path.join(table, _CURRENT)) as fh:
            return int(fh.read().strip())
    except FileNotFoundError:
        return None


def read_manifest(table: str, version: Optional[int] = None) -> Dict:
    v = current_version(table) if version is None else version
    if v is None:
        raise FileNotFoundError(f"no committed version in {table}")
    with open(_manifest_path(table, v)) as fh:
        return json.load(fh)


class ConcurrentWriteError(RuntimeError):
    """Another writer committed since this transaction read the table."""


def _commit(table: str, version: int, buckets: Dict[str, List[str]],
            expected_current: Optional[int] = None) -> int:
    """Optimistic-concurrency commit: the manifest file itself is the lock —
    ``open(..., 'x')`` fails if a racing writer already claimed that version.

    An existing manifest while _CURRENT still equals ``expected_current`` is
    an ORPHAN from a crashed writer (created but never swapped in); the
    commit skips past it to the next free version number instead of wedging
    the table — version numbers may therefore have gaps. Returns the version
    actually committed."""
    while True:
        if expected_current is not None and current_version(table) != expected_current:
            raise ConcurrentWriteError(
                f"table advanced past version {expected_current}; retry the write"
            )
        try:
            with open(_manifest_path(table, version), "x") as fh:
                json.dump({"version": version, "buckets": buckets}, fh)
            break
        except FileExistsError:
            if current_version(table) != expected_current:
                raise ConcurrentWriteError(
                    f"version {version} was committed concurrently; retry the write"
                ) from None
            version += 1  # orphaned manifest from a crashed writer — skip it
    tmp = os.path.join(table, f"_CURRENT.{uuid.uuid4().hex[:8]}")
    with open(tmp, "w") as fh:
        fh.write(str(version))
    os.replace(tmp, os.path.join(table, _CURRENT))  # atomic swap
    return version


def _write_bucket_files(records: DataFrame, table: str, token: str) -> Dict[str, List[str]]:
    """Write records (must carry doc_bucket) grouped per bucket; returns
    bucket -> new file names. One parquet file per (bucket, write) — the
    writer shuffles on doc_bucket so each file is written by one task."""
    staging = os.path.join(table, "staging", token)
    # partition by a shadow copy: partition values live in directory names,
    # not the data files, and readers still need doc_bucket as a column
    (records.withColumn("_pb", F.col("doc_bucket"))
        .repartition("_pb")
        .write.mode("overwrite").partitionBy("_pb").parquet(staging))
    out: Dict[str, List[str]] = {}
    files_dir = os.path.join(table, "files")
    os.makedirs(files_dir, exist_ok=True)
    for entry in sorted(os.listdir(staging)):
        if not entry.startswith("_pb="):
            continue
        bucket = entry.split("=", 1)[1]
        for i, part in enumerate(sorted(os.listdir(os.path.join(staging, entry)))):
            if not part.endswith(".parquet"):
                continue
            name = f"b{bucket}-{token}-{i}.parquet"
            os.replace(os.path.join(staging, entry, part), os.path.join(files_dir, name))
            out.setdefault(bucket, []).append(name)
    # remove only THIS write's staging dir — the parent is shared with any
    # concurrent writers whose in-flight data must survive
    shutil.rmtree(staging, ignore_errors=True)
    return out


def write_table(records: DataFrame, table: str) -> int:
    """Full (over)write as version 0... n+1; returns the committed version."""
    from .vector_store import _require_local_path

    _require_local_path(table, "manifest_store")
    os.makedirs(table, exist_ok=True)
    records = records.withColumn("doc_bucket", _bucket_col())
    cv = current_version(table)
    token = uuid.uuid4().hex[:8]
    buckets = _write_bucket_files(records, table, token)
    version = 0 if cv is None else cv + 1
    return _commit(table, version, buckets, expected_current=cv)


def read_table(spark, table: str, version: Optional[int] = None) -> DataFrame:
    manifest = read_manifest(table, version)
    paths = [
        os.path.join(table, "files", name)
        for names in manifest["buckets"].values()
        for name in names
    ]
    if not paths:
        raise FileNotFoundError(f"version {manifest['version']} of {table} is empty")
    return spark.read.parquet(*paths)


def incremental_replace(records: DataFrame, table: str) -> int:
    """Replace-by-documentid touching only the buckets that contain replaced
    documents; every other bucket's files are reused as-is. Returns the new
    version."""
    spark = records.sparkSession
    if current_version(table) is None:
        return write_table(records, table)

    records = records.withColumn("doc_bucket", _bucket_col())
    manifest = read_manifest(table)
    affected = sorted(
        str(r[0]) for r in records.select("doc_bucket").distinct().collect()
    )
    old_paths = [
        os.path.join(table, "files", name)
        for b in affected
        for name in manifest["buckets"].get(b, [])
    ]
    incoming_docs = records.select("documentid").distinct()
    if old_paths:
        survivors = (
            spark.read.parquet(*old_paths)
            .join(F.broadcast(incoming_docs), "documentid", "left_anti")
        )
        merged = survivors.unionByName(records, allowMissingColumns=True)
    else:
        merged = records

    token = uuid.uuid4().hex[:8]
    new_buckets = _write_bucket_files(merged, table, token)
    buckets = {
        b: names for b, names in manifest["buckets"].items() if b not in affected
    }
    buckets.update(new_buckets)
    return _commit(table, manifest["version"] + 1, buckets,
                   expected_current=manifest["version"])


def append_table(records: DataFrame, table: str) -> int:
    """Append-only commit for documents known to be new: adds files to the
    affected buckets WITHOUT reading or rewriting existing ones — O(batch)
    regardless of table size. This is what accumulates small files per
    bucket; run :func:`compact` periodically."""
    if current_version(table) is None:
        return write_table(records, table)
    records = records.withColumn("doc_bucket", _bucket_col())
    manifest = read_manifest(table)
    token = uuid.uuid4().hex[:8]
    new_buckets = _write_bucket_files(records, table, token)
    buckets = {b: list(names) for b, names in manifest["buckets"].items()}
    for b, names in new_buckets.items():
        buckets.setdefault(b, []).extend(names)
    return _commit(table, manifest["version"] + 1, buckets,
                   expected_current=manifest["version"])


def compact(spark, table: str, max_files_per_bucket: int = 4) -> int:
    """Rewrite buckets that accumulated more than ``max_files_per_bucket``
    files (the small-file growth of per-batch streaming commits) into one
    file each; untouched buckets keep their files by reference. Commits a
    new version; returns it (or the current one if nothing to compact)."""
    manifest = read_manifest(table)
    to_compact = {
        b: names for b, names in manifest["buckets"].items()
        if len(names) > max_files_per_bucket
    }
    if not to_compact:
        return manifest["version"]
    paths = [
        os.path.join(table, "files", n) for names in to_compact.values() for n in names
    ]
    merged = spark.read.parquet(*paths)
    token = "c" + uuid.uuid4().hex[:7]
    new_buckets = _write_bucket_files(merged, table, token)
    buckets = {
        b: names for b, names in manifest["buckets"].items() if b not in to_compact
    }
    buckets.update(new_buckets)
    return _commit(table, manifest["version"] + 1, buckets,
                   expected_current=manifest["version"])


def vacuum(table: str, keep_versions: int = 1) -> List[str]:
    """Delete files unreachable from the newest ``keep_versions`` manifests
    and drop manifests older than them. Versions ABOVE the live one (a
    racing writer's in-flight commit, or a crashed writer's orphan) are left
    untouched, files included — vacuum must never destroy a commit that may
    be about to win the _CURRENT swap."""
    live = current_version(table)
    if live is None:
        return []
    keep = set()
    kept_versions = set(range(max(0, live - keep_versions + 1), live + 1))
    on_disk = [
        int(e.split("-")[1].split(".")[0])
        for e in os.listdir(table) if e.startswith("manifest-")
    ]
    protected = kept_versions | {v for v in on_disk if v > live}
    for v in sorted(protected):
        try:
            m = read_manifest(table, v)
        except (FileNotFoundError, json.JSONDecodeError):
            continue  # half-written orphan: keeps nothing, stays on disk
        for names in m["buckets"].values():
            keep.update(names)
    removed = []
    files_dir = os.path.join(table, "files")
    for name in os.listdir(files_dir):
        if name not in keep:
            os.remove(os.path.join(files_dir, name))
            removed.append(name)
    for v in on_disk:
        if v not in protected:
            os.remove(_manifest_path(table, v))
    return removed
