"""Delta Lake protocol interop: export manifest tables, read Delta logs.

Implemented against the PUBLIC Delta transaction-log specification
(delta-io/delta PROTOCOL.md): a table is a directory of parquet data
files plus a ``_delta_log/`` of ordered JSON commits, each commit a list
of newline-delimited actions (``protocol``, ``metaData``, ``add``,
``remove``), optionally compacted into parquet checkpoints referenced by
``_last_checkpoint``. State reconstruction replays commits in version
order: the last ``metaData`` wins, ``add``/``remove`` are keyed by file
path.

* :func:`export_delta` — publish a manifest-store table
  (:mod:`..sinks.manifest_store`) as a Delta table any Delta reader
  (Spark+delta, DuckDB delta, polars, trino, …) can consume. Writes one
  commit with ``protocol`` (reader v1 / writer v2 — no reader-side
  features needed), ``metaData`` (the manifest's tracked Spark schema,
  verbatim, since Delta's ``schemaString`` IS Spark schema JSON), and
  one ``add`` per live data file carrying per-file
  ``numRecords``/``minValues``/``maxValues`` stats translated from the
  manifest — Delta readers data-skip on the same bounds the manifest
  store pruned with. Equality deletion vectors have no reader-v1
  representation, so live DVs are materialized first via
  :func:`..sinks.manifest_store.compact` (only DV-carrying buckets
  rewrite).

* :func:`read_delta` — a minimal Delta READER: replays JSON commits
  (resuming from the newest parquet checkpoint when ``_last_checkpoint``
  exists), reconstructs the live file set, and returns a DataFrame —
  partition columns are restored from ``partitionValues`` as typed
  literals per file group (Delta stores them only in the log, not the
  files). Tables requiring reader features this module does not
  implement (persistent deletion vectors, column mapping) raise with the
  feature named rather than returning wrong rows.

Scale: export is O(live files) driver-side metadata plus (in ``copy``
mode) a byte copy per file through the table's
:class:`~..sinks.data_backend.DataBackend`; ``shallow`` mode writes
absolute-URI ``add`` actions referencing the manifest table's files in
place — zero data movement, Delta's own shallow-clone representation.
Reading scans only live files, with partition groups unioned as separate
parquet scans.

The reference system has no table-format story at all (its sinks push to
vector stores, ``VectorStoreWriter.cs``); this is beyond-reference
surface motivated by lakehouse interchange: a 100 TB corpus curated
here should be consumable by any engine without a rewrite.
"""

from __future__ import annotations

import json
import os
import uuid
from typing import Dict, List, Optional, Tuple

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

__all__ = ["export_delta", "mirror_delta", "read_delta", "vacuum_delta"]

_LOG_DIR = "_delta_log"


def _commit_name(version: int) -> str:
    return f"{version:020d}.json"


def _spark_schema_from_manifest(meta: Dict) -> T.StructType:
    return T.StructType.fromJson({"type": "struct", "fields": meta["schema"]})


def _schema_string(meta: Dict) -> str:
    """metaData.schemaString for a manifest table: plain Spark schema
    JSON, plus per-field ``delta.columnMapping.id``/``physicalName``
    metadata when the table has renamed/dropped columns (its files carry
    frozen physical names — exactly Delta's columnMapping.mode=name)."""
    fields = meta["schema"]
    if meta.get("colmap") is None:
        return json.dumps({"type": "struct", "fields": fields})
    cm = meta["colmap"]
    out = []
    for i, f in enumerate(fields):
        md = dict(f.get("metadata") or {})
        md["delta.columnMapping.id"] = i + 1
        md["delta.columnMapping.physicalName"] = cm.get(f["name"], f["name"])
        out.append({**f, "metadata": md})
    return json.dumps({"type": "struct", "fields": out})


def _mapping_config(meta: Dict) -> Dict[str, str]:
    if meta.get("colmap") is None:
        return {}
    return {"delta.columnMapping.mode": "name",
            "delta.columnMapping.maxColumnId": str(len(meta["schema"]))}


def _delta_stats(file_stats: Optional[Dict]) -> Optional[str]:
    """Manifest per-file stats -> Delta's ``add.stats`` JSON string."""
    if not file_stats or "rows" not in file_stats:
        return None
    out: Dict = {"numRecords": int(file_stats["rows"])}
    mins: Dict = {}
    maxs: Dict = {}
    if "min" in file_stats:
        mins["documentid"] = file_stats["min"]
        maxs["documentid"] = file_stats["max"]
    for col, bounds in (file_stats.get("cols") or {}).items():
        try:
            lo, hi = bounds
        except (TypeError, ValueError):
            continue
        mins[col] = lo
        maxs[col] = hi
    if mins:
        out["minValues"] = mins
        out["maxValues"] = maxs
    return json.dumps(out)


def export_delta(spark: SparkSession, table: str, dst: str, *,
                 mode: str = "copy", version: Optional[int] = None,
                 apply_deletes: bool = True) -> str:
    """Publish a manifest table as a Delta Lake table at ``dst``.

    ``mode="copy"`` copies the live data files into ``dst`` (relative
    ``add`` paths — the exported table is self-contained and relocatable).
    ``mode="shallow"`` writes absolute-URI ``add`` actions pointing at
    the manifest table's files in place: zero bytes moved, but ``dst``
    is only valid while the source table's files live (vacuum the source
    and the export dangles — same contract as a Delta shallow clone).

    Live equality DVs are materialized first (``apply_deletes=True``
    compacts ONLY the DV-carrying buckets, a real commit on the source
    table); with ``apply_deletes=False`` a DV-carrying table raises.
    ``version`` exports a historical snapshot (time travel) — it must be
    DV-free, since compaction cannot rewrite history.

    Returns ``dst``. The export is itself a Delta commit log, so a later
    re-export to the same ``dst`` raises (version 0 exists) — export to
    fresh directories; continuous mirroring is :func:`..sinks
    .manifest_store.sync_table`'s job, on manifest tables.
    """
    from ..sinks import manifest_store as ms
    from ..sinks.data_backend import data_backend_for


    if mode not in ("copy", "shallow"):
        raise ValueError(f"mode must be 'copy' or 'shallow', got {mode!r}")
    manifest = ms.read_manifest(table, version)
    meta = ms._manifest_meta(manifest)
    has_dvs = any(
        meta["deletes"].get(b) for b in manifest["buckets"]
        if manifest["buckets"].get(b))
    if has_dvs:
        if not apply_deletes or version is not None:
            raise ValueError(
                "table carries live deletion vectors, which have no Delta "
                "reader-v1 representation; run compact() first or export "
                "the current version with apply_deletes=True")
        ms.compact(spark, table, max_files_per_bucket=10 ** 9)
        manifest = ms.read_manifest(table)
        meta = ms._manifest_meta(manifest)

    schema = _spark_schema_from_manifest(meta)
    src_be = data_backend_for(table)
    dst_be = data_backend_for(dst)
    log_dir = f"{dst.rstrip('/')}/{_LOG_DIR}"
    if dst_be.read_bytes(f"{log_dir}/{_commit_name(0)}") is not None:
        raise FileExistsError(f"{dst} already holds a Delta log")
    dst_be.ensure_dir(dst.rstrip("/"))
    dst_be.ensure_dir(log_dir)

    import time as _time

    now_ms = int(_time.time() * 1000)
    mapped = meta.get("colmap") is not None
    actions: List[str] = [
        json.dumps({"protocol": (
            {"minReaderVersion": 2, "minWriterVersion": 5} if mapped
            else {"minReaderVersion": 1, "minWriterVersion": 2})}),
        json.dumps({"metaData": {
            "id": str(uuid.uuid4()),
            "format": {"provider": "parquet", "options": {}},
            "schemaString": _schema_string(meta),
            "partitionColumns": [],
            "configuration": _mapping_config(meta),
            "createdTime": now_ms,
        }}),
    ]
    for bucket in sorted(manifest["buckets"], key=int):
        for name in manifest["buckets"][bucket]:
            src_path = (meta["ext"].get(name)
                        or ms._join(table, "files", name))
            if mode == "copy":
                data = src_be.read_bytes(src_path)
                if data is None:
                    raise FileNotFoundError(src_path)
                dst_be.write_bytes(f"{dst.rstrip('/')}/{name}", data)
                path, size = name, len(data)
            else:
                abs_path = os.path.abspath(src_path) \
                    if "://" not in src_path else src_path
                path = abs_path if "://" in abs_path else f"file://{abs_path}"
                try:
                    size = os.path.getsize(src_path)
                except OSError:
                    data = src_be.read_bytes(src_path)
                    size = 0 if data is None else len(data)
            add = {"path": path, "partitionValues": {}, "size": int(size),
                   "modificationTime": now_ms, "dataChange": True}
            st = _delta_stats(meta["stats"].get(name))
            if st is not None:
                add["stats"] = st
            actions.append(json.dumps({"add": add}))
    dst_be.write_bytes(f"{log_dir}/{_commit_name(0)}",
                       ("\n".join(actions) + "\n").encode())
    return dst


def mirror_delta(spark: SparkSession, table: str, dst: str, *,
                 apply_deletes: bool = True) -> int:
    """Incrementally publish a manifest table to an existing Delta export
    (continuous mirroring): diff the mirror's LIVE file set against the
    manifest's and write ONE new Delta commit of ``remove``/``add``
    actions — O(changed files), no re-export, and self-healing (the diff
    is against what the mirror actually references, not a stored
    watermark, so a crashed previous sync just re-diffs). A first call
    on an empty ``dst`` falls back to :func:`export_delta` (copy mode).

    File names are unique hex tokens shared between the manifest and the
    export, so basename identity IS file identity; compaction/zorder on
    the source mirrors naturally as remove+add. Live DVs are
    materialized first exactly like ``export_delta``. The mirror's mode
    is inferred from its existing ``add`` paths (absolute URIs ⇒
    shallow, relative ⇒ copy). A schema widened since the last sync
    re-emits ``metaData`` in the same commit. Returns the Delta version
    written (or the current one when nothing changed).
    """
    from urllib.parse import unquote

    from ..sinks import manifest_store as ms
    from ..sinks.commit_backend import backend_for
    from ..sinks.data_backend import data_backend_for

    log_dir = f"{dst.rstrip('/')}/{_LOG_DIR}"
    cbe = backend_for(dst)
    if cbe.read_text(f"{log_dir}/{_commit_name(0)}") is None:
        export_delta(spark, table, dst, mode="copy",
                     apply_deletes=apply_deletes)
        return 0
    adds, state = _delta_state(dst)

    manifest = ms.read_manifest(table)
    meta = ms._manifest_meta(manifest)
    has_dvs = any(meta["deletes"].get(b) for b in manifest["buckets"]
                  if manifest["buckets"].get(b))
    if has_dvs:
        if not apply_deletes:
            raise ValueError("table carries live deletion vectors; run "
                             "compact() first or pass apply_deletes=True")
        ms.compact(spark, table, max_files_per_bucket=10 ** 9)
        manifest = ms.read_manifest(table)
        meta = ms._manifest_meta(manifest)

    shallow = any("://" in a["path"] for a in adds.values())
    prev_by_name = {unquote(a["path"]).rsplit("/", 1)[-1]: a["path"]
                    for a in adds.values()}
    now_names = {n: b for b in manifest["buckets"]
                 for n in manifest["buckets"][b]}
    removed = [prev_by_name[n] for n in sorted(set(prev_by_name) - set(now_names))]
    added = sorted(set(now_names) - set(prev_by_name))

    schema_str = _schema_string(meta)
    want_cfg = {**(state["metaData"].get("configuration") or {}),
                **_mapping_config(meta)}
    schema_changed = (
        state["metaData"].get("schemaString") != schema_str
        or (state["metaData"].get("configuration") or {}) != want_cfg)

    version = state["lastDeltaVersion"] + 1
    if not removed and not added and not schema_changed:
        return version - 1

    import time as _time

    now_ms = int(_time.time() * 1000)
    actions: List[str] = [json.dumps({"commitInfo": {
        "operation": "MIRROR", "timestamp": now_ms,
        "operationParameters": {"sourceVersion": str(manifest["version"])},
    }})]
    if schema_changed:
        md = dict(state["metaData"])
        md["schemaString"] = schema_str
        md["configuration"] = want_cfg
        if meta.get("colmap") is not None:
            # mapping requires the columnMapping protocol level
            actions.append(json.dumps({"protocol": {
                "minReaderVersion": 2, "minWriterVersion": 5}}))
        actions.append(json.dumps({"metaData": md}))
    for p in removed:
        actions.append(json.dumps({"remove": {
            "path": p, "deletionTimestamp": now_ms, "dataChange": True}}))
    src_be = data_backend_for(table)
    dst_be = data_backend_for(dst)
    for name in added:
        src_path = meta["ext"].get(name) or ms._join(table, "files", name)
        if shallow:
            abs_path = os.path.abspath(src_path) \
                if "://" not in src_path else src_path
            path = abs_path if "://" in abs_path else f"file://{abs_path}"
            try:
                size = os.path.getsize(src_path)
            except OSError:
                data = src_be.read_bytes(src_path)
                size = 0 if data is None else len(data)
        else:
            data = src_be.read_bytes(src_path)
            if data is None:
                raise FileNotFoundError(src_path)
            dst_be.write_bytes(f"{dst.rstrip('/')}/{name}", data)
            path, size = name, len(data)
        add = {"path": path, "partitionValues": {}, "size": int(size),
               "modificationTime": now_ms, "dataChange": True}
        st = _delta_stats(meta["stats"].get(name))
        if st is not None:
            add["stats"] = st
        actions.append(json.dumps({"add": add}))
    payload = "\n".join(actions) + "\n"
    if not cbe.put_if_absent(f"{log_dir}/{_commit_name(version)}", payload):
        raise RuntimeError(
            f"Delta version {version} of {dst} was committed concurrently; "
            "re-run the mirror")
    return version


def vacuum_delta(dst: str, keep_hours: float = 168.0,
                 dry_run: bool = False) -> List[str]:
    """Delete data files a mirror no longer references (Delta VACUUM):
    files named by ``remove`` actions whose ``deletionTimestamp`` is
    older than ``keep_hours`` (default 7 days, Delta's default) and that
    are not re-referenced by a live ``add``. Only relative-path (copy
    mode) files are touched — shallow mirrors own no data. Honors time
    travel the same way Delta does: vacuumed history is gone, so keep
    the window longer than any reader's lag. Returns the deleted names
    (candidates when ``dry_run``)."""
    import time as _time

    from ..sinks.data_backend import data_backend_for
    from ..sinks.commit_backend import backend_for

    be = backend_for(dst)
    log_dir = f"{dst.rstrip('/')}/{_LOG_DIR}"
    names = be_names = data_backend_for(dst).list_dir(log_dir)
    if not names:
        raise FileNotFoundError(f"no {_LOG_DIR} under {dst}")
    adds, _state = _delta_state(dst)
    live = {a["path"] for a in adds.values()}
    cutoff_ms = (_time.time() - keep_hours * 3600.0) * 1000.0
    removed: Dict[str, float] = {}
    for n in sorted(be_names):
        if not (n.endswith(".json") and n[:20].isdigit() and len(n) == 25):
            continue
        text = be.read_text(f"{log_dir}/{n}")
        if text is None:
            continue
        for line in text.splitlines():
            if '"remove"' not in line:
                continue
            action = json.loads(line)
            rm = action.get("remove")
            if rm and rm.get("path") and "://" not in rm["path"]:
                removed[rm["path"]] = rm.get("deletionTimestamp", 0)
    dbe = data_backend_for(dst)
    victims = sorted(p for p, ts in removed.items()
                     if p not in live and ts < cutoff_ms)
    if not dry_run:
        for p in victims:
            dbe.delete(f"{dst.rstrip('/')}/{p}")
    return victims


# ---------------------------------------------------------------------------
# reader


def _replay_checkpoint(cp_path: str, adds: Dict[str, Dict],
                       state: Dict) -> None:
    """Fold a parquet checkpoint (one row per action, struct columns)
    into the replay state."""
    import pyarrow.parquet as pq

    tbl = pq.read_table(cp_path)
    cols = set(tbl.column_names)
    for row in tbl.to_pylist():
        md = row.get("metaData") if "metaData" in cols else None
        if md and md.get("schemaString"):
            state["metaData"] = md
        proto = row.get("protocol") if "protocol" in cols else None
        if proto and proto.get("minReaderVersion") is not None:
            state["protocol"] = proto
        add = row.get("add") if "add" in cols else None
        if add and add.get("path"):
            adds[add["path"]] = add
        rm = row.get("remove") if "remove" in cols else None
        if rm and rm.get("path"):
            adds.pop(rm["path"], None)


def _delta_state(path: str) -> Tuple[Dict[str, Dict], Dict]:
    """Replay the log; returns (live adds by path, {metaData, protocol})."""
    from ..sinks.data_backend import data_backend_for

    be = data_backend_for(path)
    log_dir = f"{path.rstrip('/')}/{_LOG_DIR}"
    names = be.list_dir(log_dir)
    if not names:
        raise FileNotFoundError(f"no {_LOG_DIR} under {path}")
    adds: Dict[str, Dict] = {}
    state: Dict = {}
    start_after = -1
    lc = be.read_bytes(f"{log_dir}/_last_checkpoint")
    if lc is not None:
        lcdoc = json.loads(lc.decode())
        cp_version = int(lcdoc["version"])
        parts = lcdoc.get("parts")
        if parts:
            # multi-part checkpoint (foreign writers split large state):
            # {v}.checkpoint.{i}.{parts}.parquet, i in 1..parts — all
            # parts together hold the state; replay requires every one
            cp_names = [
                f"{cp_version:020d}.checkpoint."
                f"{i:010d}.{int(parts):010d}.parquet"
                for i in range(1, int(parts) + 1)
            ]
        else:
            cp_names = [f"{cp_version:020d}.checkpoint.parquet"]
        if all(n in names for n in cp_names):
            for n in cp_names:
                _replay_checkpoint(f"{log_dir}/{n}", adds, state)
            start_after = cp_version
    commit_versions = sorted(
        int(n[:20]) for n in names
        if n.endswith(".json") and n[:20].isdigit() and len(n) == 25)
    state["lastDeltaVersion"] = max(commit_versions, default=start_after)
    for v in commit_versions:
        if v <= start_after:
            continue
        text = be.read_bytes(f"{log_dir}/{_commit_name(v)}")
        if text is None:
            continue
        for line in text.decode().splitlines():
            if not line.strip():
                continue
            action = json.loads(line)
            if "metaData" in action:
                state["metaData"] = action["metaData"]
            elif "protocol" in action:
                state["protocol"] = action["protocol"]
            elif "add" in action:
                adds[action["add"]["path"]] = action["add"]
            elif "remove" in action:
                adds.pop(action["remove"]["path"], None)
    if "metaData" not in state:
        raise ValueError(f"Delta log at {path} has no metaData action")
    proto = state.get("protocol", {})
    if int(proto.get("minReaderVersion", 1)) > 2:
        feats = proto.get("readerFeatures") or ["minReaderVersion "
                                                + str(proto["minReaderVersion"])]
        raise NotImplementedError(
            f"Delta table requires reader features {feats}; this reader "
            "implements reader versions 1-2 without column mapping")
    mapping = (state["metaData"].get("configuration") or {}).get(
        "delta.columnMapping.mode", "none")
    if mapping not in ("none", "", "name"):
        # "id" mapping resolves columns by parquet field id, which the
        # plain Spark parquet reader does not consult — refuse rather
        # than resolve-by-name and silently misread renamed columns
        raise NotImplementedError(
            f"delta.columnMapping.mode={mapping} is not supported "
            "(only 'none' and 'name')")
    for add in adds.values():
        if add.get("deletionVector"):
            raise NotImplementedError(
                "table has persistent deletion vectors; this reader "
                "implements reader v1/v2 semantics")
    return adds, state


def _add_may_match(add: Dict, col: str, op: str, value) -> bool:
    """Can a file with these Delta ``add.stats`` hold a matching row?
    True (must read) unless [minValues, maxValues] proves otherwise —
    missing/unparseable stats always read (skipping is an optimization,
    never a correctness gate). Mirrors
    ``manifest_store._file_may_match`` over the Delta stats shape."""
    st = add.get("stats")
    if not st:
        return True
    try:
        parsed = json.loads(st) if isinstance(st, str) else st
        lo = (parsed.get("minValues") or {}).get(col)
        hi = (parsed.get("maxValues") or {}).get(col)
    except (ValueError, AttributeError):
        return True
    if lo is None or hi is None:
        return True
    from ..sinks.manifest_store import _file_may_match

    return _file_may_match({"cols": {col: [lo, hi]}}, col, op, value)


def read_delta(spark: SparkSession, path: str,
               where=None) -> DataFrame:
    """Read a Delta Lake table directory as a DataFrame (current snapshot).

    Minimal but safe: JSON commit replay with parquet-checkpoint resume,
    schema from ``metaData.schemaString`` (Spark schema JSON, verbatim),
    partition columns restored from ``partitionValues`` as typed literal
    columns per file group. Raises ``NotImplementedError`` for tables
    that need reader features beyond v2 (deletion vectors, column
    mapping) instead of silently mis-reading them.

    ``where`` — optional ``[(column, op, literal), ...]`` conditions
    (op in ``= != < <= > >=``): files whose ``add.stats`` min/max
    bounds prove no row can match are dropped from the scan BEFORE any
    parquet IO (data skipping over the log's stats, the same shape
    Delta readers use), then the conditions are re-applied as a row
    filter so the result is exact, not just file-granular. On
    partition columns the bound check runs against ``partitionValues``
    instead (partition pruning).
    """
    from urllib.parse import unquote, urlparse

    from ..sinks.manifest_store import _file_may_match

    adds, state = _delta_state(path)
    if where:
        md0 = state["metaData"]
        pcols = set(md0.get("partitionColumns") or [])
        kept = {}
        for p, add in adds.items():
            ok = True
            for col, op, val in where:
                if col in pcols:
                    raw = (add.get("partitionValues") or {}).get(col)
                    # string-serialized partition value: compare as the
                    # literal's type when parseable, else read the file
                    try:
                        pv = type(val)(raw) if raw is not None else None
                    except (TypeError, ValueError):
                        continue
                    if pv is not None and not _file_may_match(
                            {"cols": {col: [pv, pv]}}, col, op, val):
                        ok = False
                        break
                elif not _add_may_match(add, col, op, val):
                    ok = False
                    break
            if ok:
                kept[p] = add
        adds = kept
    md = state["metaData"]
    schema = T.StructType.fromJson(json.loads(md["schemaString"]))
    part_cols: List[str] = list(md.get("partitionColumns") or [])
    # columnMapping.mode=name: files store PHYSICAL names (the spec's
    # col-… UUIDs, recorded per field in schema metadata); scan under
    # them, rename to the logical schema afterwards. Partition values
    # in the log are ALSO keyed by physical name.
    mapping = (md.get("configuration") or {}).get(
        "delta.columnMapping.mode", "none")
    phys_of = {
        f.name: (f.metadata.get("delta.columnMapping.physicalName", f.name)
                 if mapping == "name" else f.name)
        for f in schema.fields
    }
    physical = T.StructType(
        [T.StructField(phys_of[f.name], f.dataType, f.nullable)
         for f in schema.fields if f.name not in part_cols])
    by_part: Dict[Tuple, List[str]] = {}
    for add in adds.values():
        p = unquote(add["path"])
        if "://" in p:
            parsed = urlparse(p)
            if parsed.scheme != "file":
                raise NotImplementedError(
                    f"absolute add path with scheme {parsed.scheme!r}")
            p = parsed.path
        elif not p.startswith("/"):
            p = f"{path.rstrip('/')}/{p}"
        pv = add.get("partitionValues") or {}
        key = tuple(pv.get(phys_of[c], pv.get(c)) for c in part_cols)
        by_part.setdefault(key, []).append(p)
    if not by_part:
        return spark.createDataFrame([], schema)

    frames = []
    types = {f.name: f.dataType for f in schema.fields}
    for key, files in sorted(by_part.items(),
                             key=lambda kv: tuple(str(k) for k in kv[0])):
        df = spark.read.schema(physical).parquet(*sorted(files))
        for f in schema.fields:  # physical -> logical names
            if f.name not in part_cols and phys_of[f.name] != f.name:
                df = df.withColumnRenamed(phys_of[f.name], f.name)
        for col, raw in zip(part_cols, key):
            # Delta serializes partition values as strings; null is a
            # missing/None entry. The string->type cast below follows the
            # spec's serialization rules for primitive types.
            lit = (F.lit(None) if raw is None else F.lit(raw))
            df = df.withColumn(col, lit.cast(types[col]))
        frames.append(df.select(*[f.name for f in schema.fields]))
    out = frames[0]
    for f in frames[1:]:
        out = out.unionByName(f)
    if where:
        ops = {"=": lambda c, v: c == v, "!=": lambda c, v: c != v,
               "<": lambda c, v: c < v, "<=": lambda c, v: c <= v,
               ">": lambda c, v: c > v, ">=": lambda c, v: c >= v}
        for col, op, val in where:
            out = out.filter(ops[op](F.col(col), F.lit(val)))
    return out
