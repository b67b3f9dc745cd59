"""Structured Streaming SOURCE over Apache Iceberg tables.

``stream_iceberg`` tails an Iceberg v2 filesystem table — ours
(`interop/iceberg.py` exports/mirrors) or a foreign one — as a Spark 4
Python streaming data source, the same architecture as the manifest
table source (`streaming/table_source.py`):

* offsets are INDICES INTO THE SNAPSHOT LINEAGE (the metadata's
  ``snapshot-log`` order, falling back to sequence-number order), each
  offset carrying the snapshot-id it expects at that index — a lineage
  rewritten underneath a checkpoint (vacuum past the stream's
  position, RESTORE) fails loudly instead of replaying wrong rows;
* the first batch of a fresh query is the CURRENT SNAPSHOT (delete
  files applied per spec sequence-number rules), later batches emit
  the data files each successive snapshot ADDED;
* a snapshot that removes data files or adds delete files is not an
  append — it raises unless ``skip_change_commits`` (Delta's
  ``skipChangeCommits`` contract), which then emits only added files;
* one input partition per data file; executors read parquet via
  pyarrow and conform to the metadata schema (files predating a
  widened column surface null).

Scale: driver-side planning is O(manifest entries) per snapshot step;
per-partition delete application re-reads the (small) delete files per
task — bounded redundancy, same trade the manifest-table source makes
for DV files, and a heavily-deleted snapshot is better compacted
first anyway.

Beyond the reference (no streaming story at all, SURVEY §2.7-beyond);
composes with `interop/iceberg.py::mirror_iceberg` so two engines can
hand off through an Iceberg table in both directions.
"""

from __future__ import annotations

from typing import Dict, List, Optional, Tuple

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.datasource import (
    DataSource, DataSourceStreamReader, InputPartition,
)

__all__ = ["stream_iceberg", "IcebergTableDataSource"]

_FORMAT_NAME = "iceberg_table"


def _load_lineage(path: str) -> Tuple[Dict, List[Dict]]:
    """Current table metadata + snapshots ordered oldest→newest."""
    import json
    import os
    import re

    from ..sinks.data_backend import data_backend_for

    be = data_backend_for(path)
    root = path.rstrip("/")
    meta_dir = f"{root}/metadata"
    hint = be.read_bytes(f"{meta_dir}/version-hint.text")
    blob = None
    if hint is not None:
        v = hint.decode().strip()
        for cand in (f"v{v}.metadata.json", f"{v}.metadata.json"):
            blob = be.read_bytes(f"{meta_dir}/{cand}")
            if blob is not None:
                break
    if blob is None:
        versions = []
        for name in be.list_dir(meta_dir):
            m = re.match(r"v(\d+)\.metadata\.json$",
                         os.path.basename(name))
            if m:
                versions.append(int(m.group(1)))
        if not versions:
            raise FileNotFoundError(
                f"{meta_dir}: no version-hint.text or vN.metadata.json")
        blob = be.read_bytes(f"{meta_dir}/v{max(versions)}.metadata.json")
    meta = json.loads(blob)
    snaps = {s["snapshot-id"]: s for s in meta.get("snapshots", [])}
    log = meta.get("snapshot-log") or []
    ordered: List[Dict] = []
    seen = set()
    for entry in log:
        sid = entry.get("snapshot-id")
        if sid in snaps and sid not in seen:
            ordered.append(snaps[sid])
            seen.add(sid)
    for s in sorted(meta.get("snapshots", []),
                    key=lambda s: (s.get("sequence-number", 0),
                                   s.get("timestamp-ms", 0))):
        if s["snapshot-id"] not in seen:
            ordered.append(s)
            seen.add(s["snapshot-id"])
    return meta, ordered


def _snapshot_files(path: str, snap: Dict):
    """Live file sets of one snapshot: ({data_path: seq},
    [(eq_path, seq, (id-names…))], [(pos_path, seq)]). Needs the
    current schema for equality-id name resolution."""
    from ..interop.iceberg import _walk_snapshot, _norm_path, _resolve
    from ..sinks.data_backend import data_backend_for

    be = data_backend_for(path)
    root = path.rstrip("/")
    data: Dict[str, int] = {}
    eq: List[Tuple[str, int, Tuple[int, ...]]] = []
    pos: List[Tuple[str, int]] = []
    for row, live in _walk_snapshot(be, root, snap):
        for e in live:
            df_rec = e["data_file"]
            # foreign tables may store table-root-relative URIs —
            # resolve like read_iceberg does, or the executor-side
            # ParquetFile open fails with a bare FileNotFoundError
            p = _norm_path(_resolve(df_rec["file_path"], root))
            seq = int(e["sequence_number"])
            content = df_rec.get("content", 0)
            if content == 0:
                data[p] = seq
            elif content == 1:
                pos.append((p, seq))
            elif content == 2:
                eq.append((p, seq, tuple(df_rec.get("equality_ids")
                                         or ())))
            else:
                raise ValueError(f"{p}: unknown content code {content}")
    return data, eq, pos


class _IceFilePartition(InputPartition):
    """One data file + the delete files that may kill its rows."""

    def __init__(self, path: str, seq: int, eq: List, pos: List,
                 id_names: Dict[int, str],
                 aliases: Optional[Dict[str, List[str]]] = None):
        self.path = path
        self.seq = int(seq)
        self.eq = list(eq)
        self.pos = list(pos)
        self.id_names = dict(id_names)
        # current column name -> historical spellings (renamed tables;
        # files written pre-rename carry the old name)
        self.aliases = dict(aliases or {})


class _IcebergStreamReader(DataSourceStreamReader):
    _SNAPSHOT_PENDING = -2

    def __init__(self, schema, options: Dict[str, str]):
        self._schema = schema
        self._path = options.get("path") or options.get("table")
        if not self._path:
            raise ValueError("iceberg_table source requires a path")
        self._skip_changes = str(
            options.get("skipchangecommits", "false")).lower() == "true"
        mx = options.get("maxsnapshotspertrigger")
        self._max_snaps: Optional[int] = None if mx is None \
            else max(1, int(mx))
        # pacing position: highest lineage index already planned. Only
        # paced when KNOWN — after a restart the first poll is unpaced
        # by design, which sidesteps the entire rewound-offset class
        # the manifest-table source had to fence with delivery floors
        self._pos: Optional[int] = None

    # -- driver-side planning -------------------------------------------
    def initialOffset(self) -> dict:
        return {"idx": self._SNAPSHOT_PENDING, "sid": -1}

    def latestOffset(self) -> dict:
        meta, lineage = _load_lineage(self._path)
        if not lineage:
            return self.initialOffset()
        idx = len(lineage) - 1
        if self._max_snaps is not None and self._pos is not None \
                and self._pos >= 0:
            # bounded micro-batches; the snapshot batch is never split
            idx = min(idx, self._pos + self._max_snaps)
        if self._pos is not None:
            idx = max(idx, self._pos)  # never rewind a planned offset
        # a vacuum that trimmed the lineage mid-stream makes any index
        # beyond it meaningless — clamp for the sid lookup; the sid
        # check in partitions() raises the loud lineage-changed error
        idx = min(idx, len(lineage) - 1)
        self._pos = idx if self._pos is None else max(self._pos, idx)
        return {"idx": idx, "sid": lineage[idx]["snapshot-id"]}

    def _check(self, lineage: List[Dict], idx: int, sid) -> None:
        if idx < 0:
            return
        if idx >= len(lineage) or lineage[idx]["snapshot-id"] != sid:
            raise RuntimeError(
                f"{self._path}: snapshot lineage changed under the "
                f"checkpoint (expected snapshot {sid} at position "
                f"{idx}) — vacuum expired the stream's position or the "
                "table was restored; restart the stream to re-snapshot")

    def _id_names(self) -> Tuple[Dict[int, str], Dict[str, List[str]]]:
        """(field-id -> current name, current name -> historical
        spellings). The retained schema history IS the rename record —
        same resolution read_iceberg uses."""
        meta, _ = _load_lineage(self._path)
        schemas = meta.get("schemas") or [meta.get("schema")]
        by_id = {s.get("schema-id"): s for s in schemas if s}
        cur = by_id.get(meta.get("current-schema-id"), schemas[-1])
        names = {f["id"]: f["name"] for f in cur["fields"]}
        hist: Dict[int, set] = {}
        for sc in schemas:
            for f in sc.get("fields", []):
                hist.setdefault(f["id"], set()).add(f["name"])
        aliases = {n: sorted(hist.get(fid, {n}) - {n})
                   for fid, n in names.items()
                   if len(hist.get(fid, {n})) > 1}
        return names, aliases

    def partitions(self, start: dict, end: dict):
        s_idx, e_idx = int(start["idx"]), int(end["idx"])
        for v in (s_idx, e_idx):
            if v >= 0:
                self._pos = v if self._pos is None else max(self._pos, v)
        if s_idx == e_idx or e_idx < 0:
            return []
        meta, lineage = _load_lineage(self._path)
        self._check(lineage, e_idx, end["sid"])
        id_names, aliases = self._id_names()
        if s_idx == self._SNAPSHOT_PENDING:
            data, eq, pos = _snapshot_files(self._path, lineage[e_idx])
            return [_IceFilePartition(p, seq, eq, pos, id_names,
                                      aliases)
                    for p, seq in sorted(data.items())]
        self._check(lineage, s_idx, start["sid"])
        parts: List[_IceFilePartition] = []
        for i in range(s_idx + 1, e_idx + 1):
            pd_, peq, ppos = _snapshot_files(self._path, lineage[i - 1])
            nd, neq, npos = _snapshot_files(self._path, lineage[i])
            added = sorted(set(nd) - set(pd_))
            removed = set(pd_) - set(nd)
            new_deletes = (set(neq) - set(peq)) | (set(npos) - set(ppos))
            if removed or new_deletes:
                if not self._skip_changes:
                    raise RuntimeError(
                        f"snapshot {lineage[i]['snapshot-id']} of "
                        f"{self._path} removes files or adds delete "
                        "files; a streaming read only tails appends. "
                        "Set skipChangeCommits=true to emit only the "
                        "added files, or restart to re-snapshot.")
            # appended files cannot be touched by the SAME snapshot's
            # pre-existing deletes (their seq is the newest), so added
            # files ride clean — matching the table source's contract
            parts.extend(_IceFilePartition(p, nd[p], [], [], id_names,
                                           aliases)
                         for p in added)
        return parts

    # -- executor-side read ---------------------------------------------
    def read(self, partition):  # type: ignore[override]
        import pyarrow as pa
        import pyarrow.compute as pc
        import pyarrow.parquet as pq
        from pyspark.sql.pandas.types import to_arrow_schema

        target = to_arrow_schema(self._schema)
        pf = pq.ParquetFile(partition.path)
        avail = set(pf.schema_arrow.names)
        # renamed tables: a pre-rename file carries the old spelling
        src_of = {}
        current = {f.name for f in target}
        for f in target:
            if f.name in avail:
                src_of[f.name] = f.name
            else:
                for alt in partition.aliases.get(f.name, ()):
                    if alt in avail:
                        if alt in current:
                            raise ValueError(
                                f"column {alt!r} is simultaneously a "
                                "current schema column and a "
                                f"historical spelling of {f.name!r} — "
                                "name-swap history cannot be resolved "
                                "by name")
                        src_of[f.name] = alt
                        break
        need = sorted(set(src_of.values()))
        # equality-delete columns must be read even if unprojected
        eq_live = [(p, seq, ids) for p, seq, ids in partition.eq
                   if seq > partition.seq]
        extra = set()
        for _, _, ids in eq_live:
            for fid in ids:
                name = partition.id_names.get(fid)
                if name is None:
                    raise ValueError(
                        f"equality delete references field-id {fid} "
                        "not in the current schema")
                if name in avail:
                    extra.add(name)
        cols = sorted(set(need) | extra)
        tbl = pf.read(columns=cols) if cols else pf.read()

        # positional deletes: kill row indices of THIS file
        pos_live = [(p, seq) for p, seq in partition.pos
                    if seq >= partition.seq]
        if pos_live:
            from ..interop.iceberg import _norm_path
            kill_idx = set()
            for dpath, _ in pos_live:
                dt = pq.read_table(dpath, columns=["file_path", "pos"])
                fps = dt.column("file_path").to_pylist()
                poss = dt.column("pos").to_pylist()
                for fp, p_ in zip(fps, poss):
                    if _norm_path(fp) == partition.path:
                        kill_idx.add(int(p_))
            if kill_idx:
                keep = [i for i in range(tbl.num_rows)
                        if i not in kill_idx]
                tbl = tbl.take(pa.array(keep, pa.int64()))

        # equality deletes: null-safe tuple match, strictly-smaller seq
        for dpath, _, ids in eq_live:
            names = [partition.id_names[fid] for fid in ids]
            if any(n not in tbl.column_names for n in names):
                continue  # column absent in this file ⇒ all-null rows
                # can only match all-null delete keys, which real
                # writers do not produce for absent columns
            dt = pq.read_table(dpath, columns=names)
            doomed = set(zip(*[dt.column(n).to_pylist()
                               for n in names])) if dt.num_rows else set()
            if not doomed:
                continue
            rows = zip(*[tbl.column(n).to_pylist() for n in names])
            keep = [i for i, key in enumerate(rows) if key not in doomed]
            if len(keep) != tbl.num_rows:
                tbl = tbl.take(pa.array(keep, pa.int64()))

        out_cols = []
        for field in target:
            src = src_of.get(field.name)
            if src is not None and src in tbl.column_names:
                out_cols.append(tbl.column(src).cast(field.type))
            else:  # file predates a widened column
                out_cols.append(pa.nulls(tbl.num_rows, field.type))
        out = pa.Table.from_arrays(
            [c.combine_chunks() if isinstance(c, pa.ChunkedArray) else c
             for c in out_cols],
            schema=target)
        yield from out.to_batches(max_chunksize=1 << 16)

    def commit(self, end: dict) -> None:
        v = int(end.get("idx", -1)) if isinstance(end, dict) else -1
        if v >= 0:
            self._pos = v if self._pos is None else max(self._pos, v)


class IcebergTableDataSource(DataSource):
    """``spark.readStream.format("iceberg_table").load(table_path)``."""

    @classmethod
    def name(cls) -> str:
        return _FORMAT_NAME

    def schema(self):
        from pyspark.sql import types as T

        from ..interop.iceberg import spark_schema_from_iceberg

        path = self.options.get("path") or self.options.get("table")
        if not path:
            raise ValueError("iceberg_table source requires a path")
        meta, _ = _load_lineage(path)
        schemas = meta.get("schemas") or [meta.get("schema")]
        by_id = {s.get("schema-id"): s for s in schemas if s}
        cur = by_id.get(meta.get("current-schema-id"), schemas[-1])
        st = spark_schema_from_iceberg(cur)
        # files written before a widened column surface null for it —
        # the source schema must be nullable throughout
        return T.StructType(
            [T.StructField(f.name, f.dataType, True, f.metadata)
             for f in st.fields])

    def streamReader(self, schema):
        return _IcebergStreamReader(schema, dict(self.options))


def stream_iceberg(spark: SparkSession, path: str, *,
                   skip_change_commits: bool = False,
                   max_snapshots_per_trigger: Optional[int] = None
                   ) -> DataFrame:
    """Open an Iceberg v2 filesystem table as a streaming DataFrame:
    first batch = the current snapshot (delete files applied), later
    batches = the data files each new snapshot appends. Non-append
    snapshots raise unless ``skip_change_commits``.
    ``max_snapshots_per_trigger`` bounds how many snapshots one
    micro-batch spans (the snapshot batch is never split; the first
    poll after a restart is unpaced by design — the position is only
    known once the engine has planned a batch, so a paced offset can
    never rewind below a committed one). See module docstring for the
    lineage-offset contract."""
    spark.dataSource.register(IcebergTableDataSource)
    reader = (spark.readStream.format(_FORMAT_NAME)
              .option("path", path))
    if skip_change_commits:
        reader = reader.option("skipChangeCommits", "true")
    if max_snapshots_per_trigger is not None:
        reader = reader.option("maxSnapshotsPerTrigger",
                               str(max_snapshots_per_trigger))
    return reader.load()
