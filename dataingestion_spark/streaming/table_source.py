"""Structured Streaming SOURCE over a manifest-store table.

Delta Lake exposes its tables as streaming sources (``spark.readStream
.format("delta")``): the commit log is the offset sequence, appends flow
through as micro-batches, and change commits either fail the stream or
are skipped (``skipChangeCommits``). This module gives the repo's
manifest tables (:mod:`dataingestion_spark.sinks.manifest_store`) the
same capability, implemented as a Spark 4 **Python streaming data
source** (`pyspark.sql.datasource.DataSourceStreamReader`) — the
idiomatic extension point, so the source composes with every sink,
trigger (incl. ``availableNow``), checkpoint recovery, and operator
Structured Streaming offers.

Semantics (mirroring ``spark.readStream.format("delta")``):

* **Offsets are commit versions** (``{"version": N}``); the checkpoint
  stores them, so restarts resume exactly where the last batch ended
  (the manifest log is immutable history — a version range always
  replays to the same rows).
* **First batch = table snapshot** at the version current when the
  stream starts (equality deletion vectors applied), unless
  ``startingVersion`` pins the first commit to read instead.
* **Subsequent batches = appended files** of versions ``(start, end]``.
  A commit that REWRITES or DELETES pre-existing rows (file removals or
  new deletion vectors) is a *change commit*: the stream fails with a
  descriptive error unless ``skipChangeCommits=true`` (Delta's option),
  which skips those commits whole and keeps tailing appends.
* **One input partition per data file** — a 1000-file append becomes a
  1000-task micro-batch; executors read their file directly with
  pyarrow (no driver materialization), null-padding columns added by
  later schema evolution.

Scale: the driver-side planning per batch is O(manifests in the version
range) JSON reads; the data plane never touches the driver. The reader
needs ``pyarrow``-readable file paths (local or object store) — the
in-memory test backend is not streamable, matching its contract.

Reference: the reference system has no streaming-source story for its
vector stores (write-only sinks, ``VectorStoreWriter.cs``); this is
beyond-reference surface motivated by Delta/Iceberg CDC tailing.
"""

from __future__ import annotations

import json
from typing import Dict, List, Optional

from pyspark.sql import SparkSession
from pyspark.sql.datasource import (
    DataSource,
    DataSourceStreamReader,
    InputPartition,
)

__all__ = ["LakehouseChangesDataSource", "LakehouseTableDataSource",
           "stream_changes", "stream_table"]

_FORMAT_NAME = "lakehouse_table"


def _physical_map(table: str) -> Dict[str, str]:
    """logical -> PHYSICAL column names of a renamed/dropped-column
    table ({} = identity). Captured once at stream start: physical names
    are FROZEN when assigned, so one map is correct for every commit the
    stream will read — the stream's output schema is pinned at start
    anyway (a mid-stream rename changes future streams, not this one)."""
    from ..sinks import manifest_store as ms

    v = ms.current_version(table)
    if v is None:
        return {}
    return dict(ms.read_manifest(table, v).get("colmap") or {})


def _read_arrow_file(path: str):
    import pyarrow.parquet as pq

    return pq.read_table(path)


def _checkpoint_offset(ckpt) -> Optional[int]:
    """Best-effort highest version recorded in a stream checkpoint's
    offset log (None when absent or unparseable).

    Used to anchor the pace-from-start seed on RESTART: the engine never
    calls initialOffset on a restored query, so without this a freshly
    constructed paced reader would return an offset below the committed
    position from its very first latestOffset — and once that rewound
    offset is LOGGED, a second restart loses the in-memory delivery
    floor and replays committed commits (found by the engine-model
    test). Seeding from the checkpoint makes latestOffset monotone
    across restarts, so the rewound entry can never be written.

    Format (HDFSMetadataLog, written atomically via rename): files named
    by batch id under <ckpt>/offsets; line 1 = "v1", line 2 = engine
    metadata (contains batchWatermarkMs), then one offset-json line per
    source — ours is ``{"version": N}``. In a MULTI-source query the
    file holds one line per source and ``{"version": N}`` alone cannot
    be attributed to this reader (two lakehouse sources are
    indistinguishable by shape), so when more than one version-shaped
    line is present this returns None — declining to anchor is the
    documented degraded mode (one empty rewound batch, corrected by
    the delivery floor), whereas anchoring on ANOTHER source's line
    could silently disable pacing or re-log a rewound entry. Parsing
    is otherwise deliberately lenient: any failure returns None and
    the reader behaves as before (fresh-query semantics). The
    checkpoint is listed through the
    data-backend registry (``sinks.data_backend``), so an object-store
    scheme works once its backend is registered; an unreadable or
    unregistered checkpoint falls back to the in-memory delivery-floor
    defense — a restart then costs one empty rewound batch, immediately
    corrected, and only a SECOND crash inside that one-poll window
    (after the rewound entry is logged, before the corrective batch)
    can replay; with a readable checkpoint the rewound entry is never
    written at all."""
    if not ckpt:
        return None
    from ..sinks.data_backend import data_backend_for

    d = str(ckpt).rstrip("/") + "/offsets"
    try:
        be = data_backend_for(d)
        nums = [int(n) for n in be.list_dir(d) if n.isdigit()]
    except Exception:
        return None
    if not nums:
        return None
    try:
        raw = be.read_bytes(f"{d}/{max(nums)}")
    except Exception:
        return None
    if raw is None:
        return None
    try:
        lines = raw.decode("utf-8").splitlines()
    except UnicodeDecodeError:
        return None
    found: List[int] = []
    for line in lines:
        line = line.strip()
        if not line.startswith("{"):
            continue
        try:
            doc = json.loads(line)
        except ValueError:
            continue
        if not isinstance(doc, dict) or "batchWatermarkMs" in doc:
            continue
        if "version" in doc:
            try:
                found.append(int(doc["version"]))
            except (TypeError, ValueError):
                return None
    # exactly one version-shaped source line → unambiguous anchor;
    # multi-source queries decline (see docstring)
    return found[0] if len(found) == 1 else None


class _FilePartition(InputPartition):
    """One data file + the deletion vectors that may kill its rows.

    ``dvs`` is ``[(path, delete_seq), ...]`` restricted to the file's
    bucket; a row dies when its documentid appears in a DV whose seq is
    strictly greater than the data file's (Iceberg equality-delete
    semantics, identical to ``manifest_store._read_files``). Each task
    re-reads its bucket's DV files — DVs are small id lists and buckets
    hold few files, so the redundancy is bounded; a snapshot of a
    heavily-deleted table is better served by compacting first anyway.
    """

    def __init__(self, path: str, seq: int, dvs: List):
        self.path = path
        self.seq = int(seq)
        self.dvs = list(dvs)


class _TableStreamReader(DataSourceStreamReader):
    # offset sentinel: "snapshot not yet emitted"
    _SNAPSHOT_PENDING = -2

    def __init__(self, schema, options: Dict[str, str]):
        self._schema = schema
        self._table = options.get("path") or options.get("table")
        if not self._table:
            raise ValueError("lakehouse_table source requires a path "
                             "(readStream.load(<table>) or .option('path', …))")
        self._physmap = _physical_map(self._table)
        sv = options.get("startingversion")
        self._starting_version: Optional[int] = None if sv is None else int(sv)
        self._skip_changes = str(
            options.get("skipchangecommits", "false")).lower() == "true"
        mc = options.get("maxcommitspertrigger")
        self._max_commits: Optional[int] = None if mc is None else max(1, int(mc))
        if (self._max_commits is not None
                and self._starting_version is not None and str(
                options.get("pacefromstart", "false")).lower() == "true"):
            # seed the pacing position at construction so even the FIRST
            # batch of a fresh query is paced (the engine polls
            # latestOffset before initialOffset — see the changes reader
            # for the full rationale). Only meaningful with
            # startingVersion: the snapshot path is one consistent
            # version and is never split. On a checkpoint RESTART the
            # seed is stale (the engine never calls initialOffset), so
            # the first poll may return a rewound offset — anchored here
            # on the checkpoint's own offset log when the caller passes
            # checkpointLocation (our pipelines do), which makes
            # latestOffset monotone across restarts; without the hint,
            # partitions() still folds the engine-committed START into
            # the position and the delivery floor, degrading the rewind
            # to one empty batch.
            seed = self._starting_version - 1
            ck = _checkpoint_offset(options.get("checkpointlocation"))
            self._pos = seed if ck is None else max(seed, ck)

    # -- driver-side planning -------------------------------------------
    def initialOffset(self) -> dict:
        if self._starting_version is not None:
            # read commits FROM startingVersion (inclusive) — no snapshot;
            # seed the pacing position (monotone: never lower an already
            # observed one) so a fresh processing-time stream paces even
            # its initial backlog
            seed = self._starting_version - 1
            prev = getattr(self, "_pos", None)
            self._pos = seed if prev is None else max(prev, seed)
            return {"version": self._starting_version - 1}
        return {"version": self._SNAPSHOT_PENDING}

    def latestOffset(self) -> dict:
        from ..sinks import manifest_store as ms

        cur = ms.current_version(self._table)
        if cur is None:
            # nothing committed yet: hold at the initial offset so the
            # engine plans empty batches until the first commit lands
            return self.initialOffset()
        if self._max_commits is not None:
            # bounded micro-batches (Delta's maxFilesPerTrigger analog at
            # commit granularity): advance at most N commits past the
            # last known planned position, so a backlogged table drains
            # in paced batches instead of one giant catch-up batch. The
            # snapshot batch is never split — it is one consistent
            # version. The position is in-memory, strictly monotone
            # (initialOffset seed, partitions() starts/ends, own
            # returns), so a cap can never regress below a committed
            # offset; when the position is unknown — the first call
            # after a RESTART, or the availableNow end-capture that
            # precedes initialOffset — the batch is unpaced by design.
            prev = getattr(self, "_pos", None)
            if prev is not None and prev >= -1:  # -2 = snapshot pending
                cur = min(cur, prev + self._max_commits)
        prev = getattr(self, "_pos", None)
        self._pos = cur if prev is None else max(prev, cur)
        return {"version": cur}

    def partitions(self, start: dict, end: dict):
        s, e = int(start["version"]), int(end["version"])
        # keep the pacing position honest across engine-driven replans
        # (e.g. a WAL batch replayed after restart).  START is folded in
        # too, not just end: after a checkpoint RESTART the engine never
        # calls initialOffset, so the first latestOffset may have
        # returned a stale paced offset (constructor pace seed, which
        # knows nothing about the checkpoint) BELOW the committed
        # position.  start is an engine-committed fact — folding it into
        # both the pacing position and the delivery floor re-anchors the
        # reader at the real position on the first partitions call.
        if s != self._SNAPSHOT_PENDING:
            prev = getattr(self, "_pos", None)
            self._pos = s if prev is None else max(prev, s)
            if s != e:
                # the delivery floor rises only on a REAL batch plan: a
                # batch's start equals the previous batch's end, which
                # the sequential engine has finalized — that is delivery
                # evidence.  An EQUAL-endpoint call is the availableNow
                # end-capture PROBE (observed as partitions(x, x) before
                # a WAL replay on restart, with x = the logged but
                # UNCOMMITTED batch end): folding ITS start in treated
                # an undelivered offset as delivered and silently
                # suppressed the legitimate batch-0 replay after a sink
                # failure — real data loss (r10 crash-restart test).
                fl = getattr(self, "_floor", None)
                self._floor = s if fl is None else max(fl, s)
        if e >= 0:
            prev = getattr(self, "_pos", None)
            self._pos = e if prev is None else max(prev, e)
        if s == e:
            return []
        if s == self._SNAPSHOT_PENDING:
            return self._snapshot_partitions(e)
        # The microbatch engine is strictly sequential: only the LATEST
        # planned batch can ever be retried, so commits ≤ the highest
        # start offset ever seen were delivered by an earlier batch and
        # can never be legitimately requested again.  If a stale paced
        # offset briefly rewound the offset log (restart + pace seed →
        # one empty batch whose end sits below the committed position),
        # the next planned range nominally spans already-delivered
        # commits — emit only the genuinely new ones instead of
        # replaying them into the sink under fresh (app, epoch) txns.
        lo = max(s, getattr(self, "_floor", s))
        parts: List[_FilePartition] = []
        for v in range(lo + 1, e + 1):
            parts.extend(self._commit_partitions(v))
        return parts

    def _snapshot_partitions(self, version: int) -> List[_FilePartition]:
        from ..sinks import manifest_store as ms

        manifest = ms.read_manifest(self._table, version)
        meta = ms._manifest_meta(manifest)
        path_for = lambda n: (meta["ext"].get(n)  # noqa: E731
                              or ms._join(self._table, "files", n))
        parts = []
        for bucket, names in manifest["buckets"].items():
            dvs = [(path_for(d), int(meta["seq"].get(d, 0)))
                   for d in meta["deletes"].get(bucket, [])]
            for n in names:
                parts.append(_FilePartition(
                    path_for(n), int(meta["seq"].get(n, 0)), dvs))
        return parts

    def _commit_partitions(self, version: int) -> List[_FilePartition]:
        from ..sinks import manifest_store as ms

        cur = ms.read_manifest(self._table, version)
        meta = ms._manifest_meta(cur)
        if version == 0:
            prev_buckets: Dict[str, List[str]] = {}
            prev_deletes: Dict[str, List[str]] = {}
        else:
            prev = ms.read_manifest(self._table, version - 1)
            pmeta = ms._manifest_meta(prev)
            prev_buckets = prev["buckets"]
            prev_deletes = pmeta["deletes"]

        added: List[str] = []
        changed = False
        for bucket in set(cur["buckets"]) | set(prev_buckets):
            now = set(cur["buckets"].get(bucket, []))
            before = set(prev_buckets.get(bucket, []))
            added.extend(sorted(now - before))
            if before - now:
                changed = True  # files rewritten/removed
        for bucket in set(meta["deletes"]) | set(prev_deletes):
            if (set(meta["deletes"].get(bucket, []))
                    - set(prev_deletes.get(bucket, []))):
                changed = True  # new deletion vectors target old rows
        if changed:
            if self._skip_changes:
                return []
            raise RuntimeError(
                f"commit version {version} of {self._table} updates or "
                "deletes pre-existing rows; a streaming read only tails "
                "appends. Set skipChangeCommits=true to skip such commits, "
                "or restart the stream to re-snapshot the table.")
        path_for = lambda n: (meta["ext"].get(n)  # noqa: E731
                              or ms._join(self._table, "files", n))
        return [_FilePartition(path_for(n), int(meta["seq"].get(n, 0)), [])
                for n in added]

    # -- executor-side read ---------------------------------------------
    def read(self, partition):  # type: ignore[override]
        import pyarrow as pa
        import pyarrow.compute as pc
        import pyarrow.parquet as pq
        from pyspark.sql.pandas.types import to_arrow_schema

        target = to_arrow_schema(self._schema)
        kills = set()
        for dv_path, dseq in partition.dvs:
            if dseq > partition.seq:
                dv = _read_arrow_file(dv_path)
                kills.update(dv.column("documentid").to_pylist())
        # read ONLY the columns the source schema needs (Spark cannot
        # push projection into a Python source, so the narrowing done by
        # stream_table(columns=…) must happen here to save IO) — plus
        # documentid when DVs must be applied
        pf = pq.ParquetFile(partition.path)
        avail = set(pf.schema_arrow.names)
        # files carry frozen PHYSICAL names on renamed-column tables
        phys = lambda n: self._physmap.get(n, n)  # noqa: E731
        need = [phys(f.name) for f in target if phys(f.name) in avail]
        if kills and "documentid" in avail and "documentid" not in need:
            need = ["documentid"] + need
        tbl = pf.read(columns=need) if need else pf.read()
        if kills and "documentid" in tbl.column_names:
            mask = pc.is_in(tbl.column("documentid"),
                            value_set=pa.array(sorted(kills)))
            tbl = tbl.filter(pc.invert(mask))
        cols = []
        for field in target:
            if phys(field.name) in tbl.column_names:
                cols.append(tbl.column(phys(field.name)).cast(field.type))
            else:  # file predates a schema-evolution column
                cols.append(pa.nulls(tbl.num_rows, field.type))
        out = pa.Table.from_arrays(
            [c.combine_chunks() if isinstance(c, pa.ChunkedArray) else c
             for c in cols],
            schema=target)
        yield from out.to_batches(max_chunksize=1 << 16)

    def commit(self, end: dict) -> None:
        # offsets live in the stream checkpoint, but the ack is an
        # engine-committed fact: slide the pacing position and the
        # delivery floor forward so a later rewound range (restart +
        # pace seed) can never replay committed commits
        v = int(end.get("version", -1)) if isinstance(end, dict) else -1
        if v >= 0:
            self._pos = max(getattr(self, "_pos", v), v)
            fl = getattr(self, "_floor", None)
            self._floor = v if fl is None else max(fl, v)


class LakehouseTableDataSource(DataSource):
    """``spark.readStream.format("lakehouse_table").load(table_path)``."""

    @classmethod
    def name(cls) -> str:
        return _FORMAT_NAME

    def schema(self):
        from pyspark.sql import types as T

        from ..sinks import manifest_store as ms

        table = self.options.get("path") or self.options.get("table")
        if not table:
            raise ValueError("lakehouse_table source requires a path")
        cols = self.options.get("columns")
        wanted = ([c.strip() for c in cols.split(",") if c.strip()]
                  if cols else None)
        manifest = ms.read_manifest(table)
        fields = ms._manifest_meta(manifest)["schema"]
        if fields:
            st = T.StructType.fromJson({"type": "struct", "fields": fields})
            if wanted is not None:
                missing = set(wanted) - {f.name for f in st.fields}
                if missing:
                    raise ValueError(
                        f"columns {sorted(missing)} not in table schema")
                st = T.StructType([f for f in st.fields if f.name in wanted])
            # files written before a schema-evolution column surface null
            # for it regardless of how the adding batch declared it — the
            # source schema must be nullable (same forcing Spark's file
            # sources apply via asNullable)
            return T.StructType(
                [T.StructField(f.name, f.dataType, True, f.metadata)
                 for f in st.fields])
        # pre-schema manifest: derive from one data file's footer
        from pyspark.sql.pandas.types import from_arrow_schema
        import pyarrow.parquet as pq

        meta = ms._manifest_meta(manifest)
        for bucket, names in manifest["buckets"].items():
            for n in names:
                path = meta["ext"].get(n) or ms._join(table, "files", n)
                return from_arrow_schema(pq.read_schema(path))
        raise FileNotFoundError(f"{table} has no schema and no data files")

    def streamReader(self, schema):
        return _TableStreamReader(schema, dict(self.options))


class _ChangeFilePartition(InputPartition):
    """Insert-side partition: one data file added at ``version``."""

    def __init__(self, path: str, version: int):
        self.kind = "insert"
        self.path = path
        self.version = int(version)


class _ChangeDVPartition(InputPartition):
    """Delete-side partition: one bucket's new DVs at ``version``.

    ``old_files``/``old_dvs`` are ``[(path, seq), ...]`` of the bucket's
    RETAINED data files and its PRE-EXISTING delete vectors (the v-1 DV
    state); ``new_dvs`` are the DV files added at ``version``. The rows
    to emit as deletes are: alive under the old DV state AND killed by
    the new DVs (strictly-smaller seq rule both times).
    """

    def __init__(self, old_files, old_dvs, new_dvs, version: int):
        self.kind = "delete"
        self.old_files = list(old_files)
        self.old_dvs = list(old_dvs)
        self.new_dvs = list(new_dvs)
        self.version = int(version)


class _ChangesStreamReader(DataSourceStreamReader):
    """Per-commit change rows (Delta ``readChangeFeed`` analog).

    Emits each commit's row-level changes with ``_change_type``
    ('insert' | 'delete'; an update is its delete+insert pair, both at
    the same ``_commit_version``) for APPEND and DV commits — the two
    shapes every DML path here produces (append/write/merge/
    delete_where/update_where/replace). Commits that DROP files
    (compaction, zorder, restore) have no per-commit row delta
    derivable from changed files alone; they raise unless
    ``skipRewrites`` is set, which treats them as content-neutral —
    EXACT for compaction/OPTIMIZE (layout-only by construction), wrong
    for a RESTORE that rolls data back, so the option is opt-in.
    """

    def __init__(self, schema, options: Dict[str, str]):
        self._schema = schema
        self._table = options.get("path") or options.get("table")
        if not self._table:
            raise ValueError("lakehouse_changes source requires a path")
        self._physmap = _physical_map(self._table)
        self._start = int(options.get("startingversion", "0"))
        self._skip_rewrites = str(
            options.get("skiprewrites", "false")).lower() == "true"
        mc = options.get("maxcommitspertrigger")
        self._max_commits: Optional[int] = None if mc is None else max(1, int(mc))
        if (self._max_commits is not None and str(
                options.get("pacefromstart", "false")).lower() == "true"):
            # seed the pacing position at construction: the engine's FIRST
            # latestOffset call precedes initialOffset, so without a seed
            # the bootstrap batch of a fresh query is unpaced — one batch
            # spanning the entire table history, the exact catch-up spike
            # pacing exists to prevent. Opt-in because an availableNow
            # run's end-capture then also paces: such a run applies at
            # most max_commits commits and terminates (bounded work per
            # run), where unseeded availableNow drains everything in one
            # batch. A restart whose checkpoint is ahead of the seed
            # cannot stall OR replay: the seed anchors on the
            # checkpoint's own offset log when the caller passes
            # checkpointLocation (our pipelines do), so latestOffset is
            # monotone across restarts and the rewound entry is never
            # logged; without the hint, partitions() still folds the
            # engine-committed START into the position and the delivery
            # floor, degrading the rewind to one empty batch (see
            # partitions() and _checkpoint_offset).
            seed = self._start - 1
            ck = _checkpoint_offset(options.get("checkpointlocation"))
            self._pos = seed if ck is None else max(seed, ck)

    def initialOffset(self) -> dict:
        self._pos = max(getattr(self, "_pos", self._start - 1),
                        self._start - 1)
        return {"version": self._start - 1}

    def latestOffset(self) -> dict:
        from ..sinks import manifest_store as ms

        cur = ms.current_version(self._table)
        if cur is None:
            return self.initialOffset()
        if self._max_commits is not None:
            # same monotone-safe pacing as the table source: advance at
            # most N commits past the last planned position; unpaced
            # when the position is unknown (restart / end pre-capture)
            prev = getattr(self, "_pos", None)
            if prev is not None:
                cur = min(cur, prev + self._max_commits)
        prev = getattr(self, "_pos", None)
        self._pos = cur if prev is None else max(prev, cur)
        return {"version": cur}

    def partitions(self, start: dict, end: dict):
        s, e = int(start["version"]), int(end["version"])
        # fold START into the pacing position and — for REAL batch plans
        # only — the delivery floor. Same restart-rewind defense as
        # _TableStreamReader.partitions: a batch's start equals the
        # previous batch's end, which the sequential engine finalized,
        # so it is delivery evidence. An EQUAL-endpoint call is the
        # availableNow end-capture PROBE (partitions(x, x) issued before
        # a WAL replay on restart, x = the logged-but-UNCOMMITTED batch
        # end); treating its start as delivered suppressed the
        # legitimate batch-0 replay after a sink failure — real data
        # loss, caught by the r10 crash-restart publish test.
        self._pos = max(getattr(self, "_pos", -1), s, e)
        if s != e:
            fl = getattr(self, "_floor", None)
            self._floor = s if fl is None else max(fl, s)
        # emit only commits above the highest start ever seen: the engine
        # is strictly sequential, so those were already delivered — a
        # rewound range (restart + pace seed) must not replay them as
        # fresh change rows
        lo = max(s, getattr(self, "_floor", s))
        parts = []
        for v in range(lo + 1, e + 1):
            parts.extend(self._commit_changes(v))
        return parts

    def _commit_changes(self, version: int):
        from ..sinks import manifest_store as ms

        cur = ms.read_manifest(self._table, version)
        meta = ms._manifest_meta(cur)
        if version == 0:
            prev_buckets: Dict[str, List[str]] = {}
            prev_dels: Dict[str, List[str]] = {}
        else:
            prev = ms.read_manifest(self._table, version - 1)
            prev_buckets = prev["buckets"]
            prev_dels = ms._manifest_meta(prev)["deletes"]
        path_for = lambda n: (meta["ext"].get(n)  # noqa: E731
                              or ms._join(self._table, "files", n))
        seq_of = lambda n: int(meta["seq"].get(n, 0))  # noqa: E731
        dropped = any(
            set(prev_buckets.get(b, [])) - set(cur["buckets"].get(b, []))
            for b in prev_buckets)
        if dropped:
            if self._skip_rewrites:
                return []
            raise RuntimeError(
                f"commit version {version} of {self._table} rewrites "
                "files; a change feed cannot derive its row delta from "
                "changed files alone. Set skipRewrites=true ONLY if such "
                "commits are content-neutral (compaction/OPTIMIZE).")
        parts = []
        for b in cur["buckets"]:
            added = [n for n in cur["buckets"][b]
                     if n not in set(prev_buckets.get(b, []))]
            parts.extend(_ChangeFilePartition(path_for(n), version)
                         for n in added)
        for b in meta["deletes"]:
            new_dvs = [n for n in meta["deletes"][b]
                       if n not in set(prev_dels.get(b, []))]
            if not new_dvs:
                continue
            old_files = [(path_for(n), seq_of(n))
                         for n in prev_buckets.get(b, [])]
            if not old_files:
                continue  # DV on an empty bucket deletes nothing
            old_dvs = [(path_for(n), seq_of(n))
                       for n in prev_dels.get(b, [])]
            new_dv_paths = [(path_for(n), seq_of(n)) for n in new_dvs]
            # one partition PER OLD FILE, not per bucket: a big bucket's
            # delete scan parallelizes like any other read, and each
            # task still sees the whole new-DV id set (small by the
            # O(batch) delete-commit contract)
            parts.extend(
                _ChangeDVPartition([of], old_dvs, new_dv_paths, version)
                for of in old_files)
        return parts

    def read(self, partition):  # type: ignore[override]
        import pyarrow as pa
        import pyarrow.compute as pc
        from pyspark.sql.pandas.types import to_arrow_schema

        target = to_arrow_schema(self._schema)
        data_fields = [f for f in target
                       if f.name not in ("_change_type", "_commit_version")]

        phys = lambda n: self._physmap.get(n, n)  # noqa: E731

        def conform(tbl, change_type, version):
            cols = []
            for f in data_fields:
                if phys(f.name) in tbl.column_names:
                    c = tbl.column(phys(f.name)).cast(f.type)
                    cols.append(c.combine_chunks()
                                if isinstance(c, pa.ChunkedArray) else c)
                else:
                    cols.append(pa.nulls(tbl.num_rows, f.type))
            cols.append(pa.array([change_type] * tbl.num_rows,
                                 type=pa.string()))
            cols.append(pa.array([version] * tbl.num_rows,
                                 type=pa.int64()))
            return pa.Table.from_arrays(cols, schema=target)

        if partition.kind == "insert":
            tbl = _read_arrow_file(partition.path)
            out = conform(tbl, "insert", partition.version)
            yield from out.to_batches(max_chunksize=1 << 16)
            return

        # delete side: rows alive under the OLD DV state and killed by
        # the new DVs
        def dv_kills(dvs, file_seq):
            ids = set()
            for dv_path, dseq in dvs:
                if dseq > file_seq:
                    ids.update(_read_arrow_file(dv_path)
                               .column("documentid").to_pylist())
            return ids

        new_ids = set()
        for dv_path, _ in partition.new_dvs:
            new_ids.update(_read_arrow_file(dv_path)
                           .column("documentid").to_pylist())
        pieces = []
        for path, seq in partition.old_files:
            tbl = _read_arrow_file(path)
            already_dead = dv_kills(partition.old_dvs, seq)
            # the new DVs share the commit's seq, which is > every
            # retained file's seq, so membership alone decides the kill
            mask_new = pc.is_in(tbl.column("documentid"),
                                value_set=pa.array(sorted(new_ids)))
            if already_dead:
                mask_old = pc.is_in(tbl.column("documentid"),
                                    value_set=pa.array(sorted(already_dead)))
                mask = pc.and_(mask_new, pc.invert(mask_old))
            else:
                mask = mask_new
            hit = tbl.filter(mask)
            if hit.num_rows:
                pieces.append(hit)
        for tbl in pieces:
            out = conform(tbl, "delete", partition.version)
            yield from out.to_batches(max_chunksize=1 << 16)

    def commit(self, end: dict) -> None:
        # same engine-committed ack as the table reader: advance the
        # pacing position and delivery floor
        v = int(end.get("version", -1)) if isinstance(end, dict) else -1
        if v >= 0:
            self._pos = max(getattr(self, "_pos", v), v)
            fl = getattr(self, "_floor", None)
            self._floor = v if fl is None else max(fl, v)


class LakehouseChangesDataSource(DataSource):
    """``spark.readStream.format("lakehouse_changes").load(table)``."""

    @classmethod
    def name(cls) -> str:
        return "lakehouse_changes"

    def schema(self):
        from pyspark.sql import types as T

        base = LakehouseTableDataSource(self.options).schema()
        return T.StructType(
            list(base.fields)
            + [T.StructField("_change_type", T.StringType(), True),
               T.StructField("_commit_version", T.LongType(), True)])

    def streamReader(self, schema):
        return _ChangesStreamReader(schema, dict(self.options))


def stream_changes(spark: SparkSession, table: str, *,
                   starting_version: int = 0,
                   skip_rewrites: bool = False,
                   max_commits_per_trigger: Optional[int] = None,
                   pace_from_start: bool = False,
                   checkpoint: Optional[str] = None):
    """Open a manifest table's CHANGE FEED as a streaming DataFrame
    (Delta's ``readChangeFeed`` analog): per-commit row-level changes
    with ``_change_type`` ('insert'/'delete'; updates are their
    delete+insert pair) and ``_commit_version``. Commits that rewrite
    files raise unless ``skip_rewrites`` (exact for compaction/OPTIMIZE,
    which are content-neutral; NOT for restore).
    ``max_commits_per_trigger`` bounds how many commits one micro-batch
    spans — consumers that must see every intermediate version (e.g.
    :func:`..streaming.pipeline.stream_history`) set 1. Without
    ``pace_from_start`` the first batch of a fresh query is UNPACED
    (the engine polls the latest offset before the initial one), so an
    availableNow run still drains the whole backlog in one batch;
    with it, even the bootstrap batch spans at most
    ``max_commits_per_trigger`` commits — and an availableNow run then
    applies at most that many commits before terminating (bounded work
    per run), so paced bootstrap callers should use a processing-time
    trigger or rerun until drained. ``checkpoint`` should name the
    query's checkpointLocation when ``pace_from_start`` is set: the
    reader anchors its pace seed on the checkpoint's offset log so a
    RESTARTED query's first poll can never return an offset below the
    committed one (without it, a restart costs one empty rewound
    batch — see :func:`_checkpoint_offset`)."""
    spark.dataSource.register(LakehouseChangesDataSource)
    reader = (spark.readStream.format("lakehouse_changes")
              .option("path", table)
              .option("startingVersion", str(starting_version)))
    if skip_rewrites:
        reader = reader.option("skipRewrites", "true")
    if max_commits_per_trigger is not None:
        reader = reader.option("maxCommitsPerTrigger",
                               str(max_commits_per_trigger))
    if pace_from_start:
        reader = reader.option("paceFromStart", "true")
    if checkpoint is not None:
        reader = reader.option("checkpointLocation", checkpoint)
    return reader.load()


def stream_table(spark: SparkSession, table: str, *,
                 starting_version: Optional[int] = None,
                 skip_change_commits: bool = False,
                 max_commits_per_trigger: Optional[int] = None,
                 pace_from_start: bool = False,
                 columns: Optional[List[str]] = None,
                 checkpoint: Optional[str] = None):
    """Open a manifest table as a streaming DataFrame.

    ``starting_version=None`` (default) emits the current snapshot as the
    first micro-batch, then tails appends; an integer starts at that
    commit with no snapshot. ``skip_change_commits`` mirrors Delta's
    option: silently skip commits that rewrite or delete existing rows
    instead of failing the stream. ``max_commits_per_trigger`` bounds
    how many table commits one micro-batch may span (Delta's
    ``maxFilesPerTrigger`` analog at commit granularity) so a backlogged
    table drains paced instead of in one giant batch.
    ``pace_from_start`` (with ``starting_version``) paces even the
    FIRST batch of a fresh query — without it the bootstrap batch is
    unpaced because the engine polls the latest offset before the
    initial one; see :func:`stream_changes` for the availableNow
    interaction and the ``checkpoint`` restart anchor.
    """
    spark.dataSource.register(LakehouseTableDataSource)
    reader = spark.readStream.format(_FORMAT_NAME).option("path", table)
    if starting_version is not None:
        reader = reader.option("startingVersion", str(starting_version))
    if skip_change_commits:
        reader = reader.option("skipChangeCommits", "true")
    if max_commits_per_trigger is not None:
        reader = reader.option("maxCommitsPerTrigger",
                               str(max_commits_per_trigger))
    if pace_from_start:
        reader = reader.option("paceFromStart", "true")
    if checkpoint is not None:
        reader = reader.option("checkpointLocation", checkpoint)
    if columns is not None:
        # projection must be declared at the source: Spark does not push
        # column pruning into Python data sources, so a downstream
        # .select() would still read every column from parquet
        reader = reader.option("columns", ",".join(columns))
    return reader.load()
