"""Incrementally-maintained aggregate views over manifest-store tables.

A 100 TB base table whose dashboard aggregates are recomputed from
scratch on every append wastes a full scan per refresh; every mergeable
aggregate (count / sum / min / max) can instead be maintained from the
COMMIT DELTA: aggregate only the data files added since the last
refresh and fold the partials into the stored view — O(new data), not
O(table).

Mechanics (mirrors how Materialize/Delta Live Tables shape the problem,
reduced to append-only deltas):

* the view directory holds the aggregated rows as one parquet plus a
  ``_VIEW_META`` json recording the base version, the exact data-file
  names folded in so far, and the aggregate spec;
* :func:`refresh` diffs the base manifest's file list against the
  recorded one — appends create NEW files only, so aggregating just
  those and merging partials (count→sum, sum→sum, min→min, max→max) is
  exact;
* non-append churn (updates, deletes, replace-by-id) stays incremental
  for count/sum specs via the CHANGE FEED (r6): the signed diff between
  the view's base version and head folds in as +1 per inserted row and
  -1 per deleted one, with an internal ``_rows`` counter deciding when
  a group disappears — O(changed rows), the Materialize-style delta
  path. min/max cannot subtract, and file REWRITES (compaction) break
  the fast diff → automatic fall back to a full recompute.

Exactness note: integer sums and min/max merge bit-exactly; a DOUBLE sum
folds in a different order than a single-pass aggregation and can differ
in final ulps — use integer columns (or counts) where engine-exact
parity matters, same rule as everywhere else in this repo.

The reference has no derived-view machinery at all (its writer is a
row-level upsert sink, ``VectorStoreWriter.cs``); this module is part of
the beyond-reference lakehouse surface on top of ``manifest_store``.
"""

from __future__ import annotations

import json
import os
from typing import Dict, List, Optional, Tuple

from pyspark.sql import DataFrame, functions as F

from . import manifest_store as ms

_META = "_VIEW_META"
_DATA = "view.parquet"

#: aggregate spec: list of (source_col, func) with func in AGG_FUNCS;
#: output column is f"{func}_{col}" (count uses "*" → "n_rows")
AGG_FUNCS = ("count", "sum", "min", "max")


def _out_col(col: str, func: str) -> str:
    return "n_rows" if func == "count" else f"{func}_{col}"


def _agg_exprs(aggs: List[Tuple[str, str]], merge: bool) -> List[F.Column]:
    """First-pass exprs over raw rows, or merge exprs over partials
    (count merges by SUM, everything else by its own function)."""
    out = []
    for col, func in aggs:
        name = _out_col(col, func)
        if func == "count":
            e = F.sum(name) if merge else F.count("*")
        elif func == "sum":
            e = F.sum(name if merge else col)
        elif func == "min":
            e = F.min(name if merge else col)
        elif func == "max":
            e = F.max(name if merge else col)
        else:
            raise ValueError(f"unsupported aggregate {func!r} (use {AGG_FUNCS})")
        out.append(e.alias(name))
    return out


def _read_meta(view_path: str) -> Optional[Dict]:
    try:
        with open(os.path.join(view_path, _META)) as fh:
            return json.load(fh)
    except FileNotFoundError:
        return None


def _base_state(manifest: Dict) -> Tuple[List[str], List[str]]:
    """(sorted data-file names, sorted delete-file names) of a manifest."""
    names = sorted(n for fs in manifest["buckets"].values() for n in fs)
    dels = sorted(n for fs in manifest.get("deletes", {}).values() for n in fs)
    return names, dels


def refresh(spark, base_table: str, view_path: str,
            group_cols: List[str], aggs: List[Tuple[str, str]]) -> str:
    """Bring the view up to date with the base table's current version.
    Returns ``"noop"`` (already current), ``"incremental"`` (only the
    appended files were scanned) or ``"full"`` (recompute — first
    refresh, non-append churn, or a changed spec). The view itself is
    atomically swapped, so readers never see a half refresh."""
    manifest = ms.read_manifest(base_table)
    files, del_files = _base_state(manifest)
    spec = {"group_cols": list(group_cols),
            "aggs": [list(a) for a in aggs]}
    meta = _read_meta(view_path)

    # the meta names the exact data file it describes; if that file is
    # gone (crash between data and meta swaps of a *previous* refresh
    # never leaves this state — data files are generation-named and only
    # deleted after the meta swap — but a manually mangled view can) the
    # incremental branch would fold deltas into the wrong snapshot →
    # force a full recompute instead.
    data_name = (meta or {}).get("data_file", _DATA)
    data_ok = meta is not None and os.path.exists(
        os.path.join(view_path, data_name))

    if data_ok and meta["spec"] == spec:
        if meta["files"] == files and meta.get("del_files", []) == del_files:
            return "noop"
        prev = set(meta["files"])
        appended = [n for n in files if n not in prev]
        # appends only create files; existing deletion vectors cannot touch
        # them (a DV kills only files with strictly SMALLER seq), so the
        # delta rule holds as long as the delete-file set itself is frozen
        append_only = (
            meta.get("del_files", []) == del_files and set(files) >= prev
        )
        old = spark.read.parquet(os.path.join(view_path, data_name))
        # A pre-_rows snapshot takes the FULL branch (which writes _rows
        # for every group) rather than seeding NULLs: F.sum skips nulls,
        # so groups untouched by this append would carry NULL _rows
        # forever and the CDF branch's `_rows > 0` filter would silently
        # drop them on the first delete.
        if append_only and appended and "_rows" in old.columns:
            delta = ms._read_files(spark, base_table, manifest,
                                   file_subset=set(appended))
            partial = delta.groupBy(*group_cols).agg(
                *_agg_exprs(aggs, merge=False),
                F.count(F.lit(1)).alias("_rows"))
            merged = (
                old.unionByName(partial)
                .groupBy(*group_cols)
                .agg(*_agg_exprs(aggs, merge=True),
                     F.sum("_rows").alias("_rows"))
            )
            _write_view(merged, view_path, manifest, files, spec, del_files)
            return "incremental"

        # CDF branch — non-append churn (updates, deletes, replaces) is
        # still incremental for count/sum specs: fold the SIGNED change
        # feed between the view's base version and head (+1 per inserted
        # row, -1 per deleted; an update is its delete+insert pair).
        # min/max can't subtract, and a pre-_rows snapshot can't tell an
        # emptied group from a zero-sum one — both fall back to full.
        # Gate on the DIFF's fast path: file REWRITES (compaction) force
        # table_diff into its generic exceptAll (two full scans) — for a
        # content-identical rewrite that costs 2x a recompute for an
        # empty feed, so rewrites take the full branch instead.
        kept_files_intact = set(files) >= prev
        if ({f for _, f in aggs} <= {"count", "sum"}
                and "_rows" in old.columns and kept_files_intact):
            try:
                diff = ms.table_diff(spark, base_table,
                                     int(meta["base_version"]),
                                     manifest["version"])
            except (FileNotFoundError, json.JSONDecodeError):
                diff = None  # base version vacuumed: full recompute
            if diff is not None:
                sgn = F.when(F.col("_change_type") == "insert",
                             F.lit(1)).otherwise(F.lit(-1))
                exprs = []
                for col, func in aggs:
                    out = _out_col(col, func)
                    if func == "count":
                        exprs.append(
                            F.sum(F.when(F.col(col).isNotNull(), sgn)
                                  .otherwise(F.lit(0)))
                            .cast("long").alias(out))
                    else:
                        exprs.append(F.sum(F.col(col) * sgn).alias(out))
                partial = diff.groupBy(*group_cols).agg(
                    *exprs, F.sum(sgn).alias("_rows"))
                merged = (
                    old.unionByName(partial)
                    .groupBy(*group_cols)
                    .agg(*_agg_exprs(aggs, merge=True),
                         F.sum("_rows").alias("_rows"))
                    .filter(F.col("_rows") > 0)
                )
                _write_view(merged, view_path, manifest, files, spec,
                            del_files)
                return "incremental_cdf"

    base = ms.read_table(spark, base_table)
    full = base.groupBy(*group_cols).agg(*_agg_exprs(aggs, merge=False),
                                         F.count(F.lit(1)).alias("_rows"))
    _write_view(full, view_path, manifest, files, spec, del_files)
    return "full"


def _write_view(df: DataFrame, view_path: str, manifest: Dict,
                files: List[str], spec: Dict, del_files: List[str]) -> None:
    """Publish a new view snapshot crash-safely. Data files are
    GENERATION-NAMED (``view-<gen>.parquet``) and the meta records which
    one it describes, so the meta swap is the single commit point:

    * crash after writing ``view-<g+1>.parquet`` but before the meta
      swap → meta still names ``view-<g>.parquet`` (untouched; old
      generations are deleted only *after* the swap), so readers and the
      next refresh see the previous consistent snapshot and the orphan
      is overwritten/garbage-collected later;
    * crash after the meta swap → new snapshot is live; the leftover old
      generation is cleaned up by the next successful refresh.

    Never stage-then-rename onto a fixed name: that made the data swap
    visible *before* the meta swap, and a crash in between let the next
    refresh fold appended files into a snapshot that already contained
    them (silent double counting)."""
    # the VIEW artifact is local-FS by design (single-file swap via
    # os.replace is its crash-atomicity mechanism); the base TABLE is the
    # portable object — recompute views next to the compute tier
    os.makedirs(view_path, exist_ok=True)
    meta = _read_meta(view_path)
    gen = (meta or {}).get("gen", -1) + 1
    data_name = f"view-{gen:06d}.parquet"
    staging = os.path.join(view_path, "_staging")
    df.coalesce(1).write.mode("overwrite").parquet(staging)
    part = next(p for p in sorted(os.listdir(staging)) if p.endswith(".parquet"))
    os.replace(os.path.join(staging, part), os.path.join(view_path, data_name))
    import shutil

    shutil.rmtree(staging, ignore_errors=True)
    tmp = os.path.join(view_path, _META + ".tmp")
    with open(tmp, "w") as fh:
        json.dump({"base_version": manifest["version"], "files": files,
                   "spec": spec, "del_files": del_files,
                   "gen": gen, "data_file": data_name}, fh)
    os.replace(tmp, os.path.join(view_path, _META))
    for name in os.listdir(view_path):
        if ((name.startswith("view-") and name.endswith(".parquet")
             and name != data_name) or name == _DATA):
            try:
                os.remove(os.path.join(view_path, name))
            except OSError:
                pass


def read_view(spark, view_path: str) -> DataFrame:
    meta = _read_meta(view_path)
    data_name = (meta or {}).get("data_file", _DATA)
    df = spark.read.parquet(os.path.join(view_path, data_name))
    return df.drop("_rows")  # internal group-liveness counter
