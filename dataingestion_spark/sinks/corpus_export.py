"""Incremental training-corpus exports from a lakehouse table.

A training snapshot published as interchange shards (zstd-JSONL,
TFRecord, Arrow IPC) goes stale as the source table takes merges and
deletes; re-exporting 100 TB for a 0.1% change is the wrong shape.
Because every interchange sink in this repo writes DETERMINISTIC
shard bytes (hash-shard on a key, sort within the shard), a shard's
content is a pure function of the live rows hashing into it — so an
incremental publish only has to rewrite the shards whose row set
changed:

1. the table's change feed (``manifest_store.table_diff``) between the
   last exported version and now yields the changed keys — O(changed
   commits), never a snapshot diff;
2. changed keys map to shard ids by the same ``pmod(xxhash64(key),
   shards)`` the writers use; the distinct ids are the rewrite list
   (≤ shards, usually ≪);
3. the current snapshot filtered to those ids rewrites just those
   files; a shard whose rows all died is rewritten EMPTY (formats'
   empty representations are all valid reads), so the directory never
   serves deleted rows.

The result is byte-identical to a full re-export (pinned by test),
which makes incremental publishes idempotent, verifiable, and safe to
resume. State (source version, sharding spec) rides in
``_export_state.json`` inside the output directory.

Scale shape: step 1 is change-feed reads (pruned, O(changed files));
step 3 is one filtered scan of the snapshot — a full scan at worst,
but only ~|affected|/shards of the WRITE. With the source table
bucketed on the same key, the filter also prunes the read; that
wiring is the caller's layout choice, noted here rather than forced.
"""

from __future__ import annotations

import json
import os
from typing import Dict, List, Optional

from pyspark.sql import DataFrame, SparkSession, functions as F

__all__ = ["export_corpus", "export_corpus_incremental", "verify_export"]

_STATE = "_export_state.json"
_FORMATS = ("jsonl_zst", "tfrecord", "arrow")


def _shard_expr(key: str, shards: int):
    # MUST match the writers' sharding expression exactly — a drifted
    # copy silently rewrites the wrong files
    return F.pmod(F.xxhash64(F.col(key).cast("string")), F.lit(shards)) \
        .cast("int")


def _write(df: DataFrame, fmt: str, out_dir: str, key: str, shards: int,
           features: Optional[Dict[str, str]]) -> List[str]:
    if fmt == "jsonl_zst":
        from ..sources.jsonl import write_jsonl_zst

        return write_jsonl_zst(df, out_dir, shards=shards, order_by=key)
    if fmt == "tfrecord":
        from ..sources.tfrecord import write_tfrecord

        if not features:
            raise ValueError("tfrecord export needs a features dict")
        return write_tfrecord(df, features, out_dir, shards=shards,
                              order_by=key)
    from ..sources.arrow_ipc import write_arrow_ipc

    return write_arrow_ipc(df, out_dir, shards=shards, order_by=key)


def _shard_name(fmt: str, shard: int, shards: int) -> str:
    ext = {"jsonl_zst": ".jsonl.zst", "tfrecord": ".tfrecord",
           "arrow": ".arrow"}[fmt]
    return f"part-{shard:05d}-of-{shards:05d}{ext}"


def _write_empty_shard(df: DataFrame, fmt: str, out_dir: str, name: str,
                       features: Optional[Dict[str, str]]) -> None:
    """A shard whose live row set emptied still needs a (valid, empty)
    file on disk — the hash-group writers only emit non-empty groups,
    and leaving the old file would keep serving deleted rows."""
    path = os.path.join(out_dir, name)
    if fmt == "jsonl_zst":
        import pyarrow as pa

        with open(path, "wb") as f:
            f.write(pa.Codec("zstd").compress(b"").to_pybytes())
    elif fmt == "tfrecord":
        open(path, "wb").close()  # zero records = empty framing stream
    else:
        import pyarrow as pa

        from pyspark.sql.pandas.types import to_arrow_schema

        schema = to_arrow_schema(df.schema)
        with pa.OSFile(path, "wb") as sink:
            with pa.ipc.new_file(sink, schema):
                pass  # footer + schema, zero batches


def export_corpus(spark: SparkSession, table: str, out_dir: str, *,
                  fmt: str = "jsonl_zst", key: str = "documentid",
                  shards: int = 16, columns: Optional[List[str]] = None,
                  features: Optional[Dict[str, str]] = None) -> dict:
    """Full snapshot publish + state stamp; returns the state dict."""
    from . import manifest_store as ms

    if fmt not in _FORMATS:
        raise ValueError(f"fmt must be one of {_FORMATS}")
    version = ms.current_version(table)
    if version is None:
        raise ValueError(f"{table}: no committed version to export")
    snap = ms.read_table(spark, table, version=version)
    if columns is not None:
        snap = snap.select(*columns)
    if key not in snap.columns:
        raise ValueError(f"export key {key!r} not in columns")
    os.makedirs(out_dir, exist_ok=True)
    names = _write(snap, fmt, out_dir, key, shards, features)
    # shards with no rows at all still get a valid empty file so the
    # directory's name set is complete and stable across publishes
    for s in range(shards):
        n = _shard_name(fmt, s, shards)
        if n not in names and not os.path.exists(os.path.join(out_dir, n)):
            _write_empty_shard(snap, fmt, out_dir, n, features)
    state = {"version": version, "fmt": fmt, "key": key, "shards": shards,
             "columns": columns, "rewritten": sorted(names),
             "sha256": _digests(out_dir, fmt, shards)}
    with open(os.path.join(out_dir, _STATE), "w") as f:
        json.dump(state, f)
    return state


def _digests(out_dir: str, fmt: str, shards: int,
             only: Optional[List[str]] = None) -> Dict[str, str]:
    """sha256 per shard — deterministic bytes make the export
    CONTENT-ADDRESSABLE, so the manifest doubles as an integrity
    contract a consumer (or `verify_export`) can check offline.
    ``only`` restricts hashing to the named shards (the incremental
    path re-hashes O(changed), never O(corpus))."""
    import hashlib

    names = only if only is not None else [
        _shard_name(fmt, s, shards) for s in range(shards)]
    out = {}
    for n in names:
        h = hashlib.sha256()
        with open(os.path.join(out_dir, n), "rb") as f:
            for chunk in iter(lambda: f.read(1 << 20), b""):
                h.update(chunk)
        out[n] = h.hexdigest()
    return out


def verify_export(out_dir: str) -> List[str]:
    """Re-hash every shard against the stamped manifest; returns the
    names that DIVERGE (empty list = intact). Catches torn copies,
    bit rot, and out-of-band edits before a training run consumes
    them — cheap because it is pure local IO, no Spark session."""
    with open(os.path.join(out_dir, _STATE)) as f:
        state = json.load(f)
    fresh = _digests(out_dir, state["fmt"], int(state["shards"]))
    stamped = state.get("sha256") or {}
    return sorted(n for n in fresh
                  if stamped.get(n) != fresh[n])


def _load_state(out_dir: str) -> dict:
    try:
        with open(os.path.join(out_dir, _STATE)) as f:
            return json.load(f)
    except FileNotFoundError:
        raise ValueError(
            f"{out_dir}: no {_STATE} — run export_corpus first")


def _rewrite_shards(spark: SparkSession, table: str, out_dir: str,
                    state: dict, affected: List[int], version: int,
                    features: Optional[Dict[str, str]]) -> dict:
    """Rewrite ``affected`` shard ids from the ``version`` snapshot and
    re-stamp state. IDEMPOTENT: rewriting a shard always produces the
    bytes a full export of that snapshot would — so a replayed
    streaming batch or a crashed-and-retried incremental run converges
    instead of corrupting."""
    from . import manifest_store as ms

    fmt, key, shards = state["fmt"], state["key"], int(state["shards"])
    snap = ms.read_table(spark, table, version=version)
    if state["columns"] is not None:
        snap = snap.select(*state["columns"])
    part = snap.filter(_shard_expr(key, shards).isin(list(affected)))
    names = _write(part, fmt, out_dir, key, shards, features) \
        if affected else []
    for s in affected:  # emptied shards: rewrite as valid empty files
        n = _shard_name(fmt, s, shards)
        if n not in names:
            _write_empty_shard(snap, fmt, out_dir, n, features)
            names.append(n)
    state = {**state, "version": version, "rewritten": sorted(names),
             "sha256": {**(state.get("sha256") or {}),
                        **_digests(out_dir, fmt, shards, only=names)}}
    with open(os.path.join(out_dir, _STATE), "w") as f:
        json.dump(state, f)
    return state


def export_corpus_incremental(spark: SparkSession, table: str,
                              out_dir: str, *,
                              features: Optional[Dict[str, str]] = None
                              ) -> dict:
    """Rewrite only the shards whose row set changed since the stamped
    version; byte-identical to a full re-export. No-op (empty rewrite
    list) when the table hasn't moved."""
    from . import manifest_store as ms

    state = _load_state(out_dir)
    key, shards = state["key"], int(state["shards"])
    since = int(state["version"])
    cur = ms.current_version(table)
    if cur is None or cur < since:
        raise ValueError(f"{table}: version regressed ({since} -> {cur})")
    if cur == since:
        return {**state, "rewritten": []}
    diff = ms.table_diff(spark, table, since, cur)
    affected = sorted(
        r["_s"] for r in diff.select(
            _shard_expr(key, shards).alias("_s")).distinct().collect())
    return _rewrite_shards(spark, table, out_dir, state, affected, cur,
                           features)


def stream_export_corpus(spark: SparkSession, table: str, out_dir: str,
                         checkpoint: str, *,
                         features: Optional[Dict[str, str]] = None,
                         max_commits_per_trigger: Optional[int] = None,
                         available_now: bool = True):
    """Continuously-fresh published corpus: tail the table's change
    feed and rewrite affected shards per micro-batch.

    The change stream (``streaming.table_source.stream_changes``) does
    the exactly-once commit bookkeeping through its checkpoint; each
    batch's changed keys map to shard ids, and BOTH the rewrite
    snapshot and the state stamp anchor on the batch's own
    ``max(_commit_version)`` — never on ``current_version``, which may
    include commits the stream has not delivered (landed after an
    availableNow end-capture): stamping those would make a later
    ``export_corpus_incremental`` diff skip them, leaving their shards
    stale forever. With the batch anchor, the published directory
    always equals a full export of the STAMPED version (the engine is
    strictly sequential, so every commit ≤ the batch max is delivered
    by the time the batch runs), a replayed batch rewrites the same
    shards to the same bytes (idempotent, see _rewrite_shards), and
    newer commits are the next batch's job. ``available_now`` drains
    the backlog and stops (cron-style publish); False runs a
    continuous query. Returns the StreamingQuery."""
    from ..streaming.table_source import stream_changes

    state = _load_state(out_dir)
    key, shards = state["key"], int(state["shards"])
    changes = stream_changes(
        spark, table, starting_version=int(state["version"]) + 1,
        max_commits_per_trigger=max_commits_per_trigger,
        checkpoint=checkpoint)

    def publish(batch_df, batch_id):
        agg = batch_df.select(
            _shard_expr(key, shards).alias("_s"),
            F.col("_commit_version").alias("_v"))
        rows = agg.groupBy("_s").agg(F.max("_v").alias("_v")).collect()
        if not rows:
            return
        affected = sorted(r["_s"] for r in rows)
        batch_max = max(r["_v"] for r in rows)
        _rewrite_shards(spark, table, out_dir, _load_state(out_dir),
                        affected, int(batch_max), features)

    writer = (changes.writeStream.foreachBatch(publish)
              .option("checkpointLocation", checkpoint))
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
