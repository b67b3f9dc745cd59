"""Arbitrary stateful streaming on the state API v2
(``transformWithStateInPandas``, Spark 4.x).

This is the successor to ``applyInPandasWithState`` (see ``stateful.py``):
typed state variables (Value/List/Map) with per-variable TTL, event-time
timers, and RocksDB-backed state. Here: per-(user, event_type) running
``(n, min_value, max_value)`` via a MapState keyed by event_type — one
state row per (user, type) pair, so the store is O(distinct pairs), and
every accumulator is order-independent and EXACT (count, min, max — no
float summation), which is what makes the drained output fully
SQL-oracle-checkable: for each key the emission with the largest ``n`` is
the final total and must equal the batch ``GROUP BY`` on the same files.

Capability gate, now SELF-PROVISIONING: the v2 state protocol speaks
protobuf between the JVM and a dedicated Python state server. When the
real ``google.protobuf`` is absent (this image ships none),
:func:`ensure_protobuf` activates the repo's minimal pure-python
protobuf runtime (``shims/google/protobuf`` — wire-format codec +
dynamic message classes built from the generated module's own embedded
FileDescriptorProto) on the driver via ``sys.path`` and on executors
via ``SparkContext.addPyFile``, so the query runs LIVE end-to-end.
:func:`tws_available` is therefore True wherever either the real
package or the shim can load; the pure accumulation logic
(:func:`merge_type_stats`) stays unit-tested offline as well.

Reference parity: the reference has no stateful streaming at all (its
"streaming" is a pull-based IAsyncEnumerable,
``IngestionPipeline.cs:121``); this module is part of the
beyond-reference streaming surface next to ``stateful.py``.
"""

from __future__ import annotations

import importlib.util
from typing import Dict, Optional, Tuple

from pyspark.sql import functions as F

from .pipeline import events_stream_schema, normalize_event_ts

OUTPUT_SCHEMA = (
    "user_id long, event_type string, n bigint, min_value double, max_value double"
)

#: required by transformWithState: state lives in RocksDB, not the
#: default HDFS-backed in-memory provider
ROCKSDB_PROVIDER_CONF = {
    "spark.sql.streaming.stateStore.providerClass":
        "org.apache.spark.sql.execution.streaming.state."
        "RocksDBStateStoreProvider",
}


class TwsUnavailable(RuntimeError):
    """transformWithState's python worker needs the protobuf package."""


def _real_protobuf_present() -> bool:
    """True only for a REAL protobuf distribution. Two look-alikes must
    not count: (a) a bare namespace package — spark-core.jar sits on the
    worker PYTHONPATH and contains ``google/protobuf/*.proto`` resources,
    which Python happily assembles into an empty namespace ``google.
    protobuf`` ("unknown location" ImportErrors at use); (b) our own shim
    already on the driver's sys.path — the driver importing it must not
    skip shipping it to the workers."""
    try:
        # find_spec imports the parent package, so a missing 'google'
        # namespace raises instead of returning None
        spec = importlib.util.find_spec("google.protobuf")
    except ModuleNotFoundError:
        return False
    if spec is None or spec.origin is None:  # namespace portion only
        return False
    d = _shims_dir()
    return not (d is not None and spec.origin.startswith(d))


def _shims_dir() -> Optional[str]:
    import os

    d = os.path.join(os.path.dirname(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__)))), "shims")
    return d if os.path.isfile(
        os.path.join(d, "google", "protobuf", "_mini_runtime.py")) else None


def ensure_protobuf(spark=None) -> bool:
    """Make ``google.protobuf`` importable: no-op when the real package
    exists; otherwise put the repo's mini runtime on the driver's
    ``sys.path`` and (when a session is given) ship it to the Python
    workers with ``addPyFile`` — the canonical mechanism that lands on
    every worker's import path, local or cluster. Returns availability."""
    if _real_protobuf_present():
        return True
    d = _shims_dir()
    if d is None:
        return False
    import sys

    if d not in sys.path:
        sys.path.insert(0, d)
        importlib.invalidate_caches()
    if spark is not None:
        import os
        import tempfile
        import zipfile

        sc = spark.sparkContext
        if not getattr(sc, "_graft_protobuf_shim_shipped", False):
            zpath = os.path.join(tempfile.mkdtemp(prefix="pb_shim_"),
                                 "protobuf_shim.zip")
            with zipfile.ZipFile(zpath, "w") as zf:
                for root, _, files in os.walk(os.path.join(d, "google")):
                    for f in files:
                        if f.endswith(".py"):
                            p = os.path.join(root, f)
                            zf.write(p, os.path.relpath(p, d))
            # regular task workers: the include list delivered through the
            # worker protocol
            sc.addPyFile(zpath)
            # the TWS/foreachBatch "driver worker" (StreamingPythonRunner)
            # bypasses that protocol — it builds PYTHONPATH from the python
            # function's envVars, which pyspark seeds from sc.environment
            env_pp = sc.environment.get("PYTHONPATH", "")
            sc.environment["PYTHONPATH"] = (
                d if not env_pp else f"{d}{os.pathsep}{env_pp}")
            sc._graft_protobuf_shim_shipped = True
    return True


def tws_available() -> bool:
    """True when the state API v2's python dependency (protobuf) exists
    or the repo's mini runtime can stand in for it."""
    return _real_protobuf_present() or _shims_dir() is not None


Stats = Tuple[int, Optional[float], Optional[float]]  # (n, min, max)


def merge_type_stats(acc: Optional[Stats], n: int,
                     mn: Optional[float], mx: Optional[float]) -> Stats:
    """Order-independent, exact merge of a batch's (n, min, max) into the
    accumulator — the single place the processor's arithmetic lives, so
    the semantics are testable without a state server. None min/max =
    the batch had only null values (SQL MIN/MAX ignore nulls, COUNT(*)
    does not)."""
    if acc is None:
        return (n, mn, mx)
    lo = mn if acc[1] is None else acc[1] if mn is None else min(acc[1], mn)
    hi = mx if acc[2] is None else acc[2] if mx is None else max(acc[2], mx)
    return (acc[0] + n, lo, hi)


def batch_type_stats(pdf) -> Dict[str, Stats]:
    """Per-event_type (n, min, max) of one pandas batch (NaN values are
    genuine nulls in the source — excluded from min/max like SQL agg,
    counted by n like COUNT(*))."""
    out: Dict[str, Stats] = {}
    for et, g in pdf.groupby("event_type"):
        vals = g["value"].dropna()
        mn = float(vals.min()) if len(vals) else None
        mx = float(vals.max()) if len(vals) else None
        out[str(et)] = merge_type_stats(out.get(str(et)), len(g), mn, mx)
    return out


def make_processor():
    """Build the StatefulProcessor class lazily (the base class import is
    safe without protobuf; actually RUNNING it is not)."""
    from pyspark.sql.streaming.stateful_processor import (
        StatefulProcessor, StatefulProcessorHandle,
    )

    class UserTypeStatsProcessor(StatefulProcessor):
        """MapState[event_type -> (n, min, max)] per user; each batch
        emits the UPDATED totals for the types it touched. Totals are
        monotone in n, so max-by-n per key over all emissions equals the
        final state regardless of micro-batch count."""

        def init(self, handle: StatefulProcessorHandle) -> None:
            self._stats = handle.getMapState(
                "stats", "event_type string",
                "n bigint, mn double, mx double",
            )

        def handleInputRows(self, key, rows, timer_values):
            import pandas as pd

            agg: Dict[str, Stats] = {}
            for pdf in rows:
                for et, s in batch_type_stats(pdf).items():
                    agg[et] = merge_type_stats(agg.get(et), *s)
            out = []
            for et in sorted(agg):
                cur = (
                    tuple(self._stats.getValue((et,)))
                    if self._stats.containsKey((et,)) else None
                )
                merged = merge_type_stats(cur, *agg[et])
                self._stats.updateValue((et,), merged)
                out.append((key[0], et) + merged)
            yield pd.DataFrame(
                out, columns=["user_id", "event_type", "n",
                              "min_value", "max_value"],
            )

        def close(self) -> None:
            pass

    return UserTypeStatsProcessor()


def stream_user_type_stats(spark, events_dir: str,
                           query_name: str = "user_type_stats",
                           glob: str = "events*.parquet"):
    """events file-stream → per-(user, event_type) exact running
    (count, min, max) on the state API v2. Returns the started query.

    Raises :class:`TwsUnavailable` only when neither the real protobuf
    nor the repo's mini runtime is reachable; see the module docstring."""
    if not ensure_protobuf(spark):
        raise TwsUnavailable(
            "transformWithStateInPandas needs the 'protobuf' python package "
            "on driver and executors (pip install protobuf, or ship the "
            "repo's shims/google/protobuf mini runtime) plus the "
            "RocksDB state store provider "
            "(spark.sql.streaming.stateStore.providerClass="
            "...state.RocksDBStateStoreProvider)"
        )
    for k, v in ROCKSDB_PROVIDER_CONF.items():
        if spark.conf.get(k, "") != v:
            # a runtime-settable SQL conf: new streaming queries pick it up
            spark.conf.set(k, v)
    stream = normalize_event_ts(
        spark.readStream.schema(events_stream_schema(spark, events_dir, glob))
        .option("pathGlobFilter", glob)
        .parquet(events_dir)
    )
    out = stream.groupBy("user_id").transformWithStateInPandas(
        make_processor(), OUTPUT_SCHEMA, "Update", "None",
    )
    return (
        out.writeStream.outputMode("update")
        .format("memory")
        .queryName(query_name)
        .trigger(availableNow=True)
        .start()
    )


def final_totals(emissions):
    """Reduce the drained emission log to the final per-key totals:
    max-by-n works because totals are monotone in n (ties in n carry
    identical min/max — state only changes when n grows)."""
    w = F.struct(F.col("n"), F.col("min_value"), F.col("max_value"))
    return (
        emissions.groupBy("user_id", "event_type")
        .agg(F.max(w).alias("_t"))
        .select(
            "user_id", "event_type",
            F.col("_t.n").alias("n"),
            F.col("_t.min_value").alias("min_value"),
            F.col("_t.max_value").alias("max_value"),
        )
    )
