"""Z-order (Morton) data layout for multi-dimensional file pruning.

Partitioning prunes on ONE key; real workloads filter on several
(documentid + language, custkey + date). The lakehouse answer — Delta
``OPTIMIZE ZORDER BY``, Iceberg sort orders — is to sort files along a
space-filling curve so every file's min/max footer stats are tight in
*all* chosen dimensions at once, and any engine's stats-based skipping
(parquet row-group stats, the manifest store's per-file stats in
``manifest_store.read_documents``) prunes multi-predicate scans.

The curve key is integer expression math only (scale by integer
multiply + integer division, then shift/and/or bit interleaving), so it
is whole-stage-codegen'd JVM-side, shuffle-free, and bit-identical in any
SQL engine — the oracle checks the key itself.

At 100 TB: the z-key is a pure projection; the layout write is ONE range
shuffle (``repartitionByRange`` on the key) — the same shuffle a plain
sort-by-one-column write would cost — after which files carry tight
multi-column stats forever. Re-clustering is incremental per partition.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import Column, DataFrame, functions as F

__all__ = ["zorder_key", "zorder_write_ready", "zorder_key_sql"]


def _check(cols: Sequence[str], los: Sequence[int], his: Sequence[int],
           bits: int) -> None:
    n = len(cols)
    if n < 2:
        raise ValueError("z-order needs >= 2 columns (one column: plain sort)")
    if not (len(los) == len(his) == n):
        raise ValueError("los/his must match cols")
    if n * bits > 62:
        raise ValueError("ncols * bits must fit a signed long (<= 62)")
    if any(hi <= lo for lo, hi in zip(los, his)):
        raise ValueError("need hi > lo for every column")


def _scaled_terms(cols: Sequence[str], los: Sequence[int], his: Sequence[int],
                  bits: int, intdiv: str) -> list[str]:
    """Per-column scale to [0, 2^bits): ((clamp(v) - lo) * (2^bits - 1))
    intdiv (hi - lo). Integer arithmetic only — a float normalize would
    round differently per engine. Out-of-bounds values clamp to the
    edges, so stale bounds degrade clustering, never correctness."""
    top = (1 << bits) - 1
    return [
        f"(((least(greatest(CAST({c} AS BIGINT), {lo}), {hi}) - {lo})"
        f" * {top}) {intdiv} {hi - lo})"
        for c, lo, hi in zip(cols, los, his)
    ]


def zorder_key(cols: Sequence[str], los: Sequence[int], his: Sequence[int],
               bits: int = 16) -> Column:
    """Morton key over integer columns with caller-declared [lo, hi]
    bounds: bit b of scaled column j lands at position ``b * ncols + j``.
    Returns a long Column (Spark SQL ``div`` + shiftleft/shiftright)."""
    _check(cols, los, his, bits)
    n = len(cols)
    scaled = _scaled_terms(cols, los, his, bits, "div")
    terms = [
        f"shiftleft(shiftright({s}, {b}) & 1, {b * n + j})"
        for b in range(bits)
        for j, s in enumerate(scaled)
    ]
    return F.expr("(" + " | ".join(terms) + ")")


def zorder_key_sql(cols: Sequence[str], los: Sequence[int], his: Sequence[int],
                   bits: int = 16) -> str:
    """The identical Morton key as DuckDB SQL (``//`` + ``<<``/``>>``)."""
    _check(cols, los, his, bits)
    n = len(cols)
    scaled = _scaled_terms(cols, los, his, bits, "//")
    terms = [
        f"((({s} >> {b}) & 1) << {b * n + j})"
        for b in range(bits)
        for j, s in enumerate(scaled)
    ]
    return "(" + " | ".join(terms) + ")"


def zorder_write_ready(df: DataFrame, cols: Sequence[str],
                       los: Sequence[int], his: Sequence[int],
                       bits: int = 16, n_files: int = 64) -> DataFrame:
    """The layout step: range-partition by the z-key into ``n_files``
    groups and sort within partitions — the write side of OPTIMIZE
    ZORDER. Writing the result (one file per range partition) yields
    files whose min/max stats are tight in every z-ordered dimension."""
    return (
        df.withColumn("_zkey", zorder_key(cols, los, his, bits))
        .repartitionByRange(n_files, "_zkey")
        .sortWithinPartitions("_zkey")
    )


def string_prefix_key(col: str, nbytes: int = 7) -> Column:
    """Order-preserving integer key for a STRING column: the first
    ``nbytes`` UTF-8 bytes, big-endian (shorter strings zero-pad, which
    sorts them first — exactly byte-wise string order). 7 bytes stays
    under 2^56, inside signed-long integer math for the z-curve scaler.
    Collisions beyond the prefix only coarsen clustering, never
    correctness — file skipping still compares the REAL string min/max
    stats; this key only decides layout."""
    if not (1 <= nbytes <= 7):
        raise ValueError("nbytes must be in [1, 7]")
    hexpr = f"hex(encode(coalesce({col}, ''), 'UTF-8'))"
    return F.expr(
        f"CAST(conv(rpad(substring({hexpr}, 1, {2 * nbytes}),"
        f" {2 * nbytes}, '0'), 16, 10) AS BIGINT)"
    )


def string_prefix_int(value: str, nbytes: int = 7) -> int:
    """The same key computed driver-side (for bounds from string
    min/max stats)."""
    raw = (value or "").encode("utf-8")[:nbytes]
    return int.from_bytes(raw.ljust(nbytes, b"\x00"), "big")
