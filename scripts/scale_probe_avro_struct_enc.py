"""Measure-then-decide probe for vectorized STRUCT-column Avro
ENCODE (r14; decode got structs in r13-r14, the write side still
falls back to the scalar per-value encoder for struct frames).

A record-of-fields is wire-identical to the fields inlined in order,
so the vectorized encode of a struct column = extract child columns
(Arrow does dict→struct field extraction in C) + the existing flat
wave layout with the children interleaved at per-row offsets.

Proxy kernels (no encoder code):

* scalar    — `write_container` on rows with a struct field (today's
  write_avro fallback path for struct frames).
* vec_proxy — pa.array(dicts → StructArray) child extraction + the
  SHIPPED vectorized flat encoder on the inlined twin frame (the
  wire bytes are identical modulo the header's schema JSON).

Implement only if vec_proxy clears ~1.5x at both sizes.

* vec       — the SHIPPED r14 path (added after the proxy cleared at
  ~3x): `write_container_frame` on the struct frame itself —
  `encode_frame` flattens non-nullable struct columns to their
  children (one Arrow C pass per struct) and the existing wave
  layout encodes the inlined twin, byte-identical to scalar.

Usage: python scripts/scale_probe_avro_struct_enc.py [reps]
"""

from __future__ import annotations

import json
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SIZES = (200_000, 1_000_000)

NESTED = {"type": "record", "name": "r", "fields": [
    {"name": "id", "type": "long"},
    {"name": "inner", "type": {"type": "record", "name": "i",
                               "fields": [
        {"name": "a", "type": "long"},
        {"name": "b", "type": "string"},
        {"name": "c", "type": "double"}]}}]}

FLAT_TWIN = {"type": "record", "name": "r", "fields": [
    {"name": "id", "type": "long"},
    {"name": "a", "type": "long"},
    {"name": "b", "type": "string"},
    {"name": "c", "type": "double"}]}


def _time(fn, reps):
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        fn()
        best = min(best, time.perf_counter() - t0)
    return best


def main() -> None:
    reps = int(sys.argv[1]) if len(sys.argv) > 1 else 3
    import pandas as pd
    import pyarrow as pa

    from dataingestion_spark.sources.avro import (
        parse_schema, write_container,
    )
    from dataingestion_spark.sources.avro_vec_enc import encode_frame

    flat_node = parse_schema(FLAT_TWIN)

    for n in SIZES:
        rows = [{"id": i,
                 "inner": {"a": i * 3, "b": f"tag-{i % 997}",
                           "c": i * 0.25}} for i in range(n)]
        pdf = pd.DataFrame({
            "id": pd.Series([r["id"] for r in rows]),
            "inner": pd.Series([r["inner"] for r in rows],
                               dtype=object)})
        struct_t = pa.struct([("a", pa.int64()), ("b", pa.string()),
                              ("c", pa.float64())])

        def scalar():
            p = tempfile.mktemp(suffix=".avro")
            write_container(p, NESTED, rows, block_rows=1024)
            size = os.path.getsize(p)
            os.remove(p)
            return size

        def vec_proxy():
            # child extraction: one C pass dicts -> StructArray
            sa = pa.array(pdf["inner"], type=struct_t,
                          from_pandas=True)
            twin = pd.DataFrame({
                "id": pdf["id"],
                "a": sa.field("a").to_pandas(),
                "b": sa.field("b").to_pandas(),
                "c": sa.field("c").to_pandas()})
            res = encode_frame(flat_node, twin,
                               ["id", "a", "b", "c"])
            assert res is not None, "flat twin encoder declined"
            payload, _row_end = res
            return len(payload)

        from dataingestion_spark.sources.avro import (
            write_container_frame,
        )

        def vec():
            p = tempfile.mktemp(suffix=".avro")
            ok = write_container_frame(p, NESTED, pdf,
                                       ["id", "inner"],
                                       block_rows=1024)
            assert ok, "struct frame declined"
            size = os.path.getsize(p)
            os.remove(p)
            return size

        sc = _time(scalar, reps)
        vp = _time(vec_proxy, reps)
        vr = _time(vec, reps)
        print(json.dumps({
            "kernel": "avro_struct_encode", "rows": n,
            "scalar_s": round(sc, 3), "vec_proxy_s": round(vp, 3),
            "vec_s": round(vr, 3),
            "speedup_proxy": round(sc / vp, 2),
            "speedup": round(sc / vr, 2)}))


if __name__ == "__main__":
    main()
