"""Scale probe for the Avro decode paths (r11) — reproduces the
SCALE.md scalar-vs-vectorized table without Spark in the loop, so the
numbers isolate the codec itself.

Kernels, on a synthetic 4-column frame (long id / nullable string /
double / int) written with write_container at the default 1024-row
blocks:

* scalar — `read_container` (per-value python decode, rows of dicts),
* vec — `read_container_columnar` (numpy lock-step block decode,
  columnar output; `sources/avro_vec.py`),
* vec_arrays — same over an embedding-shaped frame
  (long id + 16-dim array<float>, non-nullable items).

Vector width = block count, so the vec speedup should GROW with row
count; under ~64 blocks the vec path returns None by design (the
probe asserts that too, at 1k rows).

Prints one JSON line per kernel (min-of-N secs per size + ratio);
paste into SCALE.md.

Usage: python scripts/scale_probe_avro.py [reps]
"""

from __future__ import annotations

import json
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SIZES = (200_000, 1_000_000)


def _flat_rows(n):
    return [{"id": i,
             "text": None if i % 7 == 0
             else "lorem ipsum dolor sit amet " * (i % 5),
             "score": i * 1.5, "n": i % 100} for i in range(n)]


FLAT = {"type": "record", "name": "r", "fields": [
    {"name": "id", "type": "long"},
    {"name": "text", "type": ["null", "string"], "default": None},
    {"name": "score", "type": "double"},
    {"name": "n", "type": "int"}]}

EMB = {"type": "record", "name": "e", "fields": [
    {"name": "id", "type": "long"},
    {"name": "emb", "type": {"type": "array", "items": "float"}}]}


def _emb_rows(n):
    return [{"id": i, "emb": [float(i % 97) / 7 + j for j in range(16)]}
            for i in range(n)]


def _time(fn, reps):
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        fn()
        best = min(best, time.perf_counter() - t0)
    return best


def main() -> None:
    reps = int(sys.argv[1]) if len(sys.argv) > 1 else 3
    from dataingestion_spark.sources.avro import (
        read_container, read_container_columnar, write_container,
    )

    # the design gate: tiny files go scalar on purpose
    p0 = tempfile.mktemp(suffix=".avro")
    write_container(p0, FLAT, _flat_rows(1000))
    assert read_container_columnar(open(p0, "rb").read(), p0)[1] is None
    os.remove(p0)

    for name, schema, mk in (("flat", FLAT, _flat_rows),
                             ("arrays", EMB, _emb_rows)):
        for n in SIZES:
            p = tempfile.mktemp(suffix=".avro")
            write_container(p, schema, mk(n))
            blob = open(p, "rb").read()
            os.remove(p)
            scalar = _time(lambda: read_container(blob, "probe"), reps)
            vec = _time(
                lambda: read_container_columnar(blob, "probe"), reps)
            cols = read_container_columnar(blob, "probe")[1]
            assert cols is not None, "vec path fell back unexpectedly"
            print(json.dumps({
                "kernel": f"avro_{name}", "rows": n,
                "mb": round(len(blob) / 1e6, 1),
                "blocks": n // 1024 + 1,
                "scalar_s": round(scalar, 3), "vec_s": round(vec, 3),
                "speedup": round(scalar / vec, 2),
                "vec_mrows_s": round(n / vec / 1e6, 2)}))


if __name__ == "__main__":
    main()
