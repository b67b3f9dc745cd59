"""Observability helpers: plan inspection + stage timing.

The reference wraps every pipeline stage in Activity spans with document
tags (``IngestionPipeline.cs:179-226``). On Spark the execution story lives
in the UI/event log; what an engine can add is *assertable plan facts* —
did the filter push down, did the join broadcast — and cheap wall-clock
spans around driver-side orchestration.
"""

from __future__ import annotations

import contextlib
import io
import re
import time
from typing import Iterator

from pyspark.sql import DataFrame


def plan_summary(df: DataFrame) -> dict:
    """Facts from the formatted physical plan: pushed filters, scan schemas,
    join strategies, exchange count. Use in tests/CI to pin plan shape
    (`assert plan_summary(df)["sort_merge_joins"] == 0`)."""
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    s = buf.getvalue()
    pushed = re.findall(r"PushedFilters: \[([^\]]*)\]", s)
    schemas = re.findall(r"ReadSchema: (struct<[^\n]*)", s)
    return {
        "pushed_filters": [p for p in pushed if p.strip()],
        "read_schemas": schemas,
        "broadcast_hash_joins": s.count("BroadcastHashJoin"),
        "sort_merge_joins": s.count("SortMergeJoin"),
        "nested_loop_joins": s.count("BroadcastNestedLoopJoin"),
        "exchanges": s.count("Exchange"),
        "aqe": "AdaptiveSparkPlan" in s,
    }


@contextlib.contextmanager
def span(name: str, sink: dict | None = None) -> Iterator[None]:
    """Driver-side timing span (the Activity analog). Appends seconds to
    ``sink[name]`` when a dict is given, else prints."""
    start = time.perf_counter()
    try:
        yield
    finally:
        elapsed = round(time.perf_counter() - start, 3)
        if sink is not None:
            sink[name] = sink.get(name, 0.0) + elapsed
        else:
            print(f"[span] {name}: {elapsed}s")
