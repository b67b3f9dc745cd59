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


# ---------------------------------------------------------------------------
# Span names + tags: analogs of the reference's DiagnosticsConstants
# (``src/.../DiagnosticsConstants.cs:6-48``). Per-file/per-document spans
# don't map onto distributed execution (files are rows, not loop
# iterations); the driver gets the orchestration-level spans and the
# per-partition story lives in the Spark UI / event log.
# ---------------------------------------------------------------------------

ACTIVITY_SOURCE = "dataingestion.spark"
SPAN_PROCESS_DIRECTORY = "ProcessDirectory"
SPAN_PROCESS_FILES = "ProcessFiles"
SPAN_WRITE = "WriteChunks"
TAG_FILE_PATH = "di.file.path"
TAG_DOCUMENT_ID = "di.document.id"
TAG_ERROR_TYPE = "error.type"


_EVENTS: list = []  # bounded in-process buffer (tests/inspection)


def record_event(name: str, attrs: dict | None = None) -> None:
    """Driver-side structured event (the Activity-event analog): stored
    in a bounded buffer for tests/inspection and emitted as an OTel
    event on the current span when the SDK is installed."""
    _EVENTS.append({"name": name, **(attrs or {})})
    if len(_EVENTS) > 1000:
        del _EVENTS[: len(_EVENTS) - 1000]
    try:
        from opentelemetry import trace

        sp = trace.get_current_span()
        if sp is not None:
            sp.add_event(name, attributes=attrs or {})
    except ImportError:
        pass


def _get_tracer():
    """OpenTelemetry tracer when the SDK is importable, else None (the
    package is absent in this image; spans degrade to timing-only)."""
    try:
        from opentelemetry import trace
    except ImportError:
        return None
    return trace.get_tracer(ACTIVITY_SOURCE)


@contextlib.contextmanager
def span(name: str, sink: dict | None = None,
         attrs: dict | None = None) -> Iterator[None]:
    """Driver-side span (the Activity analog): wall-clock seconds into
    ``sink[name]`` (or printed), plus a real OpenTelemetry span with the
    given attributes when the SDK is installed. Exceptions tag
    ``error.type`` with the exception class name, like the reference
    (``IngestionPipeline.cs:146-159``), and propagate."""
    tracer = _get_tracer()
    ctx = (
        tracer.start_as_current_span(name, attributes=attrs or {})
        if tracer is not None
        else contextlib.nullcontext()
    )
    start = time.perf_counter()
    with ctx as otel_span:
        try:
            yield
        except BaseException as e:
            if otel_span is not None and hasattr(otel_span, "set_attribute"):
                otel_span.set_attribute(TAG_ERROR_TYPE, type(e).__name__)
            raise
        finally:
            elapsed = round(time.perf_counter() - start, 3)
            if sink is not None:
                sink[name] = sink.get(name, 0.0) + elapsed
            else:
                print(f"[span] {name}: {elapsed}s")
