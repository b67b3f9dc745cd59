"""Span behavior: timing sink, OTel integration (via a stub tracer — the
SDK is absent in this image), and error.type tagging on failure."""

import contextlib

import pytest

from dataingestion_spark import observability as obs


def test_span_times_into_sink():
    sink = {}
    with obs.span("Stage", sink):
        pass
    assert "Stage" in sink and sink["Stage"] >= 0.0
    with obs.span("Stage", sink):
        pass
    # accumulates across calls, like the bench loop expects
    assert sink["Stage"] >= 0.0


def test_span_without_otel_is_timing_only(capsys):
    assert obs._get_tracer() is None  # opentelemetry not installed here
    with obs.span("Solo"):
        pass
    assert "[span] Solo:" in capsys.readouterr().out


class _StubSpan:
    def __init__(self):
        self.attrs = {}

    def set_attribute(self, k, v):
        self.attrs[k] = v


class _StubTracer:
    def __init__(self):
        self.spans = []

    @contextlib.contextmanager
    def start_as_current_span(self, name, attributes=None):
        s = _StubSpan()
        s.attrs.update(attributes or {})
        self.spans.append((name, s))
        yield s


def test_span_emits_otel_span_with_attrs(monkeypatch):
    tracer = _StubTracer()
    monkeypatch.setattr(obs, "_get_tracer", lambda: tracer)
    sink = {}
    with obs.span(obs.SPAN_PROCESS_DIRECTORY, sink, {obs.TAG_FILE_PATH: "/x"}):
        pass
    assert len(tracer.spans) == 1
    name, s = tracer.spans[0]
    assert name == "ProcessDirectory" and s.attrs[obs.TAG_FILE_PATH] == "/x"
    assert obs.TAG_ERROR_TYPE not in s.attrs


def test_span_tags_error_type_and_reraises(monkeypatch):
    tracer = _StubTracer()
    monkeypatch.setattr(obs, "_get_tracer", lambda: tracer)
    sink = {}
    with pytest.raises(ValueError):
        with obs.span("Boom", sink):
            raise ValueError("nope")
    _, s = tracer.spans[0]
    assert s.attrs[obs.TAG_ERROR_TYPE] == "ValueError"
    assert sink["Boom"] >= 0.0  # timing recorded even on failure
