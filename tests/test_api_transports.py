"""Rate-limited HTTP transport shape for the cloud readers
(sources/api_readers.py::_api_reader_run) driven with recorded-fixture
fake transports — the service mappings themselves are pinned by
tests/test_readers_multimodal.py."""

import os

import pytest

from dataingestion_spark.model_client import RetryPolicy
from dataingestion_spark.sources.api_readers import (
    read_document_intelligence,
    read_llamaparse,
)
from tests.test_readers_multimodal import ADI_RESULT, LP_RESULT

_FAST_RETRY = RetryPolicy(max_attempts=3, base_delay=0.01, max_delay=0.02)


def _write_docs(tmp_path, n=3):
    for i in range(n):
        (tmp_path / f"doc{i}.pdf").write_bytes(b"%PDF-fake " + bytes([i]))


def test_adi_reader_with_fixture_transport(spark, tmp_path):
    _write_docs(tmp_path)
    calls_dir = tmp_path / "calls"
    calls_dir.mkdir()
    cd = str(calls_dir)

    def fake_transport(data: bytes, doc_id: str) -> dict:
        # executor-side call marker (local mode shares the filesystem)
        open(os.path.join(cd, doc_id.rsplit("/", 1)[-1]), "w").write("x")
        return ADI_RESULT

    el = read_document_intelligence(spark, str(tmp_path), glob="*.pdf",
                                    transport=fake_transport,
                                    requests_per_second=1000.0,
                                    retry=_FAST_RETRY)
    rows = el.collect()
    # one transport call per file, each mapped through adi_result_to_elements
    assert sorted(os.listdir(cd)) == ["doc0.pdf", "doc1.pdf", "doc2.pdf"]
    per_doc = {}
    for r in rows:
        per_doc.setdefault(r["doc_id"], []).append(r)
    assert len(per_doc) == 3
    for doc_rows in per_doc.values():
        types = [r["elem_type"] for r in sorted(doc_rows, key=lambda r: r["seq"])]
        assert types == ["section", "section", "header", "paragraph",
                         "table", "image", "footer"]


def test_llamaparse_reader_with_fixture_transport(spark, tmp_path):
    _write_docs(tmp_path, n=2)

    def fake_transport(data: bytes, doc_id: str) -> dict:
        return LP_RESULT

    el = read_llamaparse(spark, str(tmp_path), glob="*.pdf",
                         transport=fake_transport,
                         requests_per_second=1000.0, retry=_FAST_RETRY)
    rows = el.collect()
    assert len({r["doc_id"] for r in rows}) == 2
    assert any(r["elem_type"] == "table" for r in rows)
    assert any(r["elem_type"] == "image" and r["image_content"] for r in rows)


def test_transient_transport_failures_are_retried(spark, tmp_path):
    _write_docs(tmp_path, n=2)
    fail_dir = tmp_path / "fails"
    fail_dir.mkdir()
    fd = str(fail_dir)

    def flaky_transport(data: bytes, doc_id: str) -> dict:
        marker = os.path.join(fd, doc_id.rsplit("/", 1)[-1])
        if not os.path.exists(marker):  # first attempt per file fails
            open(marker, "w").write("x")
            raise ConnectionError("transient 503")
        return ADI_RESULT

    el = read_document_intelligence(spark, str(tmp_path), glob="*.pdf",
                                    transport=flaky_transport,
                                    requests_per_second=1000.0,
                                    retry=_FAST_RETRY)
    assert el.select("doc_id").distinct().count() == 2  # retries succeeded


def test_exhausted_retries_surface_as_model_call_error(spark, tmp_path):
    _write_docs(tmp_path, n=1)

    def dead_transport(data: bytes, doc_id: str) -> dict:
        raise ConnectionError("always down")

    el = read_document_intelligence(spark, str(tmp_path), glob="*.pdf",
                                    transport=dead_transport,
                                    requests_per_second=1000.0,
                                    retry=_FAST_RETRY)
    with pytest.raises(Exception, match="failed after 3 attempts"):
        el.collect()


def test_missing_credentials_fail_fast(spark, tmp_path):
    with pytest.raises(ValueError, match="endpoint"):
        read_document_intelligence(spark, str(tmp_path))
    with pytest.raises(ValueError, match="api_key"):
        read_llamaparse(spark, str(tmp_path))


def test_on_error_skip_drops_poisoned_documents(spark, tmp_path):
    """One document whose transport permanently fails must not kill a
    skip-mode ingest — the rest of the corpus still lands."""
    _write_docs(tmp_path, n=3)

    def poisoned(data: bytes, doc_id: str) -> dict:
        if doc_id.endswith("doc1.pdf"):
            raise ConnectionError("permanently broken document")
        return ADI_RESULT

    el = read_document_intelligence(spark, str(tmp_path), glob="*.pdf",
                                    transport=poisoned,
                                    requests_per_second=1000.0,
                                    retry=_FAST_RETRY, on_error="skip")
    docs = {r["doc_id"].rsplit("/", 1)[-1]
            for r in el.select("doc_id").distinct().collect()}
    assert docs == {"doc0.pdf", "doc2.pdf"}
