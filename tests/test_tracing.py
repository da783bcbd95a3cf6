"""Tracing subsystem tests (reference documented this surface but never
implemented it — SURVEY.md 5.1)."""

import sskd_tpu.serve.app as app_module
from sskd_tpu.config import Settings
from sskd_tpu.serve.http import TestClient
from sskd_tpu.utils.tracing import TRACER, span


def test_span_records_duration_and_attributes():
    TRACER.clear()
    with span("unit_test_span", foo="bar") as record:
        pass
    spans = TRACER.recent("unit_test_span")
    assert len(spans) == 1
    assert spans[0].duration_ms >= 0
    assert spans[0].attributes == {"foo": "bar"}
    assert record.parent is None


def test_span_nesting():
    TRACER.clear()
    with span("outer"):
        with span("inner"):
            pass
    inner = TRACER.recent("inner")[0]
    assert inner.parent == "outer"


def test_ring_buffer_bounded():
    TRACER.clear()
    for _ in range(TRACER.MAX_SPANS + 10):
        with span("flood"):
            pass
    assert len(TRACER.recent("flood", limit=10_000)) <= TRACER.MAX_SPANS


def test_serving_emits_spans(monkeypatch, fake_student, temp_index_dir):
    TRACER.clear()
    monkeypatch.setattr(app_module, "StudentModel", lambda *a, **k: fake_student)
    tc = TestClient(app_module.create_app(settings=Settings()))
    try:
        tc.post("/index/load", json_body={"index_dir": str(temp_index_dir)})
        tc.post("/search", json_body={"query": "anything", "k": 2})
    finally:
        tc.close()
    names = {s.name for s in TRACER.recent(limit=10_000)}
    assert {"load_model", "load_index", "encode_query", "index_search"} <= names
