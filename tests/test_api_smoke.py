"""API smoke suite — the file the reference's Makefile referenced but never
committed (reference: Makefile:164, SURVEY.md 4.4). One TestClient pass over
every route plus the latency fields CI gates on."""

import pytest

import sskd_tpu.serve.app as app_module
from sskd_tpu.config import Settings
from sskd_tpu.serve.http import TestClient


@pytest.fixture
def client(monkeypatch, fake_student, temp_index_dir):
    monkeypatch.setattr(app_module, "StudentModel", lambda *a, **k: fake_student)
    tc = TestClient(app_module.create_app(settings=Settings()))
    tc.post("/index/load", json_body={"index_dir": str(temp_index_dir)})
    yield tc
    tc.close()


def test_every_route_responds(client):
    assert client.get("/").status == 200
    assert client.get("/health").status == 200
    assert client.get("/ready").status == 200
    assert client.get("/live").status == 200
    assert client.get("/metrics").status == 200
    assert client.post("/encode", json_body={"texts": ["smoke"]}).status == 200
    assert (
        client.post("/search", json_body={"query": "smoke test", "k": 2}).status
        == 200
    )


def test_latency_fields_present_and_sane(client):
    search = client.post("/search", json_body={"query": "smoke", "k": 1}).json()
    encode = client.post("/encode", json_body={"texts": ["smoke"]}).json()
    assert 0 <= search["latency_ms"] < 60_000
    assert 0 <= encode["latency_ms"] < 60_000


def test_health_reflects_index_state(monkeypatch, fake_student):
    monkeypatch.setattr(app_module, "StudentModel", lambda *a, **k: fake_student)
    tc = TestClient(app_module.create_app(settings=Settings()))
    try:
        body = tc.get("/health").json()
        assert body["model_loaded"] is True
        assert body["index_loaded"] is False
        assert body["index_size"] == 0
    finally:
        tc.close()
