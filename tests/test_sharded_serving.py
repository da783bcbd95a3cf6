"""ICI-sharded serving: with mesh.index_parallel > 1 the service lifts a
loaded index onto the device mesh and searches through shard_map + all-gather
(8-device virtual mesh)."""

import numpy as np

import sskd_tpu.serve.app as app_module
from sskd_tpu.config import Settings
from sskd_tpu.serve.http import TestClient


def test_sharded_serving_end_to_end(monkeypatch, fake_student, temp_index_dir):
    monkeypatch.setattr(app_module, "StudentModel", lambda *a, **k: fake_student)
    settings = Settings.model_validate({"mesh": {"index_parallel": 8}})
    tc = TestClient(app_module.create_app(settings=settings))
    try:
        r = tc.post("/index/load", json_body={"index_dir": str(temp_index_dir)})
        assert r.status == 200
        assert tc.app.state.sharded_index is not None
        assert tc.app.state.sharded_index.n_shards == 8

        r = tc.post("/search", json_body={"query": "machine learning", "k": 3})
        assert r.status == 200
        body = r.json()
        assert body["total_results"] == 3
        assert body["results"][0]["text"] is not None  # texts stay host-side

        # sharded ranking must equal single-device ranking
        unsharded = app_module.IndexBuilder().load(temp_index_dir)
        q = fake_student.encode_queries(["machine learning"])
        _, gt_idx = unsharded.search(q, k=3)
        got = [x["doc_id"] for x in body["results"]]
        expected = [unsharded.doc_ids[i] for i in gt_idx[0]]
        assert got == expected
    finally:
        tc.close()


def test_preload_shards_at_startup(monkeypatch, fake_student, temp_index_dir):
    monkeypatch.setattr(app_module, "StudentModel", lambda *a, **k: fake_student)
    settings = Settings.model_validate({"mesh": {"index_parallel": 4}})
    tc = TestClient(
        app_module.create_app(
            settings=settings, preload_index_dir=str(temp_index_dir)
        )
    )
    try:
        assert tc.app.state.sharded_index is not None
        assert tc.app.state.sharded_index.n_shards == 4
        r = tc.post("/search", json_body={"query": "paris", "k": 2})
        assert r.status == 200 and r.json()["total_results"] == 2
    finally:
        tc.close()
