"""Query-result + embedding cache tests (sskd_tpu/serve/cache.py) — the
reference's declared-but-dead cache block (reference:
configs/service.yaml:101-106, scaling-and-performance.md "Caching
Strategies") implemented for real: TTL + LRU store semantics, documented
key format, endpoint wiring, index-swap invalidation, and the
degraded-rerank-never-cached rule."""

import threading
import time

import numpy as np
import pytest

import sskd_tpu.serve.app as app_module
from sskd_tpu.config import CacheConfig, Settings
from sskd_tpu.serve.cache import (
    TTLCache,
    embedding_cache_key,
    make_caches,
    normalize_query,
    result_cache_key,
)
from sskd_tpu.serve.http import TestClient


class FakeClock:
    def __init__(self):
        self.t = 1000.0

    def __call__(self):
        return self.t


class TestTTLCache:
    def test_roundtrip_and_miss(self):
        c = TTLCache(max_size=4, ttl_seconds=10)
        assert c.get("a") is None
        c.put("a", {"x": 1})
        assert c.get("a") == {"x": 1}
        assert c.stats() == {"entries": 1, "hits": 1, "misses": 1}

    def test_ttl_expiry(self):
        clock = FakeClock()
        c = TTLCache(max_size=4, ttl_seconds=5, clock=clock)
        c.put("a", 1)
        clock.t += 4.999
        assert c.get("a") == 1
        clock.t += 0.002
        assert c.get("a") is None
        assert len(c) == 0  # lazy expiry dropped it

    def test_lru_eviction_and_hit_refresh(self):
        c = TTLCache(max_size=2, ttl_seconds=100)
        c.put("a", 1)
        c.put("b", 2)
        assert c.get("a") == 1  # refresh a -> b is now LRU
        c.put("c", 3)
        assert c.get("b") is None
        assert c.get("a") == 1 and c.get("c") == 3

    def test_clear_returns_count(self):
        c = TTLCache(max_size=8, ttl_seconds=100)
        for i in range(5):
            c.put(str(i), i)
        assert c.clear() == 5
        assert len(c) == 0

    def test_put_overwrites(self):
        c = TTLCache(max_size=2, ttl_seconds=100)
        c.put("a", 1)
        c.put("a", 2)
        assert c.get("a") == 2
        assert len(c) == 1

    def test_validation(self):
        with pytest.raises(ValueError):
            TTLCache(max_size=0)
        with pytest.raises(ValueError):
            TTLCache(ttl_seconds=0)

    def test_thread_hammer(self):
        c = TTLCache(max_size=64, ttl_seconds=100)
        errors = []

        def worker(tid):
            try:
                for i in range(200):
                    c.put(f"{tid}:{i % 16}", i)
                    c.get(f"{tid}:{i % 16}")
                    if i % 50 == 0:
                        len(c)
            except Exception as e:  # pragma: no cover
                errors.append(e)

        threads = [threading.Thread(target=worker, args=(t,)) for t in range(8)]
        for t in threads:
            t.start()
        for t in threads:
            t.join()
        assert not errors
        assert len(c) <= 64


class TestKeys:
    def test_normalize_query(self):
        assert normalize_query("  What   IS\tthis ") == "what is this"

    def test_result_key_normalization(self):
        a = result_cache_key("Machine  Learning", 10, False, 50)
        b = result_cache_key("machine learning", 10, False, 50)
        assert a == b

    def test_result_key_params_distinct(self):
        base = result_cache_key("q", 10, False, 50)
        assert result_cache_key("q", 20, False, 50) != base
        assert result_cache_key("q", 10, True, 50) != base
        assert result_cache_key("q", 10, True, 100) != result_cache_key(
            "q", 10, True, 50
        )

    def test_embedding_key_exact_text(self):
        # embeddings must NOT collapse case/whitespace (false hits there are
        # silent numeric corruption — module docstring)
        assert embedding_cache_key("Hello", True) != embedding_cache_key(
            "hello", True
        )
        assert embedding_cache_key("a", True) != embedding_cache_key("a", False)


class TestMakeCaches:
    def test_disabled(self):
        q, e = make_caches(CacheConfig(enabled=False))
        assert q is None and e is None

    def test_memory_backend(self):
        q, e = make_caches(CacheConfig(enabled=True, max_size=7, ttl_seconds=9))
        assert q.max_size == 7 and q.ttl_seconds == 9
        assert e is not None

    def test_no_embedding_cache(self):
        q, e = make_caches(CacheConfig(enabled=True, embedding_cache=False))
        assert q is not None and e is None

    def test_unsupported_backend_degrades(self):
        # reference default is backend: "redis" — a ported service.yaml must
        # still boot, served by the in-process store
        q, e = make_caches(CacheConfig(enabled=True, backend="redis"))
        assert isinstance(q, TTLCache) and isinstance(e, TTLCache)


class CountingStudent:
    """FakeStudent variant that counts encode calls."""

    embedding_dim = 384
    device = "cpu"

    def __init__(self, inner):
        self.inner = inner
        self.encode_calls = 0
        self.encode_query_calls = 0

    def encode(self, texts, normalize=True, **kw):
        self.encode_calls += 1
        return self.inner.encode(texts, normalize=normalize)

    def encode_queries(self, texts, **kw):
        self.encode_query_calls += 1
        return self.inner.encode_queries(texts)

    def encode_documents(self, texts, **kw):
        return self.inner.encode_documents(texts)

    def cleanup(self):
        pass


@pytest.fixture
def cached_client(monkeypatch, fake_student, fake_teacher, temp_index_dir):
    counting = CountingStudent(fake_student)
    monkeypatch.setattr(app_module, "StudentModel", lambda *a, **k: counting)
    monkeypatch.setattr(app_module, "TeacherModel", lambda *a, **k: fake_teacher)
    settings = Settings.model_validate(
        {
            "search": {"rerank_enabled": True},
            "cache": {"enabled": True, "ttl_seconds": 3600, "max_size": 100},
            # a single in-flight request per test: batcher off keeps the
            # encoder-call counting deterministic
            "service": {"micro_batch_max_size": 1},
        }
    )
    app = app_module.create_app(
        settings=settings, preload_index_dir=str(temp_index_dir)
    )
    tc = TestClient(app)
    tc.student = counting
    yield tc
    tc.close()


class TestCachedEndpoints:
    def test_search_miss_then_hit(self, cached_client):
        r1 = cached_client.post("/search", json_body={"query": "machine learning", "k": 3})
        assert r1.status == 200
        b1 = r1.json()
        assert b1["cached"] is False
        calls_after_miss = cached_client.student.encode_query_calls
        r2 = cached_client.post("/search", json_body={"query": "machine learning", "k": 3})
        b2 = r2.json()
        assert b2["cached"] is True
        # identical results, no second encode
        assert b2["results"] == b1["results"]
        assert cached_client.student.encode_query_calls == calls_after_miss

    def test_normalized_query_hits(self, cached_client):
        cached_client.post("/search", json_body={"query": "machine learning", "k": 3})
        r = cached_client.post(
            "/search", json_body={"query": "  Machine   LEARNING ", "k": 3}
        )
        assert r.json()["cached"] is True

    def test_different_k_misses(self, cached_client):
        cached_client.post("/search", json_body={"query": "machine learning", "k": 3})
        r = cached_client.post("/search", json_body={"query": "machine learning", "k": 5})
        assert r.json()["cached"] is False

    def test_index_load_flushes_result_cache(self, cached_client, temp_index_dir):
        cached_client.post("/search", json_body={"query": "machine learning", "k": 3})
        assert (
            cached_client.post(
                "/search", json_body={"query": "machine learning", "k": 3}
            ).json()["cached"]
            is True
        )
        r = cached_client.post(
            "/index/load", json_body={"index_dir": str(temp_index_dir)}
        )
        assert r.status == 200
        r = cached_client.post("/search", json_body={"query": "machine learning", "k": 3})
        assert r.json()["cached"] is False

    def test_cache_flush_endpoint(self, cached_client):
        cached_client.post("/search", json_body={"query": "machine learning", "k": 3})
        cached_client.post("/encode", json_body={"texts": ["hello"]})
        r = cached_client.post("/cache/flush", json_body={})
        assert r.status == 200
        flushed = r.json()["flushed"]
        assert flushed["result"] >= 1 and flushed["embedding"] >= 1
        r = cached_client.post("/search", json_body={"query": "machine learning", "k": 3})
        assert r.json()["cached"] is False

    def test_flush_listed_in_root(self, cached_client):
        assert "/cache/flush" in cached_client.get("/").json()["endpoints"]

    def test_encode_embedding_cache(self, cached_client):
        r1 = cached_client.post("/encode", json_body={"texts": ["alpha", "beta"]})
        calls = cached_client.student.encode_calls
        r2 = cached_client.post("/encode", json_body={"texts": ["alpha", "beta"]})
        assert cached_client.student.encode_calls == calls  # all hits
        assert np.allclose(r1.json()["embeddings"], r2.json()["embeddings"])

    def test_encode_partial_hit_single_batch(self, cached_client):
        cached_client.post("/encode", json_body={"texts": ["alpha"]})
        calls = cached_client.student.encode_calls
        r = cached_client.post("/encode", json_body={"texts": ["alpha", "gamma"]})
        # exactly one more encoder call, carrying only the miss
        assert cached_client.student.encode_calls == calls + 1
        assert r.json()["num_texts"] == 2
        # row 0 must equal the cached single-text embedding
        solo = cached_client.post("/encode", json_body={"texts": ["alpha"]}).json()
        assert np.allclose(r.json()["embeddings"][0], solo["embeddings"][0])

    def test_degraded_rerank_not_cached(
        self, monkeypatch, fake_student, temp_index_dir
    ):
        class SlowTeacher:
            def score(self, pairs, batch_size=32, **kw):
                time.sleep(0.2)
                return [0.0] * len(pairs)

        monkeypatch.setattr(
            app_module, "StudentModel", lambda *a, **k: fake_student
        )
        monkeypatch.setattr(app_module, "TeacherModel", lambda *a, **k: SlowTeacher())
        settings = Settings.model_validate(
            {
                "search": {"rerank_enabled": True, "rerank_timeout_ms": 1.0},
                "cache": {"enabled": True},
                "service": {"micro_batch_max_size": 1},
            }
        )
        app = app_module.create_app(
            settings=settings, preload_index_dir=str(temp_index_dir)
        )
        tc = TestClient(app)
        try:
            req = {"query": "machine learning", "k": 3, "rerank": True}
            r1 = tc.post("/search", json_body=req)
            assert r1.status == 200
            assert r1.json()["reranked"] is False  # timed out -> degraded
            r2 = tc.post("/search", json_body=req)
            assert r2.json()["cached"] is False  # degradation never cached
        finally:
            tc.close()

    def test_metrics_expose_cache_counters(self, cached_client):
        cached_client.post("/search", json_body={"query": "machine learning", "k": 3})
        cached_client.post("/search", json_body={"query": "machine learning", "k": 3})
        text = cached_client.get("/metrics").body.decode()
        assert 'semantic_kd_cache_hits_total{cache="result"}' in text

    def test_cache_disabled_no_marker(
        self, monkeypatch, fake_student, fake_teacher, temp_index_dir
    ):
        monkeypatch.setattr(app_module, "StudentModel", lambda *a, **k: fake_student)
        monkeypatch.setattr(app_module, "TeacherModel", lambda *a, **k: fake_teacher)
        app = app_module.create_app(
            settings=Settings(), preload_index_dir=str(temp_index_dir)
        )
        tc = TestClient(app)
        try:
            r = tc.post("/search", json_body={"query": "machine learning", "k": 3})
            assert r.status == 200
            assert "cached" not in r.json()
            assert "/cache/flush" not in tc.get("/").json()["endpoints"]
        finally:
            tc.close()
