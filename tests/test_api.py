"""Serving tests (model: reference tests/test_api.py + the middleware parts
of tests/test_hardening.py — token-bucket math, per-client isolation,
thread-safety hammer, bucket-cap eviction, salted key hashing, endpoint
happy/4xx paths, CORS preflight, security headers, and the /metrics endpoint
the reference never implemented)."""

import threading
import time

import numpy as np
import pytest

import sskd_tpu.serve.app as app_module
from sskd_tpu.config import Settings
from sskd_tpu.serve.http import Request, TestClient
from sskd_tpu.serve.middleware import APIKeyAuth, RateLimiter, TokenBucket, hash_query


class TestTokenBucket:
    def test_burst_capacity(self):
        b = TokenBucket(rate_per_minute=60, burst=3)
        assert b.consume() and b.consume() and b.consume()
        assert not b.consume()

    def test_refill(self):
        b = TokenBucket(rate_per_minute=6000, burst=1)  # 100/s
        assert b.consume()
        assert not b.consume()
        time.sleep(0.02)
        assert b.consume()

    def test_time_until_available(self):
        b = TokenBucket(rate_per_minute=60, burst=1)
        b.consume()
        t = b.time_until_available()
        assert 0.0 < t <= 1.0


class TestRateLimiter:
    def _req(self, path="/search", client="1.2.3.4", headers=None):
        return Request("POST", path, headers=headers, client=client)

    def test_burst_enforced(self):
        rl = RateLimiter(requests_per_minute=60, burst=2)
        assert rl.check(self._req())[0]
        assert rl.check(self._req())[0]
        allowed, retry = rl.check(self._req())
        assert not allowed and retry > 0

    def test_per_client_isolation(self):
        rl = RateLimiter(requests_per_minute=60, burst=1)
        assert rl.check(self._req(client="a"))[0]
        assert not rl.check(self._req(client="a"))[0]
        assert rl.check(self._req(client="b"))[0]

    def test_x_forwarded_for_first_hop(self):
        rl = RateLimiter(requests_per_minute=60, burst=1)
        headers = {"x-forwarded-for": "9.9.9.9, 8.8.8.8"}
        assert rl.client_key(self._req(headers=headers)) == "9.9.9.9"

    def test_excluded_paths_never_limited(self):
        rl = RateLimiter(requests_per_minute=60, burst=1)
        for _ in range(10):
            assert rl.check(self._req(path="/health"))[0]

    def test_thread_safety_hammer(self):
        # 10 threads x 20 requests (reference: test_hardening.py:141-190)
        rl = RateLimiter(requests_per_minute=60, burst=50)
        allowed_count = []
        lock = threading.Lock()

        def worker(cid):
            local = 0
            for _ in range(20):
                if rl.check(self._req(client=f"c{cid}"))[0]:
                    local += 1
            with lock:
                allowed_count.append(local)

        threads = [threading.Thread(target=worker, args=(i,)) for i in range(10)]
        for t in threads:
            t.start()
        for t in threads:
            t.join()
        assert len(allowed_count) == 10
        assert all(c == 20 for c in allowed_count)  # burst 50 > 20 per client

    def test_bucket_cap_eviction(self):
        rl = RateLimiter(requests_per_minute=60, burst=1)
        rl.MAX_BUCKETS = 5
        for i in range(8):
            rl.check(self._req(client=f"client{i}"))
        assert len(rl._buckets) <= 5


class TestAPIKeyAuth:
    def test_add_verify_remove(self):
        auth = APIKeyAuth()
        auth.add_key("sk_live_test123")
        assert auth.verify("sk_live_test123")
        assert not auth.verify("wrong")
        auth.remove_key("sk_live_test123")
        assert not auth.verify("sk_live_test123")

    def test_salted_pbkdf2(self):
        plain = APIKeyAuth.hash_key("k")
        salted = APIKeyAuth.hash_key("k", salt="pepper")
        assert plain != salted
        auth = APIKeyAuth(api_keys=["k"], salt="pepper")
        assert auth.verify("k")

    def test_env_hashes(self, monkeypatch):
        import json

        h = APIKeyAuth.hash_key("envkey")
        monkeypatch.setenv("SEMANTIC_KD_API_KEY_HASHES", json.dumps([h]))
        auth = APIKeyAuth()
        assert auth.verify("envkey")

    def test_empty_keyset_rejects(self):
        assert not APIKeyAuth().verify("anything")


def test_hash_query_sha256_prefix():
    h = hash_query("secret query")
    assert len(h) == 12
    import hashlib

    assert h == hashlib.sha256(b"secret query").hexdigest()[:12]


# ---------------------------------------------------------------------------
# Endpoint tests via TestClient with patched models
# (reference: tests/conftest.py:228-239)
# ---------------------------------------------------------------------------


@pytest.fixture
def client(monkeypatch, fake_student, fake_teacher, temp_index_dir):
    monkeypatch.setattr(app_module, "StudentModel", lambda *a, **k: fake_student)
    monkeypatch.setattr(app_module, "TeacherModel", lambda *a, **k: fake_teacher)
    settings = Settings.model_validate({"search": {"rerank_enabled": True}})
    app = app_module.create_app(settings=settings)
    tc = TestClient(app)
    yield tc
    tc.close()


class TestEndpoints:
    def test_root_info(self, client):
        r = client.get("/")
        assert r.status == 200
        assert "/search" in r.json()["endpoints"]

    def test_health(self, client):
        r = client.get("/health")
        body = r.json()
        assert r.status == 200
        assert body["status"] == "healthy"
        assert body["model_loaded"] is True
        assert body["index_loaded"] is False

    def test_ready_live(self, client):
        assert client.get("/ready").status == 200
        assert client.get("/live").status == 200

    def test_encode_happy(self, client):
        r = client.post("/encode", json_body={"texts": ["hello", "world"]})
        assert r.status == 200
        body = r.json()
        assert body["dimension"] == 384
        assert body["num_texts"] == 2
        assert len(body["embeddings"]) == 2
        assert body["latency_ms"] >= 0

    def test_encode_validation_422(self, client):
        assert client.post("/encode", json_body={"texts": []}).status == 422
        assert client.post("/encode", json_body={}).status == 422
        r = client.post("/encode", body=b"not json{", headers={"content-type": "application/json"})
        assert r.status == 422

    def test_search_503_without_index(self, client):
        r = client.post("/search", json_body={"query": "anything", "k": 3})
        assert r.status == 503

    def test_index_load_then_search(self, client, temp_index_dir):
        r = client.post("/index/load", json_body={"index_dir": str(temp_index_dir)})
        assert r.status == 200
        assert r.json()["index_size"] == 10
        r = client.post("/search", json_body={"query": "machine learning", "k": 3})
        assert r.status == 200
        body = r.json()
        assert body["total_results"] == 3
        assert body["reranked"] is False
        ranks = [x["rank"] for x in body["results"]]
        assert ranks == [1, 2, 3]
        scores = [x["score"] for x in body["results"]]
        assert scores == sorted(scores, reverse=True)
        assert body["results"][0]["text"] is not None

    def test_search_rerank(self, client, temp_index_dir):
        client.post("/index/load", json_body={"index_dir": str(temp_index_dir)})
        r = client.post(
            "/search",
            json_body={"query": "neural nets", "k": 2, "rerank": True, "rerank_top_k": 5},
        )
        assert r.status == 200
        body = r.json()
        assert body["reranked"] is True
        assert body["total_results"] == 2

    def test_rerank_timeout_degrades(self, monkeypatch, fake_student, temp_index_dir):
        """The rerank circuit breaker: a slow teacher degrades the response
        to bi-encoder ranking instead of hanging (reference configured
        rerank_timeout_ms but never enforced it, SURVEY.md 5.3)."""
        import time as _time

        class SlowTeacher:
            def score(self, pairs, batch_size=32):
                _time.sleep(1.0)
                return [0.0] * len(pairs)

        monkeypatch.setattr(app_module, "StudentModel", lambda *a, **k: fake_student)
        monkeypatch.setattr(app_module, "TeacherModel", lambda *a, **k: SlowTeacher())
        settings = Settings.model_validate(
            {"search": {"rerank_enabled": True, "rerank_timeout_ms": 50}}
        )
        tc = TestClient(app_module.create_app(settings=settings))
        try:
            tc.post("/index/load", json_body={"index_dir": str(temp_index_dir)})
            r = tc.post(
                "/search", json_body={"query": "q", "k": 2, "rerank": True}
            )
            assert r.status == 200
            body = r.json()
            assert body["reranked"] is False  # degraded, not hung
            assert body["total_results"] == 2
        finally:
            tc.close()

    def test_index_load_missing_dir(self, client):
        r = client.post("/index/load", json_body={"index_dir": "/nope/nothing"})
        assert r.status == 400

    def test_search_validation(self, client):
        assert client.post("/search", json_body={"query": ""}).status == 422
        assert client.post("/search", json_body={"query": "x", "k": 0}).status == 422
        assert client.post("/search", json_body={"query": "x", "k": 999}).status == 422

    def test_404_and_405(self, client):
        assert client.get("/nonexistent").status == 404
        assert client.get("/search").status == 405

    def test_security_headers(self, client):
        r = client.get("/health")
        assert r.headers["X-Content-Type-Options"] == "nosniff"
        assert r.headers["X-Frame-Options"] == "DENY"
        assert "Content-Security-Policy" in r.headers

    def test_cors_preflight(self, client):
        r = client.request("OPTIONS", "/search", headers={"origin": "http://x.test"})
        assert r.status == 204
        assert r.headers["Access-Control-Allow-Origin"] == "*"

    def test_metrics_endpoint(self, client):
        client.get("/health")
        r = client.get("/metrics")
        assert r.status == 200
        assert b"semantic_kd_requests_total" in r.body


class TestAuthAndRateLimitIntegration:
    def test_api_key_required(self, monkeypatch, fake_student):
        monkeypatch.setattr(app_module, "StudentModel", lambda *a, **k: fake_student)
        key = "sk_live_secret"
        settings = Settings.model_validate(
            {"auth": {"enabled": True, "api_key_hashes": [APIKeyAuth.hash_key(key)]}}
        )
        tc = TestClient(app_module.create_app(settings=settings))
        try:
            r = tc.post("/encode", json_body={"texts": ["x"]})
            assert r.status == 401
            assert r.headers["WWW-Authenticate"] == "ApiKey"
            r = tc.post(
                "/encode", json_body={"texts": ["x"]}, headers={"x-api-key": key}
            )
            assert r.status == 200
            assert tc.get("/health").status == 200  # excluded path
        finally:
            tc.close()

    def test_rate_limit_429(self, monkeypatch, fake_student):
        monkeypatch.setattr(app_module, "StudentModel", lambda *a, **k: fake_student)
        settings = Settings.model_validate(
            {"rate_limit": {"enabled": True, "requests_per_minute": 60, "burst": 2}}
        )
        tc = TestClient(app_module.create_app(settings=settings))
        try:
            assert tc.post("/encode", json_body={"texts": ["a"]}).status == 200
            assert tc.post("/encode", json_body={"texts": ["a"]}).status == 200
            r = tc.post("/encode", json_body={"texts": ["a"]})
            assert r.status == 429
            assert float(r.headers["Retry-After"]) > 0
        finally:
            tc.close()

    def test_teacher_failure_degrades_gracefully(self, monkeypatch, fake_student):
        monkeypatch.setattr(app_module, "StudentModel", lambda *a, **k: fake_student)

        def boom(*a, **k):
            raise RuntimeError("no teacher weights")

        monkeypatch.setattr(app_module, "TeacherModel", boom)
        settings = Settings.model_validate({"search": {"rerank_enabled": True}})
        tc = TestClient(app_module.create_app(settings=settings))
        try:
            assert tc.get("/ready").status == 200  # still starts
            assert tc.app.state.teacher is None
        finally:
            tc.close()


def test_maxsim_aggregation_route(monkeypatch, fake_student, tmp_path):
    """Chunks of the same doc collapse to one doc-level result."""
    from sskd_tpu.index.builder import IndexBuilder

    monkeypatch.setattr(app_module, "StudentModel", lambda *a, **k: fake_student)
    emb = fake_student.encode_documents([f"chunk {i}" for i in range(6)])
    # 3 docs x 2 chunks
    ids = ["docA", "docA", "docB", "docB", "docC", "docC"]
    b = IndexBuilder(embedding_dim=384)
    b.build_from_arrays(emb, ids, texts=[f"text {i}" for i in range(6)])
    b.save(tmp_path / "idx")

    settings = Settings.model_validate({"search": {"maxsim_aggregation": True}})
    tc = TestClient(app_module.create_app(settings=settings))
    try:
        tc.post("/index/load", json_body={"index_dir": str(tmp_path / "idx")})
        r = tc.post("/search", json_body={"query": "q", "k": 3})
        body = r.json()
        returned = [x["doc_id"] for x in body["results"]]
        assert len(returned) == len(set(returned))  # no duplicate docs
        assert set(returned) <= {"docA", "docB", "docC"}
    finally:
        tc.close()


def test_encode_cache_entries_own_their_memory(monkeypatch, fake_student):
    """Cached embedding rows must be copies: a row VIEW into the encode
    batch keeps the whole [miss, D] result array alive (its .base) for
    every entry until eviction — ~batch-size x memory amplification in a
    long-running service."""
    import numpy as np

    monkeypatch.setattr(app_module, "StudentModel", lambda *a, **k: fake_student)
    settings = Settings.model_validate({"cache": {"enabled": True}})
    tc = TestClient(app_module.create_app(settings=settings))
    try:
        r = tc.post("/encode", json_body={"texts": ["alpha", "beta", "gamma"]})
        assert r.status == 200
        emb_cache = tc.app.state.embedding_cache
        assert emb_cache is not None and len(emb_cache) == 3
        for _exp, row in emb_cache._store.values():
            assert isinstance(row, np.ndarray)
            assert row.base is None, "cache entry is a view into the batch"
        # second identical request is served from the cache, same values
        first = np.asarray(r.json()["embeddings"])
        r2 = tc.post("/encode", json_body={"texts": ["alpha", "beta", "gamma"]})
        np.testing.assert_allclose(
            np.asarray(r2.json()["embeddings"]), first, rtol=1e-6
        )
        assert len(emb_cache) == 3
    finally:
        tc.close()


class TestOpenAPI:
    """The reference's FastAPI published /openapi.json + /docs
    (reference: src/serve/app.py:152-157); this stack generates both from
    the pydantic schemas."""

    def test_openapi_spec_shape(self, client):
        r = client.get("/openapi.json")
        assert r.status == 200
        spec = r.json()
        assert spec["openapi"].startswith("3.1")
        assert spec["info"]["title"] == "Semantic Search API"
        schemas = spec["components"]["schemas"]
        for name in (
            "SearchRequest",
            "SearchResponse",
            "EncodeRequest",
            "EncodeResponse",
            "HealthResponse",
            "ErrorResponse",
        ):
            assert name in schemas, name
        # request-body schema refs resolve
        ref = spec["paths"]["/search"]["post"]["requestBody"]["content"][
            "application/json"
        ]["schema"]["$ref"]
        assert ref == "#/components/schemas/SearchRequest"
        # pydantic constraints survive into the contract
        k = schemas["SearchRequest"]["properties"]["k"]
        assert k["maximum"] == 100 and k["minimum"] == 1

    def test_spec_matches_live_route_table(self, client):
        """Every path in the published contract is actually routable, and
        every registered route is documented — the spec can't drift from
        create_app silently."""
        spec = client.get("/openapi.json").json()
        routes = {
            (meth.upper(), path) for (meth, path) in client.app._routes
        }
        for path, ops in spec["paths"].items():
            for method in ops:
                assert (method.upper(), path) in routes, (method, path)
        undocumented = {
            p for (_, p) in routes
            if p not in spec["paths"] and p not in ("/docs", "/openapi.json")
        }
        assert not undocumented, undocumented

    def test_docs_page_renders(self, client):
        r = client.get("/docs")
        assert r.status == 200
        assert "text/html" in r.media_type
        body = r.body.decode()
        assert "/openapi.json" in body and "/search" in body
        assert "SearchRequest" in body

    def test_conditional_routes_tracked(self, monkeypatch, fake_student):
        monkeypatch.setattr(
            app_module, "StudentModel", lambda *a, **k: fake_student
        )
        monkeypatch.setattr(app_module, "TeacherModel", lambda *a, **k: None)
        settings = Settings.model_validate(
            {"cache": {"enabled": True}, "monitoring": {"prometheus_enabled": False}}
        )
        tc = TestClient(app_module.create_app(settings=settings))
        try:
            spec = tc.get("/openapi.json").json()
            assert "/cache/flush" in spec["paths"]
            assert "/metrics" not in spec["paths"]
        finally:
            tc.close()

    def test_security_scheme_when_auth_enabled(self, monkeypatch, fake_student):
        monkeypatch.setattr(
            app_module, "StudentModel", lambda *a, **k: fake_student
        )
        monkeypatch.setattr(app_module, "TeacherModel", lambda *a, **k: None)
        from sskd_tpu.serve.middleware import APIKeyAuth

        settings = Settings.model_validate(
            {"auth": {"enabled": True, "api_key_hashes": [APIKeyAuth.hash_key("x")]}}
        )
        tc = TestClient(app_module.create_app(settings=settings))
        try:
            # docs are reachable WITHOUT a key (middleware exclusion)
            spec = tc.get("/openapi.json").json()
            assert "ApiKeyAuth" in spec["components"]["securitySchemes"]
            assert tc.get("/docs").status == 200
            # but the API itself still requires one
            assert tc.post("/encode", json_body={"texts": ["a"]}).status == 401
        finally:
            tc.close()


class TestRequestLogKnobs:
    """monitoring.log_queries / log_latencies (reference config fields) —
    raw query text is opt-in, latency field is opt-out."""

    def _run(self, monkeypatch, **kw):
        import asyncio

        from sskd_tpu.serve import middleware as mw_mod
        from sskd_tpu.serve.http import Request, Response

        lines = []

        class Rec:
            def __getattr__(self, level):
                return lambda msg: lines.append((level, msg))

        monkeypatch.setattr(mw_mod, "logger", Rec())
        mw = mw_mod.request_logging_middleware(**kw)

        async def handler(request):
            return Response({"ok": True})

        req = Request(
            "POST",
            "/search",
            body=b'{"query": "the secret text", "k": 3}',
            headers={"content-type": "application/json"},
        )
        asyncio.new_event_loop().run_until_complete(mw(req, handler))
        return lines[-1][1]

    def test_query_text_absent_by_default(self, monkeypatch):
        line = self._run(monkeypatch)
        assert "secret text" not in line and "latency_ms=" in line

    def test_log_queries_opt_in(self, monkeypatch):
        line = self._run(monkeypatch, log_queries=True)
        assert "query='the secret text'" in line

    def test_log_latencies_opt_out(self, monkeypatch):
        line = self._run(monkeypatch, log_latencies=False)
        assert "latency_ms=" not in line

    def test_settings_reach_middleware(self, monkeypatch, fake_student):
        monkeypatch.setattr(
            app_module, "StudentModel", lambda *a, **k: fake_student
        )
        monkeypatch.setattr(app_module, "TeacherModel", lambda *a, **k: None)
        settings = Settings.model_validate(
            {"monitoring": {"log_queries": True, "log_latencies": False}}
        )
        assert settings.monitoring.log_queries is True
        assert settings.service.log_level == "info"
        tc = TestClient(app_module.create_app(settings=settings))
        tc.close()


class TestReferenceConfigCompat:
    """Round-5 parity sweep: reference config fields that existed there
    but had no consumer here — CORS allow_credentials, plaintext
    auth.api_keys migration, ANCE warmup/enable gates."""

    def _cors(self, monkeypatch, creds, origins=None):
        import asyncio

        from sskd_tpu.serve import middleware as mw_mod
        from sskd_tpu.serve.http import Request, Response

        mw = mw_mod.cors_middleware(
            origins or ["*"], ["GET", "POST"], ["*"], allow_credentials=creds
        )

        async def handler(request):
            return Response({"ok": True})

        loop = asyncio.new_event_loop()
        try:
            pre = loop.run_until_complete(
                mw(Request("OPTIONS", "/search", headers={"origin": "https://a.example"}), handler)
            )
            post = loop.run_until_complete(
                mw(Request("POST", "/search", headers={"origin": "https://a.example"}), handler)
            )
        finally:
            loop.close()
        return pre, post

    def test_cors_credentials_echoes_origin_not_wildcard(self, monkeypatch):
        pre, post = self._cors(monkeypatch, creds=True)
        assert pre.headers["Access-Control-Allow-Credentials"] == "true"
        # spec: credentialed responses must not use "*"
        assert pre.headers["Access-Control-Allow-Origin"] == "https://a.example"
        assert post.headers["Access-Control-Allow-Credentials"] == "true"
        assert post.headers["Access-Control-Allow-Origin"] == "https://a.example"

    def test_cors_no_credentials_keeps_wildcard(self, monkeypatch):
        pre, post = self._cors(monkeypatch, creds=False)
        assert "Access-Control-Allow-Credentials" not in pre.headers
        assert pre.headers["Access-Control-Allow-Origin"] == "*"

    def test_plaintext_api_keys_hashed_and_audited(self):
        from sskd_tpu.serve.middleware import APIKeyAuth

        s = Settings.model_validate(
            {"auth": {"enabled": True, "api_keys": ["sk_live_x"]}}
        )
        assert APIKeyAuth.hash_key("sk_live_x") in s.auth.api_key_hashes
        auth = APIKeyAuth(api_key_hashes=s.auth.api_key_hashes, salt=s.auth.salt)
        assert auth.verify("sk_live_x") and not auth.verify("wrong")
        assert any("PLAINTEXT" in p for p in s.validate_for_production())

    def test_plaintext_keys_respect_salt(self):
        from sskd_tpu.serve.middleware import APIKeyAuth

        s = Settings.model_validate(
            {"auth": {"enabled": True, "api_keys": ["k"], "salt": "pepper"}}
        )
        assert APIKeyAuth.hash_key("k", salt="pepper") in s.auth.api_key_hashes
        auth = APIKeyAuth(api_key_hashes=s.auth.api_key_hashes, salt="pepper")
        assert auth.verify("k")

    def test_ance_gates_in_settings(self):
        s = Settings.model_validate(
            {"mining": {"ance_enabled": False, "ance_warmup_steps": 100}}
        )
        assert s.mining.ance_enabled is False
        assert s.mining.ance_warmup_steps == 100


def test_preflight_passes_auth_to_cors(monkeypatch, fake_student):
    """OPTIONS preflight is anonymous by spec: with auth + credentialed
    CORS enabled, the preflight must reach the CORS middleware and answer
    204 with the CORS headers, while data requests still require a key."""
    from sskd_tpu.serve.middleware import APIKeyAuth

    monkeypatch.setattr(app_module, "StudentModel", lambda *a, **k: fake_student)
    monkeypatch.setattr(app_module, "TeacherModel", lambda *a, **k: None)
    settings = Settings.model_validate(
        {
            "auth": {"enabled": True, "api_keys": ["sk_pre"]},
            "cors": {"enabled": True, "allow_credentials": True},
        }
    )
    tc = TestClient(app_module.create_app(settings=settings))
    try:
        pre = tc.request(
            "OPTIONS", "/search", headers={"origin": "https://app.example"}
        )
        assert pre.status == 204
        assert pre.headers["Access-Control-Allow-Origin"] == "https://app.example"
        assert pre.headers["Access-Control-Allow-Credentials"] == "true"
        assert tc.post("/encode", json_body={"texts": ["x"]}).status == 401
        ok = tc.post(
            "/encode",
            json_body={"texts": ["x"]},
            headers={"x-api-key": "sk_pre"},
        )
        assert ok.status == 200
    finally:
        tc.close()


def test_custom_api_key_header(monkeypatch, fake_student):
    """auth.api_key_header (reference config field) renames the credential
    header; the default X-API-Key stops working when overridden."""
    from sskd_tpu.serve.middleware import APIKeyAuth

    monkeypatch.setattr(app_module, "StudentModel", lambda *a, **k: fake_student)
    monkeypatch.setattr(app_module, "TeacherModel", lambda *a, **k: None)
    settings = Settings.model_validate(
        {
            "auth": {
                "enabled": True,
                "api_keys": ["sk_hdr"],
                "api_key_header": "X-Custom-Key",
            }
        }
    )
    tc = TestClient(app_module.create_app(settings=settings))
    try:
        ok = tc.post(
            "/encode",
            json_body={"texts": ["x"]},
            headers={"x-custom-key": "sk_hdr"},
        )
        assert ok.status == 200
        wrong_header = tc.post(
            "/encode",
            json_body={"texts": ["x"]},
            headers={"x-api-key": "sk_hdr"},
        )
        assert wrong_header.status == 401
    finally:
        tc.close()
