"""Serving application — the reference's FastAPI service rebuilt on the
first-party HTTP stack (reference: src/serve/app.py:49-503).

Surface parity:
- routes ``/``, ``/health``, ``/ready``, ``/live``, ``POST /search``,
  ``POST /encode``, ``POST /index/load`` (reference: app.py:221-457) plus a
  real ``/metrics`` endpoint (the reference documented one but never wired
  it, SURVEY.md 5.5);
- middleware runtime order APIKey -> RateLimit -> RequestLogging ->
  SecurityHeaders -> CORS (reference: c4-component-serving.md:7);
- lifespan: student load is fatal, teacher load failure degrades gracefully
  to rerank-disabled (reference: app.py:96-107); ``/ready`` returns 503
  until models are loaded and flips off on shutdown (reference: app.py:242);
- the index is NOT loaded at startup — it arrives via ``POST /index/load``
  or a ``preload_index_dir`` argument (reference: app.py:407-457).

TPU addition: optional MaxSim doc-level aggregation over chunk hits
(``search.maxsim_aggregation``) — the reference's dead feature made real
(SURVEY.md 5.7). Hybrid BM25+semantic fusion (``search.hybrid``) likewise
implements the reference's dead ``hybrid:``/``enable_hybrid`` config
(reference: configs/service.yaml:44-49,110-113) for real — see
``sskd_tpu/serve/hybrid.py``. The ``cache:`` block (query-result +
embedding TTL caches, reference: configs/service.yaml:101-106, also dead
there) is implemented in ``sskd_tpu/serve/cache.py`` and wired here:
result-cache check/fill on ``/search`` (degraded rerank responses are
never cached), per-text memoization on ``/encode``, flush on
``/index/load`` and ``POST /cache/flush``.
"""

from __future__ import annotations

import time
from pathlib import Path

from pydantic import ValidationError

from sskd_tpu.config import Settings, get_settings
from sskd_tpu.exceptions import SemanticKDError
from sskd_tpu.index.builder import IndexBuilder
from sskd_tpu.models.student import StudentModel
from sskd_tpu.models.teacher import TeacherModel
from sskd_tpu.serve import metrics as m
from sskd_tpu.serve.http import App, Request, Response
from sskd_tpu.serve.middleware import (
    APIKeyAuth,
    RateLimiter,
    cors_middleware,
    hash_query,
    request_logging_middleware,
    security_headers_middleware,
)
from sskd_tpu.serve.schemas import (
    EncodeRequest,
    IndexLoadRequest,
    SearchRequest,
    SearchResult,
)
from sskd_tpu.utils.chunk import maxsim_aggregate_topk
from sskd_tpu.utils.logging import get_logger
from sskd_tpu.utils.tracing import (
    SPAN_ENCODE_QUERY,
    SPAN_INDEX_SEARCH,
    SPAN_LOAD_INDEX,
    SPAN_LOAD_MODEL,
    SPAN_RERANK,
    TRACER,
    span,
    start_jax_profiler,
)
from sskd_tpu.version import __version__

logger = get_logger("serve.app")


class AppState:
    """Global service state (reference: app.py:49-72)."""

    def __init__(self):
        self.student: StudentModel | None = None
        self.teacher: TeacherModel | None = None
        self.index_builder: IndexBuilder | None = None
        self.sharded_index = None  # ShardedIndex when mesh.index_parallel > 1
        self.fused_searcher = None  # FusedSearcher on the single-device path
        self.settings: Settings | None = None
        self.ready: bool = False
        self.search_batcher = None  # MicroBatcher when enabled
        self.hybrid = None  # HybridSearcher when search.hybrid.enabled
        # TTL+LRU caches when cache.enabled (the reference's declared-but-
        # never-implemented cache: block — see sskd_tpu/serve/cache.py)
        self.query_cache = None
        self.embedding_cache = None

    def search_index(self, q_emb, k: int):
        """Route to the ICI-sharded engine when present, else single-chip."""
        if self.sharded_index is not None:
            return self.sharded_index.search(q_emb, k=k)
        return self.index_builder.search(q_emb, k=k)

    def search_texts(self, queries: list[str], k: int):
        """Encode + search in ONE fused device dispatch — on both the
        single-device path and the ICI-sharded path (encode replicated,
        sweep under shard_map)."""
        if self.fused_searcher is not None:
            return self.fused_searcher.search_texts(queries, k)
        with span(SPAN_ENCODE_QUERY, batch=len(queries)):
            q_emb = self.student.encode_queries(queries)
        return self.search_index(q_emb, k=k)

    def make_fused(self) -> None:
        # requires a real Flax student (duck-typed test fakes lack .module)
        if self.index_builder is None or not hasattr(self.student, "module"):
            self.fused_searcher = None
            return
        if self.sharded_index is not None:
            from sskd_tpu.serve.fused import ShardedFusedSearcher

            self.fused_searcher = ShardedFusedSearcher(
                self.student, self.sharded_index
            )
        else:
            from sskd_tpu.serve.fused import FusedSearcher

            self.fused_searcher = FusedSearcher(self.student, self.index_builder)

    def maybe_shard_index(self, settings) -> None:
        """Lift the loaded single-device index onto the mesh when
        ``mesh.index_parallel > 1`` (ICI-sharded serving — the capability the
        reference only described as future work, SURVEY.md 5.8). Texts and
        doc ids stay host-side on the builder."""
        if settings.mesh.index_parallel <= 1 or self.index_builder is None:
            self.sharded_index = None
            return
        from sskd_tpu.index.sharded import ShardedIndex
        from sskd_tpu.parallel.mesh import create_mesh

        mesh = create_mesh(
            data_parallel=1,
            index_parallel=settings.mesh.index_parallel,
            data_axis=settings.mesh.data_axis,
            index_axis=settings.mesh.index_axis,
        )
        if (
            self.index_builder.refine_storage == "host"
            and self.index_builder._refine is not None
        ):
            # the sharded engine rescopes inside shard_map with the refine
            # rows sharded next to their quantized rows (adr-012) — host
            # refine storage is a single-device capacity lever
            logger.warning(
                "refine_storage='host' ignored under index_parallel>1: "
                "sharded serving keeps refine rows on-device per shard"
            )
        self.sharded_index = ShardedIndex.from_builder(
            self.index_builder, mesh, axis=settings.mesh.index_axis
        )
        logger.info(
            f"index sharded over {settings.mesh.index_parallel} chips "
            f"({self.index_builder.ntotal} rows)"
        )

    @property
    def index_loaded(self) -> bool:
        return self.index_builder is not None and self.index_builder.is_built


def _status_for(exc: SemanticKDError) -> int:
    from sskd_tpu import exceptions as E

    if isinstance(exc, (E.ServiceNotReadyError, E.IndexNotLoadedError)):
        return 503
    if isinstance(exc, E.RateLimitExceededError):
        return 429
    if isinstance(exc, (E.AuthError,)):
        return 401
    if isinstance(exc, (E.ValidationError_, E.ConfigError)):
        return 400
    return 500


def create_app(
    settings: Settings | None = None,
    student_model_path: str | None = None,
    device: str | None = None,
    preload_index_dir: str | None = None,
) -> App:
    settings = settings or get_settings()
    if student_model_path:
        settings = settings.model_copy(deep=True)
        settings.student.model_name = student_model_path

    app = App()
    state = AppState()
    state.settings = settings
    app.state = state  # exposed for tests/embedding
    if settings.cache.enabled:
        from sskd_tpu.serve.cache import make_caches

        state.query_cache, state.embedding_cache = make_caches(settings.cache)

    # -- middlewares (added inner->outer; runtime order is APIKey first,
    #    reference: c4-component-serving.md:7) ------------------------------
    if settings.cors.enabled:
        app.add_middleware(
            cors_middleware(
                settings.cors.allow_origins,
                settings.cors.allow_methods,
                settings.cors.allow_headers,
                allow_credentials=settings.cors.allow_credentials,
            )
        )
    app.add_middleware(security_headers_middleware())
    app.add_middleware(
        request_logging_middleware(
            log_queries=settings.monitoring.log_queries,
            log_latencies=settings.monitoring.log_latencies,
        )
    )
    if settings.rate_limit.enabled:
        limiter = RateLimiter(
            settings.rate_limit.requests_per_minute, settings.rate_limit.burst
        )
        app.state.rate_limiter = limiter
        app.add_middleware(limiter.middleware())
    if settings.auth.enabled:
        auth = APIKeyAuth(
            api_key_hashes=settings.auth.api_key_hashes,
            salt=settings.auth.salt,
            header=settings.auth.api_key_header,
        )
        app.state.auth = auth
        app.add_middleware(auth.middleware())

    # -- lifespan (reference: app.py:75-117) --------------------------------

    def startup():
        if settings.monitoring.opentelemetry_enabled:
            TRACER.configure_otel(
                settings.monitoring.opentelemetry_endpoint,
                service_name=settings.monitoring.service_name,
            )
        start_jax_profiler(settings.monitoring.jax_profiler_port)
        t0 = time.perf_counter()
        try:
            with span(SPAN_LOAD_MODEL, model=settings.student.model_name):
                import jax.numpy as jnp

                state.student = StudentModel(
                    settings.student.model_name,
                    device=device,
                    max_seq_length=settings.student.max_seq_length,
                    query_prefix=settings.student.query_prefix,
                    passage_prefix=settings.student.passage_prefix,
                    normalize=settings.student.normalize_embeddings,
                    pooling=settings.student.pooling,
                    compute_dtype=getattr(jnp, settings.precision.compute_dtype),
                )
        except Exception:
            logger.exception("student model load failed — fatal")
            raise
        m.MODEL_LOAD_SECONDS.set(time.perf_counter() - t0)
        if settings.search.rerank_enabled:
            try:
                state.teacher = TeacherModel(
                    settings.teacher.model_name,
                    device=device,
                    max_seq_length=settings.teacher.max_seq_length,
                )
            except Exception:
                # tolerated: service starts with reranking disabled
                # (reference: app.py:101-107)
                logger.exception("teacher load failed — reranking disabled")
                state.teacher = None
        if preload_index_dir:
            state.index_builder = IndexBuilder().load(preload_index_dir)
            # nprobe is a query-time knob (the cell layout doesn't depend on
            # it): an explicit SEMANTIC_KD_INDEX__NPROBE / YAML setting
            # overrides the value saved in the index meta, so operators can
            # raise recall without a rebuild (guides/index-modes.md)
            if "nprobe" in settings.index.model_fields_set:
                state.index_builder.nprobe = settings.index.nprobe
            # refine_storage is likewise query-time (the rows are the same
            # bytes either way); "host" keeps the bf16 refine rows out of
            # HBM and rescoring runs in numpy (adr-012)
            state.index_builder.refine_storage = settings.index.refine_storage
            state.maybe_shard_index(settings)
            state.make_fused()
            m.INDEX_SIZE.set(state.index_builder.ntotal)
        if settings.search.hybrid.enabled:
            # same degradation contract as the teacher: a missing/corrupt
            # BM25 arm logs and falls back to dense-only serving
            try:
                from sskd_tpu.mining.bm25 import BM25Index
                from sskd_tpu.serve.hybrid import HybridSearcher

                h = settings.search.hybrid
                state.hybrid = HybridSearcher(
                    BM25Index.load(h.bm25_index_path),
                    bm25_weight=h.bm25_weight,
                    semantic_weight=h.semantic_weight,
                    fusion_method=h.fusion_method,
                    rrf_k=h.rrf_k,
                    query_expansion=h.query_expansion,
                    expansion_docs=h.expansion_docs,
                    expansion_terms=h.expansion_terms,
                )
                logger.info(
                    f"hybrid search enabled: {h.fusion_method} fusion, "
                    f"bm25={h.bm25_weight}/semantic={h.semantic_weight}, "
                    f"{state.hybrid.bm25.ntotal} lexical docs"
                )
            except Exception:
                logger.exception("BM25 arm load failed — hybrid disabled")
                state.hybrid = None
        # Warmup: trigger XLA compilation of the encode (and search, when an
        # index is preloaded) paths so the first request doesn't pay the
        # multi-second compile (keeps the reference's p95 CI gates honest,
        # reference: ml-pipeline.yml:324-326). Batch buckets compile up
        # front too — first-touch compiles mid-traffic stall coalesced
        # requests.
        try:
            if state.fused_searcher is not None:
                state.fused_searcher.warmup(
                    max_batch=settings.service.micro_batch_max_size,
                    k=settings.search.default_k,
                )
            else:
                warm = state.student.encode_queries(["warmup query"])
                if state.index_loaded:
                    state.search_index(warm, k=settings.search.default_k)
                if settings.service.micro_batch_max_size > 1:
                    from sskd_tpu.models.student import _buckets

                    for bucket in _buckets():  # backend-aware ladder
                        if bucket > min(settings.service.micro_batch_max_size, 64):
                            break
                        warm_batch = state.student.encode_queries(
                            ["warmup"] * bucket
                        )
                        if state.index_loaded:
                            state.search_index(
                                warm_batch, k=settings.search.default_k
                            )
        except Exception:
            logger.exception("warmup failed (continuing)")

        if settings.service.micro_batch_max_size > 1:
            from sskd_tpu.serve.batcher import MicroBatcher

            def batched_search(items):
                queries = [q for q, _ in items]
                max_k = max(k for _, k in items)
                # bucket k so differing request k's don't recompile the
                # search (results are sliced per request below)
                for bucket in (10, 20, 50, 100, 200, 400):
                    if max_k <= bucket <= state.index_builder.ntotal:
                        max_k = bucket
                        break
                t0 = time.perf_counter()
                with span(SPAN_INDEX_SEARCH, k=max_k, batch=len(queries)):
                    scores, indices = state.search_texts(queries, k=max_k)
                m.SEARCH_LATENCY.observe(time.perf_counter() - t0)
                return [
                    (scores[i, :k], indices[i, :k])
                    for i, (_, k) in enumerate(items)
                ]

            state.search_batcher = MicroBatcher(
                batched_search,
                window_ms=settings.service.micro_batch_window_ms,
                max_size=settings.service.micro_batch_max_size,
            )
        state.ready = True

    async def shutdown():
        state.ready = False  # drain signal (reference: app.py:115-116)
        if state.search_batcher is not None:
            await state.search_batcher.close()
            state.search_batcher = None

    app.on_startup.append(startup)
    app.on_shutdown.append(shutdown)

    # -- exception handlers (reference: app.py:460-482) ---------------------

    def kd_error_handler(request: Request, exc: SemanticKDError) -> Response:
        payload = exc.to_dict()
        if settings.service.environment == "production":
            payload.pop("details", None)  # prod hides internals
        return Response(payload, status=_status_for(exc))

    def validation_handler(request: Request, exc: ValidationError) -> Response:
        return Response(
            {"error": "VALIDATION_ERROR", "detail": exc.errors(include_url=False)},
            status=422,
        )

    def bad_json_handler(request: Request, exc: Exception) -> Response:
        return Response({"error": "invalid JSON body"}, status=422)

    import json as _json

    app.add_exception_handler(SemanticKDError, kd_error_handler)
    app.add_exception_handler(ValidationError, validation_handler)
    app.add_exception_handler(_json.JSONDecodeError, bad_json_handler)

    # -- routes (reference: app.py:221-457) ---------------------------------

    @app.get("/")
    async def root(request: Request) -> Response:
        return Response(
            {
                "service": "sskd-tpu semantic search",
                "version": __version__,
                "environment": settings.service.environment,
                "endpoints": [
                    "/health",
                    "/ready",
                    "/live",
                    "/search",
                    "/encode",
                    "/index/load",
                    "/metrics",
                    "/docs",
                    "/openapi.json",
                ]
                + (["/cache/flush"] if settings.cache.enabled else []),
            }
        )

    @app.get("/health")
    async def health(request: Request) -> Response:
        return Response(
            {
                "status": "healthy" if state.ready else "starting",
                "model_loaded": state.student is not None,
                "index_loaded": state.index_loaded,
                "index_size": state.index_builder.ntotal if state.index_loaded else 0,
                "version": __version__,
            }
        )

    @app.get("/ready")
    async def ready(request: Request) -> Response:
        if not state.ready:
            return Response({"ready": False}, status=503)
        return Response({"ready": True})

    @app.get("/live")
    async def live(request: Request) -> Response:
        return Response({"alive": True})

    if settings.monitoring.prometheus_enabled:

        @app.route("GET", settings.monitoring.prometheus_path)
        async def metrics_route(request: Request) -> Response:
            return Response(
                m.render(), media_type="text/plain; version=0.0.4; charset=utf-8"
            )

    # -- API docs (reference: FastAPI auto-published /openapi.json + /docs,
    #    src/serve/app.py:152-157; the middleware exclusion lists on both
    #    sides already assume these paths exist) ----------------------------
    from sskd_tpu.serve.openapi import build_openapi, render_docs_html

    _openapi_spec = build_openapi(
        __version__,
        metrics_path=(
            settings.monitoring.prometheus_path
            if settings.monitoring.prometheus_enabled
            else None
        ),
        cache_flush=settings.cache.enabled,
        auth_enabled=settings.auth.enabled,
    )

    @app.get("/openapi.json")
    async def openapi_json(request: Request) -> Response:
        return Response(_openapi_spec)

    @app.get("/docs")
    async def docs_page(request: Request) -> Response:
        return Response(
            render_docs_html(_openapi_spec),
            media_type="text/html; charset=utf-8",
        )

    @app.post("/search")
    async def search(request: Request) -> Response:
        t_start = time.perf_counter()
        body = SearchRequest.model_validate(request.json())
        if body.k > settings.search.max_k:
            return Response(
                {
                    "error": "VALIDATION_ERROR",
                    "detail": f"k={body.k} exceeds search.max_k={settings.search.max_k}",
                },
                status=422,
            )
        if not state.ready or state.student is None:
            return Response({"error": "service not ready"}, status=503)
        if not state.index_loaded:
            # reference behavior: 503 until an index is loaded
            # (reference: app.py:279-283)
            return Response({"error": "index not loaded"}, status=503)

        cache_key = None
        if state.query_cache is not None:
            from sskd_tpu.serve.cache import result_cache_key

            cache_key = result_cache_key(
                body.query, body.k, body.rerank, body.rerank_top_k
            )
            hit = state.query_cache.get(cache_key)
            if hit is not None:
                m.CACHE_HITS.labels("result").inc()
                payload = dict(hit)
                payload["cached"] = True
                payload["latency_ms"] = (time.perf_counter() - t_start) * 1000.0
                return Response(payload)
            m.CACHE_MISSES.labels("result").inc()

        fetch_k = body.rerank_top_k if body.rerank else body.k
        use_maxsim = settings.search.maxsim_aggregation
        chunk_k = min(
            fetch_k * 4 if use_maxsim else fetch_k, state.index_builder.ntotal
        )
        if state.search_batcher is not None:
            # concurrent requests coalesce into one encode + one sweep
            score_vec, idx_vec = await state.search_batcher.submit(
                (body.query, chunk_k)
            )
        else:
            t0 = time.perf_counter()
            with span(SPAN_INDEX_SEARCH, k=chunk_k):
                scores, indices = state.search_texts([body.query], k=chunk_k)
            m.SEARCH_LATENCY.observe(time.perf_counter() - t0)
            score_vec, idx_vec = scores[0], indices[0]

        idx_row = [int(i) for i in idx_vec if i >= 0]
        score_row = [float(s) for s, i in zip(score_vec, idx_vec) if i >= 0]
        doc_ids = [state.index_builder.doc_ids[i] for i in idx_row]
        texts = state.index_builder.get_texts(idx_row)

        if use_maxsim:
            # doc-level MaxSim over chunk hits (SURVEY.md 5.7, live feature)
            text_by_doc = {d: t for d, t in zip(doc_ids, texts)}
            agg_scores, agg_ids = maxsim_aggregate_topk(score_row, doc_ids, fetch_k)
            doc_ids = list(agg_ids)
            score_row = [float(s) for s in agg_scores]
            texts = [text_by_doc.get(d) for d in doc_ids]

        hybrid_used = False
        if state.hybrid is not None:
            # fuse the dense ranking with the BM25 arm (RRF or linear);
            # BM25-only candidates resolve their text through the builder's
            # id->position map, falling back to the BM25 token store
            fused = state.hybrid.fuse(
                body.query, list(zip(doc_ids, score_row)), k=fetch_k
            )
            text_by_doc = {d: t for d, t in zip(doc_ids, texts)}
            doc_ids, score_row, texts = [], [], []
            for d, s in fused:
                doc_ids.append(d)
                score_row.append(float(s))
                if d in text_by_doc:
                    texts.append(text_by_doc[d])
                else:
                    pos = state.index_builder.position_of(d)
                    if pos is not None:
                        texts.append(state.index_builder.get_texts([pos])[0])
                    else:
                        try:
                            texts.append(state.hybrid.bm25.get_doc_text(d))
                        except Exception:
                            texts.append(None)
            hybrid_used = True

        results = [
            SearchResult(doc_id=d, text=t, score=s, rank=r + 1)
            for r, (d, t, s) in enumerate(zip(doc_ids, texts, score_row))
        ]

        reranked = False
        if body.rerank:
            m.RERANK_TRIGGERS.inc()
            # debug-level like the reference (src/serve/app.py:322)
            logger.debug(f"reranking top {len(results)} results")
            if state.teacher is not None:
                import asyncio

                t0 = time.perf_counter()
                pairs = [(body.query, r.text or r.doc_id) for r in results]
                t_scores = None
                try:
                    # circuit breaker: the reference configured
                    # rerank_timeout_ms but never enforced it
                    # (reference: config.py:233, SURVEY.md 5.3)
                    with span(SPAN_RERANK, n_pairs=len(pairs)):
                        t_scores = await asyncio.wait_for(
                            asyncio.to_thread(
                                state.teacher.score,
                                pairs,
                                settings.teacher.batch_size,
                            ),
                            timeout=settings.search.rerank_timeout_ms / 1000.0,
                        )
                except asyncio.TimeoutError:
                    logger.warning(
                        f"rerank timed out after "
                        f"{settings.search.rerank_timeout_ms}ms — degrading "
                        "to bi-encoder ranking"
                    )
                m.RERANK_LATENCY.observe(time.perf_counter() - t0)
                if t_scores is not None:
                    order = sorted(
                        range(len(results)), key=lambda i: -t_scores[i]
                    )
                    results = [
                        SearchResult(
                            doc_id=results[i].doc_id,
                            text=results[i].text,
                            score=float(t_scores[i]),
                            rank=r + 1,
                        )
                        for r, i in enumerate(order)
                    ]
                    reranked = True

        results = results[: body.k]
        latency_ms = (time.perf_counter() - t_start) * 1000.0
        logger.info(
            f"search qhash={hash_query(body.query)} k={body.k} "
            f"rerank={reranked} hybrid={hybrid_used} latency_ms={latency_ms:.1f}"
        )
        payload = {
            "query": body.query,
            "results": [r.model_dump() for r in results],
            "total_results": len(results),
            "reranked": reranked,
            "hybrid": hybrid_used,
            "latency_ms": latency_ms,
        }
        if cache_key is not None:
            # don't cache a DEGRADED response: a rerank request that timed
            # out fell back to bi-encoder order, and serving that from cache
            # for ttl_seconds would pin the degradation past the incident
            if not (body.rerank and not reranked):
                state.query_cache.put(
                    cache_key, {k: v for k, v in payload.items() if k != "latency_ms"}
                )
                m.CACHE_ENTRIES.labels("result").set(len(state.query_cache))
            payload["cached"] = False
        return Response(payload)

    @app.post("/encode")
    async def encode(request: Request) -> Response:
        t_start = time.perf_counter()
        body = EncodeRequest.model_validate(request.json())
        if not state.ready or state.student is None:
            return Response({"error": "service not ready"}, status=503)
        t0 = time.perf_counter()
        if state.embedding_cache is not None:
            # the documented per-text embedding cache (reference:
            # docs/operations/scaling-and-performance.md "Embedding Cache"):
            # only cache MISSES reach the encoder, as one batch
            import numpy as np

            from sskd_tpu.serve.cache import embedding_cache_key

            keys = [embedding_cache_key(t, body.normalize) for t in body.texts]
            rows = [state.embedding_cache.get(k) for k in keys]
            miss = [i for i, r in enumerate(rows) if r is None]
            m.CACHE_HITS.labels("embedding").inc(len(rows) - len(miss))
            m.CACHE_MISSES.labels("embedding").inc(len(miss))
            if miss:
                fresh = state.student.encode(
                    [body.texts[i] for i in miss], normalize=body.normalize
                )
                for j, i in enumerate(miss):
                    # copy: a row VIEW would pin the whole encode batch
                    # (its .base) in the cache until eviction
                    rows[i] = np.asarray(fresh[j]).copy()
                    state.embedding_cache.put(keys[i], rows[i])
                m.CACHE_ENTRIES.labels("embedding").set(len(state.embedding_cache))
            emb = np.stack(rows)
        else:
            emb = state.student.encode(body.texts, normalize=body.normalize)
        m.ENCODE_LATENCY.observe(time.perf_counter() - t0)
        return Response(
            {
                "embeddings": emb.tolist(),
                "dimension": int(emb.shape[1]),
                "num_texts": int(emb.shape[0]),
                "latency_ms": (time.perf_counter() - t_start) * 1000.0,
            }
        )

    @app.post("/index/load")
    async def index_load(request: Request) -> Response:
        body = IndexLoadRequest.model_validate(request.json())
        index_dir = Path(body.index_dir)
        if not index_dir.is_dir():
            return Response(
                {"error": f"index dir not found: {index_dir}"}, status=400
            )
        builder = IndexBuilder()
        with span(SPAN_LOAD_INDEX, dir=str(index_dir)):
            builder.load(index_dir)
        if "nprobe" in settings.index.model_fields_set:
            builder.nprobe = settings.index.nprobe  # query-time override
        builder.refine_storage = settings.index.refine_storage
        state.index_builder = builder
        state.maybe_shard_index(settings)
        state.make_fused()
        m.INDEX_SIZE.set(builder.ntotal)
        if state.query_cache is not None:
            # the documented "flush the cache after index rebuilds"
            # (reference: scaling-and-performance.md:197); embeddings don't
            # depend on the index and survive the swap
            dropped = state.query_cache.clear()
            m.CACHE_ENTRIES.labels("result").set(0)
            if dropped:
                logger.info(f"index swap flushed {dropped} cached results")
        return Response(
            {"loaded": True, "index_size": builder.ntotal, "dir": str(index_dir)}
        )

    if settings.cache.enabled:
        # operational flush — the in-process analog of the reference's
        # documented `redis-cli FLUSHDB` after model updates
        # (reference: scaling-and-performance.md:197)
        @app.post("/cache/flush")
        async def cache_flush(request: Request) -> Response:
            flushed = {"result": 0, "embedding": 0}
            for name, c in (
                ("result", state.query_cache),
                ("embedding", state.embedding_cache),
            ):
                if c is not None:
                    flushed[name] = c.clear()
                    m.CACHE_ENTRIES.labels(name).set(0)
            return Response({"flushed": flushed})

    return app
