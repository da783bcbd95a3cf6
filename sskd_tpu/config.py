"""Configuration tree for sskd_tpu.

One Pydantic config tree consumed by both the CLI and the service (the
reference kept two parallel systems — argparse validators plus a
pydantic-settings tree, reference: src/config.py:263-403 and
scripts/_validate_args.py — this build unifies them).

Precedence: env vars (``SEMANTIC_KD_*``, nested via ``__``) > YAML file
(``SEMANTIC_KD_CONFIG_PATH`` or explicit ``from_yaml``) > defaults.
Matches the reference's env scheme (reference: src/config.py:275-279).

TPU additions over the reference: ``MeshConfig`` (device mesh axes and
sizes) and ``PrecisionConfig`` (bf16 compute, int8 index rows).
"""

from __future__ import annotations

import json
import os
import warnings
from functools import lru_cache
from pathlib import Path
from typing import Any, Literal

import yaml
from pydantic import BaseModel, Field, field_validator, model_validator

ENV_PREFIX = "SEMANTIC_KD_"
NESTED_DELIMITER = "__"


class StudentModelConfig(BaseModel):
    """Bi-encoder student (reference: src/config.py:22-32)."""

    model_name: str = "intfloat/e5-small-v2"
    embedding_dim: int = Field(default=384, ge=1)
    max_seq_length: int = Field(default=512, ge=1, le=8192)
    normalize_embeddings: bool = True
    query_prefix: str = "query: "
    passage_prefix: str = "passage: "
    pooling: Literal["mean", "cls"] = "mean"


class TeacherModelConfig(BaseModel):
    """Cross-encoder teacher (reference: src/config.py:35-45)."""

    model_name: str = "BAAI/bge-reranker-large"
    max_seq_length: int = Field(default=512, ge=1, le=8192)
    batch_size: int = Field(default=32, ge=1)


class LossConfig(BaseModel):
    """KD loss mix (reference: src/config.py:48-73, configs/kd.yaml:51-69)."""

    margin_mse_weight: float = Field(default=0.6, ge=0.0, le=1.0)
    listwise_kd_weight: float = Field(default=0.2, ge=0.0, le=1.0)
    contrastive_weight: float = Field(default=0.2, ge=0.0, le=1.0)
    temperature_start: float = Field(default=4.0, gt=0.0)
    temperature_end: float = Field(default=2.0, gt=0.0)
    contrastive_tau: float = Field(default=0.05, gt=0.0)
    # widen the InfoNCE denominator with every OTHER query's docs in the
    # batch (standard dense-retrieval practice; one [B, B*N] matmul on
    # already-computed embeddings). Off by default: the reference's
    # InfoNCE is per-query candidates only (reference: src/kd/losses.py
    # :109-149). Margin-MSE/listwise are untouched — teacher scores only
    # exist for a query's own candidates.
    in_batch_negatives: bool = False

    @model_validator(mode="after")
    def _weights_sum_to_one(self) -> "LossConfig":
        total = (
            self.margin_mse_weight + self.listwise_kd_weight + self.contrastive_weight
        )
        if abs(total - 1.0) > 1e-6:
            raise ValueError(f"loss weights must sum to 1.0, got {total}")
        return self


class TrainingConfig(BaseModel):
    """Trainer knobs — all of them are wired in (the reference declared
    fp16/warmup/grad-accum/max_grad_norm but never used them,
    reference: src/config.py:76-101 vs src/kd/train.py:94-304)."""

    epochs: int = Field(default=3, ge=1)
    batch_size: int = Field(default=32, ge=1)
    learning_rate: float = Field(default=2e-5, gt=0.0)
    weight_decay: float = Field(default=0.01, ge=0.0)
    warmup_ratio: float = Field(default=0.1, ge=0.0, le=1.0)
    max_grad_norm: float = Field(default=1.0, gt=0.0)
    grad_accum_steps: int = Field(default=1, ge=1)
    num_docs_per_query: int = Field(default=8, ge=2)
    early_stopping_patience: int = Field(default=2, ge=0)
    early_stopping_metric: str = "ndcg@10"
    save_steps: int = Field(default=0, ge=0)
    eval_steps: int = Field(default=0, ge=0)
    # rematerialize encoder activations in the train step (jax.checkpoint):
    # at e5-small shapes (B=32 x N=8 docs x 192 tokens) storing every
    # layer's activations for backward exceeds v5e HBM; remat trades ~1/3
    # more FLOPs for O(sqrt(layers)) activation memory
    remat: bool = True
    # remat granularity: "full" recomputes the whole tower forward in the
    # backward (max memory savings, +1x fwd FLOPs); "dots" saves matmul
    # outputs and recomputes only cheap elementwise ops
    # (jax.checkpoint_policies.checkpoint_dots) — post-fusion the
    # attention probs never materialize, so the doc tower's matmul
    # activations (~2-3 GB at bench shapes) fit v5e HBM and the +1x fwd
    # recompute is mostly avoidable
    remat_policy: str = Field(default="full", pattern="^(full|dots)$")
    # PRNG implementation for the per-step dropout keys. "rbg" drives the
    # TPU's hardware RngBitGenerator instead of computing threefry2x32 on
    # the VPU: measured 473.6 -> 429.3 ms/step at e5-small bench shapes
    # (B=32, N=8, L=192, v5e) with identical statistical behavior. Dropout
    # masks carry no reproducibility contract across impls; "threefry2x32"
    # restores the JAX default if bit-exact cross-backend replay matters.
    rng_impl: Literal["rbg", "unsafe_rbg", "threefry2x32"] = "rbg"
    # host batches packed ahead of the device by a producer thread
    # (kd/dataset.py prefetch_batches): tokenization overlaps the async
    # train-step dispatch instead of serializing with it. 0 = synchronous.
    prefetch_batches: int = Field(default=2, ge=0)
    seed: int = 42
    output_dir: str = "artifacts/models/kd_student"
    resume: bool = True


class MiningConfig(BaseModel):
    """3-stage curriculum knobs (reference: src/config.py:104-123,
    configs/kd.yaml:71-100)."""

    stage: int = Field(default=3, ge=1, le=3)
    bm25_top_k: int = Field(default=100, ge=1)
    teacher_top_k: int = Field(default=10, ge=1)
    teacher_confidence_threshold: float = Field(default=0.6, ge=0.0, le=1.0)
    ance_top_k: int = Field(default=5, ge=1)
    ance_margin: float = Field(default=0.1, ge=0.0)
    ance_refresh_every_n_steps: int = Field(default=500, ge=1)
    # master switch + warmup gate for the in-training refresh — the
    # reference declared both but never consumed them
    # (reference: src/config.py ance_enabled/ance_warmup_steps)
    ance_enabled: bool = True
    ance_warmup_steps: int = Field(default=0, ge=0)
    denoise_text_overlap_threshold: float = Field(default=0.9, ge=0.0, le=1.0)
    bm25_k1: float = Field(default=1.5, gt=0.0)
    bm25_b: float = Field(default=0.75, ge=0.0, le=1.0)
    bm25_epsilon: float = Field(default=0.25, ge=0.0)


class IndexConfig(BaseModel):
    """TPU index engine (replaces the reference's FAISSConfig,
    reference: src/config.py:126-144, configs/index.yaml:1-63).

    The index is exact blocked-matmul cosine top-k, so the HNSW graph
    parameters are gone; what remains is layout, precision and the
    build-time validation gate."""

    embedding_dim: int = Field(default=384, ge=1)
    metric: Literal["cosine", "dot"] = "cosine"
    dtype: Literal["float32", "bfloat16", "int8", "int4"] = "float32"
    # "clustered" = balanced cell-probe pruning, the IVF analog (reference:
    # src/config.py FAISSConfig ivf params) — capability parity; the dense
    # approx sweep measured faster at every stable operating point (adr-009)
    search_method: Literal["exact", "approx", "clustered"] = "approx"
    recall_target: float = Field(default=0.99, ge=0.5, le=1.0)
    block_rows: int = Field(default=262144, ge=128)
    default_k: int = Field(default=10, ge=1)
    cluster_rows: int = Field(default=0, ge=0)  # 0 = auto (~sqrt N)
    nprobe: int = Field(default=64, ge=1)
    # int8+approx two-stage refinement: sweep fetches refine_m candidates,
    # their bf16 rows are rescored exactly (recall 0.9945 vs 0.972 plain
    # int8 at 1M rows, measured); 0 disables
    refine_m: int = Field(default=0, ge=0)
    # where the bf16 refine rows live (adr-012): "device" rescoring runs
    # inside the sweep's device program; "host" keeps the rows in host RAM
    # (frees 2 bytes/elem of HBM so the int4 capacity win survives
    # refinement) and rescoring runs in numpy on the returned candidates.
    # Deployment choice, not an index property — applies at load time too.
    refine_storage: Literal["device", "host"] = "device"
    validation_queries: int = Field(default=1000, ge=1)
    validation_recall_at_10: float = Field(default=0.97, ge=0.0, le=1.0)


class MeshConfig(BaseModel):
    """Device mesh (TPU-native addition; no reference equivalent —
    the reference is single-process single-device, SURVEY.md section 2.10)."""

    data_axis: str = "data"
    index_axis: str = "index"
    data_parallel: int = Field(default=-1, ge=-1)  # -1 = all devices
    index_parallel: int = Field(default=1, ge=1)


class PrecisionConfig(BaseModel):
    """Compute/storage precision (TPU-native addition)."""

    compute_dtype: Literal["float32", "bfloat16"] = "bfloat16"
    param_dtype: Literal["float32", "bfloat16"] = "float32"
    index_dtype: Literal["float32", "bfloat16", "int8", "int4"] = "float32"


class CORSConfig(BaseModel):
    """Reference: src/config.py:147-168."""

    enabled: bool = True
    allow_origins: list[str] = Field(default_factory=lambda: ["*"])
    allow_methods: list[str] = Field(default_factory=lambda: ["GET", "POST"])
    allow_headers: list[str] = Field(default_factory=lambda: ["*"])
    # Access-Control-Allow-Credentials; a credentialed response echoes the
    # allowed origin instead of "*" (CORS spec forbids the wildcard there)
    allow_credentials: bool = False


class RateLimitConfig(BaseModel):
    """Reference: src/config.py:171-176."""

    enabled: bool = False
    requests_per_minute: int = Field(default=60, ge=1)
    burst: int = Field(default=10, ge=1)


class AuthConfig(BaseModel):
    """Reference: src/config.py:179-190."""

    enabled: bool = False
    api_key_hashes: list[str] = Field(default_factory=list)
    # credential header name (reference: src/config.py:183)
    api_key_header: str = "X-API-Key"
    # drop-in migration path for the reference's PLAINTEXT auth.api_keys
    # (reference: src/config.py:181): accepted, hashed immediately below,
    # and flagged by the production audit — hashes-only is the native mode
    api_keys: list[str] = Field(default_factory=list)
    salt: str = ""

    @model_validator(mode="after")
    def _hash_plaintext_keys(self) -> "AuthConfig":
        if self.api_keys:
            from sskd_tpu.serve.middleware import APIKeyAuth

            self.api_key_hashes = list(self.api_key_hashes) + [
                APIKeyAuth.hash_key(k, salt=self.salt) for k in self.api_keys
            ]
        return self


class MonitoringConfig(BaseModel):
    """Reference: src/config.py:193-205."""

    prometheus_enabled: bool = True
    prometheus_path: str = "/metrics"
    # optional SEPARATE metrics listener (reference declared
    # prometheus_port but never served it): 0 = metrics ride the app port
    # at prometheus_path (default); >0 additionally binds an internal
    # port serving ONLY the catalog — for deployments whose API port is
    # public but whose scrape network is private
    prometheus_port: int = Field(default=0, ge=0, le=65535)
    opentelemetry_enabled: bool = False
    opentelemetry_endpoint: str = ""
    # OTel tracer/service identity (reference: src/config.py:201)
    service_name: str = "semantic-kd"
    jax_profiler_port: int = Field(default=0, ge=0, le=65535)
    # reference: src/config.py:203-204 — raw query text in request logs is
    # opt-in (the default line carries sha256(query)[:12] only)
    log_queries: bool = False
    log_latencies: bool = True


class ServiceConfig(BaseModel):
    """Reference: src/config.py:208-220."""

    host: str = "0.0.0.0"
    port: int = Field(default=8000, ge=1, le=65535)
    environment: Literal["development", "staging", "production"] = "development"
    version: str = "0.1.0"
    # micro-batching of concurrent /search requests: window 0 = greedy
    # coalescing of whatever is already queued (no added latency); raise the
    # window to trade p50 for throughput under bursty load
    micro_batch_window_ms: float = Field(default=0.0, ge=0.0)
    micro_batch_max_size: int = Field(default=64, ge=1)
    # connection hardening (the reference delegated these to uvicorn)
    read_timeout_s: float = Field(default=30.0, gt=0.0)
    idle_timeout_s: float = Field(default=75.0, gt=0.0)
    max_connections: int = Field(default=1024, ge=1)
    # CPU-serving worker processes sharing the port via SO_REUSEPORT (the
    # reference's service.workers / uvicorn --workers, src/config.py:213).
    # TPU serving ignores >1 with a warning: one process owns the chip —
    # scale TPU serving with replicas/shards, not local forks.
    workers: int = Field(default=1, ge=1, le=32)
    # service log threshold (reference: src/config.py:214, fed to uvicorn;
    # here fed to setup_logging by the serve entry point). The reference's
    # `reload` (uvicorn dev auto-reload) is intentionally absent — there is
    # no module-reload machinery in the first-party server.
    log_level: Literal["debug", "info", "warning", "error", "critical"] = "info"


class HybridConfig(BaseModel):
    """Hybrid BM25+semantic fusion — the reference's dead `hybrid:` YAML
    block implemented for real (reference: configs/service.yaml:44-49 and
    the `enable_hybrid`/`enable_query_expansion` feature flags at
    service.yaml:110-113, which no reference code ever consumed)."""

    enabled: bool = False
    bm25_index_path: str = "artifacts/indexes/bm25"
    bm25_weight: float = Field(default=0.3, ge=0.0, le=1.0)
    semantic_weight: float = Field(default=0.7, ge=0.0, le=1.0)
    fusion_method: Literal["rrf", "linear"] = "rrf"
    rrf_k: int = Field(default=60, ge=1)
    query_expansion: bool = False
    expansion_docs: int = Field(default=3, ge=1)
    expansion_terms: int = Field(default=5, ge=1)

    @model_validator(mode="after")
    def _weights_sum(self) -> "HybridConfig":
        total = self.bm25_weight + self.semantic_weight
        if abs(total - 1.0) > 1e-6:
            raise ValueError(
                f"bm25_weight + semantic_weight must sum to 1.0, got {total}"
            )
        return self


class CacheConfig(BaseModel):
    """Query-result + embedding caches — the reference declared this block
    (reference: configs/service.yaml:101-106) and documented the strategy
    (reference: docs/operations/scaling-and-performance.md "Caching
    Strategies": result cache keyed by SHA256(normalize(query) + params),
    TTL invalidation, flush after index rebuilds; an embedding cache keyed
    per text) but never shipped an implementation. Implemented here
    in-process and dependency-free (sskd_tpu/serve/cache.py), matching the
    first-party serving stack; ``backend`` values other than memory are
    accepted for config-surface parity and degrade loudly to memory."""

    enabled: bool = False
    backend: str = "memory"  # "memory"/"in-memory" implemented; "redis"/
    # "memcached" accepted (reference surface) but served by the in-process
    # store with a startup warning — this stack ships zero external deps
    redis_url: str = "redis://localhost:6379"  # parity field, unused
    ttl_seconds: float = Field(default=3600.0, gt=0.0)
    max_size: int = Field(default=10000, ge=1)
    # the documented "Embedding Cache" (scaling-and-performance.md): per-text
    # /encode memoization — independent of the index, so /index/load keeps it
    embedding_cache: bool = True


class SearchConfig(BaseModel):
    """Reference: src/config.py:223-238."""

    default_k: int = Field(default=10, ge=1, le=100)
    max_k: int = Field(default=100, ge=1)
    rerank_enabled: bool = False
    rerank_top_k: int = Field(default=50, ge=1, le=200)
    rerank_timeout_ms: float = Field(default=5000.0, gt=0.0)
    maxsim_aggregation: bool = False
    hybrid: HybridConfig = Field(default_factory=HybridConfig)


class DataConfig(BaseModel):
    """Reference: src/config.py:241-260."""

    data_dir: str = "data"
    max_samples: int = Field(default=0, ge=0)  # 0 = all
    chunk_max_tokens: int = Field(default=512, ge=8)
    chunk_stride: int = Field(default=80, ge=0)


class Settings(BaseModel):
    """Root settings tree (reference: src/config.py:263-403)."""

    # debug mode (reference: src/config.py:286): verbose logging intent;
    # flagged by the production audit, and `semantic-kd serve` treats it
    # as log_level=debug when no explicit level is set
    debug: bool = False
    student: StudentModelConfig = Field(default_factory=StudentModelConfig)
    teacher: TeacherModelConfig = Field(default_factory=TeacherModelConfig)
    loss: LossConfig = Field(default_factory=LossConfig)
    training: TrainingConfig = Field(default_factory=TrainingConfig)
    mining: MiningConfig = Field(default_factory=MiningConfig)
    index: IndexConfig = Field(default_factory=IndexConfig)
    mesh: MeshConfig = Field(default_factory=MeshConfig)
    precision: PrecisionConfig = Field(default_factory=PrecisionConfig)
    cors: CORSConfig = Field(default_factory=CORSConfig)
    rate_limit: RateLimitConfig = Field(default_factory=RateLimitConfig)
    auth: AuthConfig = Field(default_factory=AuthConfig)
    monitoring: MonitoringConfig = Field(default_factory=MonitoringConfig)
    service: ServiceConfig = Field(default_factory=ServiceConfig)
    search: SearchConfig = Field(default_factory=SearchConfig)
    cache: CacheConfig = Field(default_factory=CacheConfig)
    data: DataConfig = Field(default_factory=DataConfig)

    @model_validator(mode="after")
    def _production_enforcement(self) -> "Settings":
        """Warn about unsafe production combinations
        (reference: src/config.py:298-318)."""
        if self.service.environment == "production":
            if "*" in self.cors.allow_origins:
                warnings.warn(
                    "CORS wildcard origin in production", UserWarning, stacklevel=2
                )
            if not self.auth.enabled:
                warnings.warn(
                    "API key auth disabled in production", UserWarning, stacklevel=2
                )
            if not self.rate_limit.enabled:
                warnings.warn(
                    "rate limiting disabled in production", UserWarning, stacklevel=2
                )
        return self

    def validate_for_production(self) -> list[str]:
        """Audit for production readiness; returns list of problems
        (reference: src/config.py:357-385)."""
        problems: list[str] = []
        if "*" in self.cors.allow_origins:
            problems.append("cors.allow_origins contains wildcard")
        if not self.auth.enabled:
            problems.append("auth.enabled is False")
        if self.auth.api_keys:
            problems.append(
                "auth.api_keys holds PLAINTEXT keys (migration aid) — move "
                "the hashes to auth.api_key_hashes and drop the plaintext"
            )
        if not self.rate_limit.enabled:
            problems.append("rate_limit.enabled is False")
        if not self.monitoring.prometheus_enabled:
            problems.append("monitoring.prometheus_enabled is False")
        if self.debug:
            problems.append("debug mode is enabled")
        return problems

    # -- YAML round trip (reference: src/config.py:320-351) ----------------

    @classmethod
    def from_yaml(cls, path: str | Path) -> "Settings":
        with open(path) as f:
            raw = yaml.safe_load(f) or {}
        return cls.model_validate(raw)

    def to_yaml(self, path: str | Path) -> None:
        with open(path, "w") as f:
            yaml.safe_dump(self.model_dump(mode="json"), f, sort_keys=False)

    # -- env overrides ------------------------------------------------------

    @classmethod
    def from_env(cls, base: "Settings | None" = None) -> "Settings":
        """Apply ``SEMANTIC_KD_section__field=value`` env overrides on top of
        ``base`` (or defaults). Values are parsed as JSON when possible so
        lists/bools/numbers work; otherwise kept as strings."""
        data = (base or cls()).model_dump()
        for key, value in os.environ.items():
            if not key.startswith(ENV_PREFIX) or key == "SEMANTIC_KD_CONFIG_PATH":
                continue
            path_parts = key[len(ENV_PREFIX) :].lower().split(NESTED_DELIMITER)
            node: Any = data
            ok = True
            for part in path_parts[:-1]:
                if isinstance(node, dict) and part in node:
                    node = node[part]
                else:
                    ok = False
                    break
            if not ok or not isinstance(node, dict):
                continue
            leaf = path_parts[-1]
            if leaf not in node:
                continue
            try:
                node[leaf] = json.loads(value)
            except (json.JSONDecodeError, ValueError):
                node[leaf] = value
        return cls.model_validate(data)


@lru_cache(maxsize=1)
def get_settings() -> Settings:
    """Cascade: YAML at ``SEMANTIC_KD_CONFIG_PATH`` (if set) -> env overrides
    -> defaults. Cached (reference: src/config.py:388-403)."""
    config_path = os.environ.get("SEMANTIC_KD_CONFIG_PATH")
    base = Settings.from_yaml(config_path) if config_path else None
    return Settings.from_env(base)


def reset_settings_cache() -> None:
    """Clear the cached settings (tests and hot-reload)."""
    get_settings.cache_clear()
