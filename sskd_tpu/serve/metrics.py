"""Prometheus metrics — the catalog the reference documented but never
implemented (reference: docs/operations/monitoring-and-alerting.md:30-49,
SURVEY.md 5.5: "no prometheus_client usage in committed src"). Implemented
here with the documented names and bucket boundaries, plus TPU-specific
gauges (queries/sec/chip is the BASELINE.json north-star metric)."""

from __future__ import annotations

from prometheus_client import (
    CollectorRegistry,
    Counter,
    Gauge,
    Histogram,
    generate_latest,
)

REGISTRY = CollectorRegistry()

_LATENCY_BUCKETS = (0.001, 0.0025, 0.005, 0.01, 0.025, 0.05, 0.1, 0.25, 0.5, 1.0, 2.5, 5.0)

REQUESTS_TOTAL = Counter(
    "semantic_kd_requests_total",
    "Total HTTP requests",
    ["method", "path", "status"],
    registry=REGISTRY,
)
REQUEST_DURATION = Histogram(
    "semantic_kd_request_duration_seconds",
    "HTTP request latency",
    ["path"],
    buckets=_LATENCY_BUCKETS,
    registry=REGISTRY,
)
ENCODE_LATENCY = Histogram(
    "semantic_kd_encode_latency_seconds",
    "Query/document encode latency",
    buckets=_LATENCY_BUCKETS,
    registry=REGISTRY,
)
SEARCH_LATENCY = Histogram(
    "semantic_kd_search_latency_seconds",
    "Index search latency",
    buckets=_LATENCY_BUCKETS,
    registry=REGISTRY,
)
RERANK_LATENCY = Histogram(
    "semantic_kd_rerank_latency_seconds",
    "Teacher rerank latency",
    buckets=_LATENCY_BUCKETS,
    registry=REGISTRY,
)
RATE_LIMIT_HITS = Counter(
    "semantic_kd_rate_limit_hits_total",
    "Requests rejected by the rate limiter",
    registry=REGISTRY,
)
MODEL_LOAD_SECONDS = Gauge(
    "semantic_kd_model_load_seconds",
    "Model load wall time",
    registry=REGISTRY,
)
INDEX_SIZE = Gauge(
    "semantic_kd_index_size",
    "Number of vectors in the loaded index",
    registry=REGISTRY,
)
RERANK_TRIGGERS = Counter(
    "semantic_kd_rerank_trigger_total",
    "Searches that requested reranking",
    registry=REGISTRY,
)
CACHE_HITS = Counter(
    "semantic_kd_cache_hits_total",
    "Cache hits (result = /search payloads, embedding = /encode vectors)",
    ["cache"],
    registry=REGISTRY,
)
CACHE_MISSES = Counter(
    "semantic_kd_cache_misses_total",
    "Cache misses",
    ["cache"],
    registry=REGISTRY,
)
CACHE_ENTRIES = Gauge(
    "semantic_kd_cache_entries",
    "Entries currently held by each cache",
    ["cache"],
    registry=REGISTRY,
)
QUERIES_PER_SECOND = Gauge(
    "semantic_kd_queries_per_second_chip",
    "Most recent measured search throughput per chip",
    registry=REGISTRY,
)


def render() -> bytes:
    return generate_latest(REGISTRY)
