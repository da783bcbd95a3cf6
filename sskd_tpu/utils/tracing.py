"""Tracing + device profiling.

The reference declared OpenTelemetry everywhere but wired none of it
(reference: pyproject.toml:31-33, config.py:200-202,
docs/operations/monitoring-and-alerting.md:190-221 describe manual spans
``encode_query / faiss_search / rerank / load_model / load_index`` — no
``import opentelemetry`` existed under src/, SURVEY.md 5.1).

This module implements that surface for real:
- :func:`span` — context-manager spans with millisecond wall time, parent
  nesting, and attributes; exported to the OTel SDK when it is installed
  AND enabled in config, else recorded in an in-process ring buffer that
  ``/metrics``-style debugging and tests can read;
- :func:`start_jax_profiler` — the TPU-level analog: serves the JAX
  profiler so device traces can be captured during serving/training
  (``monitoring.jax_profiler_port``).
"""

from __future__ import annotations

import threading
import time
from collections import deque
from contextlib import contextmanager
from dataclasses import dataclass, field

from sskd_tpu.utils.logging import get_logger

logger = get_logger("tracing")

# Canonical span names (reference: monitoring-and-alerting.md:190-221;
# "faiss_search" becomes "index_search" in the TPU engine).
SPAN_ENCODE_QUERY = "encode_query"
SPAN_INDEX_SEARCH = "index_search"
SPAN_RERANK = "rerank"
SPAN_LOAD_MODEL = "load_model"
SPAN_LOAD_INDEX = "load_index"


@dataclass
class Span:
    name: str
    start_s: float
    duration_ms: float = 0.0
    parent: str | None = None
    attributes: dict = field(default_factory=dict)


class _Tracer:
    """In-process tracer with a bounded ring buffer; OTel-exporting when
    available + enabled."""

    MAX_SPANS = 2048

    def __init__(self):
        self.spans: deque[Span] = deque(maxlen=self.MAX_SPANS)
        self._lock = threading.Lock()
        self._local = threading.local()
        self._otel_tracer = None

    def configure_otel(
        self, endpoint: str = "", service_name: str = "semantic-kd"
    ) -> bool:
        """Attach the OTel SDK if importable; returns success.
        ``service_name`` mirrors monitoring.service_name
        (reference: src/config.py:201)."""
        try:
            from opentelemetry import trace  # type: ignore

            self._otel_tracer = trace.get_tracer(service_name or "semantic-kd")
            logger.info(
                f"opentelemetry tracing enabled (service={service_name}, "
                f"endpoint={endpoint or 'default'})"
            )
            return True
        except ImportError:
            logger.warning("opentelemetry SDK not installed; in-process spans only")
            return False

    @contextmanager
    def span(self, name: str, **attributes):
        parent = getattr(self._local, "current", None)
        self._local.current = name
        record = Span(
            name=name, start_s=time.time(), parent=parent, attributes=attributes
        )
        otel_cm = (
            self._otel_tracer.start_as_current_span(name)
            if self._otel_tracer is not None
            else None
        )
        if otel_cm is not None:
            otel_cm.__enter__()
        t0 = time.perf_counter()
        try:
            yield record
        finally:
            record.duration_ms = (time.perf_counter() - t0) * 1000.0
            if otel_cm is not None:
                otel_cm.__exit__(None, None, None)
            self._local.current = parent
            with self._lock:
                self.spans.append(record)

    def recent(self, name: str | None = None, limit: int = 100) -> list[Span]:
        with self._lock:
            spans = list(self.spans)
        if name:
            spans = [s for s in spans if s.name == name]
        return spans[-limit:]

    def clear(self) -> None:
        with self._lock:
            self.spans.clear()


TRACER = _Tracer()
span = TRACER.span


def start_jax_profiler(port: int) -> bool:
    """Serve the JAX profiler for device-level traces
    (TPU analog of OTel auto-instrumentation, SURVEY.md 5.1)."""
    if port <= 0:
        return False
    try:
        import jax

        jax.profiler.start_server(port)
        logger.info(f"jax profiler serving on port {port}")
        return True
    except Exception:  # noqa: BLE001 — profiling is best-effort
        logger.exception("failed to start jax profiler server")
        return False
