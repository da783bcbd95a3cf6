"""Query-result and embedding caches for the serving stack.

The reference declared ``cache:`` in its service recipe (reference:
configs/service.yaml:101-106) and documented the full strategy — a query
result cache keyed ``SHA256(normalize(query) + top_k + ef_search)`` with
TTL invalidation plus a flush after index rebuilds, and an embedding cache
for repeated encodes (reference:
docs/operations/scaling-and-performance.md "Caching Strategies") — but no
reference code ever consumed the block. This module implements both,
in-process and dependency-free, consistent with the first-party asyncio
serving stack (a redis sidecar would put a network round-trip in front of
a sweep that measures in microseconds on the TPU engines).

Design notes:

- :class:`TTLCache` is a thread-safe TTL + LRU store: ``OrderedDict`` with
  move-to-end on hit, least-recently-used eviction at ``max_size``, lazy
  expiry on ``get``. The service is a single asyncio loop, but rerank work
  runs in a thread (``asyncio.to_thread``) and tests hammer from threads,
  so every operation takes the lock.
- The result-cache key follows the documented format: SHA256 over the
  normalized query (whitespace collapse + casefold) and the search
  parameters. The TPU engines have no ``ef_search``; ``k`` / ``rerank`` /
  ``rerank_top_k`` take its place (any knob that changes the response must
  be in the key).
- The embedding-cache key deliberately hashes the EXACT text (plus the
  normalize flag), not the normalized text: embeddings are consumed
  downstream as numerics, and two texts that differ only in casing can
  legitimately embed differently — a false cache hit there is silent
  corruption, whereas in the result cache it is the documented semantics.
- Invalidation: ``/index/load`` clears the result cache (the documented
  "flush after index rebuilds"); ``POST /cache/flush`` is the in-process
  analog of the documented ``redis-cli FLUSHDB``. The embedding cache does
  not depend on the index and survives index swaps; it is flushed by
  ``/cache/flush`` (model updates only happen at process startup).
"""

from __future__ import annotations

import hashlib
import threading
import time
from collections import OrderedDict
from typing import Any, Callable


class TTLCache:
    """Thread-safe TTL + LRU key-value store.

    ``clock`` is injectable for tests (defaults to ``time.monotonic``).
    """

    def __init__(
        self,
        max_size: int = 10000,
        ttl_seconds: float = 3600.0,
        clock: Callable[[], float] = time.monotonic,
    ):
        if max_size < 1:
            raise ValueError(f"max_size must be >= 1, got {max_size}")
        if ttl_seconds <= 0:
            raise ValueError(f"ttl_seconds must be > 0, got {ttl_seconds}")
        self.max_size = int(max_size)
        self.ttl_seconds = float(ttl_seconds)
        self._clock = clock
        self._lock = threading.Lock()
        self._store: OrderedDict[str, tuple[float, Any]] = OrderedDict()
        self.hits = 0
        self.misses = 0

    def get(self, key: str) -> Any | None:
        """Return the cached value or None (expired entries are dropped)."""
        now = self._clock()
        with self._lock:
            entry = self._store.get(key)
            if entry is None:
                self.misses += 1
                return None
            expires_at, value = entry
            if now >= expires_at:
                del self._store[key]
                self.misses += 1
                return None
            self._store.move_to_end(key)
            self.hits += 1
            return value

    def put(self, key: str, value: Any) -> None:
        now = self._clock()
        with self._lock:
            self._store[key] = (now + self.ttl_seconds, value)
            self._store.move_to_end(key)
            while len(self._store) > self.max_size:
                self._store.popitem(last=False)  # least-recently-used

    def clear(self) -> int:
        """Drop every entry; returns how many were dropped."""
        with self._lock:
            n = len(self._store)
            self._store.clear()
            return n

    def __len__(self) -> int:
        with self._lock:
            return len(self._store)

    def stats(self) -> dict[str, int]:
        with self._lock:
            return {
                "entries": len(self._store),
                "hits": self.hits,
                "misses": self.misses,
            }


def normalize_query(query: str) -> str:
    """The documented ``normalize(query)``: collapse whitespace + casefold
    (reference: docs/operations/scaling-and-performance.md cache key
    format)."""
    return " ".join(query.split()).casefold()


def result_cache_key(query: str, k: int, rerank: bool, rerank_top_k: int) -> str:
    """SHA256 over the normalized query and every response-shaping search
    parameter (the reference's ``SHA256(normalize(query)+top_k+ef_search)``
    with the TPU engines' knobs in place of ef_search)."""
    payload = f"{normalize_query(query)}\x00k={k}\x00rr={int(rerank)}\x00rrk={rerank_top_k}"
    return hashlib.sha256(payload.encode("utf-8")).hexdigest()


def embedding_cache_key(text: str, normalize: bool) -> str:
    """Exact-text key (see module docstring for why this one is NOT
    query-normalized) plus the L2-normalize flag, which changes the
    returned vector."""
    payload = f"{text}\x00n={int(normalize)}"
    return hashlib.sha256(payload.encode("utf-8")).hexdigest()


_SUPPORTED_BACKENDS = ("memory", "in-memory")


def make_caches(cfg) -> tuple[TTLCache | None, TTLCache | None]:
    """Build (query_cache, embedding_cache) from a ``CacheConfig``.

    Unsupported backends ("redis", "memcached" — accepted for reference
    config-surface parity) degrade loudly to the in-process store, matching
    the service's degradation contract (teacher-load failure -> rerank off,
    BM25 failure -> dense-only).
    """
    if not cfg.enabled:
        return None, None
    if cfg.backend not in _SUPPORTED_BACKENDS:
        from sskd_tpu.utils.logging import get_logger

        get_logger("serve.cache").warning(
            f"cache.backend={cfg.backend!r} is not shipped in this "
            "zero-dependency stack — serving from the in-process memory "
            "backend instead"
        )
    query_cache = TTLCache(max_size=cfg.max_size, ttl_seconds=cfg.ttl_seconds)
    embedding_cache = (
        TTLCache(max_size=cfg.max_size, ttl_seconds=cfg.ttl_seconds)
        if cfg.embedding_cache
        else None
    )
    return query_cache, embedding_cache
