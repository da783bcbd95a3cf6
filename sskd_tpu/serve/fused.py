"""Fused encode+search: one device dispatch per (micro-)batch.

The unfused hot path costs two dispatches per request batch — query encode,
then index sweep. Fusing them into a single jitted program halves dispatch
overhead (which dominates end-to-end latency whenever the host↔device link
is slow) and lets XLA overlap the encoder's last layers with the sweep's
first corpus blocks.

Used by the serving layer for the single-device index path; the sharded
path keeps separate dispatches (the sweep runs under shard_map).
"""

from __future__ import annotations

import numpy as np

from sskd_tpu.models.student import bucket_length
from sskd_tpu.utils.logging import get_logger

logger = get_logger("serve.fused")

K_BUCKETS = (10, 20, 50, 100, 200, 400)


class FusedSearcher:
    """Tokenize on host; encode + top-k in one jitted device call."""

    def __init__(self, student, builder):
        self.student = student
        self.builder = builder
        builder._ensure_device()
        self._jit_cache: dict[tuple[int, int], object] = {}

    def _fused_fn(self, length: int, k: int):
        key = (length, k)
        if key not in self._jit_cache:
            import jax

            module = self.student.module
            builder = self.builder
            from sskd_tpu.ops.topk import cosine_topk_core

            @jax.jit
            def fused(params, ids, mask, corpus, scales):
                q = module.apply(params, ids, mask)
                return cosine_topk_core(
                    q,
                    corpus,
                    k=k,
                    block_rows=builder.block_rows,
                    row_scales=scales,
                    valid_n=builder.ntotal,
                    method=builder.index_type,
                    recall_target=builder.recall_target,
                )

            self._jit_cache[key] = fused
        return self._jit_cache[key]

    def bucket_k(self, k: int) -> int:
        for bucket in K_BUCKETS:
            if k <= bucket <= max(self.builder.ntotal, K_BUCKETS[0]):
                return bucket
        return k

    def search_texts(self, queries: list[str], k: int):
        """Returns (scores [B, k], indices [B, k]) numpy."""
        k_eff = min(self.bucket_k(k), self.builder.ntotal)
        n = len(queries)
        padded_n = bucket_length(n, 256)
        texts = list(queries) + [""] * (padded_n - n)
        batch = self.student.tokenize_batch(
            [self.student.query_prefix + t for t in texts]
        )
        fn = self._fused_fn(batch["input_ids"].shape[1], k_eff)
        vals, idx = fn(
            self.student.params,
            batch["input_ids"],
            batch["attention_mask"],
            self.builder._device_vectors,
            self.builder._device_scales,
        )
        return np.asarray(vals)[:n, :k], np.asarray(idx)[:n, :k]

    def warmup(self, max_batch: int = 64, k: int = 10) -> None:
        bucket = 16
        while bucket <= max_batch:
            self.search_texts(["warmup"] * min(bucket, max_batch), k)
            bucket *= 2
        self.search_texts(["warmup"], k)
