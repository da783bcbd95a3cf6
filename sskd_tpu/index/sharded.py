"""ICI-sharded exact index: corpus rows sharded over a mesh axis, queries
replicated, per-shard local top-k, all-gather + static merge.

This is the capability the reference only described as future work
(reference: docs/operations/scaling-and-performance.md:154-172 — "shard per
instance with a fan-out routing layer") made first-class the TPU way
(SURVEY.md sections 2.10 and 5.8): one ``shard_map`` over the ``index`` mesh
axis, XLA collectives over ICI instead of an HTTP fan-out.

Scale story: a 10M x 384 f32 corpus is ~15 GB — more than one chip's HBM
budget next to the model; int8 rows (+ f32 scales) cut it to ~3.8 GB, and the
``index`` axis splits it across chips with the all-gather merge costing
O(shards * B * k) — tiny next to the matmul sweep.
"""

from __future__ import annotations

import functools
from typing import Sequence

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from sskd_tpu.exceptions import IndexBuildError
from sskd_tpu.ops.topk import cosine_topk_core, merge_topk
from sskd_tpu.utils.logging import get_logger

logger = get_logger("index.sharded")


class ShardedIndex:
    """Corpus rows sharded along ``axis`` of ``mesh``; search returns global
    doc indices with the same (scores, indices) contract as
    :class:`sskd_tpu.index.builder.IndexBuilder.search`."""

    def __init__(
        self,
        mesh: Mesh,
        axis: str = "index",
        metric: str = "cosine",
        block_rows: int = 8192,
        method: str = "exact",
        recall_target: float = 0.99,
    ):
        if axis not in mesh.axis_names:
            raise IndexBuildError(f"mesh has no axis {axis!r}")
        self.mesh = mesh
        self.axis = axis
        self.metric = metric
        self.block_rows = block_rows
        self.method = method
        self.recall_target = recall_target
        self.n_shards = mesh.shape[axis]
        self.ntotal = 0
        self.doc_ids: list[str] = []
        self._vectors = None  # device array sharded on rows
        self._scales = None
        self._search_fn = None

    # ------------------------------------------------------------------

    def build_from_arrays(
        self,
        embeddings: np.ndarray,
        doc_ids: Sequence[str],
        dtype: str = "float32",
    ) -> "ShardedIndex":
        emb = np.asarray(embeddings, dtype=np.float32)
        n, d = emb.shape
        if len(doc_ids) != n:
            raise IndexBuildError("doc_ids length != embedding rows")
        if self.metric == "cosine":
            emb = emb / np.maximum(np.linalg.norm(emb, axis=1, keepdims=True), 1e-12)

        # Pad rows so every shard gets an equal, block-aligned slice.
        per_shard = -(-n // self.n_shards)
        per_shard = -(-per_shard // 128) * 128
        padded = per_shard * self.n_shards
        if padded > n:
            emb = np.pad(emb, ((0, padded - n), (0, 0)))

        scales = None
        if dtype == "int8":
            from sskd_tpu.ops.quant import quantize_rows

            values, scales_arr = quantize_rows(jnp.asarray(emb))
            emb = np.asarray(values)
            scales = np.asarray(scales_arr)

        row_sharding = NamedSharding(self.mesh, P(self.axis, None))
        self._vectors = jax.device_put(emb, row_sharding)
        if scales is not None:
            self._scales = jax.device_put(
                scales, NamedSharding(self.mesh, P(self.axis))
            )
        self.ntotal = n
        self.rows_per_shard = per_shard
        self.doc_ids = [str(x) for x in doc_ids]
        self._search_fn = None
        logger.info(
            f"sharded index: ntotal={n} shards={self.n_shards} "
            f"rows/shard={per_shard} dtype={dtype}"
        )
        return self

    @classmethod
    def from_builder(cls, builder, mesh: Mesh, axis: str = "index") -> "ShardedIndex":
        """Lift a single-device :class:`IndexBuilder` onto the mesh."""
        from sskd_tpu.ops.quant import dequantize_rows

        vec = builder._vectors
        if builder.dtype == "int8":
            vec = np.asarray(dequantize_rows(vec, builder._scales))
        idx = cls(mesh, axis=axis, metric=builder.metric)
        idx.build_from_arrays(vec, builder.doc_ids, dtype=builder.dtype)
        return idx

    # ------------------------------------------------------------------

    def _make_search_fn(self, k: int):
        axis = self.axis
        ntotal = self.ntotal
        rows_per_shard = self.rows_per_shard
        block = min(self.block_rows, rows_per_shard)
        has_scales = self._scales is not None

        def local_search(queries, shard, shard_scales=None):
            my = jax.lax.axis_index(axis)
            offset = my * rows_per_shard
            vals, idx = cosine_topk_core(
                queries,
                shard,
                k=k,
                block_rows=block,
                row_scales=shard_scales,
                valid_n=ntotal,
                index_offset=offset,
                method=self.method,
                recall_target=self.recall_target,
            )
            # all-gather candidates from every shard, merge to global top-k
            all_vals = jax.lax.all_gather(vals, axis, axis=1, tiled=True)
            all_idx = jax.lax.all_gather(idx, axis, axis=1, tiled=True)
            return merge_topk(all_vals, all_idx, k)

        in_specs = [P(), P(axis, None)] + ([P(axis)] if has_scales else [])
        shmap = jax.shard_map(
            (lambda q, s, sc: local_search(q, s, sc))
            if has_scales
            else (lambda q, s: local_search(q, s)),
            mesh=self.mesh,
            in_specs=tuple(in_specs),
            out_specs=(P(), P()),
            check_vma=False,
        )
        return jax.jit(shmap)

    def search(self, query_emb: np.ndarray, k: int = 10):
        if self._vectors is None:
            raise IndexBuildError("index not built")
        q = np.asarray(query_emb, dtype=np.float32)
        if q.ndim == 1:
            q = q[None, :]
        if self.metric == "cosine":
            q = q / np.maximum(np.linalg.norm(q, axis=1, keepdims=True), 1e-12)
        if self._search_fn is None or self._search_k != k:
            self._search_fn = self._make_search_fn(k)
            self._search_k = k
        args = (jnp.asarray(q), self._vectors)
        if self._scales is not None:
            args = args + (self._scales,)
        vals, idx = self._search_fn(*args)
        return np.asarray(vals), np.asarray(idx)
