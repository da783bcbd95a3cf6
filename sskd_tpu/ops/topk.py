"""Blocked exact cosine/dot top-k over an HBM-resident corpus matrix.

This replaces the reference's FAISS-HNSW C++ index wholesale (reference:
missing src/index/build_index.py, SURVEY.md sections 2.5 and 2.9): instead of
an approximate graph walk, the TPU does an exact blocked matmul sweep —
recall is 1.0 by construction, trivially beating the reference's 0.97
recall@10 build gate (reference: configs/index.yaml:52-56).

Design for the MXU/HBM (SURVEY.md section 7.3):
- scores for a corpus block are one big [B, R] matmul (MXU-bound),
- a `lax.scan` carries a running [B, K] top-k so the full [B, N] score
  matrix is never materialized in HBM,
- queries are batched to amortize the HBM sweep of the corpus — the
  100k qps/chip target is batch-mode throughput,
- the int8 path does the matmul in int8 (MXU native) against per-row scales
  with a f32 rescale of only the [B, R] block.

All functions are pure and jit-compatible with static shapes.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

_NEG_INF = jnp.float32(jnp.finfo(jnp.float32).min / 2)


def _pad_rows(x: jnp.ndarray, multiple: int):
    n = x.shape[0]
    padded = (n + multiple - 1) // multiple * multiple
    if padded == n:
        return x
    pad = [(0, padded - n)] + [(0, 0)] * (x.ndim - 1)
    return jnp.pad(x, pad)


def cosine_topk_core(
    queries: jnp.ndarray,
    corpus: jnp.ndarray,
    k: int,
    block_rows: int = 32768,
    row_scales: jnp.ndarray | None = None,
    valid_n=None,
    index_offset=0,
):
    """Exact top-k by score = queries @ corpus^T (cosine when both sides are
    L2-normalized, which the index builder guarantees).

    Args:
      queries: [B, D] float. corpus: [N, D] float or int8.
      row_scales: [N] dequant scales when corpus is int8 (score *= scale).
      valid_n: true row count when the corpus was padded; rows >= valid_n are
        masked to -inf. Defaults to N. May be a traced scalar (sharded path).
      index_offset: added to returned indices (global ids for corpus shards);
        the valid_n mask is applied AFTER offsetting, so pass the global row
        count together with this shard's global start offset.
    Returns:
      (scores [B, k] f32, indices [B, k] int32); missing results are
      (-inf, -1), matching the FAISS convention the serving layer expects
      (reference: serve/app.py:293-300).
    """
    B, D = queries.shape
    N = corpus.shape[0]
    if valid_n is None:
        valid_n = N
    k_eff = min(k, N)

    corpus = _pad_rows(corpus, block_rows)
    if row_scales is not None:
        row_scales = _pad_rows(row_scales, block_rows)
    n_blocks = corpus.shape[0] // block_rows

    is_int8 = corpus.dtype == jnp.int8
    if is_int8:
        # Quantize queries per-row to int8 so the MXU runs an int8 matmul.
        q_absmax = jnp.maximum(jnp.max(jnp.abs(queries), axis=1, keepdims=True), 1e-9)
        q_scale = q_absmax / 127.0
        q_int8 = jnp.clip(jnp.round(queries / q_scale), -127, 127).astype(jnp.int8)

    def body(carry, i):
        top_vals, top_idx = carry
        start = i * block_rows
        block = jax.lax.dynamic_slice(corpus, (start, 0), (block_rows, D))
        if is_int8:
            raw = jax.lax.dot_general(
                q_int8,
                block,
                (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.int32,
            ).astype(jnp.float32)
            scales_block = jax.lax.dynamic_slice(row_scales, (start,), (block_rows,))
            scores = raw * q_scale * scales_block[None, :]
        else:
            scores = jax.lax.dot_general(
                queries,
                block,
                (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            if row_scales is not None:
                scales_block = jax.lax.dynamic_slice(row_scales, (start,), (block_rows,))
                scores = scores * scales_block[None, :]

        global_idx = (
            start
            + index_offset
            + jax.lax.broadcasted_iota(jnp.int32, (1, block_rows), 1)
        )
        valid = global_idx < valid_n
        scores = jnp.where(valid, scores, _NEG_INF)

        cat_vals = jnp.concatenate([top_vals, scores], axis=1)
        cat_idx = jnp.concatenate(
            [top_idx, jnp.broadcast_to(global_idx, (B, block_rows))], axis=1
        )
        new_vals, pos = jax.lax.top_k(cat_vals, k_eff)
        new_idx = jnp.take_along_axis(cat_idx, pos, axis=1)
        return (new_vals, new_idx), None

    init_vals = jnp.full((B, k_eff), _NEG_INF, jnp.float32)
    init_idx = jnp.full((B, k_eff), -1, jnp.int32)
    (vals, idx), _ = jax.lax.scan(
        body, (init_vals, init_idx), jnp.arange(n_blocks, dtype=jnp.int32)
    )

    if k_eff < k:  # pad out to requested k with FAISS-style sentinels
        vals = jnp.concatenate(
            [vals, jnp.full((B, k - k_eff), _NEG_INF, jnp.float32)], axis=1
        )
        idx = jnp.concatenate([idx, jnp.full((B, k - k_eff), -1, jnp.int32)], axis=1)
    idx = jnp.where(vals > _NEG_INF / 2, idx, -1)
    return vals, idx


@functools.partial(jax.jit, static_argnames=("k", "block_rows", "valid_n"))
def cosine_topk(
    queries: jnp.ndarray,
    corpus: jnp.ndarray,
    k: int,
    block_rows: int = 32768,
    row_scales: jnp.ndarray | None = None,
    valid_n: int | None = None,
):
    """Jitted single-device entry point; see :func:`cosine_topk_core`."""
    return cosine_topk_core(
        queries, corpus, k, block_rows=block_rows, row_scales=row_scales, valid_n=valid_n
    )


def merge_topk(
    scores: jnp.ndarray, indices: jnp.ndarray, k: int
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Merge candidate sets: scores/indices [B, M] -> global top-k [B, k].
    Used for the all-gather merge of per-shard results
    (SURVEY.md section 5.8)."""
    vals, pos = jax.lax.top_k(scores, min(k, scores.shape[1]))
    idx = jnp.take_along_axis(indices, pos, axis=1)
    return vals, idx
