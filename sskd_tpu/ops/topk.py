"""Blocked exact cosine/dot top-k over an HBM-resident corpus matrix.

This replaces the reference's FAISS-HNSW C++ index wholesale (reference:
missing src/index/build_index.py, SURVEY.md sections 2.5 and 2.9): instead of
an approximate graph walk, the TPU does an exact blocked matmul sweep —
recall is 1.0 by construction, trivially beating the reference's 0.97
recall@10 build gate (reference: configs/index.yaml:52-56).

Design for the MXU/HBM (measured on TPU v5e — see scripts/profile_topk.py):
- XLA's fused ``lax.top_k(q @ block.T)`` is near speed-of-light per block
  (the [B, R] score tile never round-trips HBM at these sizes);
- blocks are STATIC slices unrolled in python — a `lax.scan` with
  `dynamic_slice` copies each corpus block and measured ~60x slower;
- per-block top-k candidates are concatenated and reduced with one final
  top-k, so the full [B, N] score matrix never exists for large N;
- the int8 path runs the matmul in int8 (MXU native) against per-row scales
  with an f32 rescale of only the [B, R] block.

All functions are pure and jit-compatible with static shapes.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

_NEG_INF = float(jnp.finfo(jnp.float32).min / 2)

# Above this many unrolled blocks, group the tail into a scan to bound
# compile time (10M rows at the default block size stays fully unrolled).
MAX_UNROLL = 64


def _block_needs_mask(lo: int, block_rows: int, valid_n, index_offset) -> bool:
    """STATIC (trace-time) check: may the validity mask be skipped for the
    corpus block [lo, lo+block_rows)? Skippable iff every row is provably
    < valid_n. The -inf mask is a [B, block_rows] select XLA must weave into
    the matmul epilogue — at the headline config (1M rows, one block, no
    padding) dropping it is pure profit. Traced valid_n/index_offset (the
    sharded path) conservatively keeps the mask."""
    if not isinstance(valid_n, int) or not isinstance(index_offset, int):
        return True
    return lo + block_rows + index_offset > valid_n


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
    block_rows: int = 262144,
    row_scales: jnp.ndarray | None = None,
    valid_n=None,
    index_offset=0,
    method: str = "exact",
    recall_target: float = 0.99,
):
    """Top-k by score = queries @ corpus^T (cosine when both sides are
    L2-normalized, which the index builder guarantees).

    Methods (both validated against the reference's recall@10 >= 0.97 gate,
    configs/index.yaml:52-56; measured on v5e with 1M x 384 rows, B=256):
    - ``exact``: blocked matmul + full per-block top-k, recall 1.0.
    - ``approx``: one fused ``lax.approx_max_k`` sweep — XLA fuses the binned
      reduction into the matmul epilogue so the [B, N] scores never
      materialize; HBM-bound at ~0.84 ms/sweep int8 (~300k q/s/chip) vs
      ~7.5 ms exact. This is the TPU-native analog of the reference's
      HNSW approximation (recall_target plays efSearch's role).

    Args:
      queries: [B, D] float. corpus: [N, D] float or int8.
      row_scales: [N] dequant scales when corpus is int8 (score *= scale).
      valid_n: true row count when the corpus was padded; rows >= valid_n are
        masked to -inf. Defaults to N. May be a traced scalar (sharded path).
      index_offset: added to returned indices (global ids for corpus shards);
        the valid_n mask is applied AFTER offsetting.
    Returns:
      (scores [B, k] f32, indices [B, k] int32); missing results are
      (-inf, -1), matching the FAISS convention the serving layer expects
      (reference: serve/app.py:293-300).
    """
    if corpus.dtype == jnp.uint8:
        # packed-int4 corpus on the XLA path: unpack to int8 and reuse the
        # int8 machinery (correctness fallback — materializes the unpacked
        # copy, so TPU callers route to the Pallas int4 engine instead via
        # cosine_topk / cosine_topk_compose)
        from sskd_tpu.ops.quant import unpack_int4

        if row_scales is None:
            raise ValueError("packed int4 corpus requires row_scales")
        corpus = unpack_int4(corpus)
    if method == "approx":
        return _approx_topk(
            queries,
            corpus,
            k,
            row_scales,
            valid_n,
            index_offset,
            recall_target,
            block_rows=max(block_rows, 1_048_576),
        )
    B, D = queries.shape
    N = corpus.shape[0]
    if valid_n is None:
        valid_n = N
    k_eff = max(1, min(k, N))
    block_rows = min(block_rows, max(128, N))

    corpus = _pad_rows(corpus, block_rows)
    if row_scales is not None:
        row_scales = _pad_rows(row_scales, block_rows)
    n_blocks = corpus.shape[0] // block_rows
    k_block = min(k_eff, block_rows)

    is_int8 = corpus.dtype == jnp.int8
    if is_int8:
        # Quantize queries per-row to int8 so the MXU runs an int8 matmul.
        q_absmax = jnp.maximum(jnp.max(jnp.abs(queries), axis=1, keepdims=True), 1e-9)
        q_scale = q_absmax / 127.0
        q_int8 = jnp.clip(jnp.round(queries / q_scale), -127, 127).astype(jnp.int8)

    def block_topk(block, scales_block, start, need_mask=True):
        """Fused matmul + top-k for one corpus block (static slice)."""
        if is_int8:
            raw = jax.lax.dot_general(
                q_int8, block, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.int32,
            ).astype(jnp.float32)
            scores = raw * q_scale * scales_block[None, :]
        else:
            scores = jax.lax.dot_general(
                queries, block, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            if scales_block is not None:
                scores = scores * scales_block[None, :]
        if need_mask:
            global_idx = (
                start + index_offset
                + jax.lax.broadcasted_iota(jnp.int32, (1, block_rows), 1)
            )
            scores = jnp.where(global_idx < valid_n, scores, _NEG_INF)
        vals, pos = jax.lax.top_k(scores, k_block)
        idx = start + index_offset + pos.astype(jnp.int32)
        return vals, idx

    if n_blocks <= MAX_UNROLL:
        parts_v, parts_i = [], []
        for b in range(n_blocks):
            lo = b * block_rows
            block = jax.lax.slice_in_dim(corpus, lo, lo + block_rows, axis=0)
            scales_block = (
                jax.lax.slice_in_dim(row_scales, lo, lo + block_rows, axis=0)
                if row_scales is not None
                else None
            )
            v, i = block_topk(
                block, scales_block, lo,
                need_mask=_block_needs_mask(lo, block_rows, valid_n, index_offset),
            )
            parts_v.append(v)
            parts_i.append(i)
        cat_v = jnp.concatenate(parts_v, axis=1)
        cat_i = jnp.concatenate(parts_i, axis=1)
    else:
        # huge corpora: scan over pre-stacked blocks, carrying the running
        # candidate set
        stacked = corpus.reshape(n_blocks, block_rows, D)
        stacked_scales = (
            row_scales.reshape(n_blocks, block_rows)
            if row_scales is not None
            else None
        )

        def body(carry, xs):
            c_v, c_i = carry
            if stacked_scales is not None:
                block, scales_block, start = xs
            else:
                (block, start), scales_block = xs, None
            v, i = block_topk(block, scales_block, start)
            merged_v = jnp.concatenate([c_v, v], axis=1)
            merged_i = jnp.concatenate([c_i, i], axis=1)
            nv, pos = jax.lax.top_k(merged_v, k_block)
            ni = jnp.take_along_axis(merged_i, pos, axis=1)
            return (nv, ni), None

        starts = jnp.arange(n_blocks, dtype=jnp.int32) * block_rows
        init = (
            jnp.full((B, k_block), _NEG_INF, jnp.float32),
            jnp.full((B, k_block), -1, jnp.int32),
        )
        xs = (
            (stacked, stacked_scales, starts)
            if stacked_scales is not None
            else (stacked, starts)
        )
        (cat_v, cat_i), _ = jax.lax.scan(body, init, xs)

    vals, pos = jax.lax.top_k(cat_v, k_eff)
    idx = jnp.take_along_axis(cat_i, pos, axis=1)

    if k_eff < k:  # pad out to requested k with FAISS-style sentinels
        vals = jnp.concatenate(
            [vals, jnp.full((B, k - k_eff), _NEG_INF, jnp.float32)], axis=1
        )
        idx = jnp.concatenate([idx, jnp.full((B, k - k_eff), -1, jnp.int32)], axis=1)
    idx = jnp.where(vals > _NEG_INF / 2, idx, -1)
    return vals, idx


def _approx_topk(
    queries,
    corpus,
    k,
    row_scales,
    valid_n,
    index_offset,
    recall_target,
    block_rows: int = 1_048_576,
):
    """Blocked fused approx_max_k sweep. Blocks keep the transient score
    tile bounded (a single-shot sweep at 10M rows materializes a [B, N] f32
    matrix when XLA declines to fuse — 20 GB at B=512); the binned reduce
    per block plus an exact merge over ``n_blocks * k`` candidates is
    recall-equivalent to one global approx_max_k."""
    B, D = queries.shape
    N = corpus.shape[0]
    if valid_n is None:
        valid_n = N
    k_eff = max(1, min(k, N))
    block_rows = min(block_rows, max(128, N))

    corpus = _pad_rows(corpus, block_rows)
    if row_scales is not None:
        row_scales = _pad_rows(row_scales, block_rows)
    n_blocks = corpus.shape[0] // block_rows
    k_block = min(k_eff, block_rows)

    is_int8 = corpus.dtype == jnp.int8
    if is_int8:
        q_absmax = jnp.maximum(jnp.max(jnp.abs(queries), axis=1, keepdims=True), 1e-9)
        q_scale = q_absmax / 127.0
        q_int8 = jnp.clip(jnp.round(queries / q_scale), -127, 127).astype(jnp.int8)

    parts_v, parts_i = [], []
    for b in range(n_blocks):
        lo = b * block_rows
        block = jax.lax.slice_in_dim(corpus, lo, lo + block_rows, axis=0)
        if is_int8:
            scores = jax.lax.dot_general(
                q_int8, block, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.int32,
            ).astype(jnp.float32) * q_scale
        else:
            scores = jax.lax.dot_general(
                queries, block, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
        if row_scales is not None:
            scales_block = jax.lax.slice_in_dim(
                row_scales, lo, lo + block_rows, axis=0
            )
            scores = scores * scales_block[None, :]
        if _block_needs_mask(lo, block_rows, valid_n, index_offset):
            global_idx = (
                lo + index_offset
                + jax.lax.broadcasted_iota(jnp.int32, (1, block_rows), 1)
            )
            scores = jnp.where(global_idx < valid_n, scores, _NEG_INF)
        vals, pos = jax.lax.approx_max_k(scores, k_block, recall_target=recall_target)
        parts_v.append(vals)
        idx_b = pos.astype(jnp.int32)
        if lo != 0 or not (isinstance(index_offset, int) and index_offset == 0):
            idx_b = lo + index_offset + idx_b
        parts_i.append(idx_b)

    if n_blocks == 1:
        # Single-sweep fast path: approx_max_k already returns a sorted
        # exact top-k over its bins (aggregate_to_topk defaults True), so
        # the concat + re-top-k merge is an identity — and measurably NOT
        # free: an interleaved A/B on v5e timed the merged path at 3.30 ms
        # vs 2.95 ms without it at the headline config (1M int8, B=1024).
        vals, idx = parts_v[0], parts_i[0]
    else:
        cat_v = jnp.concatenate(parts_v, axis=1)
        cat_i = jnp.concatenate(parts_i, axis=1)
        vals, pos = jax.lax.top_k(cat_v, k_eff)
        idx = jnp.take_along_axis(cat_i, pos, axis=1)

    if k_eff < k:
        vals = jnp.concatenate(
            [vals, jnp.full((B, k - k_eff), _NEG_INF, jnp.float32)], axis=1
        )
        idx = jnp.concatenate([idx, jnp.full((B, k - k_eff), -1, jnp.int32)], axis=1)
    idx = jnp.where(vals > _NEG_INF / 2, idx, -1)
    return vals, idx


@functools.partial(
    jax.jit, static_argnames=("k", "block_rows", "valid_n", "method", "recall_target")
)
def _cosine_topk_jit(
    queries, corpus, k, block_rows, row_scales, valid_n, method, recall_target
):
    return cosine_topk_core(
        queries,
        corpus,
        k,
        block_rows=block_rows,
        row_scales=row_scales,
        valid_n=valid_n,
        method=method,
        recall_target=recall_target,
    )


def _pallas_exact_ok(corpus, k: int) -> bool:
    """Host-side dispatch gate for the binned Pallas exact engine: TPU
    backend, in-capacity k, and a corpus big enough that the two-phase
    sweep (bin maxima + k*128-row rescan) beats the blocked XLA engine."""
    import jax as _jax

    if _jax.default_backend() != "tpu":
        return False
    from sskd_tpu.ops.topk_pallas import BIN_W, K_MAX

    n = corpus.shape[0]
    return k <= K_MAX and n >= (1 << 16) and n > 2 * k * BIN_W


def cosine_topk(
    queries: jnp.ndarray,
    corpus: jnp.ndarray,
    k: int,
    block_rows: int = 262144,
    row_scales: jnp.ndarray | None = None,
    valid_n: int | None = None,
    method: str = "exact",
    recall_target: float = 0.99,
):
    """Single-device TOP-LEVEL entry point (jitted); see
    :func:`cosine_topk_core`. When composing inside another jit use
    :func:`cosine_topk_compose` — a nested jit becomes an XLA closed_call
    whose big operands are COPIED at the boundary (measured ~4.7 ms/call
    at 10M int8).

    The ``exact`` method dispatches to the binned Pallas engine on TPU
    (exact results, no per-block extraction — ops/topk_pallas.py) for
    large corpora, else the blocked XLA engine."""
    if method == "exact" and _pallas_exact_ok(corpus, k):
        from sskd_tpu.ops.topk_pallas import cosine_topk_pallas

        return cosine_topk_pallas(
            queries, corpus, k, row_scales=row_scales, valid_n=valid_n
        )
    return _cosine_topk_jit(
        queries, corpus, k, block_rows, row_scales, valid_n, method, recall_target
    )


def cosine_topk_compose(
    queries: jnp.ndarray,
    corpus: jnp.ndarray,
    k: int,
    block_rows: int = 262144,
    row_scales: jnp.ndarray | None = None,
    valid_n: int | None = None,
    method: str = "exact",
    recall_target: float = 0.99,
):
    """Same dispatch as :func:`cosine_topk` but fully UNJITTED — for
    composition inside an enclosing jit (the fused serving dispatch, the
    shard_map program, benchmark loops). The Pallas-exact gate reads only
    static shape/dtype/backend facts, so it traces cleanly."""
    if method == "exact" and _pallas_exact_ok(corpus, k):
        from sskd_tpu.ops.topk_pallas import cosine_topk_pallas_impl

        return cosine_topk_pallas_impl(
            queries, corpus, k, row_scales=row_scales, valid_n=valid_n
        )
    return cosine_topk_core(
        queries,
        corpus,
        k,
        block_rows=block_rows,
        row_scales=row_scales,
        valid_n=valid_n,
        method=method,
        recall_target=recall_target,
    )


def refined_candidates_core(
    queries: jnp.ndarray,
    corpus: jnp.ndarray,
    refine_m: int,
    row_scales: jnp.ndarray | None = None,
    valid_n: int | None = None,
    block_rows: int = 1_048_576,
    recall_target: float = 0.95,
):
    """Candidate stage of the two-stage refined search: the quantized sweep
    alone, returning ``(vals [B, m], positions [B, m])`` with -1 padding.
    Shared by :func:`refined_topk_core` (device bf16 rescore) and the
    builder's HOST-resident refine path (``refine_storage="host"``,
    adr-012), where the bf16 rows never occupy HBM and the rescore runs in
    numpy on the gathered candidates. ``refine_m`` may exceed the row
    count — the sweep pads with -1 positions like any k > N search.
    Unjitted for composition."""
    if corpus.dtype == jnp.uint8 and _pallas_exact_ok(corpus, refine_m):
        # packed int4: the XLA approx sweep would materialize a full
        # unpacked copy (cosine_topk_core's fallback), forfeiting the
        # bandwidth win — the binned Pallas engine unpacks in VMEM and its
        # EXACT candidates only improve recall@refine_m
        return cosine_topk_compose(
            queries,
            corpus,
            k=refine_m,
            row_scales=row_scales,
            valid_n=valid_n,
            method="exact",
        )
    return cosine_topk_core(
        queries,
        corpus,
        k=refine_m,
        row_scales=row_scales,
        valid_n=valid_n,
        method="approx",
        recall_target=recall_target,
        block_rows=block_rows,
    )


@functools.partial(
    jax.jit,
    static_argnames=("refine_m", "valid_n", "block_rows", "recall_target"),
)
def refined_candidates(
    queries,
    corpus,
    refine_m,
    row_scales=None,
    valid_n=None,
    block_rows=1_048_576,
    recall_target=0.95,
):
    """Jitted top-level entry for :func:`refined_candidates_core`."""
    return refined_candidates_core(
        queries,
        corpus,
        refine_m,
        row_scales=row_scales,
        valid_n=valid_n,
        block_rows=block_rows,
        recall_target=recall_target,
    )


def refined_topk_core(
    queries: jnp.ndarray,
    corpus: jnp.ndarray,
    refine_rows: jnp.ndarray,
    k: int,
    refine_m: int = 40,
    row_scales: jnp.ndarray | None = None,
    valid_n: int | None = None,
    block_rows: int = 1_048_576,
    recall_target: float = 0.95,
):
    """Two-stage search: int8 fused approx sweep fetches ``refine_m``
    candidates, then their bf16 rows are gathered and rescored EXACTLY
    against the full-precision query — the classic IVF-refinement trick,
    TPU-shaped. The candidate pass runs at a LOOSE recall_target (0.95):
    recall@refine_m of the sweep stays near 1.0 and the rescore fixes the
    ordering, so the binning budget can relax.

    Measured on v5e at 1M x 384, B=1024, k=10: recall@10 vs exact-f32
    0.9945 (int8 sweep alone: 0.972; the int8 quantization floor itself is
    0.9765 — refinement beats the floor because candidate fetch at m=40
    only needs the true top-10 SOMEWHERE in the int8 top-40, then bf16
    rescoring restores their order).

    ``refine_rows``: [N, D] bf16 (or f32) rows in the SAME storage order
    as ``corpus``. Unjitted for composition (see cosine_topk_compose).
    """
    refine_m = max(k, min(refine_m, corpus.shape[0]))
    _, cand = refined_candidates_core(
        queries,
        corpus,
        refine_m,
        row_scales=row_scales,
        valid_n=valid_n,
        block_rows=block_rows,
        recall_target=recall_target,
    )
    safe = jnp.clip(cand, 0, refine_rows.shape[0] - 1)
    rows = refine_rows[safe]  # [B, m, D] gather
    res = jnp.einsum(
        "bd,bmd->bm",
        queries.astype(refine_rows.dtype),
        rows,
        preferred_element_type=jnp.float32,
    )
    res = jnp.where(cand >= 0, res, _NEG_INF)
    k_eff = min(k, refine_m)
    vals, pos = jax.lax.top_k(res, k_eff)
    idx = jnp.take_along_axis(cand, pos, axis=1)
    if k_eff < k:
        B = queries.shape[0]
        vals = jnp.concatenate(
            [vals, jnp.full((B, k - k_eff), _NEG_INF, jnp.float32)], axis=1
        )
        idx = jnp.concatenate([idx, jnp.full((B, k - k_eff), -1, jnp.int32)], axis=1)
    idx = jnp.where(vals > _NEG_INF / 2, idx, -1)
    return vals, idx


@functools.partial(
    jax.jit, static_argnames=("k", "refine_m", "valid_n", "block_rows", "recall_target")
)
def refined_topk(
    queries,
    corpus,
    refine_rows,
    k,
    refine_m=40,
    row_scales=None,
    valid_n=None,
    block_rows=1_048_576,
    recall_target=0.95,
):
    """Jitted top-level entry for :func:`refined_topk_core`."""
    return refined_topk_core(
        queries,
        corpus,
        refine_rows,
        k,
        refine_m=refine_m,
        row_scales=row_scales,
        valid_n=valid_n,
        block_rows=block_rows,
        recall_target=recall_target,
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
