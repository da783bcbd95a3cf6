"""Pallas fused blocked matmul + running top-k kernel.

The XLA scan version (:mod:`sskd_tpu.ops.topk`) materializes each block's
[B, R] score matrix in HBM and pays a full `lax.top_k` per block. This
kernel keeps everything in VMEM (SURVEY.md 7.3: "the Pallas kernel must fuse
dot + running top-k to avoid materializing [B, N] scores"):

- grid over corpus row-blocks; Pallas pipelines the HBM -> VMEM block loads
  (double-buffered) while the MXU computes the previous block's scores;
- the per-block [B, R] scores live only in a VMEM scratch;
- top-k is maintained exactly via k max-extraction passes per block over a
  unified [B, R + 128] buffer whose tail carries the running top-k, so the
  merge costs nothing extra;
- ties resolve to the lowest global row index (deterministic, and gather-free:
  the winning index is recovered with a masked min over the index buffer).

Exactness: identical result set to brute force (ties aside), so the
reference's recall@10 >= 0.97 build gate (configs/index.yaml:52-56) holds at
recall 1.0.

Supports f32 and int8 corpora (int8 queries are quantized per-row on the fly
so the MXU runs an int8 x int8 -> int32 matmul).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_NEG_INF = float(jnp.finfo(jnp.float32).min / 2)  # python literal: kernels
_INT_MAX = 2**31 - 1  # must not capture traced constants

K_PAD = 128  # lane-aligned tail carrying the running top-k


def _kernel(
    valid_n_ref,  # SMEM (1,1) int32 — true corpus rows
    q_ref,  # [B, D] (f32) or int8
    block_ref,  # [R, D] corpus block (f32 or int8)
    scale_ref,  # [1, R] f32 per-row scales, or None
    qscale_ref,  # [B, 1] f32 query scales (int8 path), or None
    out_vals_ref,  # [B, K_PAD] f32
    out_idx_ref,  # [B, K_PAD] int32
    s_buf,  # scratch [B, R + K_PAD] f32
    i_buf,  # scratch [B, R + K_PAD] int32
    run_vals,  # scratch [B, K_PAD] f32
    run_idx,  # scratch [B, K_PAD] int32
    *,
    k: int,
    block_rows: int,
    is_int8: bool,
    prune: bool,
):
    step = pl.program_id(0)
    R = block_rows
    B = q_ref.shape[0]

    @pl.when(step == 0)
    def _init():
        run_vals[:] = jnp.full(run_vals.shape, _NEG_INF, jnp.float32)
        run_idx[:] = jnp.full(run_idx.shape, -1, jnp.int32)

    # ---- scores for this block (MXU) ----------------------------------
    if is_int8:
        raw = jax.lax.dot_general(
            q_ref[:],
            block_ref[:],
            (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.int32,
        ).astype(jnp.float32)
        scores = raw * qscale_ref[:] * scale_ref[0][None, :]
    else:
        scores = jax.lax.dot_general(
            q_ref[:],
            block_ref[:],
            (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        if scale_ref is not None:
            scores = scores * scale_ref[0][None, :]

    # ---- mask padded rows -----------------------------------------------
    global_idx = step * R + jax.lax.broadcasted_iota(jnp.int32, (B, R), 1)
    valid = global_idx < valid_n_ref[0, 0]
    scores = jnp.where(valid, scores, _NEG_INF)

    # ---- threshold pruning ----------------------------------------------
    # A block only matters for queries whose kth-best would change. One max
    # pass decides; blocks that cannot contribute skip the k-pass extraction
    # entirely (the dominant VPU cost, ~k*5 passes over [B, R]). With many
    # queries nearly every block contributes (expected winners/block =
    # B*k/n_blocks), so the wrapper enables pruning only for small batches.
    def _extract_block():
        s_buf[:, :R] = scores
        i_buf[:, :R] = jnp.where(valid, global_idx, -1)
        s_buf[:, R:] = run_vals[:]
        i_buf[:, R:] = run_idx[:]

        # Stores into the running top-k use a masked full-tile update
        # rather than a dynamic lane slice: Mosaic requires lane-dim store
        # offsets to be 128-aligned, and a [B, 1] store at traced ki is not.
        lane = jax.lax.broadcasted_iota(jnp.int32, run_vals.shape, 1)

        def extract(ki, _):
            s = s_buf[:]
            m = jnp.max(s, axis=1, keepdims=True)  # [B, 1]
            eq = s >= m  # max positions
            # winning index = min index among maxima (deterministic ties)
            win = jnp.min(
                jnp.where(eq, i_buf[:], _INT_MAX), axis=1, keepdims=True
            )
            at_k = lane == ki
            run_vals[:] = jnp.where(at_k, m, run_vals[:])
            run_idx[:] = jnp.where(at_k, win, run_idx[:])
            # knock out exactly the winning element
            s_buf[:] = jnp.where(eq & (i_buf[:] == win), _NEG_INF, s)
            return 0

        jax.lax.fori_loop(0, k, extract, 0)
        # positions k..K_PAD stay at -inf/-1 from init (never written)

    if prune:
        block_max = jnp.max(scores, axis=1, keepdims=True)  # [B, 1]
        kth_lane = (
            jax.lax.broadcasted_iota(jnp.int32, run_vals.shape, 1) == k - 1
        )
        kth = jnp.sum(
            jnp.where(kth_lane, run_vals[:], 0.0), axis=1, keepdims=True
        )
        pl.when(jnp.any(block_max > kth))(_extract_block)
    else:
        _extract_block()

    @pl.when(step == pl.num_programs(0) - 1)
    def _emit():
        out_vals_ref[:] = run_vals[:]
        out_idx_ref[:] = run_idx[:]


@functools.partial(
    jax.jit, static_argnames=("k", "block_rows", "valid_n", "interpret", "prune")
)
def cosine_topk_pallas(
    queries: jnp.ndarray,
    corpus: jnp.ndarray,
    k: int,
    block_rows: int = 2048,
    row_scales: jnp.ndarray | None = None,
    valid_n: int | None = None,
    interpret: bool | None = None,
    prune: bool | None = None,
):
    """Exact fused top-k. Same contract as
    :func:`sskd_tpu.ops.topk.cosine_topk`: returns (scores [B, k] f32,
    indices [B, k] int32) with (-inf, -1) sentinels.

    ``prune`` (default: on for query batches <= 64) adds a one-pass
    block-max threshold check that skips the k-pass extraction for blocks
    that cannot change any query's top-k — a large win for small batches
    (measured 3x+ at B=8), a ~9% loss at B=256 where nearly every block
    contributes. Tie caveat: a pruned block with an element exactly equal
    to a query's kth score keeps the incumbent (scores identical; only
    tie-index selection can differ from brute force).
    """
    if k > K_PAD:
        raise ValueError(f"k={k} exceeds kernel capacity {K_PAD}")
    B, D = queries.shape
    N = corpus.shape[0]
    if valid_n is None:
        valid_n = N
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    # The unified score+index scratch costs B * (R + K_PAD) * 8 bytes of
    # VMEM; shrink the block until it fits the ~16MB budget with headroom
    # for the pipelined corpus block and queries.
    VMEM_BUDGET = 10 * 1024 * 1024
    while block_rows > 512 and B * (block_rows + K_PAD) * 8 > VMEM_BUDGET:
        block_rows //= 2

    # pad corpus rows to a block multiple
    padded = (N + block_rows - 1) // block_rows * block_rows
    if padded != N:
        corpus = jnp.pad(corpus, ((0, padded - N), (0, 0)))
        if row_scales is not None:
            row_scales = jnp.pad(row_scales, (0, padded - N))
    n_blocks = padded // block_rows

    is_int8 = corpus.dtype == jnp.int8
    if is_int8:
        if row_scales is None:
            raise ValueError("int8 corpus requires row_scales")
        q_absmax = jnp.maximum(jnp.max(jnp.abs(queries), axis=1, keepdims=True), 1e-9)
        q_scale = (q_absmax / 127.0).astype(jnp.float32)
        q_in = jnp.clip(jnp.round(queries / q_scale), -127, 127).astype(jnp.int8)
    else:
        q_in = queries.astype(jnp.float32)
        q_scale = None

    valid_arr = jnp.asarray([[valid_n]], jnp.int32)
    scales_arr = (
        row_scales.astype(jnp.float32).reshape(1, padded)
        if row_scales is not None
        else None
    )

    in_specs = [
        pl.BlockSpec(memory_space=pltpu.SMEM),  # valid_n
        pl.BlockSpec((B, D), lambda i: (0, 0), memory_space=pltpu.VMEM),  # queries
        pl.BlockSpec((block_rows, D), lambda i: (i, 0), memory_space=pltpu.VMEM),
    ]
    operands = [valid_arr, q_in, corpus]
    if scales_arr is not None:
        in_specs.append(
            pl.BlockSpec((1, block_rows), lambda i: (0, i), memory_space=pltpu.VMEM)
        )
        operands.append(scales_arr)
    if is_int8:
        in_specs.append(pl.BlockSpec((B, 1), lambda i: (0, 0), memory_space=pltpu.VMEM))
        operands.append(q_scale)

    if prune is None:
        prune = B <= 64
    kernel = functools.partial(
        _kernel_dispatch,
        has_scales=scales_arr is not None,
        is_int8=is_int8,
        k=min(k, valid_n),
        block_rows=block_rows,
        prune=prune,
    )

    out_vals, out_idx = pl.pallas_call(
        kernel,
        grid=(n_blocks,),
        in_specs=in_specs,
        out_specs=(
            pl.BlockSpec((B, K_PAD), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((B, K_PAD), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((B, K_PAD), jnp.float32),
            jax.ShapeDtypeStruct((B, K_PAD), jnp.int32),
        ),
        scratch_shapes=[
            pltpu.VMEM((B, block_rows + K_PAD), jnp.float32),
            pltpu.VMEM((B, block_rows + K_PAD), jnp.int32),
            pltpu.VMEM((B, K_PAD), jnp.float32),
            pltpu.VMEM((B, K_PAD), jnp.int32),
        ],
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=2 * B * padded * D,
            bytes_accessed=padded * D * corpus.dtype.itemsize + B * D * 4,
            transcendentals=0,
        ),
    )(*operands)

    vals = out_vals[:, :k]
    idx = out_idx[:, :k]
    if k > valid_n:  # pad out to requested k
        pad = k - valid_n
        vals = jnp.concatenate(
            [vals[:, :valid_n], jnp.full((B, pad), _NEG_INF, jnp.float32)], axis=1
        )
        idx = jnp.concatenate(
            [idx[:, :valid_n], jnp.full((B, pad), -1, jnp.int32)], axis=1
        )
    idx = jnp.where(vals > _NEG_INF / 2, idx, -1)
    return vals, idx


def _kernel_dispatch(
    valid_ref, q_ref, block_ref, *rest, has_scales, is_int8, k, block_rows, prune
):
    """Unpack optional operands, then run the kernel body."""
    rest = list(rest)
    scale_ref = rest.pop(0) if has_scales else None
    qscale_ref = rest.pop(0) if is_int8 else None
    out_vals_ref, out_idx_ref, s_buf, i_buf, run_vals, run_idx = rest
    _kernel(
        valid_ref,
        q_ref,
        block_ref,
        scale_ref,
        qscale_ref,
        out_vals_ref,
        out_idx_ref,
        s_buf,
        i_buf,
        run_vals,
        run_idx,
        k=k,
        block_rows=block_rows,
        is_int8=is_int8,
        prune=prune,
    )
