"""Clustered (cell-probe) top-k — the TPU-native IVF analog.

Search = centroid scoring (one tiny [B, n_cells] matmul) → per-query
``nprobe`` cells → sweep only those cells' rows. With the default
sqrt(N)-sized cells and nprobe=64, a 10M-row query touches ~2% of the
corpus — the FLOP/HBM reduction the reference reached for with IVF-PQ
(reference: docs/operations/scaling-and-performance.md:115-152), but with
static shapes (equal cells, see :mod:`sskd_tpu.ops.cluster`) and no
product quantization: rows stay int8+scales, so in-cell scoring is
identical to the exact engines and recall loss comes ONLY from cell
pruning, which ``IndexBuilder.validate()`` gates.

This mode is a *latency* engine: its win is small-batch p50 (the full
sweep already amortizes perfectly at large B). The dispatcher falls back
to the sweep engines above ``CLUSTER_MAX_BATCH`` where the probe union
approaches the whole corpus anyway.

Shapes: corpus [P, D] row-reordered so cell ``i`` owns rows
``[i*rpc, (i+1)*rpc)``; P >= n_cells*rpc (tail padding masked via
``valid_n``). Returns indices in REORDERED space — the caller
(IndexBuilder) maps them through its stored permutation.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

_NEG_INF = float(jnp.finfo(jnp.float32).min / 2)

CLUSTER_MAX_BATCH = 64  # above this, the full sweep is the better engine


@functools.partial(
    jax.jit, static_argnames=("k", "nprobe", "rows_per_cell", "valid_n")
)
def clustered_topk(
    queries: jnp.ndarray,  # [B, D] f32 (L2-normalized by the caller)
    corpus: jnp.ndarray,  # [P, D] f32/bf16/int8, cell-contiguous rows
    centroids: jnp.ndarray,  # [n_cells, D] f32, L2-normalized
    k: int,
    nprobe: int,
    rows_per_cell: int,
    row_scales: jnp.ndarray | None = None,  # [P] f32 when corpus is int8
    valid_n: int | None = None,
    index_offset: jnp.ndarray | int = 0,
):
    """(scores [B, k] f32, indices [B, k] int32 in reordered space);
    (-inf, -1) sentinels, FAISS convention.

    ``index_offset`` (static or traced — e.g. ``axis_index * local_rows``
    inside a shard_map) shifts local row positions into the GLOBAL reordered
    space: returned indices are global, and ``valid_n`` masks against the
    global position, so shard-tail padding cells resolve to (-inf, -1)."""
    B, D = queries.shape
    n_cells = centroids.shape[0]
    rpc = rows_per_cell
    nprobe = min(nprobe, n_cells)
    if valid_n is None:
        valid_n = corpus.shape[0]

    q = queries.astype(jnp.float32)
    # ---- probe: score centroids, keep top-nprobe cells per query --------
    cell_scores = q @ centroids.T  # [B, n_cells]
    _, probe = jax.lax.top_k(cell_scores, nprobe)  # [B, nprobe] int32

    is_int8 = corpus.dtype == jnp.int8
    if is_int8:
        q_absmax = jnp.maximum(jnp.max(jnp.abs(q), axis=1, keepdims=True), 1e-9)
        q_scale = (q_absmax / 127.0).astype(jnp.float32)  # [B, 1]
        q_mat = jnp.clip(jnp.round(q / q_scale), -127, 127).astype(jnp.int8)
    else:
        q_scale = None
        q_mat = q.astype(corpus.dtype)

    cells = corpus[: n_cells * rpc].reshape(n_cells, rpc, D)
    scales3 = (
        row_scales[: n_cells * rpc].reshape(n_cells, rpc)
        if row_scales is not None
        else None
    )

    # ---- per-query cell sweep (lax.map: bounds live memory to one query's
    # gather, [nprobe, rpc, D] — the XLA reference path; the Pallas gather
    # kernel below streams cells without materializing them) --------------
    def one_query(args):
        qv, pv = args  # [D], [nprobe]
        rows = cells[pv]  # [nprobe, rpc, D] gather
        flat = rows.reshape(nprobe * rpc, D)
        s = jax.lax.dot_general(
            qv[None, :],
            flat,
            (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.int32 if is_int8 else jnp.float32,
        )[0].astype(jnp.float32)
        if scales3 is not None:
            s = s * scales3[pv].reshape(nprobe * rpc)
        return s  # [nprobe * rpc]

    scores = jax.lax.map(one_query, (q_mat, probe))  # [B, nprobe*rpc]
    if is_int8:
        scores = scores * q_scale

    # ---- mask tail padding + duplicate probes, extract global top-k -----
    gidx = (
        probe[:, :, None] * rpc + jnp.arange(rpc, dtype=jnp.int32)[None, None, :]
    ).reshape(B, nprobe * rpc)
    gidx = gidx + jnp.asarray(index_offset, jnp.int32)
    scores = jnp.where(gidx < valid_n, scores, _NEG_INF)

    k_eff = min(k, nprobe * rpc)
    vals, pos = jax.lax.top_k(scores, k_eff)
    idx = jnp.take_along_axis(gidx, pos, axis=1)
    idx = jnp.where(vals > _NEG_INF / 2, idx, -1)
    if k_eff < k:
        pad = k - k_eff
        vals = jnp.concatenate(
            [vals, jnp.full((B, pad), _NEG_INF, jnp.float32)], axis=1
        )
        idx = jnp.concatenate([idx, jnp.full((B, pad), -1, jnp.int32)], axis=1)
    return vals, idx
