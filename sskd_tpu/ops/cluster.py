"""Balanced clustering for the IVF-style "clustered" index mode.

The reference kept an IVF-PQ migration path for beyond-HNSW scale
(reference: src/config.py:126-144 FAISSConfig ivf params,
docs/operations/scaling-and-performance.md:115-152). On TPU the analog is
NOT a quantized inverted list — it is a *pruned sweep*: partition corpus
rows into equal-size, spatially-coherent cells; at query time score the
cell centroids (one tiny matmul), pick ``nprobe`` cells per query, and
sweep only those rows. FLOPs and HBM traffic drop by ~``nprobe /
n_cells`` while every other engine contract is unchanged.

Why *balanced* partitions instead of plain k-means: XLA needs static
shapes. Equal cells make the probe sweep a fixed ``[B, nprobe,
rows_per_cell]`` computation — no ragged inverted lists, no host-side
gather. The builder reorders rows once (a permutation, stored alongside
the index) so cells are contiguous in HBM and a cell DMA is one
contiguous block.

The partitioner is a quota-balanced recursive bisection: at each node,
estimate the dominant separation direction with a 2-means step, sort the
node's rows along it, and split at the exact row quota of the left
subtree. Leaves get exactly ``rows_per_cell`` rows (the final leaf takes
the remainder; the global tail is padded and masked by ``valid_n``).
"""

from __future__ import annotations

import numpy as np

from sskd_tpu.utils.logging import get_logger

logger = get_logger("ops.cluster")

# cell sizes are rounded to a lane-tile multiple so a cell block is a legal
# Pallas BlockSpec on every dtype (int8 needs 32-row sublane tiles)
CELL_ROW_MULTIPLE = 256


def auto_cells(n_rows: int, target_rows_per_cell: int = 0) -> tuple[int, int]:
    """Pick (n_cells, rows_per_cell). Default heuristic: cells of about
    sqrt(N) rows (the classic IVF nlist ~ sqrt(N) balance between centroid
    scan cost and per-cell sweep cost), rounded to CELL_ROW_MULTIPLE."""
    if target_rows_per_cell <= 0:
        target_rows_per_cell = int(np.sqrt(max(n_rows, 1)))
    rpc = max(
        CELL_ROW_MULTIPLE,
        -(-target_rows_per_cell // CELL_ROW_MULTIPLE) * CELL_ROW_MULTIPLE,
    )
    n_cells = max(1, -(-n_rows // rpc))
    return n_cells, rpc


# direction estimation runs on a bounded subsample: the split only needs a
# statistically stable separation axis (the ORDERING over all rows still
# uses every row), and full-node means/gathers dominated 10M-row builds
_DIRECTION_SAMPLE = 65536


def _split_direction(x: np.ndarray, rng: np.random.Generator) -> np.ndarray:
    """One 2-means-style step: the direction between the means of a random
    halving, refined once by the induced partition. Cheap and good enough
    for a *median* split (only the ordering matters, not the boundary)."""
    n = x.shape[0]
    idx = rng.permutation(n)
    c1 = x[idx[: n // 2]].mean(axis=0)
    c2 = x[idx[n // 2 :]].mean(axis=0)
    d = c1 - c2
    norm = np.linalg.norm(d)
    if norm < 1e-9:
        d = rng.standard_normal(x.shape[1]).astype(x.dtype)
        norm = np.linalg.norm(d)
    d = d / norm
    # refine: re-estimate from the sign partition of the first projection
    proj = x @ d
    med = np.median(proj)
    left, right = proj <= med, proj > med
    if left.any() and right.any():
        d2 = x[left].mean(axis=0) - x[right].mean(axis=0)
        n2 = np.linalg.norm(d2)
        if n2 > 1e-9:
            d = d2 / n2
    return d


def build_clusters(
    embeddings: np.ndarray,
    n_cells: int,
    rows_per_cell: int,
    seed: int = 0,
) -> tuple[np.ndarray, np.ndarray]:
    """Partition ``embeddings`` [N, D] into ``n_cells`` contiguous cells of
    exactly ``rows_per_cell`` rows (the last cell takes the remainder).

    Returns:
      perm: int32 [N] — reordered position p holds original row perm[p];
        cell i owns reordered rows [i*rows_per_cell, (i+1)*rows_per_cell).
      centroids: f32 [n_cells, D] — L2-normalized cell means (so centroid
        scoring is the same cosine the row sweep uses).
    """
    x = np.asarray(embeddings, dtype=np.float32)
    n = x.shape[0]
    if n_cells * rows_per_cell < n:
        raise ValueError("n_cells * rows_per_cell must cover all rows")
    rng = np.random.default_rng(seed)

    # quotas: every cell exactly rows_per_cell, last cell takes the tail
    quotas = [rows_per_cell] * (n_cells - 1)
    quotas.append(n - rows_per_cell * (n_cells - 1))
    if quotas[-1] <= 0:  # tiny corpora: fewer effective cells
        quotas = []
        left = n
        while left > 0:
            take = min(rows_per_cell, left)
            quotas.append(take)
            left -= take
        quotas += [0] * (n_cells - len(quotas))

    out: list[np.ndarray] = [None] * n_cells  # type: ignore[list-item]

    def bisect(indices: np.ndarray, cell_lo: int, cell_hi: int) -> None:
        n_node_cells = cell_hi - cell_lo
        if n_node_cells == 1:
            out[cell_lo] = indices
            return
        mid = cell_lo + n_node_cells // 2
        left_quota = sum(quotas[cell_lo:mid])
        if left_quota == 0 or left_quota == len(indices):
            # degenerate quota (empty trailing cells) — split positionally
            out_idx = indices
            bisect(out_idx[:left_quota], cell_lo, mid)
            bisect(out_idx[left_quota:], mid, cell_hi)
            return
        # direction from a bounded subsample (the ordering below still uses
        # every row); one gathered copy per node, not two
        if len(indices) > _DIRECTION_SAMPLE:
            sub_idx = rng.choice(indices, _DIRECTION_SAMPLE, replace=False)
            d = _split_direction(x[sub_idx], rng)
        else:
            d = _split_direction(x[indices], rng)
        order = np.argsort(x[indices] @ d, kind="stable")
        ordered = indices[order]
        bisect(ordered[:left_quota], cell_lo, mid)
        bisect(ordered[left_quota:], mid, cell_hi)

    bisect(np.arange(n, dtype=np.int64), 0, n_cells)

    perm = np.concatenate([c for c in out if c is not None and len(c)])
    if perm.shape[0] != n:
        raise AssertionError("partition lost rows")

    centroids = np.zeros((n_cells, x.shape[1]), np.float32)
    pos = 0
    for i, q in enumerate(quotas):
        if q > 0:
            centroids[i] = x[perm[pos : pos + q]].mean(axis=0)
            pos += q
    norms = np.linalg.norm(centroids, axis=1, keepdims=True)
    centroids = centroids / np.maximum(norms, 1e-12)
    logger.info(
        f"clustered {n} rows into {n_cells} cells x {rows_per_cell} "
        f"(tail {quotas[-1]})"
    )
    return perm.astype(np.int32), centroids
