"""Int8 row quantization for the index matrix.

The TPU-native analog of the reference's ONNX INT8 export path (reference:
missing src/models/export_onnx.py, scripts/export_to_onnx.py:9,40-45 —
dynamic quantization + parity validation): the index rows are stored int8
with per-row f32 scales (4x HBM saving -> 4x search throughput at matched
bandwidth), and build-time validation checks recall against the f32 ground
truth (reference gate: configs/index.yaml:52-56).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np


@jax.jit
def quantize_rows(x: jnp.ndarray) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Symmetric per-row int8 quantization.

    Returns (values int8 [N, D], scales f32 [N]) with
    ``x ~= values * scales[:, None]``.
    """
    absmax = jnp.maximum(jnp.max(jnp.abs(x), axis=1), 1e-9)
    scales = absmax / 127.0
    values = jnp.clip(jnp.round(x / scales[:, None]), -127, 127).astype(jnp.int8)
    return values, scales.astype(jnp.float32)


@jax.jit
def dequantize_rows(values: jnp.ndarray, scales: jnp.ndarray) -> jnp.ndarray:
    return values.astype(jnp.float32) * scales[:, None]


def quantization_error(x: np.ndarray) -> dict[str, float]:
    """Parity diagnostics for the export/validation step
    (reference kept a parity-validation step for its INT8 export,
    scripts/export_to_onnx.py:40-45)."""
    values, scales = quantize_rows(jnp.asarray(x))
    recon = np.asarray(dequantize_rows(values, scales))
    err = np.abs(recon - x)
    denom = np.maximum(np.abs(x), 1e-9)
    cos = np.sum(recon * x, axis=1) / (
        np.linalg.norm(recon, axis=1) * np.linalg.norm(x, axis=1) + 1e-12
    )
    return {
        "max_abs_err": float(err.max()),
        "mean_abs_err": float(err.mean()),
        "max_rel_err": float((err / denom).max()),
        "min_row_cosine": float(cos.min()),
    }


# ---------------------------------------------------------------------------
# Int4: two values per byte — halves HBM bytes per row vs int8, which is the
# whole game in the bandwidth-bound sweep regimes (B=1 serving latency sits
# AT the HBM roofline at 10M rows) and doubles index capacity per chip. The
# reference's analogous axis is IVF-PQ compression (8x) at a large recall
# cost; int4 + the existing refine rescore keeps int8-grade recall.
#
# Layout: packed[:, j] stores dim j in the LOW nibble and dim j + D/2 in the
# HIGH nibble, both biased +8 (stored 0..15, value = nibble - 8 in [-8, 7];
# quantization clips to [-7, 7] so the code -8 never occurs, keeping the
# scheme symmetric). The halves-layout (not interleave) lets consumers dot
# the unpacked halves against the matching query halves with NO lane
# shuffles: q . row = q[:D/2] . lo + q[D/2:] . hi.
# ---------------------------------------------------------------------------


@jax.jit
def quantize_rows_int4(x: jnp.ndarray) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Symmetric per-row int4 quantization, packed two-per-byte.

    Returns (packed uint8 [N, D//2], scales f32 [N]) with
    ``x[:, j] ~= ((packed[:, j] & 15) - 8) * scales`` and
    ``x[:, j + D//2] ~= ((packed[:, j] >> 4) - 8) * scales``.
    D must be even.
    """
    n, d = x.shape
    if d % 2:
        raise ValueError(f"int4 packing requires even dim, got {d}")
    absmax = jnp.maximum(jnp.max(jnp.abs(x), axis=1), 1e-9)
    scales = absmax / 7.0
    q = jnp.clip(jnp.round(x / scales[:, None]), -7, 7).astype(jnp.int32) + 8
    lo, hi = q[:, : d // 2], q[:, d // 2 :]
    packed = (lo | (hi << 4)).astype(jnp.uint8)
    return packed, scales.astype(jnp.float32)


@jax.jit
def unpack_int4(packed: jnp.ndarray) -> jnp.ndarray:
    """Packed uint8 [N, D//2] -> int8 [N, D] nibble values in [-7, 7]
    (halves layout: columns 0..D/2-1 from low nibbles, the rest from high)."""
    p = packed.astype(jnp.int32)
    lo = (p & 15) - 8
    hi = (p >> 4) - 8
    return jnp.concatenate([lo, hi], axis=1).astype(jnp.int8)


@jax.jit
def dequantize_rows_int4(packed: jnp.ndarray, scales: jnp.ndarray) -> jnp.ndarray:
    return unpack_int4(packed).astype(jnp.float32) * scales[:, None]


def quantization_error_int4(x: np.ndarray) -> dict[str, float]:
    """Same diagnostics as :func:`quantization_error`, int4 path."""
    packed, scales = quantize_rows_int4(jnp.asarray(x))
    recon = np.asarray(dequantize_rows_int4(packed, scales))
    err = np.abs(recon - x)
    denom = np.maximum(np.abs(x), 1e-9)
    cos = np.sum(recon * x, axis=1) / (
        np.linalg.norm(recon, axis=1) * np.linalg.norm(x, axis=1) + 1e-12
    )
    return {
        "max_abs_err": float(err.max()),
        "mean_abs_err": float(err.mean()),
        "max_rel_err": float((err / denom).max()),
        "min_row_cosine": float(cos.min()),
    }
