"""Pallas flash-attention parity vs the XLA reference path (interpret mode
on CPU; the same kernel compiles on TPU)."""

import numpy as np

import jax.numpy as jnp

from sskd_tpu.ops.attention import flash_attention, xla_attention


def _qkv(rng, B, h, L, d):
    q = rng.standard_normal((B, h, L, d)).astype(np.float32)
    k = rng.standard_normal((B, h, L, d)).astype(np.float32)
    v = rng.standard_normal((B, h, L, d)).astype(np.float32)
    return jnp.asarray(q), jnp.asarray(k), jnp.asarray(v)


def test_flash_matches_xla_unmasked():
    rng = np.random.default_rng(0)
    q, k, v = _qkv(rng, 2, 3, 128, 32)
    out_flash = flash_attention(q, k, v, block_q=64, block_k=64, interpret=True)
    out_xla = xla_attention(q, k, v)
    np.testing.assert_allclose(np.asarray(out_flash), np.asarray(out_xla), atol=2e-5)


def test_flash_matches_xla_with_padding_mask():
    rng = np.random.default_rng(1)
    B, h, L, d = 2, 2, 128, 16
    q, k, v = _qkv(rng, B, h, L, d)
    mask = np.ones((B, L), np.int32)
    mask[0, 100:] = 0
    mask[1, 64:] = 0
    bias = (1.0 - mask[:, None, None, :].astype(np.float32)) * (-1e9)
    out_flash = flash_attention(
        q, k, v, jnp.asarray(mask), block_q=64, block_k=64, interpret=True
    )
    out_xla = xla_attention(q, k, v, jnp.asarray(bias))
    flash_np = np.asarray(out_flash)
    xla_np = np.asarray(out_xla)
    # compare only query positions that are themselves valid
    np.testing.assert_allclose(flash_np[0, :, :100], xla_np[0, :, :100], atol=2e-5)
    np.testing.assert_allclose(flash_np[1, :, :64], xla_np[1, :, :64], atol=2e-5)
