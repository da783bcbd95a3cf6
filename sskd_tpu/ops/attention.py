"""Attention ops: XLA fused path + Pallas flash-attention kernel.

The encoder's sequence length is fixed at 512 (long documents are chunked at
data-prep time, SURVEY.md section 5.7), so attention is short-sequence,
large-batch. XLA already fuses QK^T -> masked softmax -> V well at this size;
the Pallas flash kernel avoids materializing the [B, h, L, L] score matrix in
HBM, which wins once B*h*L*L spills VMEM during corpus encoding.

Dispatch: ``scaled_dot_attention`` uses XLA unless ``SSKD_FLASH_ATTENTION=1``
(or ``use_flash=True``) and the default backend is TPU.
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_NEG_INF = float(jnp.finfo(jnp.float32).min / 2)


def xla_attention(q, k, v, bias=None):
    """Reference XLA path: softmax(QK^T/sqrt(d) + bias) V.

    q,k,v: [B, h, L, d]; bias broadcastable to [B, h, L, L] (additive).
    """
    d = q.shape[-1]
    scores = jnp.einsum(
        "bhqd,bhkd->bhqk", q, k, preferred_element_type=jnp.float32
    ) / jnp.sqrt(jnp.asarray(d, jnp.float32))
    if bias is not None:
        scores = scores + bias.astype(scores.dtype)
    probs = jax.nn.softmax(scores, axis=-1)
    return jnp.einsum(
        "bhqk,bhkd->bhqd", probs.astype(v.dtype), v, preferred_element_type=jnp.float32
    ).astype(v.dtype)


def _flash_kernel(q_ref, k_ref, v_ref, mask_ref, o_ref, *, block_k: int, sm_scale: float):
    """Single (batch*head, q-block) program: online-softmax over k blocks.

    Shapes inside the kernel: q [Lq, d], k/v [Lk, d], mask [1, Lk] (1 = keep).
    """
    q = q_ref[0].astype(jnp.float32) * sm_scale  # [Lq, d]
    Lk = k_ref.shape[1]
    num_kb = Lk // block_k

    Lq = q.shape[0]
    d = v_ref.shape[-1]

    def body(i, carry):
        acc, m_i, l_i = carry
        ks = k_ref[0, pl.ds(i * block_k, block_k), :].astype(jnp.float32)
        vs = v_ref[0, pl.ds(i * block_k, block_k), :].astype(jnp.float32)
        mask = mask_ref[0, 0, pl.ds(i * block_k, block_k)]
        s = jnp.dot(q, ks.T, preferred_element_type=jnp.float32)  # [Lq, bk]
        s = jnp.where(mask[None, :] > 0, s, _NEG_INF)
        m_new = jnp.maximum(m_i, jnp.max(s, axis=1, keepdims=True))
        p = jnp.exp(s - m_new)
        alpha = jnp.exp(m_i - m_new)
        l_new = alpha * l_i + jnp.sum(p, axis=1, keepdims=True)
        acc = acc * alpha + jnp.dot(p, vs, preferred_element_type=jnp.float32)
        return acc, m_new, l_new

    acc0 = jnp.zeros((Lq, d), jnp.float32)
    m0 = jnp.full((Lq, 1), _NEG_INF, jnp.float32)
    l0 = jnp.zeros((Lq, 1), jnp.float32)
    acc, _, l_i = jax.lax.fori_loop(0, num_kb, body, (acc0, m0, l0))
    o_ref[0] = (acc / jnp.maximum(l_i, 1e-30)).astype(o_ref.dtype)


def flash_attention(
    q, k, v, mask=None, block_q: int = 256, block_k: int = 256, interpret: bool | None = None
):
    """Pallas flash attention (no [L, L] materialization).

    q,k,v: [B, h, L, d]; mask: [B, L] with 1 = attend (pad positions 0).
    Returns [B, h, L, d].
    """
    B, h, L, d = q.shape
    if mask is None:
        mask = jnp.ones((B, L), dtype=jnp.int32)
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    block_q = min(block_q, L)
    block_k = min(block_k, L)
    if L % block_q or L % block_k:
        raise ValueError(f"seq len {L} must be divisible by block sizes")
    sm_scale = 1.0 / (d**0.5)

    qf = q.reshape(B * h, L, d)
    kf = k.reshape(B * h, L, d)
    vf = v.reshape(B * h, L, d)
    maskf = jnp.repeat(mask[:, None, :], h, axis=0).reshape(B * h, 1, L)

    grid = (B * h, L // block_q)
    out = pl.pallas_call(
        functools.partial(_flash_kernel, block_k=block_k, sm_scale=sm_scale),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, block_q, d), lambda b, i: (b, i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, L, d), lambda b, i: (b, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, L, d), lambda b, i: (b, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, L), lambda b, i: (b, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (1, block_q, d), lambda b, i: (b, i, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((B * h, L, d), q.dtype),
        interpret=interpret,
    )(qf, kf, vf, maskf)
    return out.reshape(B, h, L, d)


def scaled_dot_attention(q, k, v, bias=None, use_flash: bool | None = None):
    """Dispatching attention: Pallas flash on TPU when enabled, XLA otherwise.

    ``bias`` is the additive mask [B, 1, 1, L] produced by the encoder; the
    flash path converts it back to a boolean keep-mask.
    """
    if use_flash is None:
        use_flash = os.environ.get("SSKD_FLASH_ATTENTION", "0") == "1"
    if use_flash and jax.default_backend() == "tpu":
        if bias is None:
            mask = None
        else:
            mask = (bias[:, 0, 0, :] >= -1.0).astype(jnp.int32)  # [B, L]
        return flash_attention(q, k, v, mask)
    return xla_attention(q, k, v, bias)
