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


def test_flash_auto_group_at_e5_encode_shape_bf16():
    """The exact shape the L=512 corpus-encode auto-dispatch hits on TPU
    (e5-small: h=12, d=32, bf16, default blocks, auto head-group): the
    picker must return a divisor of h and the packed kernel must match
    XLA within bf16 tolerance. De-risks the unattended TPU bench run."""
    from sskd_tpu.ops.attention import _pick_head_group

    B, h, L, d = 2, 12, 512, 32
    G = _pick_head_group(h, L, d, 256, 256, jnp.dtype(jnp.bfloat16).itemsize)
    assert h % G == 0 and G >= 1

    rng = np.random.default_rng(7)
    q, k, v = _qkv(rng, B, h, L, d)
    qb, kb, vb = (x.astype(jnp.bfloat16) for x in (q, k, v))
    mask = np.ones((B, L), np.int32)
    mask[1, 384:] = 0
    out = flash_attention(qb, kb, vb, jnp.asarray(mask), interpret=True)
    assert out.dtype == jnp.bfloat16
    bias = (1.0 - mask[:, None, None, :].astype(np.float32)) * (-1e9)
    ref = xla_attention(qb, kb, vb, jnp.asarray(bias))
    out_np = np.asarray(out, np.float32)
    ref_np = np.asarray(ref, np.float32)
    np.testing.assert_allclose(out_np[0], ref_np[0], atol=3e-2)
    np.testing.assert_allclose(out_np[1, :, :384], ref_np[1, :, :384], atol=3e-2)


def test_flash_head_group_packing_matches_unpacked():
    """G heads per program must give the same numbers as one-head
    programs (the packing only batches the dots)."""
    rng = np.random.default_rng(2)
    q, k, v = _qkv(rng, 2, 4, 128, 32)
    mask = np.ones((2, 128), np.int32)
    mask[1, 96:] = 0
    packed = flash_attention(
        q, k, v, jnp.asarray(mask), block_q=64, head_group=4, interpret=True
    )
    unpacked = flash_attention(
        q, k, v, jnp.asarray(mask), block_q=64, head_group=1, interpret=True
    )
    np.testing.assert_allclose(
        np.asarray(packed), np.asarray(unpacked), atol=2e-6
    )


def test_flash_bf16_matches_xla_loosely():
    """bf16 inputs run bf16 MXU dots (f32 accumulate): parity vs the XLA
    path within bf16 tolerance — the production encode dtype."""
    rng = np.random.default_rng(3)
    q, k, v = _qkv(rng, 2, 3, 128, 32)
    qb, kb, vb = (x.astype(jnp.bfloat16) for x in (q, k, v))
    out_flash = flash_attention(qb, kb, vb, block_q=64, interpret=True)
    out_xla = xla_attention(qb, kb, vb)
    assert out_flash.dtype == jnp.bfloat16
    np.testing.assert_allclose(
        np.asarray(out_flash, dtype=np.float32),
        np.asarray(out_xla, dtype=np.float32),
        atol=3e-2,
    )


def test_flash_odd_length_single_block_fallback():
    q, k, v = _qkv(np.random.default_rng(4), 1, 2, 96, 16)
    out = flash_attention(q, k, v, block_q=64, block_k=64, interpret=True)
    np.testing.assert_allclose(
        np.asarray(out), np.asarray(xla_attention(q, k, v)), atol=2e-5
    )


def test_flash_auto_decision_env_tunable(monkeypatch):
    """The auto-dispatch thresholds are runtime-recalibratable: the
    measured crossover ladder (profile_encode_variants.py) sets
    SSKD_FLASH_AUTO_MIN_L / SSKD_FLASH_AUTO_SCORE_MB instead of editing
    code (VERDICT r4 weak #2). Lane alignment (L % 128) stays mandatory."""
    from sskd_tpu.ops.attention import flash_auto_decision

    monkeypatch.delenv("SSKD_FLASH_AUTO_MIN_L", raising=False)
    monkeypatch.delenv("SSKD_FLASH_AUTO_SCORE_MB", raising=False)
    # defaults: the e5 L=512 batch-encode regime dispatches to flash...
    assert flash_auto_decision(256, 12, 512)
    # ...L=128 encode and small batches stay on XLA
    assert not flash_auto_decision(256, 12, 128)
    assert not flash_auto_decision(1, 12, 512)
    # measured-crossover recalibration lowers both thresholds
    monkeypatch.setenv("SSKD_FLASH_AUTO_MIN_L", "128")
    monkeypatch.setenv("SSKD_FLASH_AUTO_SCORE_MB", "4")
    assert flash_auto_decision(256, 12, 128)
    # lane tiling is a kernel requirement, not a threshold
    assert not flash_auto_decision(256, 12, 192)


def test_flash_diff_gradients_match_xla_autodiff():
    """The flash dispatcher path is differentiable: its custom VJP falls
    back to the XLA attention pullback, so jax.grad through an
    auto-dispatched deterministic encode (attention_dropout == 0 at
    L >= 384, large batch) no longer fails at trace time (ADVICE r4 medium:
    grad over a bare pallas_call has no transpose rule)."""
    import jax

    from sskd_tpu.ops.attention import _flash_attention_diff

    rng = np.random.default_rng(7)
    B, h, L, d = 2, 2, 128, 16
    q, k, v = _qkv(rng, B, h, L, d)
    mask_np = np.ones((B, L), np.int32)
    mask_np[0, 96:] = 0
    mask = jnp.asarray(mask_np)
    bias = jnp.asarray(
        (1.0 - mask_np[:, None, None, :].astype(np.float32)) * (-1e9)
    )
    # weight the loss away from padded query rows so masked-position
    # outputs (which flash and XLA define differently) don't contribute
    w = jnp.asarray(mask_np.astype(np.float32))[:, None, :, None]

    def loss_flash(q, k, v):
        return jnp.sum(w * _flash_attention_diff(q, k, v, mask, bias) ** 2)

    def loss_xla(q, k, v):
        return jnp.sum(w * xla_attention(q, k, v, bias) ** 2)

    g_flash = jax.grad(loss_flash, argnums=(0, 1, 2))(q, k, v)
    g_xla = jax.grad(loss_xla, argnums=(0, 1, 2))(q, k, v)
    for gf, gx in zip(g_flash, g_xla):
        np.testing.assert_allclose(np.asarray(gf), np.asarray(gx), atol=3e-5)


# ---------------------------------------------------------------------------
# Fused training attention (softmax + in-kernel PRNG dropout + PV)
# ---------------------------------------------------------------------------

import jax
import pytest

from sskd_tpu.ops.attention import dropout_attention


def _bias_rows(mask):
    return jnp.asarray((1.0 - mask.astype(np.float32)) * (-1e9))


def test_dropout_attention_p0_matches_xla():
    """p=0 statically skips the PRNG, so both kernels run under interpret:
    forward parity and custom-VJP gradients vs autodiff of xla_attention."""
    rng = np.random.default_rng(2)
    B, h, L, d = 2, 2, 128, 32
    q, k, v = _qkv(rng, B, h, L, d)
    mask = np.ones((B, L), np.int32)
    mask[1, 96:] = 0
    bias_rows = _bias_rows(mask)
    bias4 = bias_rows[:, None, None, :]
    seed = jnp.asarray(7, jnp.int32)

    out = dropout_attention(q, k, v, bias_rows, 0.0, seed, interpret=True)
    ref = xla_attention(q, k, v, bias4)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5)

    g = jnp.asarray(rng.standard_normal((B, h, L, d)).astype(np.float32))

    def f_kernel(q, k, v):
        return jnp.vdot(dropout_attention(q, k, v, bias_rows, 0.0, seed, interpret=True), g)

    def f_ref(q, k, v):
        return jnp.vdot(xla_attention(q, k, v, bias4), g)

    grads_k = jax.grad(f_kernel, argnums=(0, 1, 2))(q, k, v)
    grads_r = jax.grad(f_ref, argnums=(0, 1, 2))(q, k, v)
    for a, b in zip(grads_k, grads_r):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=3e-5)


def test_dropout_attention_p0_bf16_matches_xla_loosely():
    """bf16 inputs (the production training compute dtype) run bf16 MXU
    dots with f32 accumulation: forward + grads parity vs the XLA path
    within bf16 tolerance."""
    rng = np.random.default_rng(6)
    B, h, L, d = 2, 2, 128, 32
    q, k, v = _qkv(rng, B, h, L, d)
    qb, kb, vb = (x.astype(jnp.bfloat16) for x in (q, k, v))
    bias_rows = jnp.zeros((B, L), jnp.float32)
    seed = jnp.asarray(3, jnp.int32)

    out = dropout_attention(qb, kb, vb, bias_rows, 0.0, seed, interpret=True)
    ref = xla_attention(qb, kb, vb)
    assert out.dtype == jnp.bfloat16
    np.testing.assert_allclose(
        np.asarray(out, np.float32), np.asarray(ref, np.float32), atol=3e-2
    )

    g = jnp.asarray(
        rng.standard_normal((B, h, L, d)).astype(np.float32)
    ).astype(jnp.bfloat16)

    def f_kernel(q_, k_, v_):
        return jnp.vdot(
            dropout_attention(q_, k_, v_, bias_rows, 0.0, seed, interpret=True),
            g,
        )

    def f_ref(q_, k_, v_):
        return jnp.vdot(xla_attention(q_, k_, v_), g)

    grads_k = jax.grad(f_kernel, argnums=(0, 1, 2))(qb, kb, vb)
    grads_r = jax.grad(f_ref, argnums=(0, 1, 2))(qb, kb, vb)
    for a, b in zip(grads_k, grads_r):
        np.testing.assert_allclose(
            np.asarray(a, np.float32), np.asarray(b, np.float32), atol=0.15
        )


def test_dropout_attention_p_positive_requires_tpu():
    rng = np.random.default_rng(3)
    q, k, v = _qkv(rng, 1, 1, 128, 32)
    bias_rows = jnp.zeros((1, 128), jnp.float32)
    with pytest.raises(NotImplementedError):
        dropout_attention(q, k, v, bias_rows, 0.1, jnp.asarray(1, jnp.int32), interpret=True)


@pytest.mark.skipif(jax.default_backend() != "tpu", reason="compiled flash kernel needs a real TPU")
def test_flash_dispatch_grad_compiles_on_tpu():
    """jax.grad through the COMPILED flash dispatch path: the custom VJP
    must let a deterministic large-batch encode train on device (ADVICE
    r4 medium). Values pin against XLA autodiff at the same inputs."""
    from sskd_tpu.ops.attention import scaled_dot_attention

    rng = np.random.default_rng(9)
    B, h, L, d = 2, 4, 384, 32
    q, k, v = _qkv(rng, B, h, L, d)
    bias = jnp.zeros((B, 1, 1, L), jnp.float32)

    def loss(fn):
        def inner(q_, k_, v_):
            return jnp.sum(fn(q_, k_, v_) ** 2)

        return inner

    flash_fn = loss(lambda a, b, c: scaled_dot_attention(a, b, c, bias, use_flash=True))
    xla_fn = loss(lambda a, b, c: scaled_dot_attention(a, b, c, bias, use_flash=False))
    g_flash = jax.jit(jax.grad(flash_fn, argnums=(0, 1, 2)))(q, k, v)
    g_xla = jax.jit(jax.grad(xla_fn, argnums=(0, 1, 2)))(q, k, v)
    for gf, gx in zip(g_flash, g_xla):
        np.testing.assert_allclose(
            np.asarray(gf), np.asarray(gx), atol=5e-2, rtol=1e-2
        )


@pytest.mark.skipif(jax.default_backend() != "tpu", reason="in-kernel PRNG needs a real TPU")
def test_fused_dropout_attention_tpu():
    """On-chip: determinism (same seed -> same mask), keep-rate ~ 1-p,
    scaling (kept probs multiplied by 1/(1-p)), and grad consistency of the
    regenerated backward mask (finite-difference spot check on v)."""
    rng = np.random.default_rng(4)
    B, h, L, d = 2, 2, 128, 128  # d == L so v = I extracts the probs matrix
    q, k, v = _qkv(rng, B, h, L, d)
    bias_rows = jnp.zeros((B, L), jnp.float32)
    p = 0.25
    seed = jnp.asarray(11, jnp.int32)
    out1 = dropout_attention(q, k, v, bias_rows, p, seed)
    out2 = dropout_attention(q, k, v, bias_rows, p, seed)
    np.testing.assert_array_equal(np.asarray(out1), np.asarray(out2))
    out3 = dropout_attention(q, k, v, bias_rows, p, jnp.asarray(12, jnp.int32))
    assert not np.allclose(np.asarray(out1), np.asarray(out3))
    # keep-rate pin via mask extraction (v = I => out = dropped probs):
    # catches sign/uniformity bugs in the bits -> [0,1) conversion that the
    # looser statistical check below tolerates (a signed >> produced
    # keep-rate 0.25 for p=0.25 during bring-up)
    eye = jnp.broadcast_to(jnp.eye(L, dtype=jnp.float32), (B, h, L, L))
    pd = np.asarray(dropout_attention(q, k, eye, bias_rows, p, seed))
    keep_rate = (pd > 0).mean()
    assert abs(keep_rate - (1 - p)) < 0.02, keep_rate
    # E[out] == no-dropout out (inverted-dropout scaling); loose statistical check
    avg = np.mean([
        np.asarray(dropout_attention(q, k, v, bias_rows, p, jnp.asarray(100 + i, jnp.int32)))
        for i in range(32)
    ], axis=0)
    ref = np.asarray(xla_attention(q, k, v, bias_rows[:, None, None, :]))
    assert np.abs(avg - ref).mean() < 0.12
    # grad wrt v is linear in the dropped probs: finite difference is exact
    g = jnp.ones((B, h, L, d), jnp.float32)

    def f(v_):
        return jnp.vdot(dropout_attention(q, k, v_, bias_rows, p, seed), g)

    dv = jax.grad(f)(v)
    eps = 1e-2
    delta = np.zeros_like(np.asarray(v))
    delta[0, 0, 5, 3] = eps
    fd = (f(v + jnp.asarray(delta)) - f(v - jnp.asarray(delta))) / (2 * eps)
    np.testing.assert_allclose(float(fd), float(np.asarray(dv)[0, 0, 5, 3]), rtol=5e-2)
