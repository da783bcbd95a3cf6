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


def _flash_kernel(
    q_ref, k_ref, v_ref, mask_ref, o_ref, *, block_k: int, sm_scale: float
):
    """One (head-group, q-block) program: online-softmax over k blocks.

    Shapes inside the kernel: q [G, Lq, d], k/v [G, Lk, d], mask [1, Lk]
    (1 = keep; all G heads in a group belong to the same batch row, so
    they share it). G heads ride ONE program as a batched dot_general —
    at head_dim 32 a per-head program is ~0.03 GFLOP and launch overhead
    dominates (VERDICT r3 weak #2: L=512 encode sat at ~20% MFU).

    The dots run in the INPUT dtype with f32 accumulation: upcasting
    q/k/v to f32 before the dot (the round-2 version) put f32 matmuls on
    the MXU at a fraction of the bf16 rate — the reason flash "tied" XLA
    in the r03 measurement instead of beating it.
    """
    q = q_ref[0]  # [G, Lq, d], input dtype
    G, Lq, d = q.shape
    Lk = k_ref.shape[2]
    num_kb = Lk // block_k

    def body(i, carry):
        acc, m_i, l_i = carry
        ks = k_ref[0, :, pl.ds(i * block_k, block_k), :]  # [G, bk, d]
        vs = v_ref[0, :, pl.ds(i * block_k, block_k), :]
        mask = mask_ref[0, 0, pl.ds(i * block_k, block_k)]  # [bk]
        s = jax.lax.dot_general(
            q, ks, (((2,), (2,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        ) * sm_scale  # [G, Lq, bk] f32
        s = jnp.where(mask[None, None, :] > 0, s, _NEG_INF)
        m_new = jnp.maximum(m_i, jnp.max(s, axis=2))  # [G, Lq]
        p = jnp.exp(s - m_new[:, :, None])
        alpha = jnp.exp(m_i - m_new)
        l_new = alpha * l_i + jnp.sum(p, axis=2)
        acc = acc * alpha[:, :, None] + jax.lax.dot_general(
            p.astype(v_ref.dtype), vs, (((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        )
        return acc, m_new, l_new

    acc0 = jnp.zeros((G, Lq, d), jnp.float32)
    m0 = jnp.full((G, Lq), _NEG_INF, jnp.float32)
    l0 = jnp.zeros((G, Lq), jnp.float32)
    acc, _, l_i = jax.lax.fori_loop(0, num_kb, body, (acc0, m0, l0))
    o_ref[0] = (
        acc / jnp.maximum(l_i, 1e-30)[:, :, None]
    ).astype(o_ref.dtype)


def _flash_vmem_estimate(
    G: int, L: int, d: int, block_q: int, block_k: int, itemsize: int
) -> int:
    """Analytic per-program VMEM demand. Calibrated round 5 against the real
    v5e Mosaic compiler (artifacts/bench/flash_tune_r5.json): when block_k < L
    the online-softmax fori_loop carries extra temporaries that roughly double
    the score-buffer cost (G6/bq512/bk256 failed at an uncorrected estimate of
    4.5 MB while the loop-free G6/bq512/bk512 passed at 7.7 MB), so the s term
    gets a 2x multiplier on the loop path."""
    s_mult = 4 if block_k < L else 2  # f32 bytes x loop-temp factor
    return (
        2 * G * L * d * itemsize  # k + v
        + G * block_q * d * itemsize  # q
        + 2 * s_mult * G * block_q * block_k  # s/p (f32) + loop temps
        + 4 * G * block_q * d  # acc (f32)
    )


# Budget calibrated on-device (round 5): G12/bq128/bk512 at e5 shape
# (estimate 5.0 MB) compiles and is the measured-fastest config; the next
# step up (G12/bq256/bk512, estimate 8.5 MB) exceeds the 16 MB scoped
# limit once Mosaic's double buffering and stack are added.
_FLASH_VMEM_BUDGET = int(5.5 * 1024 * 1024)


def _pick_head_group(
    h: int, L: int, d: int, block_q: int, block_k: int, itemsize: int
) -> int:
    """Largest divisor of h within the device-calibrated VMEM budget."""
    for cand in range(h, 0, -1):
        if h % cand:
            continue
        if (
            _flash_vmem_estimate(cand, L, d, block_q, block_k, itemsize)
            <= _FLASH_VMEM_BUDGET
        ):
            return cand
    return 1


def flash_attention(
    q,
    k,
    v,
    mask=None,
    block_q: int | None = None,
    block_k: int | None = None,
    head_group: int | None = None,
    interpret: bool | None = None,
):
    """Pallas flash attention (no [L, L] materialization in HBM).

    q,k,v: [B, h, L, d]; mask: [B, L] with 1 = attend (pad positions 0).
    Returns [B, h, L, d]. ``head_group`` packs that many heads into one
    program (default: auto — as many as fit VMEM).

    Default blocks come from the round-5 on-device sweep
    (artifacts/bench/flash_tune_r5.json, B=256/h=12/L=512/d=32 on v5e):
    small q blocks (128) with a SINGLE k block (block_k = L, loop-free
    online softmax) dominate every looped config — measured 5.65 ms vs
    10.48 ms XLA — and the loop-free path is also the one whose VMEM
    demand Mosaic prices predictably (see ``_flash_vmem_estimate``).
    """
    B, h, L, d = q.shape
    if block_q is None:
        block_q = 128 if L % 128 == 0 else L
    if block_k is None:
        block_k = L if L <= 512 else 512
    if mask is None:
        mask = jnp.ones((B, L), dtype=jnp.int32)
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    if not interpret and L % 128:
        # On the compiled TPU path a non-lane-aligned block fails (or blows
        # VMEM) deep inside Mosaic; fail here with a clear message instead.
        raise ValueError(
            f"flash_attention requires L % 128 == 0 on TPU (got L={L}); "
            "pad the sequence or use the XLA path"
        )
    block_q = min(block_q, L)
    block_k = min(block_k, L)
    if L % block_q:  # fall back to a single q block for odd lengths
        block_q = L
    if L % block_k:
        block_k = L
    sm_scale = 1.0 / (d**0.5)
    G = head_group or _pick_head_group(
        h, L, d, block_q, block_k, q.dtype.itemsize
    )
    if h % G:
        raise ValueError(f"head_group {G} must divide num_heads {h}")

    n_groups = B * h // G
    qf = q.reshape(n_groups, G, L, d)
    kf = k.reshape(n_groups, G, L, d)
    vf = v.reshape(n_groups, G, L, d)
    # one mask row per group; groups never straddle batch rows (G | h)
    maskf = jnp.repeat(mask[:, None, :], h // G, axis=1).reshape(
        n_groups, 1, L
    )

    grid = (n_groups, L // block_q)
    out = pl.pallas_call(
        functools.partial(_flash_kernel, block_k=block_k, sm_scale=sm_scale),
        grid=grid,
        in_specs=[
            pl.BlockSpec(
                (1, G, block_q, d),
                lambda b, i: (b, 0, i, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (1, G, L, d), lambda b, i: (b, 0, 0, 0), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(
                (1, G, L, d), lambda b, i: (b, 0, 0, 0), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(
                (1, 1, L), lambda b, i: (b, 0, 0), memory_space=pltpu.VMEM
            ),
        ],
        out_specs=pl.BlockSpec(
            (1, G, block_q, d), lambda b, i: (b, 0, i, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((n_groups, G, L, d), q.dtype),
        interpret=interpret,
    )(qf, kf, vf, maskf)
    return out.reshape(B, h, L, d)


# ---------------------------------------------------------------------------
# Fused TRAINING attention: softmax + dropout + PV in one kernel, fwd and bwd
# ---------------------------------------------------------------------------
#
# The training path needs dropout ON THE ATTENTION PROBABILITIES (HF BERT
# semantics; the reference trained with torch train-mode dropout,
# reference: src/kd/train.py:127). In plain XLA that forces the [B, h, L, L]
# f32 probability tensor to materialize in HBM — measured 429.3 -> 254.9
# ms/step at KD bench shapes (B=32, N=8, L=192, v5e) when attention dropout
# is turned off, i.e. ~40% of the whole train step was probs traffic. At the
# encoder's sequence lengths (<= 512) one (batch, head) slice of scores fits
# VMEM whole, so this kernel pair keeps scores/probs/dropout mask entirely
# on-chip: the forward generates the keep-mask with the TPU's hardware PRNG
# (pltpu.prng_random_bits), and the backward RE-GENERATES the identical mask
# from the same (seed, program_id) instead of ever storing it.
#
# The per-(b, h) PRNG stream is seeded (seed, bh): re-seeding per program
# makes the mask independent of grid execution order, and identical between
# the forward and backward kernels (and across jax.checkpoint replays, which
# re-run the forward with the same seed operand).
#
# CPU/interpret has no prng_seed lowering, so the kernel is TPU-only; the
# encoder falls back to the materialized-probs XLA path elsewhere. p == 0
# statically skips the PRNG, which lets CI exercise both kernels (forward
# math + custom VJP) under interpret mode against autodiff of
# xla_attention; the p > 0 mask/grad parity test needs a real TPU
# (tests/test_attention.py::test_fused_dropout_attention_tpu).



def _uniform_bits(shape):
    """Uniform [0, 1) f32 from the per-core PRNG. prng_random_bits returns
    SIGNED int32 on this lowering — an arithmetic >> keeps the sign and
    halves+skews the distribution (observed keep-rate 0.25 for p=0.25
    instead of 0.75), so bitcast to uint32 BEFORE the shift; the top 24
    bits convert exactly to f32."""
    bits = pltpu.bitcast(pltpu.prng_random_bits(shape), jnp.uint32)
    # Mosaic has no uint32 -> f32 cast; after >> 8 the value fits 24 bits,
    # so a bitcast to int32 is value-preserving and int32 -> f32 is exact
    hi24 = pltpu.bitcast(bits >> jnp.uint32(8), jnp.int32)
    return hi24.astype(jnp.float32) * (1.0 / 16777216.0)


def _dropattn_fwd_kernel(
    seed_ref, q_ref, k_ref, v_ref, bias_ref, o_ref, *, p: float, sm_scale: float
):
    """One (batch*head) program: ctx = dropout(softmax(qk^T + bias)) @ v.

    Dots run in the INPUT dtype with f32 accumulation (softmax statistics
    and the dropout scale stay f32): upcasting to f32 before the dot puts
    f32 matmuls on the MXU at a fraction of the bf16 rate. f32 inputs
    (CPU tests) behave bit-identically to the previous version; the
    backward recomputes s with the SAME dot, so fwd/bwd probs match
    exactly in either dtype."""
    q = q_ref[0]
    k = k_ref[0]
    v = v_ref[0]
    s = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    ) * sm_scale + bias_ref[0]
    m = jnp.max(s, axis=1, keepdims=True)
    e = jnp.exp(s - m)
    probs = e / jnp.sum(e, axis=1, keepdims=True)
    if p > 0.0:
        pltpu.prng_seed(seed_ref[0], pl.program_id(0))
        u = _uniform_bits(probs.shape)
        probs = jnp.where(u >= p, probs * (1.0 / (1.0 - p)), 0.0)
    o_ref[0] = jax.lax.dot_general(
        probs.astype(v.dtype), v, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ).astype(o_ref.dtype)


def _dropattn_bwd_kernel(
    seed_ref,
    q_ref,
    k_ref,
    v_ref,
    bias_ref,
    g_ref,
    dq_ref,
    dk_ref,
    dv_ref,
    *,
    p: float,
    sm_scale: float,
):
    """Recompute probs + the IDENTICAL keep-mask, then the softmax VJP.

    Same dtype policy as the forward: MXU dots in the input dtype with
    f32 accumulation, f32 softmax/VJP arithmetic between them. The s
    recompute uses the same dot as the forward, so the probs (and
    therefore the dropout mask application) match the forward exactly.
    """
    q = q_ref[0]
    k = k_ref[0]
    v = v_ref[0]
    g = g_ref[0]
    cdt = q.dtype  # compute dtype of the MXU dots
    s = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    ) * sm_scale + bias_ref[0]
    m = jnp.max(s, axis=1, keepdims=True)
    e = jnp.exp(s - m)
    probs = e / jnp.sum(e, axis=1, keepdims=True)
    if p > 0.0:
        pltpu.prng_seed(seed_ref[0], pl.program_id(0))
        keep = _uniform_bits(probs.shape) >= p
        inv = 1.0 / (1.0 - p)
        pd = jnp.where(keep, probs * inv, 0.0)
    else:
        pd = probs
    # dv = pd^T g ; dprobs = (g v^T) through the dropout mask
    dv_ref[0] = jax.lax.dot_general(
        pd.astype(cdt), g, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ).astype(dv_ref.dtype)
    dpd = jax.lax.dot_general(
        g, v, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    )
    if p > 0.0:
        dprobs = jnp.where(keep, dpd * inv, 0.0)
    else:
        dprobs = dpd
    # softmax VJP (rowwise): ds = probs * (dprobs - <dprobs, probs>)
    ds = probs * (dprobs - jnp.sum(dprobs * probs, axis=1, keepdims=True))
    ds = ds * sm_scale
    dq_ref[0] = jax.lax.dot_general(
        ds.astype(cdt), k, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ).astype(dq_ref.dtype)
    dk_ref[0] = jax.lax.dot_general(
        ds.astype(cdt), q, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ).astype(dk_ref.dtype)


def _dropattn_specs(B, h, L, d):
    qkv = pl.BlockSpec((1, L, d), lambda bh: (bh, 0, 0), memory_space=pltpu.VMEM)
    # bias rides as [B, 1, L]: a (1, 1, L) block keeps the trailing-two-dims
    # tile rule satisfied (block == array dims) while indexing per batch
    bias = pl.BlockSpec(
        (1, 1, L), lambda bh, _h=h: (bh // _h, 0, 0), memory_space=pltpu.VMEM
    )
    return qkv, bias


def _dropattn_fwd_call(p, interpret, q, k, v, bias, seed):
    B, h, L, d = q.shape
    qkv_spec, bias_spec = _dropattn_specs(B, h, L, d)
    out = pl.pallas_call(
        functools.partial(_dropattn_fwd_kernel, p=p, sm_scale=1.0 / (d**0.5)),
        grid=(B * h,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM), qkv_spec, qkv_spec, qkv_spec, bias_spec],
        out_specs=qkv_spec,
        out_shape=jax.ShapeDtypeStruct((B * h, L, d), q.dtype),
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel",)
        ),
    )(
        seed.reshape(1),
        q.reshape(B * h, L, d),
        k.reshape(B * h, L, d),
        v.reshape(B * h, L, d),
        bias.reshape(B, 1, L),
    )
    return out.reshape(B, h, L, d)


def _dropattn_bwd_call(p, interpret, q, k, v, bias, seed, g):
    B, h, L, d = q.shape
    qkv_spec, bias_spec = _dropattn_specs(B, h, L, d)
    shp = jax.ShapeDtypeStruct((B * h, L, d), jnp.float32)
    dq, dk, dv = pl.pallas_call(
        functools.partial(_dropattn_bwd_kernel, p=p, sm_scale=1.0 / (d**0.5)),
        grid=(B * h,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            qkv_spec,
            qkv_spec,
            qkv_spec,
            bias_spec,
            qkv_spec,
        ],
        out_specs=(qkv_spec, qkv_spec, qkv_spec),
        out_shape=(shp, shp, shp),
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel",)
        ),
    )(
        seed.reshape(1),
        q.reshape(B * h, L, d),
        k.reshape(B * h, L, d),
        v.reshape(B * h, L, d),
        bias.reshape(B, 1, L),
        g.reshape(B * h, L, d),
    )
    return (
        dq.reshape(B, h, L, d),
        dk.reshape(B, h, L, d),
        dv.reshape(B, h, L, d),
    )


@functools.partial(jax.custom_vjp, nondiff_argnums=(0, 1))
def _fused_dropout_attention(p, interpret, q, k, v, bias, seed):
    return _dropattn_fwd_call(p, interpret, q, k, v, bias, seed)


def _fda_fwd(p, interpret, q, k, v, bias, seed):
    return _dropattn_fwd_call(p, interpret, q, k, v, bias, seed), (q, k, v, bias, seed)


def _fda_bwd(p, interpret, res, g):
    import numpy as np

    q, k, v, bias, seed = res
    dq, dk, dv = _dropattn_bwd_call(p, interpret, q, k, v, bias, seed, g)
    return (
        dq.astype(q.dtype),
        dk.astype(k.dtype),
        dv.astype(v.dtype),
        jnp.zeros_like(bias),  # mask bias: constant input, no grad path
        np.zeros(seed.shape, jax.dtypes.float0),
    )


_fused_dropout_attention.defvjp(_fda_fwd, _fda_bwd)


def dropout_attention(q, k, v, bias, p: float, seed, interpret: bool | None = None):
    """Fused training attention: softmax(qk^T/sqrt(d) + bias) with dropout
    probability ``p`` applied to the probabilities, times V — probs and the
    dropout mask never leave VMEM (429.3 -> ~255 ms/step at KD bench shapes
    vs the materialized XLA path; see module comment).

    q,k,v: [B, h, L, d]; bias: [B, L] additive f32 over KEY positions
    (0 attend / large-negative pad); seed: int32 scalar array — the same
    seed reproduces the same mask (backward and jax.checkpoint replays rely
    on this). Differentiable w.r.t. q/k/v via a custom VJP whose backward
    kernel regenerates the mask on-chip.
    """
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    if interpret and p > 0.0:
        raise NotImplementedError(
            "in-kernel PRNG has no interpret-mode lowering; p > 0 requires "
            "a real TPU (the encoder uses the XLA materialized path off-TPU)"
        )
    bias = jax.lax.stop_gradient(bias.astype(jnp.float32))
    seed = jnp.asarray(seed, jnp.int32)
    return _fused_dropout_attention(float(p), bool(interpret), q, k, v, bias, seed)


@jax.custom_vjp
def _flash_attention_diff(q, k, v, mask, bias):
    return flash_attention(q, k, v, mask)


def _flash_diff_fwd(q, k, v, mask, bias):
    return flash_attention(q, k, v, mask), (q, k, v, mask, bias)


def _flash_diff_bwd(res, g):
    # Backward falls back to the XLA attention VJP: flash_attention is a
    # bare pallas_call with no transpose rule, and training reaches this
    # dispatcher whenever attention_dropout == 0 (bert.py). Recomputing
    # through xla_attention costs one [B, h, L, L] materialization in the
    # backward only — the flash forward still never spills scores to HBM.
    import numpy as np

    q, k, v, mask, bias = res
    _, pullback = jax.vjp(lambda a, b, c: xla_attention(a, b, c, bias), q, k, v)
    dq, dk, dv = pullback(g)
    return (
        dq,
        dk,
        dv,
        np.zeros(mask.shape, jax.dtypes.float0),  # int keep-mask: no grad
        jnp.zeros_like(bias),  # additive pad mask: constant input
    )


_flash_attention_diff.defvjp(_flash_diff_fwd, _flash_diff_bwd)


def flash_auto_decision(B: int, h: int, L: int) -> bool:
    """Auto-dispatch rule: flash when the XLA path would materialize a
    large [B, h, L, L] score tensor in HBM. Defaults measured round 5 on
    v5e (artifacts/bench/encode_variants_r5.json, B=256 e5 shape): flash
    wins at L=512 (149.5 vs 194.1 ms/batch, 1,713 vs 1,319 docs/s) and
    LOSES at L=128 (30.8 vs 24.1 ms) — the crossover sits between, so
    min_l defaults to the measured-safe 512 rather than the old analytic
    384. Recalibrate at runtime via SSKD_FLASH_AUTO_MIN_L /
    SSKD_FLASH_AUTO_SCORE_MB without a code change. L % 128 == 0 is a
    kernel lane-tiling requirement, not tunable.
    """
    min_l = int(os.environ.get("SSKD_FLASH_AUTO_MIN_L", "512"))
    score_mb = float(os.environ.get("SSKD_FLASH_AUTO_SCORE_MB", "256"))
    score_bytes = 4.0 * B * h * L * L
    return L >= min_l and L % 128 == 0 and score_bytes > score_mb * 1e6


def scaled_dot_attention(q, k, v, bias=None, use_flash: bool | None = None):
    """Dispatching attention: Pallas flash on TPU when enabled, XLA otherwise.

    ``bias`` is the additive mask [B, 1, 1, L] produced by the encoder; the
    flash path converts it back to a boolean keep-mask.

    SSKD_FLASH_ATTENTION: 1 forces flash, 0 forces XLA, unset = auto —
    see ``flash_auto_decision`` (thresholds env-tunable for crossover
    recalibration).

    Differentiable on every path: the flash branch carries a custom VJP
    whose backward is the XLA attention pullback, so jax.grad through a
    large-batch deterministic encode (KD / teacher fine-tune with
    attention_dropout == 0) no longer fails at trace time.
    """
    if use_flash is None:
        env = os.environ.get("SSKD_FLASH_ATTENTION")
        if env is not None:
            use_flash = env == "1"
        else:
            B, h, L, _ = q.shape
            use_flash = flash_auto_decision(B, h, L)
    if use_flash and jax.default_backend() == "tpu":
        B, _, L, _ = q.shape
        if L % 128:
            # Forced flash (SSKD_FLASH_ATTENTION=1) on a short serving /
            # training bucket (L in {16,32,64,...}): degrade to XLA at the
            # dispatcher instead of 500ing every request — the hard
            # lane-alignment error in flash_attention stays for direct
            # kernel callers, who chose the kernel explicitly.
            return xla_attention(q, k, v, bias)
        if bias is None:
            mask = jnp.ones((B, L), dtype=jnp.int32)
            bias_arr = jnp.zeros((B, 1, 1, L), jnp.float32)
        else:
            mask = (bias[:, 0, 0, :] >= -1.0).astype(jnp.int32)  # [B, L]
            bias_arr = jax.lax.stop_gradient(bias)
        return _flash_attention_diff(q, k, v, mask, bias_arr)
    return xla_attention(q, k, v, bias)
