"""Validate the binned Pallas exact top-k engine on the real TPU:
exactness vs the blocked XLA exact engine, and slope-timed speed vs the
approx engine, across block sizes.

Run: PYTHONPATH=/root/repo:/root/.axon_site python scripts/validate_hybrid.py
"""

from __future__ import annotations

import os
import time

import jax
import jax.numpy as jnp
import numpy as np

from sskd_tpu.ops.quant import quantize_rows
from sskd_tpu.ops.topk import cosine_topk_core, cosine_topk, _pallas_exact_ok
from sskd_tpu.ops.topk_pallas import cosine_topk_pallas

N = int(os.environ.get("VH_ROWS", 1_000_000))
D = int(os.environ.get("VH_DIM", 384))
B = int(os.environ.get("VH_BATCH", 256))
K = int(os.environ.get("VH_K", 10))
ITERS = 8


def log(*a):
    print(*a, flush=True)


def slope_ms(fn, *args):
    """t(ITERS)-t(1) with data-dependent fori_loop + host readback."""

    def make(n):
        @jax.jit
        def chained(q0, *rest):
            def body(i, carry):
                q, acc = carry
                vals, idx = fn(q, *rest)
                q = q + (vals[:, :1] + idx[:, :1].astype(jnp.float32)) * 1e-12
                return (q, acc + vals[0, 0])

            return jax.lax.fori_loop(0, n, body, (q0, jnp.float32(0)))

        return chained

    times = {}
    for n in (1, ITERS):
        f = make(n)
        float(f(*args)[1])  # compile + settle
        t0 = time.perf_counter()
        float(f(*args)[1])
        times[n] = time.perf_counter() - t0
    return max(0.0, (times[ITERS] - times[1]) / (ITERS - 1)) * 1000


def main():
    log("backend:", jax.default_backend())

    rng = np.random.default_rng(0)
    q = rng.standard_normal((B, D)).astype(np.float32)
    q /= np.linalg.norm(q, axis=1, keepdims=True)
    qj = jnp.asarray(q)

    slab = 250_000
    slabs, scs = [], []
    for i in range(0, N, slab):
        n = min(slab, N - i)
        x = jax.random.normal(jax.random.PRNGKey(i), (n, D), dtype=jnp.float32)
        x = x / jnp.linalg.norm(x, axis=1, keepdims=True)
        v8, sc = quantize_rows(x)
        slabs.append(jax.block_until_ready(v8))
        scs.append(sc)
    c8 = jnp.concatenate(slabs)
    scales = jnp.concatenate(scs)
    del slabs, scs
    _ = np.asarray(c8[0, :4])
    log(f"corpus ready: {N}x{D} int8")
    log("pallas dispatch gate:", _pallas_exact_ok(c8, K))

    # ---- correctness: pallas vs blocked exact (identical index sets) ----
    vh, ih = cosine_topk_pallas(qj, c8, K, row_scales=scales)
    vg, ig = cosine_topk_core(qj, c8, k=K, row_scales=scales, method="exact")
    ih, ig = np.asarray(ih), np.asarray(ig)
    vh, vg = np.asarray(vh), np.asarray(vg)
    set_match = np.mean([len(set(ih[i]) & set(ig[i])) / K for i in range(B)])
    log(f"exactness: set recall vs blocked exact = {set_match:.6f}")
    np.testing.assert_allclose(
        np.sort(vh, 1), np.sort(vg, 1), rtol=2e-5, atol=2e-5
    )
    log("score values match (rtol 2e-5)")

    # ---- f32 path spot check at smaller N ----
    c32 = jax.random.normal(jax.random.PRNGKey(7), (1 << 17, D), jnp.float32)
    c32 = c32 / jnp.linalg.norm(c32, axis=1, keepdims=True)
    vh2, ih2 = cosine_topk_pallas(qj, c32, K)
    vg2, ig2 = cosine_topk_core(qj, c32, k=K, method="exact")
    m2 = np.mean(
        [
            len(set(np.asarray(ih2)[i]) & set(np.asarray(ig2)[i])) / K
            for i in range(B)
        ]
    )
    log(f"f32 path (131k rows): set recall = {m2:.6f}")

    # ---- speed across block sizes ----
    for bl in (8192, 32768, 65536, 131072):
        ms = slope_ms(
            lambda qq, c, s, _bl=bl: cosine_topk_pallas(
                qq, c, K, block_rows=_bl, row_scales=s
            ),
            qj, c8, scales,
        )
        log(f"pallas exact bl={bl}: {ms:.3f} ms/sweep ({B/ms*1000:,.0f} q/s)")
    ms_approx = slope_ms(
        lambda qq, c, s: cosine_topk_core(
            qq, c, k=K, row_scales=s, method="approx", recall_target=0.99
        ),
        qj, c8, scales,
    )
    log(f"approx engine: {ms_approx:.3f} ms/sweep ({B/ms_approx*1000:,.0f} q/s)")
    ms_blocked = slope_ms(
        lambda qq, c, s: cosine_topk_core(qq, c, k=K, row_scales=s, method="exact"),
        qj, c8, scales,
    )
    log(f"blocked exact: {ms_blocked:.3f} ms/sweep ({B/ms_blocked*1000:,.0f} q/s)")

    # dispatcher end-to-end (should pick the pallas engine on TPU)
    vd, idd = cosine_topk(qj, c8, k=K, row_scales=scales, method="exact")
    md = np.mean([len(set(np.asarray(idd)[i]) & set(ig[i])) / K for i in range(B)])
    log(f"dispatcher exact-mode set recall vs blocked: {md:.6f}")

    # small-batch point (serving single queries)
    q1 = qj[:8]
    ms1 = slope_ms(
        lambda qq, c, s: cosine_topk_pallas(qq, c, K, row_scales=s), q1, c8, scales
    )
    log(f"pallas exact B=8: {ms1:.3f} ms/sweep")
    log("DONE")


if __name__ == "__main__":
    main()
