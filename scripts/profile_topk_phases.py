#!/usr/bin/env python
"""Phase breakdown of the exact Pallas top-k (dev tool).

Times phase A (binmax sweep), bin extraction, phase B (gather/rescan), and
the full kernel independently with the on-device fori_loop slope method
(naive timing lies through the remote tunnel — see profile_topk2.py).

Run: PYTHONPATH=/root/repo:/root/.axon_site python scripts/profile_topk_phases.py [B] [N]
"""

import functools
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))


def main() -> None:
    import jax
    import jax.numpy as jnp
    import numpy as np

    from sskd_tpu.ops.quant import quantize_rows
    from sskd_tpu.ops import topk_pallas as tp

    B = int(sys.argv[1]) if len(sys.argv) > 1 else 256
    N = int(sys.argv[2]) if len(sys.argv) > 2 else 1_000_000
    ITERS = int(sys.argv[3]) if len(sys.argv) > 3 else 16
    D, K = 384, 10
    BLOCK = 16384

    print(f"phases: B={B} N={N} D={D} K={K} iters={ITERS}", flush=True)
    rng = np.random.default_rng(0)
    q0 = jnp.asarray(rng.standard_normal((B, D)).astype(np.float32))
    corpus = jax.random.normal(jax.random.PRNGKey(0), (N, D), dtype=jnp.float32)
    corpus = corpus / jnp.linalg.norm(corpus, axis=1, keepdims=True)
    c8, scales = quantize_rows(corpus)
    jax.block_until_ready((c8, scales))

    # replicate the jit body's setup for int8
    padded = (N + BLOCK - 1) // BLOCK * BLOCK
    c8p = jnp.pad(c8, ((0, padded - N), (0, 0)))
    scp = jnp.pad(scales, (0, padded - N)).astype(jnp.float32).reshape(padded, 1)
    n_blocks = padded // BLOCK
    n_bins = padded // tp.BIN_W
    G = BLOCK // tp.BIN_W
    valid_arr = jnp.asarray([[N]], jnp.int32)
    jax.block_until_ready((c8p, scp))

    import jax.experimental.pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    def binmax(q, c8p, scp):
        q_absmax = jnp.maximum(jnp.max(jnp.abs(q), axis=1, keepdims=True), 1e-9)
        q_scale = (q_absmax / 127.0).astype(jnp.float32)
        q_in = jnp.clip(jnp.round(q / q_scale), -127, 127).astype(jnp.int8)
        kern = functools.partial(
            tp._binmax_dispatch, has_scales=True, is_int8=True, block_rows=BLOCK
        )
        return pl.pallas_call(
            kern,
            grid=(n_blocks,),
            in_specs=[
                pl.BlockSpec(memory_space=pltpu.SMEM),
                pl.BlockSpec((B, D), lambda i: (0, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((BLOCK, D), lambda i: (i, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((BLOCK, 1), lambda i: (i, 0), memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((G, B), lambda i: (i, 0), memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((n_bins, B), jnp.float32),
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("arbitrary",),
                vmem_limit_bytes=100 * 1024 * 1024,
            ),
        )(valid_arr, q_in, c8p, scp)

    def slope(fn, operands, label):
        """One-dispatch loop: iteration i perturbs q by prev result.
        Large arrays MUST be passed via ``operands`` (jit arguments) — a
        closed-over corpus becomes a compile-payload constant and the
        remote-compile tunnel rejects it with HTTP 413."""

        def make(iters):
            @jax.jit
            def run(q, *ops):
                def body(i, carry):
                    q_, acc = carry
                    out = fn(q_ + acc * 1e-6, *ops)
                    s = (
                        jnp.sum(jnp.asarray(out[0], jnp.float32))
                        if isinstance(out, tuple)
                        else jnp.sum(out)
                    )
                    return (q_, jnp.full((B, 1), s * 1e-20, jnp.float32) + acc * 0)

                _, acc = jax.lax.fori_loop(
                    0, iters, body, (q, jnp.zeros((B, 1), jnp.float32))
                )
                return acc

            return run

        r1, rN = make(1), make(ITERS)
        jax.block_until_ready(r1(q0, *operands))
        jax.block_until_ready(rN(q0, *operands))
        t0 = time.perf_counter(); jax.block_until_ready(r1(q0, *operands)); t1 = time.perf_counter()
        t2 = time.perf_counter(); jax.block_until_ready(rN(q0, *operands)); t3 = time.perf_counter()
        ms = ((t3 - t2) - (t1 - t0)) / (ITERS - 1) * 1000
        print(f"{label:34s} {ms:8.3f} ms", flush=True)
        return ms

    # phase A alone
    slope(lambda q, c, sc: binmax(q, c, sc), (c8p, scp), "phase A (binmax sweep)")

    # extraction alone (on a fixed binmax output)
    bm = jax.block_until_ready(binmax(q0, c8p, scp))

    def extract(q, bm_in):
        # data-dep: shift binmax by a hair of q
        x = bm_in + jnp.sum(q) * 1e-20
        return tp._small_topk(x.T, K)

    slope(extract, (bm,), "extraction (top-k bins)")

    # full kernel
    def full(q, c, sc):
        return tp.cosine_topk_pallas(q, c, K, row_scales=sc.reshape(-1), valid_n=N)

    ms_full = slope(full, (c8p, scp), "full exact kernel")

    # approx engine for reference
    from sskd_tpu.ops.topk import cosine_topk_core

    def approx(q, c, sc):
        return cosine_topk_core(q, c, k=K, row_scales=sc.reshape(-1), method="approx", valid_n=N)

    try:
        slope(approx, (c8p, scp), "approx engine")
    except Exception as e:
        print("approx failed:", e)


if __name__ == "__main__":
    main()
