#!/usr/bin/env python
"""Trustworthy on-device throughput measurement (dev tool).

The naive loop-and-block pattern mis-measures through the remote-execution
tunnel (identical dispatches appear to cost ~25us regardless of FLOPs). This
version compiles a single on-device `lax.fori_loop` whose iterations are
data-dependent (each query batch is perturbed by the previous result), so
one dispatch covers `iters` real sweeps.
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
    from sskd_tpu.ops.topk import cosine_topk_core
    from sskd_tpu.ops.topk_pallas import cosine_topk_pallas

    B = int(sys.argv[1]) if len(sys.argv) > 1 else 256
    N = int(sys.argv[2]) if len(sys.argv) > 2 else 1_000_000
    ITERS = int(sys.argv[3]) if len(sys.argv) > 3 else 20
    D, K = 384, 10

    print(f"profile2: B={B} N={N} D={D} K={K} iters={ITERS} (on-device loop)", flush=True)
    rng = np.random.default_rng(0)
    q0 = jnp.asarray(rng.standard_normal((B, D)).astype(np.float32))
    corpus = jax.random.normal(jax.random.PRNGKey(0), (N, D), dtype=jnp.float32)
    corpus = corpus / jnp.linalg.norm(corpus, axis=1, keepdims=True)
    c8, scales = quantize_rows(corpus)
    jax.block_until_ready((corpus, c8))

    flops = 2.0 * B * N * D

    def bench(name, search_fn, *args):
        # slope method (t(ITERS) - t(1)) with a HOST READBACK forcing
        # completion: block_until_ready does not reliably block through the
        # remote tunnel (see bench.py / verify skill notes)
        def make(n):
            @jax.jit
            def chained(q0, *args):
                def body(i, carry):
                    q, acc = carry
                    vals, idx = search_fn(q, *args)
                    # data dependency: perturb next queries with this result
                    q = q + (vals[:, :1] + idx[:, :1].astype(jnp.float32)) * 1e-12
                    return (q, acc + vals[0, 0])

                return jax.lax.fori_loop(0, n, body, (q0, jnp.float32(0)))

            return chained

        try:
            times = {}
            for n in (1, ITERS):
                fn = make(n)
                float(fn(q0, *args)[1])  # compile + settle
                t0 = time.perf_counter()
                float(fn(q0, *args)[1])  # readback forces completion
                times[n] = time.perf_counter() - t0
            per = max(0.0, (times[ITERS] - times[1]) / (ITERS - 1)) * 1000
            qps = B / (per / 1000.0)
            eff = flops / (per / 1000.0) / 1e12
            print(
                f"  {name:38s} {per:9.3f} ms/sweep  {qps:11.0f} q/s  {eff:7.1f} TFLOP/s",
                flush=True,
            )
        except Exception as e:  # noqa: BLE001
            msg = str(e).splitlines()[0][:120]
            print(f"  {name:38s} FAILED: {type(e).__name__}: {msg}", flush=True)

    bench(
        "xla fused top_k f32 (1 block)",
        lambda q, c: jax.lax.top_k(
            jax.lax.dot_general(q, c, (((1,), (1,)), ((), ())),
                                preferred_element_type=jnp.float32), K),
        corpus,
    )
    bench(
        "engine f32 bl=262144",
        functools.partial(cosine_topk_core, k=K, block_rows=262144),
        corpus,
    )
    bench(
        "engine int8 bl=262144",
        lambda q, c, s: cosine_topk_core(q, c, k=K, block_rows=262144, row_scales=s),
        c8,
        scales,
    )
    bench(
        "engine int8 bl=65536",
        lambda q, c, s: cosine_topk_core(q, c, k=K, block_rows=65536, row_scales=s),
        c8,
        scales,
    )
    for bl in (1024, 2048):
        bench(
            f"pallas fused f32 bl={bl}",
            lambda q, c, _bl=bl: cosine_topk_pallas(q, c, k=K, block_rows=_bl),
            corpus,
        )
        bench(
            f"pallas fused int8 bl={bl}",
            lambda q, c, s, _bl=bl: cosine_topk_pallas(
                q, c, k=K, block_rows=_bl, row_scales=s
            ),
            c8,
            scales,
        )


if __name__ == "__main__":
    main()
