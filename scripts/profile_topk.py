#!/usr/bin/env python
"""On-device profiling of the search engine variants (dev tool).

Compares: raw matmul, matmul+top_k, matmul+approx_max_k, the XLA scan
engine, and the Pallas fused kernel, at several block sizes. Prints
unbuffered lines as results arrive.
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
    from sskd_tpu.ops.topk import cosine_topk
    from sskd_tpu.ops.topk_pallas import cosine_topk_pallas

    B = int(sys.argv[1]) if len(sys.argv) > 1 else 256
    N = int(sys.argv[2]) if len(sys.argv) > 2 else 100_000
    D, K = 384, 10
    iters = 10

    print(f"profile: B={B} N={N} D={D} K={K}", flush=True)
    rng = np.random.default_rng(0)
    q = jnp.asarray(rng.standard_normal((B, D)).astype(np.float32))
    corpus = jax.random.normal(jax.random.PRNGKey(0), (N, D), dtype=jnp.float32)
    corpus = corpus / jnp.linalg.norm(corpus, axis=1, keepdims=True)
    c8, scales = quantize_rows(corpus)
    jax.block_until_ready((corpus, c8))

    def bench(name, fn, *args):
        try:
            out = fn(*args)
            jax.block_until_ready(out)
            t0 = time.perf_counter()
            for _ in range(iters):
                out = fn(*args)
            jax.block_until_ready(out)
            dt = (time.perf_counter() - t0) / iters * 1000
            qps = B / (dt / 1000.0)
            print(f"  {name:40s} {dt:9.3f} ms  {qps:12.0f} q/s", flush=True)
        except Exception as e:  # noqa: BLE001 — report and continue
            print(f"  {name:40s} FAILED: {type(e).__name__}: {e}", flush=True)

    bench("f32 matmul only", jax.jit(lambda q, c: q @ c.T), q, corpus)
    bench(
        "int8 matmul only",
        jax.jit(
            lambda q, c: jax.lax.dot_general(
                jnp.clip(jnp.round(q * 127), -127, 127).astype(jnp.int8),
                c,
                (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.int32,
            )
        ),
        q,
        c8,
    )
    bench(
        "f32 matmul + lax.top_k",
        jax.jit(lambda q, c: jax.lax.top_k(q @ c.T, K)),
        q,
        corpus,
    )
    bench(
        "f32 matmul + approx_max_k",
        jax.jit(lambda q, c: jax.lax.approx_max_k(q @ c.T, K)),
        q,
        corpus,
    )
    for block in (32768, 65536):
        bench(
            f"scan engine int8 bl={block}",
            functools.partial(cosine_topk, k=K, block_rows=block, row_scales=scales),
            q,
            c8,
        )
    for block in (1024, 2048, 4096):
        bench(
            f"pallas fused f32 bl={block}",
            functools.partial(cosine_topk_pallas, k=K, block_rows=block),
            q,
            corpus,
        )
        bench(
            f"pallas fused int8 bl={block}",
            functools.partial(
                cosine_topk_pallas, k=K, block_rows=block, row_scales=scales
            ),
            q,
            c8,
        )


if __name__ == "__main__":
    main()
