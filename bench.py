#!/usr/bin/env python
"""Headline benchmark: exact-search throughput (queries/sec/chip).

Prints ONE JSON line:
  {"metric": "index_search_qps_chip", "value": N, "unit": "queries/s",
   "vs_baseline": R}

vs_baseline is measured against the reference's FAISS-HNSW serving hot path:
~10 ms per query, single query at a time, on CPU (BASELINE.md "FAISS HNSW
search (k=10) ~10ms" => ~100 q/s). The TPU engine is exact (recall 1.0 vs
HNSW's 0.97 gate) and batch-mode; the BASELINE.json north star is 100k q/s
per chip over a 10M-passage index.

Environment knobs:
  SSKD_BENCH_ROWS     corpus rows          (default 1_000_000)
  SSKD_BENCH_DIM      embedding dim        (default 384)
  SSKD_BENCH_BATCH    query batch          (default 1024)
  SSKD_BENCH_K        top-k                (default 10)
  SSKD_BENCH_DTYPE    float32|int8         (default int8)
  SSKD_BENCH_ITERS    timed iterations     (default 20)
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

REFERENCE_QPS = 100.0  # FAISS HNSW ~10ms/query, serving hot path (BASELINE.md)


def main() -> None:
    rows = int(os.environ.get("SSKD_BENCH_ROWS", 1_000_000))
    dim = int(os.environ.get("SSKD_BENCH_DIM", 384))
    batch = int(os.environ.get("SSKD_BENCH_BATCH", 1024))
    k = int(os.environ.get("SSKD_BENCH_K", 10))
    dtype = os.environ.get("SSKD_BENCH_DTYPE", "int8")
    iters = int(os.environ.get("SSKD_BENCH_ITERS", 20))

    import jax
    import jax.numpy as jnp
    import numpy as np

    from sskd_tpu.ops.topk import cosine_topk
    from sskd_tpu.ops.quant import quantize_rows

    backend = jax.default_backend()
    rng = np.random.default_rng(0)

    # Build the corpus on-device without a giant host->device transfer:
    # generate on device in slabs.
    key = jax.random.PRNGKey(0)
    corpus = jax.random.normal(key, (rows, dim), dtype=jnp.float32)
    corpus = corpus / jnp.linalg.norm(corpus, axis=1, keepdims=True)
    scales = None
    if dtype == "int8":
        corpus, scales = quantize_rows(corpus)
    corpus = jax.block_until_ready(corpus)

    queries = rng.standard_normal((batch, dim)).astype(np.float32)
    queries /= np.linalg.norm(queries, axis=1, keepdims=True)
    queries = jnp.asarray(queries)

    block_rows = min(65536, rows)

    def run():
        return cosine_topk(
            queries, corpus, k=k, block_rows=block_rows, row_scales=scales
        )

    # compile + warmup
    vals, idx = run()
    jax.block_until_ready((vals, idx))

    t0 = time.perf_counter()
    for _ in range(iters):
        vals, idx = run()
    jax.block_until_ready((vals, idx))
    elapsed = time.perf_counter() - t0

    qps = batch * iters / elapsed
    ms_per_batch = elapsed / iters * 1000.0

    result = {
        "metric": "index_search_qps_chip",
        "value": round(qps, 1),
        "unit": "queries/s",
        "vs_baseline": round(qps / REFERENCE_QPS, 2),
        "detail": {
            "backend": backend,
            "rows": rows,
            "dim": dim,
            "batch": batch,
            "k": k,
            "dtype": dtype,
            "ms_per_batch": round(ms_per_batch, 3),
            "ms_per_query_amortized": round(ms_per_batch / batch, 4),
        },
    }
    print(json.dumps(result))


if __name__ == "__main__":
    main()
