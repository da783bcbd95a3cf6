#!/usr/bin/env python
"""On-device sweep of flash_attention (head_group, block_q, block_k) configs.

Round-5 device recovery: the analytic VMEM budget in ``_pick_head_group``
(sskd_tpu/ops/attention.py) under-estimated Mosaic's real scoped-vmem demand
(G=6/bq=bk=256 at e5 shape demands 17.96 MB vs the 16 MB v5e limit — compile
error captured in artifacts/bench/encode_variants_r5.json's run log). This
script measures the real compile/latency frontier so the picker can be
recalibrated from data instead of an estimate.

Times the bare attention op (not the full encoder) with the chained-slope
method; configs that fail to compile are recorded as such.
"""

from __future__ import annotations

import argparse
import json
import time
from pathlib import Path
import sys

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import jax
import jax.numpy as jnp
import numpy as np

from sskd_tpu.ops.attention import flash_attention, xla_attention

rng = np.random.default_rng(0)


def slope_ms(fn, *args, n_hi: int = 8) -> float:
    @jax.jit
    def chained(n, *a):
        def body(i, q):
            out = fn(q, *a[1:])
            return q + (out.astype(q.dtype) * jnp.bfloat16(1e-6))

        return jax.lax.fori_loop(0, n, body, a[0]).sum()

    float(chained(jnp.int32(1), *args))  # compile + warm
    ts = {}
    for n in (1, n_hi):
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            float(chained(jnp.int32(n), *args))
            best = min(best, time.perf_counter() - t0)
        ts[n] = best
    return max(0.0, (ts[n_hi] - ts[1]) / (n_hi - 1) * 1000.0)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="artifacts/bench/flash_tune_r5.json")
    ap.add_argument("--batch", type=int, default=256)
    ap.add_argument("--seq", type=int, default=512)
    ap.add_argument("--heads", type=int, default=12)
    ap.add_argument("--dim", type=int, default=32)
    args = ap.parse_args()

    B, h, L, d = args.batch, args.heads, args.seq, args.dim
    q = jnp.asarray(rng.standard_normal((B, h, L, d)), jnp.bfloat16)
    k = jnp.asarray(rng.standard_normal((B, h, L, d)), jnp.bfloat16)
    v = jnp.asarray(rng.standard_normal((B, h, L, d)), jnp.bfloat16)
    mask = jnp.ones((B, L), jnp.int32)

    results = {"shape": f"B{B}_h{h}_L{L}_d{d}", "device": str(jax.devices()[0])}

    ms = slope_ms(lambda qq, kk, vv: xla_attention(qq, kk, vv), q, k, v)
    results["xla"] = round(ms, 3)
    print("xla", ms, flush=True)

    for G in (1, 2, 3, 4, 6, 12):
        if h % G:
            continue
        for bq in (128, 256, 512):
            if L % bq:
                continue
            for bk in (128, 256, 512):
                if L % bk:
                    continue
                key = f"G{G}_bq{bq}_bk{bk}"
                try:
                    ms = slope_ms(
                        lambda qq, kk, vv, mm, G=G, bq=bq, bk=bk: flash_attention(
                            qq, kk, vv, mm, block_q=bq, block_k=bk, head_group=G
                        ),
                        q, k, v, mask,
                    )
                    results[key] = round(ms, 3)
                    print(key, ms, flush=True)
                except Exception as e:  # noqa: BLE001 - record compile failures
                    results[key] = f"FAIL: {str(e).splitlines()[0][:120]}"
                    print(key, "FAIL", flush=True)

    timed = {k2: v2 for k2, v2 in results.items()
             if isinstance(v2, float) and k2 != "xla"}
    if timed:
        best = min(timed, key=timed.get)
        results["best"] = {"config": best, "ms": timed[best],
                           "xla_ms": results["xla"]}
    out = Path(args.out)
    out.parent.mkdir(parents=True, exist_ok=True)
    out.write_text(json.dumps(results, indent=2) + "\n")
    print(json.dumps(results.get("best", {})))


if __name__ == "__main__":
    main()
