#!/usr/bin/env python
"""Fused-attention KD train step across remat policies, with MFU.

Runs the full KD train step (query tower + doc tower + combined loss +
adamw update) at bench shapes (B=32, N=8, QL=64, DL=192, e5-small class,
bf16 compute, rbg dropout keys) under three rematerialisation policies:

  full — ``jax.checkpoint`` around each tower: recompute everything in the
         backward pass (the round-3 default; cheapest memory, most FLOPs)
  dots — ``jax.checkpoint_policies.checkpoint_dots``: keep matmul outputs,
         recompute elementwise (``training.remat_policy='dots'``)
  none — no remat: with the fused dropout-attention kernel the [B,h,L,L]
         probs never materialise, so the un-rematerialised step may now fit

Reports ms/step (chained-slope timing, dispatch overhead cancelled),
queries/s, effective TFLOP/s and MFU against the v5e bf16 peak. The FLOPs
model counts the forward GEMMs exactly and applies the standard backward
multiplier per policy (3.0 none / 3.3 dots / 4.0 full).

Round-4 context: the round-3 record measured 461.9 ms/step ≈ 15% MFU
pre-fusion (VERDICT r3 weak #3); the fused kernel's isolation math predicts
~255 ms. This script decides the shipped default for
``training.remat_policy``.

Usage:  python scripts/profile_train_step.py [--out OUT.json]
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
import optax

from sskd_tpu.kd.losses import combined_kd_loss
from sskd_tpu.models.bert import BertConfig, BiEncoder

# bench shapes; main() overrides for the --arch tiny CI smoke
cfg = BertConfig.e5_small_v2(compute_dtype=jnp.bfloat16)
TB, TN, QL, DL = 32, 8, 64, 192
PEAK_BF16 = 197e12  # v5e


def bert_fwd_flops(B: int, L: int) -> float:
    per_token = cfg.num_layers * (
        4 * cfg.hidden_size**2 + 2 * cfg.hidden_size * cfg.intermediate_size
    )
    attn = 4.0 * B * L * L * cfg.hidden_size * cfg.num_layers
    return 2.0 * B * L * per_token + attn


def make_batch(seed: int) -> dict:
    r = np.random.default_rng(seed)
    return {
        "query_ids": jnp.asarray(r.integers(1000, cfg.vocab_size, (TB, QL)).astype(np.int32)),
        "query_mask": jnp.ones((TB, QL), jnp.int32),
        "doc_ids": jnp.asarray(
            r.integers(1000, cfg.vocab_size, (TB, TN, DL)).astype(np.int32)
        ),
        "doc_mask": jnp.ones((TB, TN, DL), jnp.int32),
        "teacher_scores": jnp.asarray(r.uniform(-5, 5, (TB, TN)).astype(np.float32)),
        "doc_valid": jnp.ones((TB, TN), jnp.bool_),
    }


def measure(policy_name: str) -> dict:
    enc = BiEncoder(cfg, normalize=True, pooling="mean")
    dummy = np.zeros((1, 8), np.int32)
    params = enc.init(jax.random.PRNGKey(0), dummy, np.ones_like(dummy))
    tx = optax.chain(optax.clip_by_global_norm(1.0), optax.adamw(2e-5, weight_decay=0.01))
    opt_state = tx.init(params)

    def encode(p, ids, mask, rng_):
        return enc.apply(p, ids, mask, deterministic=False, rngs={"dropout": rng_})

    if policy_name == "full":
        encode_r = jax.checkpoint(encode)
    elif policy_name == "dots":
        encode_r = jax.checkpoint(encode, policy=jax.checkpoint_policies.checkpoint_dots)
    else:
        encode_r = encode

    def train_step(p0, o0, batch, rng_):
        q_rng, d_rng = jax.random.split(rng_)

        def loss_fn(p):
            q_emb = encode_r(p, batch["query_ids"], batch["query_mask"], q_rng)
            B, N, L = batch["doc_ids"].shape
            d_emb = encode_r(
                p, batch["doc_ids"].reshape(B * N, L), batch["doc_mask"].reshape(B * N, L), d_rng
            ).reshape(B, N, -1)
            scores = jnp.einsum("bh,bnh->bn", q_emb, d_emb)
            return combined_kd_loss(
                scores, batch["teacher_scores"], batch["doc_valid"], temperature=3.0
            )["loss"]

        loss, grads = jax.value_and_grad(loss_fn)(p0)
        updates, o1 = tx.update(grads, o0, p0)
        return optax.apply_updates(p0, updates), o1, loss

    @jax.jit
    def chained(p, o, batch, rng_, n):
        def body(i, carry):
            p_, o_ = carry
            p_, o_, _ = train_step(p_, o_, batch, jax.random.fold_in(rng_, i))
            return (p_, o_)

        p, o = jax.lax.fori_loop(0, n, body, (p, o))
        return jax.tree.leaves(p)[0].reshape(-1)[0]

    batch = make_batch(0)
    key = jax.random.key(7, impl="rbg")
    salt = iter(range(1, 10_000))
    try:
        float(chained(params, opt_state, batch, jax.random.fold_in(key, next(salt)), jnp.int32(1)))
    except Exception as e:  # OOM for 'none' is a legitimate outcome to record
        return {"error": str(e)[:300]}
    times = {}
    for n in (1, 5):
        best = float("inf")
        for _ in range(2):
            r = jax.random.fold_in(key, next(salt))
            t0 = time.perf_counter()
            float(chained(params, opt_state, batch, r, jnp.int32(n)))
            best = min(best, time.perf_counter() - t0)
        times[n] = best
    ms = max(0.0, (times[5] - times[1]) / 4 * 1000.0)
    fwd = bert_fwd_flops(TB, QL) + bert_fwd_flops(TB * TN, DL)
    mult = {"full": 4.0, "dots": 3.3, "none": 3.0}[policy_name]
    flops = mult * fwd
    return {
        "ms_per_step": round(ms, 2),
        "queries_per_s": round(TB / (ms / 1000.0), 1) if ms > 0 else 0.0,
        "tflops_effective": round(flops / (ms / 1e3) / 1e12, 1) if ms > 0 else 0,
        "mfu_vs_v5e_bf16": round(flops / (ms / 1e3) / PEAK_BF16, 3) if ms > 0 else 0,
        "flops_multiplier": mult,
    }


def main() -> None:
    global cfg, TB, TN, QL, DL
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="artifacts/bench/train_step_remat.json")
    ap.add_argument(
        "--arch", default="e5", choices=["e5", "tiny"],
        help="'tiny' = small shapes so CI can execute the script off-device",
    )
    ap.add_argument("--platform", default=None,
                    help="jax platform override (also SSKD_PLATFORM)")
    args = ap.parse_args()
    from sskd_tpu.utils.platform import apply_platform

    apply_platform(args.platform)
    if args.arch == "tiny":
        cfg = BertConfig.tiny(compute_dtype=jnp.bfloat16)
        TB, TN, QL, DL = 4, 2, 16, 32
    out = {"device": str(jax.devices()[0]), "arch": args.arch}
    for policy in ("full", "dots", "none"):
        out[policy] = measure(policy)
        print(policy, out[policy], flush=True)
    path = Path(args.out)
    path.parent.mkdir(parents=True, exist_ok=True)
    path.write_text(json.dumps(out, indent=2) + "\n")
    print(json.dumps(out))


if __name__ == "__main__":
    main()
