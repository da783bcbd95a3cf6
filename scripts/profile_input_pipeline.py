#!/usr/bin/env python
"""Train-loop input-pipeline overlap: prefetch_batches off vs on.

scripts/profile_train_step.py measures the jitted step in isolation
(device-only cost). This script measures the REAL ``KDTrainer.train``
loop — host batch packing (C++ WordPiece tokenize + pad) plus the
device step — with ``training.prefetch_batches`` 0 (synchronous, the
pre-round-5 behavior) vs 2 (producer thread overlaps packing with the
async dispatch pipeline). The delta is the input-pipeline stall the
overlap removes; on a 1-core contended host the two are expected to
tie, on a TPU the synchronous loop pays tokenization between steps.

Both arms run the same seeds and data; epoch 1 pays compile, so the
reported number is epoch 2's wall-clock (``history[1]['seconds']`` —
loop time only, checkpoint/eval excluded by construction: no dev set).

Usage: python scripts/profile_input_pipeline.py [--arch tiny --platform cpu]
"""

from __future__ import annotations

import argparse
import json
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))


def build_inputs(arch: str):
    import numpy as np

    from sskd_tpu.kd.dataset import KDSample
    from sskd_tpu.models import BertConfig, StudentModel
    from sskd_tpu.tokenization import WordPieceTokenizer

    words = [f"tok{i:04d}" for i in range(512)]
    rng = np.random.default_rng(0)
    corpus = [
        " ".join(rng.choice(words, size=40).tolist()) for _ in range(64)
    ]
    tokenizer = WordPieceTokenizer.build_from_corpus(
        corpus, vocab_size=4096 if arch == "e5" else 1024
    )
    if arch == "e5":
        import dataclasses

        cfg = dataclasses.replace(
            BertConfig.e5_small_v2(), vocab_size=tokenizer.vocab_size
        )
        n_samples, n_docs, doc_words = 256, 8, 160
    else:
        cfg = BertConfig.tiny(vocab_size=tokenizer.vocab_size)
        n_samples, n_docs, doc_words = 24, 2, 12
    student = StudentModel(
        model_name=f"pipeline-profile-{arch}", config=cfg, tokenizer=tokenizer
    )
    samples = []
    for i in range(n_samples):
        docs = [
            " ".join(rng.choice(words, size=doc_words).tolist())
            for _ in range(n_docs)
        ]
        scores = sorted(
            rng.uniform(-5, 5, n_docs).tolist(), reverse=True
        )
        samples.append(
            KDSample(
                query=" ".join(rng.choice(words, size=8).tolist()),
                docs=docs,
                teacher_scores=scores,
            )
        )
    return student, samples, n_docs


def run_arm(arch: str, prefetch: int, tmp: Path) -> dict:
    """Fresh student + trainer per arm so jit caches / params never leak
    across arms; identical seeds mean identical batch order."""
    from sskd_tpu.config import Settings
    from sskd_tpu.kd.train import KDTrainer

    student, samples, n_docs = build_inputs(arch)
    s = Settings()
    s.training.epochs = 2
    s.training.batch_size = 32 if arch == "e5" else 4
    s.training.num_docs_per_query = n_docs
    s.training.prefetch_batches = prefetch
    s.training.early_stopping_patience = 10
    s.training.resume = False
    trainer = KDTrainer(student, settings=s)
    out = trainer.train(
        samples,
        output_dir=tmp / f"arm_prefetch{prefetch}",
        query_len=16 if arch == "tiny" else 64,
        doc_len=32 if arch == "tiny" else 192,
    )
    ep = out["history"][-1]
    return {"prefetch": prefetch, "epoch2_s": round(ep["seconds"], 3)}


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="artifacts/bench/input_pipeline.json")
    ap.add_argument(
        "--arch", default="e5", choices=["e5", "tiny"],
        help="'tiny' = CI smoke shapes so the script can't bitrot off-device",
    )
    ap.add_argument("--platform", default=None,
                    help="jax platform override (also SSKD_PLATFORM)")
    args = ap.parse_args()
    from sskd_tpu.utils.platform import apply_platform

    apply_platform(args.platform)
    import tempfile

    import jax

    out = {"device": str(jax.devices()[0]), "arch": args.arch}
    with tempfile.TemporaryDirectory() as d:
        for prefetch in (0, 2):
            arm = run_arm(args.arch, prefetch, Path(d))
            out[f"prefetch{prefetch}"] = arm
            print(arm, flush=True)
    sync, pre = out["prefetch0"]["epoch2_s"], out["prefetch2"]["epoch2_s"]
    out["overlap_speedup"] = round(sync / pre, 3) if pre > 0 else 0.0
    path = Path(args.out)
    path.parent.mkdir(parents=True, exist_ok=True)
    path.write_text(json.dumps(out, indent=2) + "\n")
    print(json.dumps(out))


if __name__ == "__main__":
    main()
