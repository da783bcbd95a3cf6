#!/usr/bin/env python
"""Ablate the dev early-stop signal's teacher-graded blend weight.

VERDICT r4 weak #4 / next-step #8: ``KDTrainer._GRADE_WEIGHT = 0.25``
blends binary positive-placement gains (weight 1.0) with min-max
normalized teacher-score gains (weight w) in the in-candidate dev
signal (sskd_tpu/kd/train.py:_dev_ndcg). The 0.25 value was validated
on the calibrated demo distribution only; this script re-validates the
selection policy on a HARDER, non-demo distribution and records a
committed ablation artifact.

Protocol (one training run, many selection policies):

1. Generate a *near-duplicate negatives* distribution — deliberately
   NOT the demo generator (data/demo.py uses concept mixtures with
   graded distractors). Here every query's mined negatives are
   token-perturbed copies of its positive, and the synthetic teacher
   scores them with noise large enough that a fraction of near-dups
   outscore the positive — the exact regime where a pure-graded signal
   selects checkpoints by negative-order agreement while positive
   placement (what qrels measure) regresses.
2. Train a tiny student ONCE, snapshotting params each epoch.
3. Per epoch, compute (a) corpus-level nDCG@10 over the full corpus
   with qrels — the ground truth the selection proxies — and (b) the
   shipped ``_dev_ndcg`` at each candidate grade weight (the actual
   trainer method, instance-patched, so the ablation executes the
   production code path).
4. Each policy "selects" its argmax epoch; its score is the GROUND
   TRUTH corpus nDCG at that epoch. Report blended vs binary (w=0)
   vs graded-dominant (w=100), repeated over several seeds.

Acceptance: blended >= max(binary, graded) - eps on every seed — the
engineering claim behind the shipped 0.25 is that blending never loses
to either pure signal (which of the two pure signals is worse is
distribution-dependent: binary saturates on easy candidate sets, graded
chases negative order on noisy teachers).

Usage: python scripts/ablate_grade_weight.py --out artifacts/ablation/grade_weight_r5.json
"""

from __future__ import annotations

import argparse
import json
import sys
import tempfile
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import numpy as np

WEIGHTS = [0.0, 0.1, 0.25, 0.5, 1.0, 100.0]
POLICY_NAMES = {0.0: "binary", 0.25: "blended (shipped)", 100.0: "graded-dominant"}


def make_near_duplicate_distribution(
    n_queries: int = 48,
    n_negs: int = 7,
    n_distractors: int = 400,
    teacher_noise: float = 1.2,
    seed: int = 11,
):
    """Queries with near-duplicate mined negatives and a noisy teacher.

    Positive doc: 8 topic words + 4 unique words. Each near-dup negative
    swaps 2-3 of those words for off-topic ones — lexically almost the
    positive. Teacher score = true relevance (positive 5.0, near-dup
    2.5..4.0) + N(0, teacher_noise): with noise 1.2, ~15-25% of queries
    have a near-dup outscoring the positive, mimicking real cross-encoder
    confusion on hard mined negatives.
    """
    rng = np.random.default_rng(seed)
    topics = [f"topic{t}" for t in range(12)]
    vocab = [f"word{i}" for i in range(160)]
    off = [f"noise{i}" for i in range(80)]

    corpus: dict[str, str] = {}
    queries: dict[str, str] = {}
    qrels: dict[str, dict[str, float]] = {}
    samples = []

    def _doc_words(t: str):
        return [t] * 2 + list(rng.choice(vocab, 6)) + [
            f"uniq{rng.integers(1e9)}" for _ in range(2)
        ]

    for qi in range(n_queries):
        t = topics[qi % len(topics)]
        pos_words = _doc_words(t)
        pos_text = " ".join(pos_words)
        pos_id = f"pos{qi}"
        corpus[pos_id] = pos_text
        qid = f"q{qi}"
        queries[qid] = f"{t} " + " ".join(rng.choice(pos_words, 2))
        qrels[qid] = {pos_id: 1.0}

        docs = [pos_text]
        true_rel = [5.0]
        for ni in range(n_negs):
            words = list(pos_words)
            for swap in rng.choice(len(words), rng.integers(2, 4), replace=False):
                words[swap] = str(rng.choice(off))
            neg_text = " ".join(words)
            corpus[f"neg{qi}_{ni}"] = neg_text
            docs.append(neg_text)
            true_rel.append(float(rng.uniform(2.5, 4.0)))
        noisy = np.asarray(true_rel) + rng.normal(0.0, teacher_noise, len(true_rel))
        samples.append((queries[qid], docs, noisy.tolist()))

    for di in range(n_distractors):
        corpus[f"dist{di}"] = " ".join(rng.choice(off, 10))

    return samples, queries, corpus, qrels


def corpus_ndcg_at_10(student, queries, corpus, qrels) -> float:
    from sskd_tpu.utils.metrics import ndcg_at_k

    doc_ids = list(corpus.keys())
    d = student.encode_documents([corpus[i] for i in doc_ids], batch_size=256)
    qids = list(queries.keys())
    q = student.encode_queries([queries[i] for i in qids], batch_size=256)
    scores = q @ d.T
    vals = []
    for qi, qid in enumerate(qids):
        order = np.argsort(-scores[qi])[:10]
        rels = qrels[qid]
        vals.append(
            ndcg_at_k([float(rels.get(doc_ids[i], 0.0)) for i in order], k=10)
        )
    return float(np.mean(vals))


def run_one_seed(seed: int, epochs: int) -> dict:
    from sskd_tpu.config import Settings
    from sskd_tpu.kd.dataset import KDSample
    from sskd_tpu.kd.train import KDTrainer
    from sskd_tpu.models import BertConfig, StudentModel
    from sskd_tpu.tokenization import WordPieceTokenizer

    raw, queries, corpus, qrels = make_near_duplicate_distribution(seed=seed)
    samples = [KDSample(query=q, docs=d, teacher_scores=s) for q, d, s in raw]
    n_dev = max(8, len(samples) // 5)
    dev_samples, train_samples = samples[:n_dev], samples[n_dev:]
    dev_qids = [f"q{i}" for i in range(n_dev)]
    dev_queries = {k: queries[k] for k in dev_qids}
    dev_qrels = {k: qrels[k] for k in dev_qids}

    tok = WordPieceTokenizer.build_from_corpus(
        list(corpus.values()) + list(queries.values()) + ["query passage"],
        vocab_size=2048,
    )
    student = StudentModel(
        "ablate-tiny",
        config=BertConfig.tiny(vocab_size=tok.vocab_size),
        tokenizer=tok,
    )

    settings = Settings.model_validate(
        {
            "training": {
                "epochs": epochs,
                "batch_size": 8,
                "num_docs_per_query": 8,
                "learning_rate": 2e-4,  # hot LR: induce a non-monotone trajectory
                "early_stopping_patience": epochs + 1,  # full trace
            }
        }
    )
    trainer = KDTrainer(student, settings)

    trace: list[dict] = []

    def dev_evaluator(live_student) -> float:
        """Epoch-end hook: record ground truth + every signal variant at
        the CURRENT params, driving the shipped _dev_ndcg code path."""
        truth = corpus_ndcg_at_10(live_student, dev_queries, corpus, dev_qrels)
        row = {"epoch": len(trace) + 1, "corpus_ndcg@10": truth, "signals": {}}
        for w in WEIGHTS:
            trainer._GRADE_WEIGHT = w  # instance attr shadows the class attr
            row["signals"][str(w)] = trainer._dev_ndcg(
                dev_samples, live_student.params
            )
        del trainer.__dict__["_GRADE_WEIGHT"]  # restore the shipped class value
        trace.append(row)
        print(
            f"epoch {row['epoch']}: corpus={truth:.4f} "
            + " ".join(f"w{w}={row['signals'][str(w)]:.4f}" for w in WEIGHTS)
        )
        return truth

    with tempfile.TemporaryDirectory() as tmp:
        trainer.train(
            train_samples,
            dev_samples=dev_samples,
            output_dir=tmp,
            query_len=16,
            doc_len=32,
            dev_evaluator=dev_evaluator,
        )

    # Selection: each policy picks its argmax-signal epoch (first hit on
    # ties — the trainer's ">" update keeps the earliest best) and is
    # scored by the ground-truth corpus nDCG at that epoch.
    policies = {}
    for w in WEIGHTS:
        sig = [r["signals"][str(w)] for r in trace]
        sel = int(np.argmax(sig))
        policies[str(w)] = {
            "name": POLICY_NAMES.get(w, f"w={w}"),
            "selected_epoch": sel + 1,
            "signal_at_selected": sig[sel],
            "corpus_ndcg_at_selected": trace[sel]["corpus_ndcg@10"],
        }

    blended = policies["0.25"]["corpus_ndcg_at_selected"]
    binary = policies["0.0"]["corpus_ndcg_at_selected"]
    graded = policies["100.0"]["corpus_ndcg_at_selected"]
    return {
        "seed": seed,
        "trace": trace,
        "policies": policies,
        "blended": blended,
        "binary": binary,
        "graded": graded,
        "blended_ge_both": blended >= max(binary, graded) - 1e-9,
    }


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="artifacts/ablation/grade_weight_r5.json")
    ap.add_argument("--epochs", type=int, default=10)
    ap.add_argument("--seeds", default="11,23,37")
    ap.add_argument("--platform", default="cpu")
    args = ap.parse_args()

    import jax

    if args.platform:
        try:
            jax.config.update("jax_platforms", args.platform)
        except RuntimeError:
            pass

    seeds = [int(s) for s in args.seeds.split(",") if s]
    runs = []
    for seed in seeds:
        print(f"=== seed {seed} ===")
        runs.append(run_one_seed(seed, args.epochs))

    verdict_ok = all(r["blended_ge_both"] for r in runs)
    out = {
        "protocol": "near-duplicate negatives + noisy teacher (non-demo), "
        "one training run per seed, per-epoch signal traces, argmax "
        "selection scored by corpus-level nDCG@10 with qrels",
        "acceptance": "blended(0.25) >= max(binary, graded) on every seed",
        "distribution": {
            "n_queries": 48,
            "n_negs_per_query": 7,
            "n_distractors": 400,
            "teacher_noise_sigma": 1.2,
        },
        "epochs": args.epochs,
        "seeds": seeds,
        "runs": runs,
        "summary": {
            "blended_mean": float(np.mean([r["blended"] for r in runs])),
            "binary_mean": float(np.mean([r["binary"] for r in runs])),
            "graded_mean": float(np.mean([r["graded"] for r in runs])),
            "blended_ge_both_every_seed": verdict_ok,
        },
        "shipped_weight": 0.25,
    }
    out_path = Path(args.out)
    out_path.parent.mkdir(parents=True, exist_ok=True)
    out_path.write_text(json.dumps(out, indent=2))
    print(json.dumps({k: v for k, v in out.items() if k != "runs"}, indent=2))
    print(f"wrote {out_path}")
    return 0 if verdict_ok else 1


if __name__ == "__main__":
    raise SystemExit(main())
