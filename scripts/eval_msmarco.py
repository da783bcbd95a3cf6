#!/usr/bin/env python
"""Mount-and-run MS MARCO dev evaluation — the reference's published
quality protocol, reproduced the day real artifacts are mounted.

Reference protocol (docs/overview/results-and-benchmarks.md:26-48):
200 held-out dev queries, nDCG@10 + MRR@10, three arms

    vanilla bi-encoder   0.719 / 0.685
    KD student           0.882 / 0.854   (97% of teacher — the 0.88
                                          north-star, BASELINE.md)
    teacher              0.910 / 0.891

plus the serving rerank path (student top-10 -> teacher rerank,
0.882 -> 0.910). This host has zero egress, so real weights and data
cannot be fetched; everything DOWN-STACK of the artifacts is executed by
tests/test_eval_msmarco.py at real model shapes with random weights on a
tiny sample in the exact MS MARCO layout. When the artifacts exist, run:

    python scripts/eval_msmarco.py \
        --msmarco-dev  /mnt/data/msmarco/dev.jsonl \
        --kd-model     /mnt/models/kd_student            # own or HF dir \
        --vanilla-model /mnt/models/e5-small-v2          # HF dir \
        --teacher-model /mnt/models/bge-reranker-large   # HF dir \
        --out artifacts/eval/msmarco_dev.json

Accepts both MS MARCO v2.1 layouts (passages dict-of-lists or
list-of-dicts — data/prepare.py:42-70) and uses a TREC qrels sidecar
(<name>.qrels.jsonl) when present. HF checkpoints are converted through
models/convert.py (name-based mapping, parity-tested vs torch at 2e-5).
"""

from __future__ import annotations

import argparse
import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

# the reference's published table, quoted for side-by-side context
REFERENCE_TABLE = {
    "vanilla": {"ndcg@10": 0.719, "mrr@10": 0.685},
    "kd_student": {"ndcg@10": 0.882, "mrr@10": 0.854},
    "teacher": {"ndcg@10": 0.910, "mrr@10": 0.891},
    "kd_student_reranked": {"ndcg@10": 0.910, "mrr@10": None},
}
NORTH_STAR_NDCG = 0.88  # BASELINE.md quality north star
ACCEPTANCE_RATIO = 0.95  # reference scripts/evaluate_and_compare.py:129-134


def build_argparser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(description=__doc__.split("\n")[0])
    p.add_argument("--msmarco-dev", required=True,
                   help="raw dev JSONL in either MS MARCO v2.1 layout")
    p.add_argument("--kd-model", required=True,
                   help="distilled student (own checkpoint dir or HF dir)")
    p.add_argument("--vanilla-model", default=None,
                   help="un-distilled bi-encoder baseline (HF dir)")
    p.add_argument("--teacher-model", default=None,
                   help="cross-encoder teacher (HF dir); enables the "
                        "teacher + rerank arms")
    p.add_argument("--queries", type=int, default=200,
                   help="held-out query count (reference protocol: 200)")
    p.add_argument("--rerank-k", type=int, default=10)
    p.add_argument("--seed", type=int, default=42)
    p.add_argument("--out", default="artifacts/eval/msmarco_dev.json")
    p.add_argument("--platform", default=None,
                   help="jax platform override (e.g. cpu)")
    p.add_argument("--batch-size", type=int, default=256)
    return p


def main(argv=None) -> int:
    args = build_argparser().parse_args(argv)

    from sskd_tpu.utils.logging import setup_logging
    from sskd_tpu.utils.platform import apply_platform

    setup_logging()
    apply_platform(args.platform)

    from sskd_tpu.cli.pipeline import load_eval_inputs
    from sskd_tpu.kd.eval import KDEvaluator
    from sskd_tpu.models import StudentModel

    # ---- data: sample the held-out queries (seeded, reproducible) ------
    q_map, corpus, qrels = load_eval_inputs(args.msmarco_dev, max_samples=None)
    import numpy as np

    rng = np.random.default_rng(args.seed)
    qids = list(q_map.keys())
    if len(qids) > args.queries:
        pick = set(rng.choice(len(qids), size=args.queries, replace=False).tolist())
        q_map = {q: q_map[q] for i, q in enumerate(qids) if i in pick}
    qrels = {q: qrels.get(q, {}) for q in q_map}
    print(f"eval set: {len(q_map)} queries over {len(corpus)} passages")

    ev = KDEvaluator(batch_size=args.batch_size)
    results: dict[str, dict] = {}
    timings: dict[str, float] = {}

    def run(name: str, fn):
        t0 = time.perf_counter()
        results[name] = fn()
        timings[name] = round(time.perf_counter() - t0, 1)
        print(f"{name}: ndcg@10={results[name].get('ndcg@10', 0):.4f} "
              f"mrr@10={results[name].get('mrr@10', 0):.4f} "
              f"({timings[name]}s)")

    kd = StudentModel(args.kd_model)
    run("kd_student", lambda: ev.evaluate_retrieval(kd, q_map, corpus, qrels))

    if args.vanilla_model:
        vanilla = StudentModel(args.vanilla_model)
        run("vanilla", lambda: ev.evaluate_retrieval(vanilla, q_map, corpus, qrels))

    teacher = None
    if args.teacher_model:
        from sskd_tpu.models import TeacherModel

        teacher = TeacherModel(args.teacher_model)
        run(
            "teacher",
            lambda: ev.evaluate_retrieval_teacher(
                teacher, q_map, corpus, qrels, batch_size=args.batch_size
            ),
        )
        run(
            "kd_student_reranked",
            lambda: ev.evaluate_retrieval_reranked(
                kd, teacher, q_map, corpus, qrels,
                rerank_k=args.rerank_k, batch_size=args.batch_size,
            ),
        )

    # ---- verdicts vs the reference's published table -------------------
    kd_ndcg = results["kd_student"].get("ndcg@10", 0.0)
    verdict = {
        "north_star_0.88_ndcg10": bool(kd_ndcg >= NORTH_STAR_NDCG),
        "kd_ndcg10": round(kd_ndcg, 4),
    }
    if "teacher" in results:
        t_ndcg = results["teacher"].get("ndcg@10", 0.0)
        verdict["teacher_ndcg10"] = round(t_ndcg, 4)
        verdict["kd_over_teacher"] = round(kd_ndcg / t_ndcg, 4) if t_ndcg else None
        verdict["acceptance_gate_95pct"] = bool(
            kd_ndcg >= ACCEPTANCE_RATIO * t_ndcg
        )

    report = {
        "protocol": {
            "dataset": str(args.msmarco_dev),
            "queries": len(q_map),
            "corpus_passages": len(corpus),
            "seed": args.seed,
            "rerank_k": args.rerank_k,
            "metrics": "ndcg@{1,5,10,20} mrr@{...} via utils/metrics.py",
        },
        "results": results,
        "reference_published": REFERENCE_TABLE,
        "verdict": verdict,
        "timings_s": timings,
    }
    out = Path(args.out)
    out.parent.mkdir(parents=True, exist_ok=True)
    with open(out, "w") as f:
        json.dump(report, f, indent=2)
    md = KDEvaluator.generate_report(
        results, title="MS MARCO dev evaluation (reference protocol)"
    )
    out.with_suffix(".md").write_text(
        md + "\nVerdict: " + json.dumps(verdict) + "\n"
    )
    print(json.dumps(verdict))
    print(f"report -> {out}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
