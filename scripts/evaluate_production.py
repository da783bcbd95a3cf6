#!/usr/bin/env python
"""Production evaluation: vanilla vs KD student vs (optional, slow) teacher
(reference: scripts/evaluate_production.py — writes evaluation_results.json
+ EVALUATION_SUMMARY.md)."""

import argparse
import json
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))


class _TeacherAsRetriever:
    """Scores every (query, doc) pair with the cross-encoder — exact but slow
    (the reference gated this behind --include-teacher for the same reason)."""

    def __init__(self, teacher, corpus_texts):
        self.teacher = teacher
        self.corpus_texts = corpus_texts

    def encode_queries(self, texts, **kw):
        import numpy as np

        # pseudo-embedding: row of teacher scores against the whole corpus
        rows = []
        for q in texts:
            pairs = [(q, d) for d in self.corpus_texts]
            rows.append(self.teacher.score(pairs))
        return np.asarray(rows, dtype=np.float32)

    def encode_documents(self, texts, **kw):
        import numpy as np

        return np.eye(len(self.corpus_texts), dtype=np.float32)[: len(texts)]


def main(argv=None) -> int:
    parser = argparse.ArgumentParser()
    parser.add_argument("--kd-model", required=True)
    parser.add_argument("--vanilla-model", required=True)
    parser.add_argument("--data", required=True, help="raw JSONL")
    parser.add_argument("--max-samples", type=int, default=100)
    parser.add_argument("--include-teacher", action="store_true")
    parser.add_argument("--teacher-model", default=None)
    parser.add_argument("--out-dir", default="artifacts/evaluation")
    parser.add_argument("--tiny", action="store_true")
    parser.add_argument("--platform", default=None)
    args = parser.parse_args(argv)

    from sskd_tpu.utils.logging import setup_logging
    from sskd_tpu.utils.platform import apply_platform

    setup_logging()
    apply_platform(args.platform)

    from sskd_tpu.cli.main import _load_eval_inputs, _tiny_student
    from sskd_tpu.kd.eval import KDEvaluator

    q_map, corpus, qrels = _load_eval_inputs(args.data, args.max_samples)
    ev = KDEvaluator()

    models = {
        "vanilla": _tiny_student(args.vanilla_model, args.tiny),
        "kd_student": _tiny_student(args.kd_model, args.tiny),
    }
    if args.include_teacher:
        from sskd_tpu.models.teacher import TeacherModel

        teacher = TeacherModel(args.teacher_model)
        models["teacher"] = _TeacherAsRetriever(teacher, list(corpus.values()))

    df, gate = ev.compare_models(models, q_map, corpus, qrels)
    results = {name: df.loc[name].to_dict() for name in df.index}
    out_dir = Path(args.out_dir)
    out_dir.mkdir(parents=True, exist_ok=True)
    with open(out_dir / "evaluation_results.json", "w") as f:
        json.dump({"results": results, "gate": gate}, f, indent=2)

    summary = KDEvaluator.generate_report(results, title="Production evaluation")
    if gate:
        summary += "\n## Acceptance gate (>= 95% of teacher nDCG@10)\n\n"
        for name, passed in gate.items():
            summary += f"- {name}: {'PASS' if passed else 'FAIL'}\n"
    (out_dir / "EVALUATION_SUMMARY.md").write_text(summary)
    print(summary)
    return 0


if __name__ == "__main__":
    sys.exit(main())
