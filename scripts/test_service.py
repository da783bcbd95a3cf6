#!/usr/bin/env python
"""Service smoke test (reference: scripts/test_service.py — load model,
encode, similarity, top-k print)."""

import argparse
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))


def main() -> int:
    parser = argparse.ArgumentParser()
    parser.add_argument("--model", required=True)
    parser.add_argument("--platform", default=None)
    args = parser.parse_args()

    from sskd_tpu.utils.platform import apply_platform

    apply_platform(args.platform)

    from sskd_tpu.models.student import StudentModel

    model = StudentModel(args.model)
    docs = [
        "machine learning is a field of AI",
        "paris is the capital of france",
        "python is a programming language",
    ]
    q = model.encode_queries(["what is machine learning"])
    d = model.encode_documents(docs)
    sims = model.compute_similarity(q, d)[0]
    order = sims.argsort()[::-1]
    print("query: what is machine learning")
    for rank, i in enumerate(order, 1):
        print(f"  {rank}. [{sims[i]:+.4f}] {docs[i]}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
