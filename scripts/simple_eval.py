#!/usr/bin/env python
"""Simple retrieval eval over raw JSONL (reference: scripts/simple_eval.py —
dedup corpus, full-corpus similarity, nDCG/MRR JSON)."""

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from sskd_tpu.cli.main import main

if __name__ == "__main__":
    sys.exit(main(["eval"] + sys.argv[1:]))
