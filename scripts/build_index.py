#!/usr/bin/env python
"""Vector index build CLI (reference: scripts/build_faiss_index.py — FAISS
replaced by the exact Pallas/XLA engine; same args shape: model/data/output/
max-docs/batch)."""

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from sskd_tpu.cli.main import main

if __name__ == "__main__":
    sys.exit(main(["index", "build"] + sys.argv[1:]))
