#!/usr/bin/env python
"""End-to-end KD training pipeline (reference: scripts/train_kd_pipeline.py).
Thin wrapper over the library pipeline — see sskd_tpu/cli/pipeline.py for
the 7-step flow."""

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from sskd_tpu.cli.main import main

if __name__ == "__main__":
    sys.exit(main(["train"] + sys.argv[1:]))
