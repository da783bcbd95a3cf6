#!/usr/bin/env python
"""3-way model comparison with the KD acceptance gate (reference:
scripts/evaluate_and_compare.py — whose committed version was bit-rotted,
SURVEY.md 7.4; this one runs against the real eval API)."""

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from sskd_tpu.cli.main import main

if __name__ == "__main__":
    sys.exit(main(["compare"] + sys.argv[1:]))
