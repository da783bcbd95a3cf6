#!/usr/bin/env python
"""Quantized export CLI (reference: scripts/export_to_onnx.py — ONNX INT8
replaced by the int8 weight export with parity validation)."""

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from sskd_tpu.cli.main import main

if __name__ == "__main__":
    sys.exit(main(["export"] + sys.argv[1:]))
