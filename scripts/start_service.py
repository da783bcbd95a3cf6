#!/usr/bin/env python
"""Service launcher (reference: scripts/start_service.py — create_app +
uvicorn; here the first-party asyncio server)."""

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from sskd_tpu.cli.main import main

if __name__ == "__main__":
    sys.exit(main(["serve"] + sys.argv[1:]))
