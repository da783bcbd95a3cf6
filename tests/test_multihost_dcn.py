"""The DCN (multi-host) leg of SURVEY 5.8, executed — not prose.

Spawns scripts/dryrun_multihost.py: two OS processes, each with 4 CPU
devices, joined by ``initialize_distributed`` (parallel/mesh.py:22-48)
into one 8-device global mesh; a cross-process psum (DP gradient
reduction) and a cross-process all_gather + top-k merge (sharded-search
merge) both execute over the Gloo fabric and assert their values.

The reference had no distributed capability at all (single process,
single device — SURVEY 2.10); this pins the multi-slice-pod code path
the framework adds. Opt out with SSKD_SKIP_MULTIHOST=1 (the two extra
jax imports cost ~30 s of suite wall time).
"""

from __future__ import annotations

import os
import subprocess
import sys
from pathlib import Path

import pytest

SCRIPT = Path(__file__).resolve().parent.parent / "scripts" / "dryrun_multihost.py"


@pytest.mark.skipif(
    os.environ.get("SSKD_SKIP_MULTIHOST") == "1",
    reason="multi-host dryrun skipped by env",
)
def test_two_process_dcn_dryrun():
    out = subprocess.run(
        [sys.executable, str(SCRIPT)],
        capture_output=True,
        timeout=420,
        text=True,
    )
    assert out.returncode == 0, out.stdout[-3000:] + out.stderr[-1000:]
    assert "MULTIHOST DRYRUN PASSED" in out.stdout
    assert "DCN-DRYRUN-OK p0" in out.stdout
    assert "DCN-DRYRUN-OK p1" in out.stdout
