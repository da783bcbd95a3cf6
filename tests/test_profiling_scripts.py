"""The queued device-profiling scripts execute end-to-end off-device.

Both scripts were written during a TPU outage and sit in the recovery
queue (VERDICT r4 items 2-3); these CPU smokes at tiny shapes keep them
from bitrotting before the device comes back — every code path except
the actual flash-kernel compilation runs (off-TPU, the flash variant
measures the XLA path, which is exactly scaled_dot_attention's
documented off-device behavior).
"""

import json
import subprocess
import sys
from pathlib import Path

ROOT = Path(__file__).resolve().parent.parent


def _run(script: str, *args: str) -> dict:
    out_path = None
    argv = [sys.executable, str(ROOT / "scripts" / script), *args]
    for i, a in enumerate(args):
        if a == "--out":
            out_path = Path(args[i + 1])
    proc = subprocess.run(
        argv, capture_output=True, text=True, timeout=1200, cwd=str(ROOT)
    )
    assert proc.returncode == 0, proc.stdout[-2000:] + proc.stderr[-2000:]
    assert out_path is not None and out_path.exists()
    return json.loads(out_path.read_text())


def test_encode_variants_smoke(tmp_path):
    out = _run(
        "profile_encode_variants.py",
        "--arch", "tiny", "--batch", "4", "--seq-lens", "128",
        "--platform", "cpu",
        "--out", str(tmp_path / "enc.json"),
    )
    assert out["arch"] == "tiny"
    for variant in ("xla", "flash"):
        row = out[f"B4_L128_{variant}"]
        assert row["ms_per_batch"] >= 0.0
        assert "docs_per_s" in row
    # The recovery queue eval's this block to recalibrate auto-dispatch
    # for every downstream stage (scripts/tpu_recovery_queue.sh); MIN_L
    # must always be present — either the measured crossover or the
    # flash-never-wins pin — and every value must be env-safe (no spaces).
    rec = out["recommended_env"]
    assert "SSKD_FLASH_AUTO_MIN_L" in rec
    assert out["B4_L128_winner"] in ("xla", "flash")
    for v in rec.values():
        assert isinstance(v, str) and v and " " not in v


def test_bench_serving_cache_arm_smoke(tmp_path):
    """--cache boots the service with the result cache, the distinct-query
    ladder stays all-miss (unique queries across the whole run), and the
    hit-path block records an all-hit repeated-query measurement."""
    out = _run(
        "bench_serving.py",
        "--rows", "512", "--requests", "8", "--levels", "1,2",
        "--arch", "tiny", "--platform", "cpu", "--cache",
        "--out", str(tmp_path / "serve.json"),
    )
    cache = out["detail"]["result_cache"]
    assert cache["all_hits"] is True
    assert cache["hit_p50_ms"] >= 0.0
    assert cache["miss_p50_ms"] == out["detail"]["sequential_p50_ms"]
    assert out["detail"]["all_correct"] is True


def test_bench_serving_int4_host_refine_smoke(tmp_path):
    """The serving ladder can drive the production int4 + recall-margin
    config with HOST-resident refine rows (adr-012): the knob must reach
    the /index/load-constructed builder via settings, and responses stay
    correct (each query's top hit cross-checked against builder.search)."""
    out = _run(
        "bench_serving.py",
        "--rows", "512", "--requests", "6", "--levels", "1,2",
        "--arch", "tiny", "--platform", "cpu",
        "--dtype", "int4", "--refine-m", "16", "--refine-storage", "host",
        "--out", str(tmp_path / "serve_hr.json"),
    )
    assert out["detail"]["dtype"] == "int4"
    assert out["detail"]["refine_storage"] == "host"
    assert out["detail"]["all_correct"] is True


def test_input_pipeline_smoke(tmp_path):
    """Both prefetch arms of the real train loop execute; the JSON carries
    the overlap ratio the TPU run will publish."""
    out = _run(
        "profile_input_pipeline.py",
        "--arch", "tiny", "--platform", "cpu",
        "--out", str(tmp_path / "pipe.json"),
    )
    assert out["arch"] == "tiny"
    assert out["prefetch0"]["epoch2_s"] > 0.0
    assert out["prefetch2"]["epoch2_s"] > 0.0
    assert out["overlap_speedup"] > 0.0


def test_train_step_remat_smoke(tmp_path):
    out = _run(
        "profile_train_step.py",
        "--arch", "tiny", "--platform", "cpu",
        "--out", str(tmp_path / "train.json"),
    )
    assert out["arch"] == "tiny"
    for policy in ("full", "dots", "none"):
        row = out[policy]
        assert "error" in row or row["ms_per_step"] >= 0.0


def test_bench_serving_clustered_arm_smoke(tmp_path):
    """--index-type clustered drives the cell-probe engine through the
    real service (the CPU-host B=1 recommendation, adr-009 addendum) on
    clusterable synthetic data, and the artifact records the served
    engine's recall so a fast-but-lossy config can't pass silently."""
    out = _run(
        "bench_serving.py",
        "--rows", "512", "--requests", "6", "--levels", "1,2",
        "--arch", "tiny", "--platform", "cpu",
        "--index-type", "clustered", "--cluster-rows", "128", "--nprobe", "2",
        "--data-centers", "8", "--data-noise", "0.02",
        "--out", str(tmp_path / "serve_cl.json"),
    )
    assert out["detail"]["index_type"] == "clustered"
    assert out["detail"]["nprobe"] == 2
    assert out["detail"]["data_centers"] == 8
    assert 0.0 <= out["detail"]["engine_recall_at_10"] <= 1.0
    assert out["detail"]["all_correct"] is True
