"""`semantic-kd doctor` — environment diagnostics.

Automates the runbook's manual probes (docs/operations/runbook.md:
device reachability, native tokenizer load, compile cache, index
layout) into one JSON report. Exit 0 = every REQUIRED check passed;
optional facilities (compile cache, OTel) report as informational.
"""

from __future__ import annotations

import importlib
import os
import sys
import time
from pathlib import Path


def _check(fn):
    """Run one probe; normalize to {ok, detail|error}."""
    try:
        out = fn()
        return {"ok": True, **(out if isinstance(out, dict) else {"detail": out})}
    except Exception as e:  # noqa: BLE001 — a doctor reports, never raises
        return {"ok": False, "error": f"{type(e).__name__}: {e}"}


def run_doctor(index_dir: str | None = None, settings=None) -> dict:
    checks: dict[str, dict] = {}

    def jax_backend():
        import jax

        t0 = time.perf_counter()
        devices = jax.devices()
        import jax.numpy as jnp

        (jnp.ones((8, 8)) @ jnp.ones((8, 8))).block_until_ready()
        return {
            "backend": jax.default_backend(),
            "devices": [str(d) for d in devices],
            "first_op_s": round(time.perf_counter() - t0, 2),
        }

    checks["jax_device"] = _check(jax_backend)

    def native_tokenizer():
        from sskd_tpu.tokenization.native import native_available

        if not native_available():
            raise RuntimeError(
                "C++ wordpiece core unavailable (pure-python fallback active; "
                "check native/libwordpiece.so and the g++ toolchain)"
            )
        return {"library": "native/libwordpiece.so"}

    checks["native_tokenizer"] = _check(native_tokenizer)

    def deps():
        mods = {}
        for m in ("jax", "flax", "optax", "orbax.checkpoint", "pydantic", "numpy"):
            mod = importlib.import_module(m)
            mods[m] = getattr(mod, "__version__", "?")
        return {"python": sys.version.split()[0], "versions": mods}

    checks["dependencies"] = _check(deps)

    def compile_cache():
        cache = os.environ.get("SSKD_COMPILATION_CACHE")
        if not cache:
            return {
                "detail": "SSKD_COMPILATION_CACHE unset — cold starts repay "
                "every compile (fine for dev, set it for serving)"
            }
        p = Path(cache)
        return {"dir": str(p), "exists": p.is_dir(), "entries": len(list(p.glob("*"))) if p.is_dir() else 0}

    checks["compile_cache"] = _check(compile_cache)

    if index_dir:

        def index():
            from sskd_tpu.index.builder import IndexBuilder

            b = IndexBuilder().load(index_dir)
            return {
                "ntotal": b.ntotal,
                "dtype": b.dtype,
                "index_type": b.index_type,
                "embedding_dim": b.embedding_dim,
                "refine_m": b.refine_m,
            }

        checks["index"] = _check(index)

    if settings is not None:

        def production():
            problems = settings.validate_for_production()
            return {"problems": problems} if not problems else {
                "detail": "informational (non-production env)",
                "problems": problems,
            }

        checks["production_audit"] = _check(production)

    required = ["jax_device", "native_tokenizer", "dependencies"]
    if index_dir:
        required.append("index")
    ok = all(checks[name]["ok"] for name in required)
    return {"ok": ok, "required": required, "checks": checks}
