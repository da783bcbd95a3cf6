"""Platform selection helper for framework entry points.

Some TPU hosts pin ``JAX_PLATFORMS`` through a sitecustomize that overrides
the env var after interpreter start; the only reliable switch is
``jax.config.update`` before first backend use. Framework entry points call
``apply_platform()`` early, honoring (in order): an explicit argument, the
``SSKD_PLATFORM`` env var, or leaving JAX's default untouched.
"""

from __future__ import annotations

import os


def apply_platform(platform: str | None = None, cpu_devices: int | None = None) -> None:
    platform = platform or os.environ.get("SSKD_PLATFORM")
    import jax

    if platform:
        jax.config.update("jax_platforms", platform)
    if cpu_devices:
        jax.config.update("jax_num_cpu_devices", cpu_devices)

    # Persistent compilation cache: TPU service cold starts re-pay every
    # encode/search compile otherwise. Opt-in via SSKD_COMPILATION_CACHE=dir.
    cache_dir = os.environ.get("SSKD_COMPILATION_CACHE")
    if cache_dir:
        try:
            jax.config.update("jax_compilation_cache_dir", cache_dir)
            jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
        except Exception:  # noqa: BLE001 — older jax without these knobs
            pass
