"""Deterministic seeding (reference: src/utils/seed.py:11-35).

The reference seeded python/numpy/torch and set CUDA determinism knobs.
The JAX equivalent: python/numpy seeding for host-side code, plus an
explicit `jax.random` key for device-side randomness (JAX is deterministic
by construction — randomness only flows through keys).
"""

from __future__ import annotations

import os
import random

import numpy as np


def set_seed(seed: int = 42, deterministic: bool = True) -> "object":
    """Seed host RNGs and return a fresh ``jax.random`` key.

    ``deterministic=True`` additionally pins XLA's deterministic-ops flag via
    env (must happen before first compilation to take effect).
    """
    random.seed(seed)
    np.random.seed(seed)
    if deterministic:
        os.environ.setdefault("TF_DETERMINISTIC_OPS", "1")

    import jax

    return jax.random.PRNGKey(seed)


def new_rng(key, n: int = 2):
    """Split a key into ``n`` fresh keys."""
    import jax

    return jax.random.split(key, n)
