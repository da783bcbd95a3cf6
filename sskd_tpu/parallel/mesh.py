"""Device-mesh helpers.

The reference had no distributed capability at all (single process, single
device — SURVEY.md section 2.10); distribution here is first-class and
TPU-idiomatic: one `jax.sharding.Mesh` with two logical axes,

- ``data``  — batch/data parallelism for training and batched encoding,
- ``index`` — corpus-row sharding for the search engine (the workload's real
  scaling axis; per-shard local top-k + all-gather merge rides ICI).

Multi-slice corpora extend the same mesh with a DCN axis; GCS stays the
artifact bus between jobs (reference: docs/architecture/c4-container.md:197-211).
"""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh


def initialize_distributed(
    coordinator_address: str | None = None,
    num_processes: int | None = None,
    process_id: int | None = None,
) -> bool:
    """Multi-host initialization (`jax.distributed.initialize`) for
    multi-slice TPU pods — intra-slice collectives ride ICI, cross-slice
    rides DCN (SURVEY.md 5.8). Arguments default to the standard env vars
    (``SSKD_COORDINATOR`` / ``SSKD_NUM_PROCESSES`` / ``SSKD_PROCESS_ID``; on
    Cloud TPU the runtime autodetects and all three may be omitted).
    Returns True when initialization ran. Single-host runs skip silently.
    """
    import os

    coordinator_address = coordinator_address or os.environ.get("SSKD_COORDINATOR")
    if num_processes is None and "SSKD_NUM_PROCESSES" in os.environ:
        num_processes = int(os.environ["SSKD_NUM_PROCESSES"])
    if process_id is None and "SSKD_PROCESS_ID" in os.environ:
        process_id = int(os.environ["SSKD_PROCESS_ID"])
    if coordinator_address is None and num_processes is None:
        return False
    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes,
        process_id=process_id,
    )
    return True


def mesh_shape_for(
    n_devices: int, data_parallel: int = -1, index_parallel: int = 1
) -> tuple[int, int]:
    """Resolve (data, index) axis sizes. ``data_parallel=-1`` means
    "all devices not used by index_parallel". A mesh smaller than the
    device count is allowed (it occupies the first dp*ip devices)."""
    if index_parallel < 1 or n_devices % index_parallel:
        raise ValueError(
            f"index_parallel={index_parallel} must divide device count {n_devices}"
        )
    if data_parallel == -1:
        data_parallel = n_devices // index_parallel
    if data_parallel * index_parallel > n_devices:
        raise ValueError(
            f"mesh {data_parallel}x{index_parallel} needs more than "
            f"{n_devices} devices"
        )
    return data_parallel, index_parallel


def create_mesh(
    data_parallel: int = -1,
    index_parallel: int = 1,
    data_axis: str = "data",
    index_axis: str = "index",
    devices=None,
) -> Mesh:
    devices = devices if devices is not None else jax.devices()
    dp, ip = mesh_shape_for(len(devices), data_parallel, index_parallel)
    dev_array = np.asarray(devices[: dp * ip]).reshape(dp, ip)
    return Mesh(dev_array, (data_axis, index_axis))
