"""Device-mesh helpers.

Every distributed component is net-new relative to the reference (which is
single-threaded C with no communication backend at all — SURVEY.md section
2); the TPU-native mechanism is a `jax.sharding.Mesh` with XLA collectives
over ICI, initialized once per process. Multi-host runs initialize
jax.distributed before building the mesh.
"""

from __future__ import annotations

from typing import Sequence

import jax
import numpy as np
from jax.sharding import Mesh


LANDMARK_AXIS = "ldmk"


def make_mesh(n_devices: int | None = None, axis: str = LANDMARK_AXIS) -> Mesh:
    """1-D mesh over the landmark axis (the BA sharding axis)."""
    devices = jax.devices()
    if n_devices is not None:
        if len(devices) < n_devices:
            raise ValueError(
                f"requested {n_devices} devices, only {len(devices)} present"
            )
        devices = devices[:n_devices]
    return Mesh(np.array(devices), (axis,))


def maybe_init_distributed() -> None:
    """Initialize jax.distributed from standard env vars if multi-host.

    No-op for single-process runs; on a pod slice each host calls this once
    before any mesh is created (coordinator address comes from the env)."""
    import os

    if os.environ.get("JAX_COORDINATOR_ADDRESS") and jax.process_count() == 1:
        jax.distributed.initialize()
