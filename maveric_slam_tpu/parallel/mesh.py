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
    """Initialize jax.distributed from env vars if multi-host.

    No-op for single-process runs; on a pod slice each host calls this once
    before any mesh is created. Configuration:

    - JAX_COORDINATOR_ADDRESS: host:port of process 0 (required to engage).
    - JAX_NUM_PROCESSES / JAX_PROCESS_ID: explicit topology. When absent,
      jax.distributed.initialize() auto-detects (TPU pod metadata).

    The explicit path is what the multi-process CPU tests use
    (tests/test_multihost.py): N processes x M virtual devices each,
    collectives crossing process boundaries over gRPC — the same code path
    a DCN-connected pod uses, minus the wire."""
    import os

    addr = os.environ.get("JAX_COORDINATOR_ADDRESS")
    # NB: must not query jax.process_count() here — that initializes the
    # XLA backend, after which jax.distributed.initialize() refuses to run.
    if not addr or jax.distributed.is_initialized():
        return
    nproc = os.environ.get("JAX_NUM_PROCESSES")
    pid = os.environ.get("JAX_PROCESS_ID")
    if nproc is not None and pid is not None:
        jax.distributed.initialize(
            coordinator_address=addr,
            num_processes=int(nproc),
            process_id=int(pid),
        )
    else:
        jax.distributed.initialize(coordinator_address=addr)


def global_mesh(axis: str = LANDMARK_AXIS) -> Mesh:
    """1-D mesh over ALL global devices (multi-host aware).

    After maybe_init_distributed, jax.devices() enumerates every process's
    devices; the mesh spans them so shard_map collectives reduce over
    ICI within a host and DCN across hosts."""
    return Mesh(np.array(jax.devices()), (axis,))
