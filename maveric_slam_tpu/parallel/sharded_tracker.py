"""Data-parallel multi-stream tracking over a device mesh.

The multi-stream tracker (frontend.tracker.track_step_batched) vmaps S
independent odometry streams through one program; here the stream axis is
sharded over mesh devices, so each chip tracks S/n streams with zero
cross-chip communication (streams are independent by construction — the
"data-parallel frame/feature batching" row of SURVEY.md section 2's
distributed table). Sharding is expressed with NamedSharding on the inputs
and propagated by XLA through the whole step: SuperPoint convs, windowed
matching, RANSAC, and GN refine all partition along the batch axis.
"""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding
from jax.sharding import PartitionSpec as P

from ..frontend import tracker as trk

STREAM_AXIS = "stream"


def make_stream_mesh(n_devices: int | None = None) -> Mesh:
    devices = jax.devices()
    if n_devices is not None:
        devices = devices[:n_devices]
    return Mesh(np.array(devices), (STREAM_AXIS,))


def shard_streams(states: trk.TrackerState, images, mesh: Mesh):
    """Place batched tracker state + images stream-sharded on the mesh.

    The leading (stream) axis of every state leaf and of images must be
    divisible by the mesh size."""
    spec = NamedSharding(mesh, P(STREAM_AXIS))
    states = jax.tree.map(lambda x: jax.device_put(x, spec), states)
    images = jax.device_put(images, spec)
    return states, images


def replicate_params(params, mesh: Mesh):
    rep = NamedSharding(mesh, P())
    return jax.tree.map(lambda x: jax.device_put(x, rep), params)


def track_step_sharded(params, states, images, config):
    """One tracking step for all streams; runs S/n streams per device.

    `params` must be replicated and `states`/`images` stream-sharded
    (shard_streams). This is the same jitted program as
    track_step_batched — XLA partitions it along the stream axis from the
    input shardings. Per-stream results match the unsharded run
    geometrically; the partitioned executable may tile float reductions
    differently (per-device batch S/n vs S), giving ~1e-5 jitter."""
    return trk.track_step_batched(params, states, images, config)
