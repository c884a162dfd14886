"""Word-axis-sharded device feature pool (multi-host map sharding).

The last row of SURVEY.md section 2's distributed table: the map store
itself sharded over a mesh. The pool is a direct-mapped table indexed by
visual-word id (mapping/feature_pool.py — the TPU redesign of
include/local_feature_pool.h:82-131), so the natural shard axis is the
WORD axis: each device owns a contiguous id range [k*V/n, (k+1)*V/n) and
every operation is local except the query gather, which needs one psum of
the per-shard contributions (zeros off-shard).

Semantics are identical to the single-device ops — tests assert exact
equality of the table contents and query results on a virtual mesh and in
the 2-process jax.distributed harness.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding
from jax.sharding import PartitionSpec as P

from .feature_pool import DevicePool

WORD_AXIS = "word"


def shard_pool(pool: DevicePool, mesh: Mesh) -> DevicePool:
    """Place word-indexed arrays across the mesh (vocab size must divide
    by the mesh size — the reference vocabulary is 10*1000, so pad the
    table, not the ids, when it doesn't)."""
    ax = tuple(mesh.axis_names)
    spec = NamedSharding(mesh, P(ax))
    rep = NamedSharding(mesh, P())
    return DevicePool(
        first_seen=jax.device_put(pool.first_seen, spec),
        last_seen=jax.device_put(pool.last_seen, spec),
        num_sightings=jax.device_put(pool.num_sightings, spec),
        coords=jax.device_put(pool.coords, spec),
        window=jax.device_put(pool.window, rep),
    )


def _local_hit(word_ids, table_rows, shard, rows):
    """Boolean hit mask over this shard's rows for a replicated id batch."""
    ok = word_ids >= 0
    local = word_ids - shard * rows
    in_range = ok & (local >= 0) & (local < rows)
    idx = jnp.where(in_range, local, 0)
    return jnp.zeros((table_rows,), bool).at[idx].max(in_range)


@partial(jax.jit, static_argnums=(3,))
def observe_batch(
    pool: DevicePool, word_ids: jnp.ndarray, frame_num, mesh: Mesh
) -> DevicePool:
    """Sharded feature_pool.observe_batch: each shard scatters only the ids
    in its own range; no communication."""
    ax = tuple(mesh.axis_names)
    rows = pool.first_seen.shape[0] // mesh.size

    @partial(
        jax.shard_map,
        mesh=mesh,
        in_specs=(P(ax), P(ax), P(ax), P(), P(), P()),
        out_specs=(P(ax), P(ax), P(ax)),
        check_vma=False,
    )
    def run(first, last, count, ids, frame, window):
        shard = jax.lax.axis_index(ax[0])
        hit = _local_hit(ids, first.shape[0], shard, rows)
        present = last >= 0
        seen_this_frame = last == frame
        first_n = jnp.where(hit & ~present, frame, first)
        last_n = jnp.where(hit, frame, last)
        count_n = jnp.minimum(
            count + (hit & ~seen_this_frame).astype(jnp.int32), window
        )
        return first_n, last_n, count_n

    frame = jnp.asarray(frame_num, jnp.int32)
    first, last, count = run(
        pool.first_seen,
        pool.last_seen,
        pool.num_sightings,
        word_ids,
        frame,
        pool.window,
    )
    return pool._replace(
        first_seen=first, last_seen=last, num_sightings=count
    )


def remove_old(pool: DevicePool, current_frame, mesh: Mesh) -> DevicePool:
    """Elementwise eviction — sharding-preserving, no communication."""
    from . import feature_pool

    # The single-device op is purely elementwise over the word axis; XLA
    # keeps the sharding. Reuse it directly.
    return feature_pool.remove_old(pool, jnp.asarray(current_frame, jnp.int32))


@partial(jax.jit, static_argnums=(2,))
def covisibility_weights(
    pool: DevicePool, word_ids: jnp.ndarray, mesh: Mesh
) -> jnp.ndarray:
    """Sharded feature_pool.covisibility_weights: each shard contributes
    the counts for ids it owns (0 elsewhere); one psum combines."""
    ax = tuple(mesh.axis_names)
    rows = pool.first_seen.shape[0] // mesh.size

    @partial(
        jax.shard_map,
        mesh=mesh,
        in_specs=(P(ax), P()),
        out_specs=P(),
        check_vma=False,
    )
    def run(count, ids):
        shard = jax.lax.axis_index(ax[0])
        local = ids - shard * rows
        in_range = (ids >= 0) & (local >= 0) & (local < rows)
        idx = jnp.where(in_range, local, 0)
        part = jnp.where(in_range, count[idx], 0)
        return jax.lax.psum(part, ax)

    return run(pool.num_sightings, word_ids)
