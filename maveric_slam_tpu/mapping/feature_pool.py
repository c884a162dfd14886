"""TPU-resident feature pool (structure-of-arrays, masked scatter updates).

The reference keeps its map bookkeeping in a host hash map
(include/local_feature_pool.h); the TPU-native redesign (SURVEY.md section 7,
"Map/track store") is a *direct-mapped* fixed-capacity table indexed by
visual-word id — the word id is a perfect hash into [0, vocab_size), so
probing disappears entirely and every operation is a batched gather/scatter:

- observe_batch: one masked scatter-max per frame,
- remove_old: one vectorized compare,
- covisibility / recency queries: pure elementwise reductions.

Note the semantic simplification vs the host pool: the device table keeps
(first_seen, last_seen, num_sightings) rather than the full 8-deep ring of
sighting frames — enough for the age-out policy and covisibility weights,
and O(1) memory per word. The full-ring variant lives in the native C++
runtime (runtime/pool.py) for host-side use.
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp


class DevicePool(NamedTuple):
    first_seen: jnp.ndarray  # (V,) int32, -1 when absent
    last_seen: jnp.ndarray  # (V,) int32
    num_sightings: jnp.ndarray  # (V,) int32 (capped at window)
    coords: jnp.ndarray  # (V, 3) float32 optional 3-D anchor
    window: jnp.ndarray  # () int32 age-out window


def create(vocab_size: int, window: int = 8) -> DevicePool:
    return DevicePool(
        first_seen=jnp.full((vocab_size,), -1, jnp.int32),
        last_seen=jnp.full((vocab_size,), -1, jnp.int32),
        num_sightings=jnp.zeros((vocab_size,), jnp.int32),
        coords=jnp.zeros((vocab_size, 3), jnp.float32),
        window=jnp.int32(window),
    )


@jax.jit
def observe_batch(
    pool: DevicePool, word_ids: jnp.ndarray, frame_num: jnp.ndarray
) -> DevicePool:
    """Record sightings for one frame (word_ids < 0 ignored)."""
    ok = word_ids >= 0
    idx = jnp.where(ok, word_ids, 0)
    # Whole-table hit mask: duplicate ids in the batch collapse, invalid ids
    # never touch the table (a scatter of per-entry values would race on
    # duplicates; a boolean scatter-max cannot).
    hit = jnp.zeros(pool.last_seen.shape, bool).at[idx].max(ok)
    present = pool.last_seen >= 0
    seen_this_frame = pool.last_seen == frame_num
    return pool._replace(
        first_seen=jnp.where(hit & ~present, frame_num, pool.first_seen),
        last_seen=jnp.where(hit, frame_num, pool.last_seen),
        num_sightings=jnp.minimum(
            pool.num_sightings + (hit & ~seen_this_frame).astype(jnp.int32),
            pool.window,
        ),
    )


@jax.jit
def remove_old(pool: DevicePool, current_frame: jnp.ndarray) -> DevicePool:
    """Evict words last seen before (current_frame - window + 1)."""
    stale = (pool.last_seen >= 0) & (
        pool.last_seen < current_frame - pool.window + 1
    )
    return pool._replace(
        first_seen=jnp.where(stale, -1, pool.first_seen),
        last_seen=jnp.where(stale, -1, pool.last_seen),
        num_sightings=jnp.where(stale, 0, pool.num_sightings),
    )


@jax.jit
def size(pool: DevicePool) -> jnp.ndarray:
    return jnp.sum(pool.last_seen >= 0).astype(jnp.int32)


@jax.jit
def covisibility_weights(pool: DevicePool, word_ids: jnp.ndarray) -> jnp.ndarray:
    """Sighting counts for a query set (0 for absent/invalid ids)."""
    ok = word_ids >= 0
    idx = jnp.where(ok, word_ids, 0)
    return jnp.where(ok, pool.num_sightings[idx], 0)


@jax.jit
def check_invariant(pool: DevicePool, current_frame: jnp.ndarray) -> jnp.ndarray:
    """0 when consistent (mirrors the reference's checker as a reduction):
    bit 1 = stale survivor, bit 2 = first>last, bit 4 = count/presence
    mismatch."""
    present = pool.last_seen >= 0
    stale = present & (pool.last_seen < current_frame - pool.window + 1)
    order = present & (pool.first_seen > pool.last_seen)
    count = (present & (pool.num_sightings < 1)) | (
        ~present & (pool.num_sightings != 0)
    )
    return (
        jnp.any(stale).astype(jnp.int32)
        + 2 * jnp.any(order).astype(jnp.int32)
        + 4 * jnp.any(count).astype(jnp.int32)
    )
