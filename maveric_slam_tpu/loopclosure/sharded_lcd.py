"""Frame-axis-sharded loop-closure database query.

At production scale the BoW database outgrows one chip's HBM appetite long
before vocabulary does ((F, V) int8 grows linearly in mapped area); the
TPU-native answer is to shard the *frame* axis over the mesh: each device
scores its own slice of stored frames with the same MXU matvec as
loopclosure.lcd.query, then a single tiny all_gather of per-shard winners
resolves the global argmax. Communication per query: n * 4 scalars.

This is the "multi-host map sharding" row of SURVEY.md section 2's
distributed table applied to the LCD store (seed:
include/local_feature_pool.h:82 — the reference's only map container).
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding
from jax.sharding import PartitionSpec as P

from .lcd import LoopDatabase

FRAME_AXIS = "lcdf"


def shard_database(db: LoopDatabase, mesh: Mesh) -> LoopDatabase:
    """Shard all frame-indexed arrays over the mesh (ring capacity must be
    divisible by the mesh size)."""
    ax = tuple(mesh.axis_names)
    spec = NamedSharding(mesh, P(ax))
    rep = NamedSharding(mesh, P())
    return LoopDatabase(
        multihot=jax.device_put(db.multihot, spec),
        counts=jax.device_put(db.counts, spec),
        frames=jax.device_put(db.frames, spec),
        valid=jax.device_put(db.valid, spec),
        next_slot=jax.device_put(db.next_slot, rep),
    )


@partial(jax.jit, static_argnums=(3,))
def sharded_add_frame(
    db: LoopDatabase, word_ids: jnp.ndarray, frame, mesh: Mesh
) -> LoopDatabase:
    """lcd.add_frame on a frame-axis-sharded database: the ring slot lives
    on exactly one shard, which writes the multi-hot row locally; the
    cursor is replicated. No communication."""
    ax = tuple(mesh.axis_names)
    rows = db.multihot.shape[0] // mesh.size

    @partial(
        jax.shard_map,
        mesh=mesh,
        in_specs=(P(ax), P(ax), P(ax), P(ax), P(), P(), P()),
        out_specs=(P(ax), P(ax), P(ax), P(ax), P()),
        check_vma=False,
    )
    def run(multihot, counts, frames, valid, ids, frame_num, slot):
        v = multihot.shape[1]
        ok = ids >= 0
        safe = jnp.where(ok, ids, 0)
        row = jnp.zeros((v,), jnp.int8).at[safe].max(ok.astype(jnp.int8))
        shard = jax.lax.axis_index(ax[0])
        local = slot - shard * rows
        mine = (local >= 0) & (local < rows)
        idx = jnp.where(mine, local, 0)
        multihot = multihot.at[idx].set(
            jnp.where(mine, row, multihot[idx])
        )
        counts = counts.at[idx].set(
            jnp.where(mine, jnp.sum(row.astype(jnp.int32)), counts[idx])
        )
        frames = frames.at[idx].set(jnp.where(mine, frame_num, frames[idx]))
        valid = valid.at[idx].set(jnp.where(mine, True, valid[idx]))
        next_slot = (slot + 1) % (rows * jax.lax.psum(1, ax[0]))
        return multihot, counts, frames, valid, next_slot

    multihot, counts, frames, valid, next_slot = run(
        db.multihot,
        db.counts,
        db.frames,
        db.valid,
        word_ids,
        jnp.asarray(frame, jnp.int32),
        db.next_slot,
    )
    return LoopDatabase(
        multihot=multihot,
        counts=counts,
        frames=frames,
        valid=valid,
        next_slot=next_slot,
    )


class ShardedLoopResult(NamedTuple):
    best: jnp.ndarray  # () int32 global slot of best candidate (-1 none)
    best_frame: jnp.ndarray  # () int32 frame number of best (-1 none)
    best_score: jnp.ndarray  # () float32 normalized score


@partial(jax.jit, static_argnums=(2, 4, 5))
def sharded_query(
    db: LoopDatabase,
    word_ids: jnp.ndarray,
    mesh: Mesh,
    current_frame: jnp.ndarray,
    min_frame_gap: int = 50,
    min_score: float = 0.05,
) -> ShardedLoopResult:
    """Same candidate semantics as lcd.query, distributed over the mesh."""
    ax = tuple(mesh.axis_names)
    rows_per_shard = db.multihot.shape[0] // mesh.size

    @partial(
        jax.shard_map,
        mesh=mesh,
        in_specs=(P(ax), P(ax), P(ax), P(ax), P(), P()),
        out_specs=(P(), P(), P()),
        check_vma=False,
    )
    def run(multihot, counts, frames, valid, qrow, cur):
        scores = jax.lax.dot_general(
            multihot,
            qrow[:, None],
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.int32,
        )[:, 0]
        qcount = jnp.sum(qrow.astype(jnp.int32))
        denom = jnp.maximum(jnp.minimum(counts, qcount), 1)
        normalized = scores.astype(jnp.float32) / denom.astype(jnp.float32)
        recent = frames > cur - min_frame_gap
        eligible = valid & ~recent
        masked = jnp.where(eligible, normalized, -1.0)
        i = jnp.argmax(masked).astype(jnp.int32)
        shard = jax.lax.axis_index(ax[0]).astype(jnp.int32)
        local = jnp.stack(
            [
                masked[i],
                (shard * rows_per_shard + i).astype(jnp.float32),
                frames[i].astype(jnp.float32),
            ]
        )
        # Tiny all_gather of per-shard winners; every device resolves the
        # global argmax redundantly (cheaper than a reduction tree at n<=64).
        allb = jax.lax.all_gather(local, ax[0])  # (n, 3)
        w = jnp.argmax(allb[:, 0])
        return allb[w, 0], allb[w, 1], allb[w, 2]

    v = db.multihot.shape[1]
    ok = word_ids >= 0
    safe = jnp.where(ok, word_ids, 0)
    qrow = jnp.zeros((v,), jnp.int8).at[safe].max(ok.astype(jnp.int8))

    score, slot_f, frame_f = run(
        db.multihot,
        db.counts,
        db.frames,
        db.valid,
        qrow,
        jnp.asarray(current_frame, jnp.int32),
    )
    found = score >= min_score
    return ShardedLoopResult(
        best=jnp.where(found, slot_f.astype(jnp.int32), -1),
        best_frame=jnp.where(found, frame_f.astype(jnp.int32), -1),
        best_score=jnp.where(found, score, 0.0),
    )
