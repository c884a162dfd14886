"""Loop-closure candidate detection: BoW frame database + scoring.

Capability of the reference's lcd_main.c (:52-74): count shared visual
words between the current frame and every stored frame. The reference's
merge-join over sorted id lists becomes a single (F, vocab) x (vocab,)
int8 matvec on the MXU against a TPU-resident multi-hot database — exactly
the "BoW scoring kernel" the north star names. Fixed capacity, masked;
candidate gating (recency, minimum score) is part of the query.
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp


class LoopDatabase(NamedTuple):
    """Fixed-capacity BoW database (device-resident).

    The ring stores the *frame number* of each slot so recency gating and
    slot -> frame resolution stay correct after the cursor wraps (slot
    arithmetic breaks as soon as more frames than slots have been seen).
    """

    multihot: jnp.ndarray  # (F, V) int8 — 1 where frame contains word
    counts: jnp.ndarray  # (F,) int32 number of distinct words per frame
    frames: jnp.ndarray  # (F,) int32 frame number stored in slot (-1 empty)
    valid: jnp.ndarray  # (F,) bool
    next_slot: jnp.ndarray  # () int32 ring-buffer cursor


def create_database(max_frames: int, vocab_size: int) -> LoopDatabase:
    return LoopDatabase(
        multihot=jnp.zeros((max_frames, vocab_size), jnp.int8),
        counts=jnp.zeros((max_frames,), jnp.int32),
        frames=jnp.full((max_frames,), -1, jnp.int32),
        valid=jnp.zeros((max_frames,), bool),
        next_slot=jnp.int32(0),
    )


@jax.jit
def add_frame(
    db: LoopDatabase, word_ids: jnp.ndarray, frame: jnp.ndarray
) -> LoopDatabase:
    """Insert a frame's word set (word_ids < 0 are ignored; duplicates
    collapse, matching the reference's set semantics lcd_main.c:29-35)."""
    v = db.multihot.shape[1]
    ok = word_ids >= 0
    safe = jnp.where(ok, word_ids, 0)
    row = jnp.zeros((v,), jnp.int8).at[safe].max(ok.astype(jnp.int8))
    slot = db.next_slot
    return LoopDatabase(
        multihot=db.multihot.at[slot].set(row),
        counts=db.counts.at[slot].set(jnp.sum(row.astype(jnp.int32))),
        frames=db.frames.at[slot].set(jnp.asarray(frame, jnp.int32)),
        valid=db.valid.at[slot].set(True),
        next_slot=(slot + 1) % db.multihot.shape[0],
    )


class LoopCandidates(NamedTuple):
    scores: jnp.ndarray  # (F,) shared-word counts (the reference's metric)
    normalized: jnp.ndarray  # (F,) score / min(|words_a|, |words_b|)
    best: jnp.ndarray  # () int32 best candidate slot (-1 if none)
    best_frame: jnp.ndarray  # () int32 frame number in the best slot (-1)
    best_score: jnp.ndarray  # () float32 normalized score of best


@partial(jax.jit, static_argnames=("min_frame_gap",))
def query(
    db: LoopDatabase,
    word_ids: jnp.ndarray,
    current_frame: jnp.ndarray,
    min_frame_gap: int = 50,
    min_score: float = 0.05,
) -> LoopCandidates:
    """Score the current frame against the whole database in one matvec.

    current_frame: the querying frame's *frame number*; stored frames within
    min_frame_gap of it are excluded (recent frames trivially share words).
    Gating compares stored frame numbers, not slot indices, so it survives
    ring wraparound.
    """
    v = db.multihot.shape[1]
    ok = word_ids >= 0
    safe = jnp.where(ok, word_ids, 0)
    qrow = jnp.zeros((v,), jnp.int8).at[safe].max(ok.astype(jnp.int8))

    # MXU matvec: shared-word counts against every stored frame.
    scores = jax.lax.dot_general(
        db.multihot,
        qrow[:, None],
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32,
    )[:, 0]

    qcount = jnp.sum(qrow.astype(jnp.int32))
    denom = jnp.maximum(jnp.minimum(db.counts, qcount), 1)
    normalized = scores.astype(jnp.float32) / denom.astype(jnp.float32)

    recent = db.frames > current_frame - min_frame_gap
    eligible = db.valid & ~recent
    masked = jnp.where(eligible, normalized, -1.0)
    best = jnp.argmax(masked).astype(jnp.int32)
    best_score = masked[best]
    found = best_score >= min_score
    return LoopCandidates(
        scores=jnp.where(eligible, scores, 0),
        normalized=jnp.where(eligible, normalized, 0.0),
        best=jnp.where(found, best, -1),
        best_frame=jnp.where(found, db.frames[best], -1),
        best_score=jnp.where(found, best_score, 0.0),
    )
