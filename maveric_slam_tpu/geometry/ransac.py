"""Vmapped RANSAC for essential-matrix estimation.

The reference runs 10 sequential iterations with `rand() % n` sampling
(src/pnp_solver.c:110-165). On TPU hypotheses are data-parallel: all K
hypotheses are estimated and scored in one batched pass (K x 8-point solves,
K x M Sampson evaluations — a handful of fused einsums on the MXU), followed
by a weighted refit on the winning consensus set. Everything is fixed-shape;
masked correspondences simply never become inliers.
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp

from . import epipolar


class RansacResult(NamedTuple):
    E: jnp.ndarray  # (3, 3) best essential matrix (after inlier refit)
    R: jnp.ndarray  # (3, 3) recovered rotation (cam1 -> cam2)
    t: jnp.ndarray  # (3,) unit translation
    inliers: jnp.ndarray  # (M,) bool
    num_inliers: jnp.ndarray  # () int32
    num_cheirality: jnp.ndarray  # () int32 points passing depth test


@partial(
    jax.jit,
    static_argnames=("num_hypotheses", "sample_size", "refit_schedule"),
)
def ransac_essential(
    key: jax.Array,
    p1: jnp.ndarray,  # (M, 2) normalized points, frame A
    p2: jnp.ndarray,  # (M, 2) normalized points, frame B
    mask: jnp.ndarray,  # (M,) bool — valid correspondences
    inlier_thresh: float,  # Sampson threshold (normalized coords, squared^0.5)
    num_hypotheses: int = 256,
    sample_size: int = 8,
    refit_schedule: tuple = (16.0, 4.0, 1.0, 1.0),
) -> RansacResult:
    """Batched RANSAC + annealed consensus refit + cheirality pose recovery.

    The refit uses a shrinking threshold schedule (LO-RANSAC style): the
    winning hypothesis's consensus set is biased toward its own (noisy
    minimal-sample) model, and refitting at 1x threshold can lock into that
    bias; starting wide and annealing recovers the full inlier set (measured
    on synthetic KITTI-like data: 66 -> 106/106 true inliers).
    """
    m = p1.shape[0]
    thresh2 = inlier_thresh**2

    # --- sample hypotheses (with replacement among valid points) ----------
    # Bias sampling toward valid entries: draw uniform, then map invalid draws
    # onto valid indices by rejection-free re-indexing (gumbel-top-k over the
    # mask keeps shapes static).
    logits = jnp.where(mask, 0.0, -jnp.inf)
    keys = jax.random.split(key, num_hypotheses)

    def draw(k):
        return jax.random.categorical(k, logits, shape=(sample_size,))

    idx = jax.vmap(draw)(keys)  # (K, 8)

    s1 = p1[idx]  # (K, 8, 2)
    s2 = p2[idx]

    # --- estimate + score all hypotheses ----------------------------------
    E = epipolar.estimate_essential(s1, s2)  # (K, 3, 3)
    d2 = epipolar.sampson_distance(E, p1[None], p2[None])  # (K, M)
    is_in = (d2 < thresh2) & mask[None, :]
    scores = jnp.sum(is_in, axis=-1)  # (K,)
    best = jnp.argmax(scores)
    E_best = E[best]
    inliers = is_in[best]

    # --- annealed weighted refit on the consensus set ---------------------
    for mult in refit_schedule:
        d2 = epipolar.sampson_distance(E_best, p1, p2)
        inliers = (d2 < thresh2 * mult) & mask
        w = inliers.astype(p1.dtype)
        # Guard: keep the current E if the consensus set is degenerate.
        enough = jnp.sum(w) >= sample_size
        E_refit = epipolar.estimate_essential(p1, p2, weights=w)
        E_best = jnp.where(enough, E_refit, E_best)
    d2 = epipolar.sampson_distance(E_best, p1, p2)
    inliers = (d2 < thresh2) & mask

    # --- pose ---------------------------------------------------------------
    R, t, n_good = epipolar.recover_pose(E_best, p1, p2, weights=inliers)
    return RansacResult(
        E=E_best,
        R=R,
        t=t,
        inliers=inliers,
        num_inliers=jnp.sum(inliers).astype(jnp.int32),
        num_cheirality=n_good.astype(jnp.int32),
    )
