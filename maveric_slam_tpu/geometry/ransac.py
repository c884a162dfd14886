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
    static_argnames=(
        "num_hypotheses",
        "sample_size",
        "refit_schedule",
        "lo_rounds",
        "refit_rounds",
    ),
)
def ransac_essential(
    key: jax.Array,
    p1: jnp.ndarray,  # (M, 2) normalized points, frame A
    p2: jnp.ndarray,  # (M, 2) normalized points, frame B
    mask: jnp.ndarray,  # (M,) bool — valid correspondences
    inlier_thresh: float,  # Sampson threshold (normalized coords, squared^0.5)
    num_hypotheses: int = 256,
    sample_size: int = 8,
    refit_schedule: tuple = (16.0, 4.0, 1.0),
    lo_rounds: int = 1,
    refit_rounds: int = 2,
) -> RansacResult:
    """Batched RANSAC + annealed consensus refit + cheirality pose recovery.

    The refit uses a shrinking threshold schedule (LO-RANSAC style): the
    winning hypothesis's consensus set is biased toward its own (noisy
    minimal-sample) model, and refitting at 1x threshold can lock into that
    bias; starting wide and annealing recovers the full inlier set (measured
    on synthetic KITTI-like data: 66 -> 106/106 true inliers).

    Latency structure (the whole routine is ~5 dependent stages of tiny ops,
    so wall time is chain depth, not FLOPs): all hypotheses in one batched
    8-point pass; one LO pass of non-minimal resamples; then `refit_rounds`
    passes that each fit the WHOLE threshold schedule as one batched
    weighted solve and keep the best score-improving candidate (replacing
    the reference-style one-threshold-per-pass anneal at a fraction of the
    depth). Sampled (minimal-ish) hypotheses are scored after manifold
    projection — mandatory, see estimate_essential — while the well-seeded
    full-set refits skip it; the winner's final projection shares one svd3
    with pose decomposition.
    """
    m = p1.shape[0]
    thresh2 = inlier_thresh**2

    # --- sample hypotheses (duplicate-free among valid points) ------------
    # Gumbel-top-k per hypothesis: k distinct uniform draws from the valid
    # set in one fixed-shape op (categorical sampling with replacement can
    # hand the 8-point solver <8 distinct rows — a silently wasted, rank-
    # deficient hypothesis). Invalid points stay at -inf and are picked only
    # when fewer than sample_size valid points exist at all.
    logits = jnp.where(mask, 0.0, -jnp.inf)
    keys = jax.random.split(key, num_hypotheses)

    def draw(k):
        g = logits + jax.random.gumbel(k, logits.shape)
        return jax.lax.top_k(g, sample_size)[1]

    idx = jax.vmap(draw)(keys)  # (K, 8) distinct per row

    s1 = p1[idx]  # (K, 8, 2)
    s2 = p2[idx]

    # --- estimate + score all hypotheses (MSAC truncated loss) -------------
    def msac_score(d2):
        # Lower is better: truncated squared Sampson distance.
        return jnp.sum(jnp.where(mask, jnp.minimum(d2, thresh2), 0.0), axis=-1)

    E = epipolar.estimate_essential(s1, s2)  # (K, 3, 3)
    d2 = epipolar.sampson_distance(E, p1[None], p2[None])  # (K, M)
    best = jnp.argmin(msac_score(d2))
    E_best = E[best]
    score_best = msac_score(d2[best])

    # --- LO step: non-minimal hypotheses sampled from the consensus set ----
    # Minimal 8-point solves amplify noise; resampling 16-point subsets of
    # the best hypothesis's inliers averages it out while staying robust to
    # the odd outlier inside the gate (unlike an LS fit on the whole set).
    lo_k = max(num_hypotheses // 4, 16)
    lo_size = 2 * sample_size
    for lo_round in range(lo_rounds):
        d2b = epipolar.sampson_distance(E_best, p1, p2)
        in_gate = (d2b < 4.0 * thresh2) & mask
        lo_logits = jnp.where(in_gate, 0.0, -jnp.inf)
        # Guard against a degenerate gate (all -inf): fall back to `mask`.
        lo_logits = jnp.where(jnp.any(in_gate), lo_logits, logits)
        lo_keys = jax.random.split(jax.random.fold_in(key, 1 + lo_round), lo_k)
        lo_idx = jax.vmap(
            lambda k: jax.lax.top_k(
                lo_logits + jax.random.gumbel(k, lo_logits.shape), lo_size
            )[1]
        )(lo_keys)
        E_lo = epipolar.estimate_essential(p1[lo_idx], p2[lo_idx])  # (K2,3,3)
        d2_lo = epipolar.sampson_distance(E_lo, p1[None], p2[None])
        lo_scores = msac_score(d2_lo)
        lo_best = jnp.argmin(lo_scores)
        improve = lo_scores[lo_best] < score_best
        E_best = jnp.where(improve, E_lo[lo_best], E_best)
        score_best = jnp.where(improve, lo_scores[lo_best], score_best)

    # --- score-guarded, robustly-weighted refit bank ------------------------
    # LS on the consensus set can be poisoned by a few high-leverage
    # outliers inside the gate, and a single tight gate can lock into the
    # minimal-sample model's bias. Fit every gate width of the schedule in
    # ONE batched weighted solve (weights broadcast to (R, M)), with Cauchy
    # downweighting inside the gate, and accept the best scoring candidate
    # only if it improves the MSAC score.
    mults = jnp.asarray(refit_schedule, p1.dtype)[:, None]  # (R, 1)
    for _ in range(refit_rounds):
        d2 = epipolar.sampson_distance(E_best, p1, p2)  # (M,)
        gate = (d2[None] < thresh2 * mults) & mask  # (R, M)
        w = gate * 1.0 / (1.0 + d2[None] / (thresh2 * mults))
        enough = jnp.sum(gate, axis=-1) >= sample_size  # (R,)
        E_refit = epipolar.estimate_essential(
            p1, p2, weights=w.astype(p1.dtype), project=False
        )  # (R, 3, 3)
        d2_new = epipolar.sampson_distance(E_refit, p1[None], p2[None])
        score_new = jnp.where(enough, msac_score(d2_new), jnp.inf)  # (R,)
        rbest = jnp.argmin(score_new)
        accept = score_new[rbest] < score_best
        E_best = jnp.where(accept, E_refit[rbest], E_best)
        score_best = jnp.where(accept, score_new[rbest], score_best)

    # --- project winner + pose (one shared svd3) ----------------------------
    E_proj, R1, R2, t_unit = epipolar.project_and_decompose(E_best)
    d2 = epipolar.sampson_distance(E_proj, p1, p2)
    inliers = (d2 < thresh2) & mask
    R, t, n_good = epipolar.choose_pose_by_cheirality(
        R1, R2, t_unit, p1, p2, weights=inliers
    )
    return RansacResult(
        E=E_proj,
        R=R,
        t=t,
        inliers=inliers,
        num_inliers=jnp.sum(inliers).astype(jnp.int32),
        num_cheirality=n_good.astype(jnp.int32),
    )
