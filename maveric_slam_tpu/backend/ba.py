"""Sliding-window bundle adjustment via Schur complement, batched for TPU.

The algorithmic contract of the reference's BA kernel
(src/local_bundle_adjustment.c:128-251): per-factor Hessian blocks
H = J^T J scattered into a landmark block-diagonal A = H_LL, a pose-landmark
B = H_PL, and a reduced pose system C = H_PP; landmarks eliminated per chunk
with the analytic 3x3 block inverse (:50-76, :229) and the Schur update
C -= B A^-1 B^T (:240-245); then Cholesky of C — which the reference left
unimplemented (:86-88) — plus everything else it faked: real reprojection
Jacobians (its J was `initialize_random_matrix`, :90-96), robust weights,
Levenberg damping, the landmark back-substitution, and the state update.

TPU formulation: the factor set is a dense (L, P) grid (every landmark x
every window pose, masked) — exactly the reference's loop nest (:150-226),
but as einsums: H_LL is (L, 3, 3) batched, W = H_PL is (L, P, 6, 3), and the
Schur reduction is one einsum contraction over L that maps onto the MXU.
Landmarks are embarrassingly parallel over L, which is the axis
`parallel.sharded_ba` shards over devices (psum of the reduced system).
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp

from ..geometry import projection
from ..ops.lie import se3_exp
from ..ops.linalg import inv3x3


class BAProblem(NamedTuple):
    """Dense-window BA problem. L landmarks, P poses.

    Poses map world points into each camera: p_cam = R[p] X + t[p].
    """

    K: jnp.ndarray  # (3, 3)
    R: jnp.ndarray  # (P, 3, 3)
    t: jnp.ndarray  # (P, 3)
    X: jnp.ndarray  # (L, 3)
    uv: jnp.ndarray  # (L, P, 2) observations
    mask: jnp.ndarray  # (L, P) bool — observation exists


class BAStats(NamedTuple):
    cost: jnp.ndarray  # per-iteration robust cost, (iters+1,)
    num_factors: jnp.ndarray


def _residuals(problem: BAProblem):
    """All residuals/Jacobians on the dense (L, P) factor grid."""

    def per_pose(R, t):
        return projection.residual_and_jacobians(
            problem.K, R, t, problem.X, jnp.zeros_like(problem.X[..., :2])
        )

    # vmap over poses; z is subtracted after (residual fn is linear in z).
    r0, J_pose, J_point = jax.vmap(per_pose)(problem.R, problem.t)
    # r0: (P, L, 2) with z=0 -> subtract actual observations.
    r = jnp.swapaxes(r0, 0, 1) - problem.uv  # (L, P, 2)
    J_pose = jnp.swapaxes(J_pose, 0, 1)  # (L, P, 2, 6)
    J_point = jnp.swapaxes(J_point, 0, 1)  # (L, P, 2, 3)
    return r, J_pose, J_point


def _robust_weights(r: jnp.ndarray, mask: jnp.ndarray, delta: float) -> jnp.ndarray:
    w = projection.huber_weights(r, delta)
    return jnp.where(mask, w, 0.0)


def _cost(r: jnp.ndarray, w: jnp.ndarray) -> jnp.ndarray:
    return 0.5 * jnp.sum(w * jnp.sum(r * r, axis=-1))


def build_normal_blocks(problem: BAProblem, huber_delta: float):
    """One linearization pass: all Schur ingredients, batched.

    Returns (H_ll, b_l, H_pp, b_p, W, cost):
      H_ll: (L, 3, 3)   landmark diagonal blocks      (reference's A)
      b_l:  (L, 3)
      H_pp: (P, 6, 6)   pose diagonal blocks          (diag of reference's C)
      b_p:  (P, 6)
      W:    (L, P, 6, 3) pose-landmark cross blocks   (reference's B)
    """
    r, Jp, Jl = _residuals(problem)
    w = _robust_weights(r, problem.mask, huber_delta)

    H_ll = jnp.einsum("lpki,lp,lpkj->lij", Jl, w, Jl)
    b_l = -jnp.einsum("lpki,lp,lpk->li", Jl, w, r)
    H_pp = jnp.einsum("lpki,lp,lpkj->pij", Jp, w, Jp)
    b_p = -jnp.einsum("lpki,lp,lpk->pi", Jp, w, r)
    W = jnp.einsum("lpki,lp,lpkj->lpij", Jp, w, Jl)
    return H_ll, b_l, H_pp, b_p, W, _cost(r, w)


def reduce_schur(H_ll, b_l, H_pp, b_p, W, damping: float):
    """Eliminate landmarks: reduced pose system (S, rhs) + A^-1 blocks.

    The batched form of the reference's chunk loop: analytic damped 3x3
    inverses (local_bundle_adjustment.c:50-84) and the Schur update
    C -= B A^-1 B^T (:232-245) as one einsum over all landmarks.
    """
    p = H_pp.shape[0]
    A_inv = inv3x3(H_ll, damping=damping)  # (L, 3, 3)
    # S = diag(H_pp) - sum_l W A^-1 W^T, with LM damping on the diagonal.
    S_off = -jnp.einsum("lpij,ljk,lqmk->pqim", W, A_inv, W)
    S = S_off.at[jnp.arange(p), jnp.arange(p)].add(
        H_pp + damping * jnp.eye(6, dtype=H_pp.dtype)
    )
    rhs = b_p - jnp.einsum("lpij,ljk,lk->pi", W, A_inv, b_l)
    return S, rhs, A_inv


def solve_reduced(S, rhs, gauge_weight: float = 1e8, num_anchored: int = 1):
    """Solve the reduced pose system with gauge priors on the first
    `num_anchored` poses (2 anchors additionally pin the monocular scale).

    (The Cholesky the reference skipped, src/local_bundle_adjustment.c:86-88.)
    """
    p = S.shape[0]
    for a in range(num_anchored):
        S = S.at[a, a].add(gauge_weight * jnp.eye(6, dtype=S.dtype))
    S_flat = jnp.swapaxes(S, 1, 2).reshape(p * 6, p * 6)
    rhs_flat = rhs.reshape(p * 6)
    L = jnp.linalg.cholesky(S_flat)
    y = jax.scipy.linalg.solve_triangular(L, rhs_flat[:, None], lower=True)
    dx = jax.scipy.linalg.solve_triangular(L.T, y, lower=False)[:, 0]
    return dx.reshape(p, 6)


def back_substitute(A_inv, b_l, W, dx_p):
    """Landmark updates: dx_l = A^-1 (b_l - W^T dx_p)."""
    Wt_dxp = jnp.einsum("lpij,pi->lj", W, dx_p)
    return jnp.einsum("lij,lj->li", A_inv, b_l - Wt_dxp)


def apply_update(problem: BAProblem, dx_p, dx_l) -> BAProblem:
    dR, dt = se3_exp(dx_p)  # (P, 3, 3), (P, 3)
    R_new = dR @ problem.R
    t_new = jnp.einsum("pij,pj->pi", dR, problem.t) + dt
    return problem._replace(R=R_new, t=t_new, X=problem.X + dx_l)


@partial(jax.jit, static_argnames=("iterations", "num_anchored"))
def bundle_adjust(
    problem: BAProblem,
    iterations: int = 10,
    damping: float = 1e-4,
    huber_delta: float = 2.0,
    num_anchored: int = 1,
) -> Tuple[BAProblem, BAStats]:
    """Damped Gauss-Newton with Schur elimination, fixed iteration count."""

    def body(carry, _):
        prob = carry
        H_ll, b_l, H_pp, b_p, W, cost = build_normal_blocks(prob, huber_delta)
        # Scale-aware LM damping: proportional to the mean diagonal.
        lam_l = damping * jnp.maximum(
            jnp.mean(jnp.trace(H_ll, axis1=-2, axis2=-1)) / 3.0, 1e-6
        )
        S, rhs, A_inv = reduce_schur(H_ll, b_l, H_pp, b_p, W, lam_l)
        dx_p = solve_reduced(S, rhs, num_anchored=num_anchored)
        dx_l = back_substitute(A_inv, b_l, W, dx_p)
        new_prob = apply_update(prob, dx_p, dx_l)
        # Reject steps that increase the cost (simple LM fallback).
        r_new, _, _ = _residuals(new_prob)
        w_new = _robust_weights(r_new, prob.mask, huber_delta)
        new_cost = _cost(r_new, w_new)
        accept = new_cost < cost
        prob_out = jax.tree.map(
            lambda a, b: jnp.where(accept, a, b), new_prob, prob
        )
        return prob_out, cost

    final, costs = jax.lax.scan(body, problem, None, length=iterations)
    r, _, _ = _residuals(final)
    w = _robust_weights(r, final.mask, huber_delta)
    final_cost = _cost(r, w)
    return final, BAStats(
        cost=jnp.concatenate([costs, final_cost[None]]),
        num_factors=jnp.sum(final.mask).astype(jnp.int32),
    )
