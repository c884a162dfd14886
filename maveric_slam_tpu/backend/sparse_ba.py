"""Sparse factor-list bundle adjustment (TPU scatter-add formulation).

The dense window solver (backend.ba) linearizes every (landmark, pose)
cell of the (L, P) grid and masks the absent ones — the right shape when
observation density is high (short windows, aggressive track selection).
At realistic densities (~35% in KITTI-style windows, round-2 verdict #9)
two thirds of that Jacobian work is thrown away. This module keeps the
factor list explicit, the way the reference's loop nest walks it
(src/local_bundle_adjustment.c:150-226: `for ldmk in chunk, for pose in
P`), but batched TPU-style:

- factors are a fixed-capacity (F,) list of (landmark, pose, uv, valid);
- residual + Jacobians are computed per factor (gather - vmap - no waste);
- the Schur ingredients are assembled with masked scatter-adds into the
  same (L,3,3)/(L,P,6,3)/(P,6,6) blocks the dense path uses, after which
  elimination/solve/back-substitution are literally backend.ba's
  functions.

Same arithmetic per factor => solutions match the dense solver to
reduction-order tolerance (tests/test_ba.py::TestSparseBA).

MEASUREMENT (v5e, 1024x8 window, 35% density, BENCH_ALL.json): the dense
masked grid solves at 0.66 ms/iter vs 1.61 ms/iter for this factor list —
the dense einsums map straight onto the MXU while the factor list pays
for gathers + scatter-adds, and the ratio is density-independent (both
scale with L*P at fixed density). On TPU the "wasteful" dense
formulation IS the fast one at SLAM-window sizes; this module documents
the trade and serves very-low-density regimes (density << 10%) where the
Jacobian work dominates the scatters.
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..geometry import projection
from . import ba


class SparseBAProblem(NamedTuple):
    """Factor-list BA problem. L landmarks, P poses, F factor capacity.

    Invalid factor slots carry f_l = f_p = 0 with valid = False; they
    contribute zero through the robust weight.
    """

    K: jnp.ndarray  # (3, 3)
    R: jnp.ndarray  # (P, 3, 3)
    t: jnp.ndarray  # (P, 3)
    X: jnp.ndarray  # (L, 3)
    f_l: jnp.ndarray  # (F,) int32 landmark index per factor
    f_p: jnp.ndarray  # (F,) int32 pose index per factor
    uv: jnp.ndarray  # (F, 2) observations
    valid: jnp.ndarray  # (F,) bool


def from_dense(problem: ba.BAProblem, capacity: int | None = None) -> SparseBAProblem:
    """Enumerate the dense problem's observed cells into a factor list
    (host-side; capacity defaults to the observation count rounded up to a
    multiple of 128 for lane alignment)."""
    mask = np.asarray(problem.mask)
    l_idx, p_idx = np.nonzero(mask)
    n = l_idx.size
    if capacity is None:
        capacity = max(128, -(-n // 128) * 128)
    if n > capacity:
        raise ValueError(f"{n} factors exceed capacity {capacity}")
    f_l = np.zeros((capacity,), np.int32)
    f_p = np.zeros((capacity,), np.int32)
    uv = np.zeros((capacity, 2), np.float32)
    valid = np.zeros((capacity,), bool)
    f_l[:n] = l_idx
    f_p[:n] = p_idx
    uv[:n] = np.asarray(problem.uv)[l_idx, p_idx]
    valid[:n] = True
    return SparseBAProblem(
        K=jnp.asarray(problem.K),
        R=jnp.asarray(problem.R),
        t=jnp.asarray(problem.t),
        X=jnp.asarray(problem.X),
        f_l=jnp.asarray(f_l),
        f_p=jnp.asarray(f_p),
        uv=jnp.asarray(uv),
        valid=jnp.asarray(valid),
    )


def _factor_residuals(problem: SparseBAProblem):
    """Per-factor residual (F, 2) + Jacobians (F, 2, 6) / (F, 2, 3)."""
    X_f = problem.X[problem.f_l]
    R_f = problem.R[problem.f_p]
    t_f = problem.t[problem.f_p]

    def one(R, t, X, z):
        r, J_pose, J_point = projection.residual_and_jacobians(
            problem.K, R, t, X[None], z[None]
        )
        return r[0], J_pose[0], J_point[0]

    return jax.vmap(one)(R_f, t_f, X_f, problem.uv)


def _assemble(problem: SparseBAProblem, huber_delta: float):
    """Scatter-add the factor list into the dense Schur ingredient blocks
    (identical block definitions to ba.build_normal_blocks)."""
    r, Jp, Jl = _factor_residuals(problem)
    w = jnp.where(problem.valid, projection.huber_weights(r, huber_delta), 0.0)

    L = problem.X.shape[0]
    P = problem.R.shape[0]
    H_ll = jnp.zeros((L, 3, 3), r.dtype).at[problem.f_l].add(
        jnp.einsum("fki,f,fkj->fij", Jl, w, Jl)
    )
    b_l = jnp.zeros((L, 3), r.dtype).at[problem.f_l].add(
        -jnp.einsum("fki,f,fk->fi", Jl, w, r)
    )
    H_pp = jnp.zeros((P, 6, 6), r.dtype).at[problem.f_p].add(
        jnp.einsum("fki,f,fkj->fij", Jp, w, Jp)
    )
    b_p = jnp.zeros((P, 6), r.dtype).at[problem.f_p].add(
        -jnp.einsum("fki,f,fk->fi", Jp, w, r)
    )
    W = jnp.zeros((L, P, 6, 3), r.dtype).at[problem.f_l, problem.f_p].add(
        jnp.einsum("fki,f,fkj->fij", Jp, w, Jl)
    )
    cost = 0.5 * jnp.sum(w * jnp.sum(r * r, axis=-1))
    return H_ll, b_l, H_pp, b_p, W, cost


@partial(jax.jit, static_argnames=("iterations", "num_anchored"))
def bundle_adjust(
    problem: SparseBAProblem,
    iterations: int = 10,
    damping: float = 1e-4,
    huber_delta: float = 2.0,
    num_anchored: int = 1,
) -> Tuple[SparseBAProblem, jnp.ndarray]:
    """Damped GN over the factor list; elimination/solve reuse backend.ba.

    Returns (solved problem, per-iteration cost with the final appended).
    """

    def body(carry, _):
        prob = carry
        H_ll, b_l, H_pp, b_p, W, cost = _assemble(prob, huber_delta)
        lam_l = damping * jnp.maximum(
            jnp.mean(jnp.trace(H_ll, axis1=-2, axis2=-1)) / 3.0, 1e-6
        )
        S, rhs, A_inv = ba.reduce_schur(H_ll, b_l, H_pp, b_p, W, lam_l)
        dx_p = ba.solve_reduced(S, rhs, num_anchored=num_anchored)
        dx_l = ba.back_substitute(A_inv, b_l, W, dx_p)
        from ..ops.lie import se3_exp

        dRm, dtv = se3_exp(dx_p)
        R_new = dRm @ prob.R
        t_new = jnp.einsum("pij,pj->pi", dRm, prob.t) + dtv
        new_prob = prob._replace(R=R_new, t=t_new, X=prob.X + dx_l)
        r_new, _, _ = _factor_residuals(new_prob)
        w_new = jnp.where(
            new_prob.valid, projection.huber_weights(r_new, huber_delta), 0.0
        )
        new_cost = 0.5 * jnp.sum(w_new * jnp.sum(r_new * r_new, axis=-1))
        accept = new_cost < cost
        prob_out = jax.tree.map(
            lambda a, b: jnp.where(accept, a, b), new_prob, prob
        )
        return prob_out, cost

    final, costs = jax.lax.scan(body, problem, None, length=iterations)
    r, _, _ = _factor_residuals(final)
    w = jnp.where(final.valid, projection.huber_weights(r, huber_delta), 0.0)
    final_cost = 0.5 * jnp.sum(w * jnp.sum(r * r, axis=-1))
    return final, jnp.concatenate([costs, final_cost[None]])
