"""Pose-graph relinearization numerics.

Batched between-factor residuals and Jacobians — the real version of the
reference's `run_relin.c`, which sketches SO(3) LogMap local-coordinate
Jacobians with Taylor-series trig (run_relin.c:5-57) but carries two math
bugs (w22 and the H[2][0] self-add, :121, :129) and an incomplete `Local()`
(:135-151). Here the correct closed forms live in ops.lie
(so3_inverse_left_jacobian), and the SE(3) between-factor Jacobians are
taken exactly via forward-mode autodiff of the boxplus-perturbed residual —
12 dual evaluations of cheap Lie ops, fully batched and TPU-fused.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp

from ..ops import lie


def between_residual(
    R_i: jnp.ndarray,
    t_i: jnp.ndarray,
    R_j: jnp.ndarray,
    t_j: jnp.ndarray,
    R_meas: jnp.ndarray,
    t_meas: jnp.ndarray,
) -> jnp.ndarray:
    """r = Log( T_meas^-1 * T_i^-1 * T_j )  (6,) — zero when T_ij == T_meas.

    Poses are world-from-camera (T_w_ci); the measurement is T_ci_cj
    (j expressed in i). Batched over leading dims.
    """
    Ri_inv, ti_inv = lie.se3_inverse(R_i, t_i)
    R_ij, t_ij = lie.se3_compose(Ri_inv, ti_inv, R_j, t_j)
    Rm_inv, tm_inv = lie.se3_inverse(R_meas, t_meas)
    R_err, t_err = lie.se3_compose(Rm_inv, tm_inv, R_ij, t_ij)
    return lie.se3_log(R_err, t_err)


def between_residual_jacobians(
    R_i, t_i, R_j, t_j, R_meas, t_meas
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Residual + exact Jacobians wrt left-multiplicative perturbations of
    T_i and T_j (the same boxplus used by the BA/PnP solvers).

    Returns r (..., 6), J_i (..., 6, 6), J_j (..., 6, 6).
    """

    def r_of(xi_i, xi_j, R_i, t_i, R_j, t_j, R_meas, t_meas):
        dRi, dti = lie.se3_exp(xi_i)
        dRj, dtj = lie.se3_exp(xi_j)
        Ri2, ti2 = lie.se3_compose(dRi, dti, R_i, t_i)
        Rj2, tj2 = lie.se3_compose(dRj, dtj, R_j, t_j)
        return between_residual(Ri2, ti2, Rj2, tj2, R_meas, t_meas)

    zeros = jnp.zeros(R_i.shape[:-2] + (6,), R_i.dtype)

    def single(z_i, z_j, R_i, t_i, R_j, t_j, R_meas, t_meas):
        r = r_of(z_i, z_j, R_i, t_i, R_j, t_j, R_meas, t_meas)
        Ji = jax.jacfwd(r_of, argnums=0)(z_i, z_j, R_i, t_i, R_j, t_j, R_meas, t_meas)
        Jj = jax.jacfwd(r_of, argnums=1)(z_i, z_j, R_i, t_i, R_j, t_j, R_meas, t_meas)
        return r, Ji, Jj

    if R_i.ndim == 2:
        return single(zeros, zeros, R_i, t_i, R_j, t_j, R_meas, t_meas)
    return jax.vmap(single)(zeros, zeros, R_i, t_i, R_j, t_j, R_meas, t_meas)


def so3_local_jacobian(R: jnp.ndarray) -> jnp.ndarray:
    """d Log(exp(w^) R) / d w at w = 0 — the matrix the reference's
    `Local()` was computing (run_relin.c:135-151), done right:
    J = J_l^{-1}(Log(R))."""
    omega = lie.so3_log(R)
    return lie.so3_inverse_left_jacobian(omega)
