"""Pose-only Gauss-Newton PnP refinement (batched, fixed iteration count).

The north-star "PnP tracking as batched Gauss-Newton" (BASELINE.json): given
fixed 3D map points and their 2D observations in a new frame, refine the
camera pose. Residual/Jacobian assembly is one fused einsum pass over all
factors; the 6x6 normal system solves with Cholesky; iterations are a
static-count lax.fori_loop (no data-dependent control flow under jit).
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..ops.lie import se3_exp
from ..ops.linalg import cholesky_small, cholesky_solve_small
from . import projection


class PnPResult(NamedTuple):
    R: jnp.ndarray  # (3, 3)
    t: jnp.ndarray  # (3,)
    cost: jnp.ndarray  # () final robust cost
    num_used: jnp.ndarray  # () int32 factors with weight > 0


@partial(jax.jit, static_argnames=("iterations",))
def refine_pose(
    K: jnp.ndarray,
    R0: jnp.ndarray,
    t0: jnp.ndarray,
    X: jnp.ndarray,  # (N, 3) map points (world/reference frame)
    z: jnp.ndarray,  # (N, 2) observations in the new frame
    mask: jnp.ndarray,  # (N,) bool
    huber_delta: float = 2.0,
    damping: float = 1e-4,
    iterations: int = 8,
) -> PnPResult:
    """Minimize sum_i huber(|pi(R X_i + t) - z_i|) over (R, t)."""

    w_valid = mask.astype(jnp.float32)

    def body(_, state):
        R, t = state
        r, J_pose, _ = projection.residual_and_jacobians(K, R, t, X, z)
        w = projection.huber_weights(r, huber_delta) * w_valid  # (N,)
        # Normal equations: H = sum w J^T J, b = -sum w J^T r.
        H = jnp.einsum("nki,n,nkj->ij", J_pose, w, J_pose)
        b = -jnp.einsum("nki,n,nk->i", J_pose, w, r)
        H = H + damping * jnp.eye(6, dtype=H.dtype)
        # Damped GN H is SPD: unrolled 6x6 Cholesky (straight-line VPU ops)
        # instead of jnp.linalg.solve's LU, which lowers to a long
        # sequential chain inside this device loop.
        xi = cholesky_solve_small(cholesky_small(H), b)
        dR, dt = se3_exp(xi)
        # Left-multiplicative update: T <- exp(xi) T.
        R_new = dR @ R
        t_new = jnp.einsum("ij,j->i", dR, t) + dt
        return (R_new, t_new)

    R, t = jax.lax.fori_loop(0, iterations, body, (R0, t0))
    r, _, _ = projection.residual_and_jacobians(K, R, t, X, z)
    w = projection.huber_weights(r, huber_delta) * w_valid
    cost = jnp.sum(w * jnp.sum(r * r, axis=-1))
    return PnPResult(
        R=R, t=t, cost=cost, num_used=jnp.sum(mask).astype(jnp.int32)
    )
