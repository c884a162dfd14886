"""Reprojection residuals and analytic Jacobians.

The reference defines the projection factor but never implements its
Jacobian (reference: src/projection_factor.c:27-33 computes only the error;
include/tracking.h sketches the intent; the BA driver substitutes random
Jacobians, src/local_bundle_adjustment.c:90-96). This module supplies the
real thing, batched over factors: residual r = pi(K, R X + t) - z and
closed-form d r / d xi (pose, se3 right perturbation) and d r / d X
(landmark), the inputs to both pose-only GN (PnP) and full BA.

Pose convention: (R, t) maps world/map points into the camera frame,
p_cam = R X + t. Pose perturbation: R <- R exp([w]_x), t <- t + R dt?  No —
we use the standard left-multiplicative update on the camera-from-world
transform: T <- exp(xi^) T with xi = (dt, dw), which gives the simple
Jacobians d(p_cam)/d(dt) = I, d(p_cam)/d(dw) = -[p_cam]_x.
"""

from __future__ import annotations

from typing import Tuple

import jax.numpy as jnp

from ..ops.lie import hat


def project(K: jnp.ndarray, p_cam: jnp.ndarray) -> jnp.ndarray:
    """Pinhole projection of camera-frame points (..., 3) -> pixels (..., 2).

    (Capability of cam_project/project2d, src/projection_factor.c:12-25.)
    """
    z = jnp.maximum(p_cam[..., 2], 1e-6)
    u = K[0, 0] * p_cam[..., 0] / z + K[0, 2]
    v = K[1, 1] * p_cam[..., 1] / z + K[1, 2]
    return jnp.stack([u, v], axis=-1)


def reprojection_residual(
    K: jnp.ndarray,
    R: jnp.ndarray,
    t: jnp.ndarray,
    X: jnp.ndarray,  # (..., 3) world points
    z: jnp.ndarray,  # (..., 2) observed pixels
) -> jnp.ndarray:
    """r = pi(R X + t) - z (reference: compute_error_ProjectionFactor)."""
    p_cam = jnp.einsum("ij,...j->...i", R, X) + t
    return project(K, p_cam) - z


def residual_and_jacobians(
    K: jnp.ndarray,
    R: jnp.ndarray,
    t: jnp.ndarray,
    X: jnp.ndarray,  # (N, 3)
    z: jnp.ndarray,  # (N, 2)
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Residuals + analytic Jacobians for N factors sharing one pose.

    Returns:
      r: (N, 2)
      J_pose: (N, 2, 6) wrt xi = (dt, dw), T <- exp(xi^) T.
      J_point: (N, 2, 3) wrt the world point X.
    """
    p = jnp.einsum("ij,nj->ni", R, X) + t  # (N, 3) camera-frame
    x, y = p[..., 0], p[..., 1]
    z_ = jnp.maximum(p[..., 2], 1e-6)
    fx, fy = K[0, 0], K[1, 1]
    inv_z = 1.0 / z_

    r = project(K, p) - z

    # d pi / d p_cam: (N, 2, 3)
    zero = jnp.zeros_like(x)
    dpi = jnp.stack(
        [
            jnp.stack([fx * inv_z, zero, -fx * x * inv_z * inv_z], -1),
            jnp.stack([zero, fy * inv_z, -fy * y * inv_z * inv_z], -1),
        ],
        axis=-2,
    )

    # d p_cam / d xi = [I | -[p_cam]_x]: (N, 3, 6)
    eye = jnp.broadcast_to(jnp.eye(3, dtype=p.dtype), p.shape[:-1] + (3, 3))
    dp_dxi = jnp.concatenate([eye, -hat(p)], axis=-1)

    J_pose = dpi @ dp_dxi  # (N, 2, 6)
    J_point = dpi @ R  # (N, 2, 3): d p_cam / d X = R
    return r, J_pose, J_point


def huber_weights(r: jnp.ndarray, delta: float) -> jnp.ndarray:
    """IRLS weights for the Huber loss on per-factor residual norms.

    r: (N, 2). Returns (N,) weights in (0, 1].
    """
    norm = jnp.linalg.norm(r, axis=-1)
    return jnp.where(norm <= delta, 1.0, delta / jnp.maximum(norm, 1e-12))
