"""SO(3)/SE(3) Lie-group operations, batched and branch-free.

Capability parity with the reference's quaternion/SE3 library
(reference: include/types.h:4-23, src/types.c:18-73) and its pose-graph
relinearization numerics (reference: src/run_relin.c:59-151), but written as
vectorized jnp ops with `jnp.where` in place of data-dependent branches so
everything maps cleanly onto the VPU under jit/vmap.

The reference's LogMap has two known defects that are fixed here:
- `w22` was computed as omega1*omega2 instead of omega2^2
  (reference: src/run_relin.c:121),
- the `H[2][0]` accumulation added itself instead of the symmetric term
  (reference: src/run_relin.c:129).
Formulas follow the standard right-Jacobian expressions (Barfoot, "State
Estimation for Robotics", ch. 7); all functions are verified against
scipy.spatial.transform in tests/test_lie.py.

Conventions: quaternions are (w, x, y, z); rotations act on column vectors;
all functions accept arbitrary leading batch dimensions.
"""

from __future__ import annotations

import jax.numpy as jnp

_EPS = 1e-8
# Below this squared angle, use Taylor expansions (all branches are computed
# and selected with `where`, so the cutoff only controls accuracy).
_SMALL_THETA2 = 1e-8


# ---------------------------------------------------------------------------
# Quaternions
# ---------------------------------------------------------------------------

def quat_multiply(q1: jnp.ndarray, q2: jnp.ndarray) -> jnp.ndarray:
    """Hamilton product (reference semantics: src/types.c:18-26)."""
    w1, x1, y1, z1 = jnp.moveaxis(q1, -1, 0)
    w2, x2, y2, z2 = jnp.moveaxis(q2, -1, 0)
    return jnp.stack(
        [
            w1 * w2 - x1 * x2 - y1 * y2 - z1 * z2,
            w1 * x2 + x1 * w2 + y1 * z2 - z1 * y2,
            w1 * y2 - x1 * z2 + y1 * w2 + z1 * x2,
            w1 * z2 + x1 * y2 - y1 * x2 + z1 * w2,
        ],
        axis=-1,
    )


def quat_conjugate(q: jnp.ndarray) -> jnp.ndarray:
    return q * jnp.asarray([1.0, -1.0, -1.0, -1.0], dtype=q.dtype)


def quat_normalize(q: jnp.ndarray) -> jnp.ndarray:
    return q / jnp.maximum(jnp.linalg.norm(q, axis=-1, keepdims=True), _EPS)


def quat_rotate(q: jnp.ndarray, v: jnp.ndarray) -> jnp.ndarray:
    """Rotate vectors by unit quaternions (reference: src/types.c:62-68).

    Uses the expanded 15-mul form rather than two quaternion products.
    """
    w = q[..., :1]
    u = q[..., 1:]
    uv = jnp.cross(u, v)
    return v + 2.0 * (w * uv + jnp.cross(u, uv))


def quat_to_matrix(q: jnp.ndarray) -> jnp.ndarray:
    w, x, y, z = jnp.moveaxis(quat_normalize(q), -1, 0)
    xx, yy, zz = x * x, y * y, z * z
    xy, xz, yz = x * y, x * z, y * z
    wx, wy, wz = w * x, w * y, w * z
    r = jnp.stack(
        [
            1 - 2 * (yy + zz), 2 * (xy - wz), 2 * (xz + wy),
            2 * (xy + wz), 1 - 2 * (xx + zz), 2 * (yz - wx),
            2 * (xz - wy), 2 * (yz + wx), 1 - 2 * (xx + yy),
        ],
        axis=-1,
    )
    return r.reshape(r.shape[:-1] + (3, 3))


def matrix_to_quat(R: jnp.ndarray) -> jnp.ndarray:
    """Branch-free Shepperd's method: compute all four candidate forms and
    select the best-conditioned one with `where` (TPU-friendly)."""
    m00, m01, m02 = R[..., 0, 0], R[..., 0, 1], R[..., 0, 2]
    m10, m11, m12 = R[..., 1, 0], R[..., 1, 1], R[..., 1, 2]
    m20, m21, m22 = R[..., 2, 0], R[..., 2, 1], R[..., 2, 2]
    tr = m00 + m11 + m22

    def _safe_sqrt(x):
        return jnp.sqrt(jnp.maximum(x, _EPS))

    # Candidate 0: w dominant.
    s0 = _safe_sqrt(tr + 1.0) * 2.0
    q0 = jnp.stack([0.25 * s0, (m21 - m12) / s0, (m02 - m20) / s0, (m10 - m01) / s0], -1)
    # Candidate 1: x dominant.
    s1 = _safe_sqrt(1.0 + m00 - m11 - m22) * 2.0
    q1 = jnp.stack([(m21 - m12) / s1, 0.25 * s1, (m01 + m10) / s1, (m02 + m20) / s1], -1)
    # Candidate 2: y dominant.
    s2 = _safe_sqrt(1.0 + m11 - m00 - m22) * 2.0
    q2 = jnp.stack([(m02 - m20) / s2, (m01 + m10) / s2, 0.25 * s2, (m12 + m21) / s2], -1)
    # Candidate 3: z dominant.
    s3 = _safe_sqrt(1.0 + m22 - m00 - m11) * 2.0
    q3 = jnp.stack([(m10 - m01) / s3, (m02 + m20) / s3, (m12 + m21) / s3, 0.25 * s3], -1)

    cond0 = (tr > 0.0)[..., None]
    cond1 = ((m00 > m11) & (m00 > m22))[..., None]
    cond2 = (m11 > m22)[..., None]
    q = jnp.where(cond0, q0, jnp.where(cond1, q1, jnp.where(cond2, q2, q3)))
    return quat_normalize(q)


# ---------------------------------------------------------------------------
# SO(3)
# ---------------------------------------------------------------------------

def hat(omega: jnp.ndarray) -> jnp.ndarray:
    """Skew-symmetric matrix [omega]_x."""
    o1, o2, o3 = omega[..., 0], omega[..., 1], omega[..., 2]
    z = jnp.zeros_like(o1)
    r = jnp.stack([z, -o3, o2, o3, z, -o1, -o2, o1, z], axis=-1)
    return r.reshape(r.shape[:-1] + (3, 3))


def vee(W: jnp.ndarray) -> jnp.ndarray:
    return jnp.stack([W[..., 2, 1], W[..., 0, 2], W[..., 1, 0]], axis=-1)


def so3_exp(omega: jnp.ndarray) -> jnp.ndarray:
    """Rodrigues formula with Taylor fallback near zero."""
    theta2 = jnp.sum(omega * omega, axis=-1)
    theta = jnp.sqrt(jnp.maximum(theta2, _EPS))
    small = theta2 < _SMALL_THETA2
    # sin(t)/t and (1-cos(t))/t^2, with series for small t.
    a = jnp.where(small, 1.0 - theta2 / 6.0, jnp.sin(theta) / theta)
    b = jnp.where(small, 0.5 - theta2 / 24.0, (1.0 - jnp.cos(theta)) / theta2)
    W = hat(omega)
    eye = jnp.broadcast_to(jnp.eye(3, dtype=omega.dtype), W.shape)
    return eye + a[..., None, None] * W + b[..., None, None] * (W @ W)


def so3_log(R: jnp.ndarray) -> jnp.ndarray:
    """Inverse of so3_exp. Mirrors the gtsam-style trace formulation the
    reference sketches (src/run_relin.c:59-85) including the Taylor branch for
    trace near 3 (gtsam issue 746), but batched and branch-free.
    """
    tr = jnp.trace(R, axis1=-2, axis2=-1)
    tr_3 = tr - 3.0
    # Normal branch: theta = acos((tr-1)/2), magnitude = theta / (2 sin theta).
    cos_theta = jnp.clip((tr - 1.0) * 0.5, -1.0, 1.0)
    theta = jnp.arccos(cos_theta)
    sin_theta = jnp.sqrt(jnp.maximum(1.0 - cos_theta * cos_theta, _EPS))
    mag_normal = theta / (2.0 * sin_theta)
    # Near-identity branch (trace near 3): theta ~ 0.
    mag_taylor = 0.5 - tr_3 / 12.0 + tr_3 * tr_3 / 60.0
    near_identity = tr_3 > -1e-6
    magnitude = jnp.where(near_identity, mag_taylor, mag_normal)

    axis = jnp.stack(
        [
            R[..., 2, 1] - R[..., 1, 2],
            R[..., 0, 2] - R[..., 2, 0],
            R[..., 1, 0] - R[..., 0, 1],
        ],
        axis=-1,
    )
    omega = magnitude[..., None] * axis

    # Near theta = pi the antisymmetric part vanishes; recover the axis from
    # the symmetric part instead: R ~ I + (1-cos)[n]_x^2 + sin[n]_x, so
    # n_i^2 = (R_ii - cos) / (1 - cos) and n_i n_j = (R_ij + R_ji) / (2(1-cos)).
    near_pi = cos_theta < -1.0 + 1e-4
    one_minus_cos = jnp.maximum(1.0 - cos_theta, _EPS)
    diag = jnp.stack([R[..., 0, 0], R[..., 1, 1], R[..., 2, 2]], axis=-1)
    n_abs = jnp.sqrt(jnp.maximum((diag - cos_theta[..., None]) / one_minus_cos[..., None], 0.0))
    sxy = R[..., 0, 1] + R[..., 1, 0]
    sxz = R[..., 0, 2] + R[..., 2, 0]
    syz = R[..., 1, 2] + R[..., 2, 1]
    nx, ny, nz = n_abs[..., 0], n_abs[..., 1], n_abs[..., 2]

    def _sgn(x):
        return jnp.where(x < 0, -1.0, 1.0)

    # One candidate per dominant axis (that component taken positive, the
    # others signed via the products n_i n_j), then select branch-free.
    cand_x = jnp.stack([nx, _sgn(sxy) * ny, _sgn(sxz) * nz], axis=-1)
    cand_y = jnp.stack([_sgn(sxy) * nx, ny, _sgn(syz) * nz], axis=-1)
    cand_z = jnp.stack([_sgn(sxz) * nx, _sgn(syz) * ny, nz], axis=-1)
    x_dom = (nx >= ny) & (nx >= nz)
    y_dom = ny >= nz
    n_pi = jnp.where(
        x_dom[..., None], cand_x, jnp.where(y_dom[..., None], cand_y, cand_z)
    )
    # Align the overall sign with the (small but meaningful for theta < pi)
    # antisymmetric part; at exactly pi both signs are valid.
    flip = jnp.sum(n_pi * axis, axis=-1) < 0.0
    n_pi = jnp.where(flip[..., None], -n_pi, n_pi)
    omega_pi = theta[..., None] * n_pi
    return jnp.where(near_pi[..., None], omega_pi, omega)


def so3_left_jacobian(omega: jnp.ndarray) -> jnp.ndarray:
    """J_l(omega): exp((omega+d)^) ~ exp(d_l) exp(omega^), d_l = J_l d."""
    theta2 = jnp.sum(omega * omega, axis=-1)
    theta = jnp.sqrt(jnp.maximum(theta2, _EPS))
    small = theta2 < _SMALL_THETA2
    b = jnp.where(small, 0.5 - theta2 / 24.0, (1.0 - jnp.cos(theta)) / theta2)
    c = jnp.where(
        small,
        1.0 / 6.0 - theta2 / 120.0,
        (theta - jnp.sin(theta)) / (theta2 * theta),
    )
    W = hat(omega)
    eye = jnp.broadcast_to(jnp.eye(3, dtype=omega.dtype), W.shape)
    return eye + b[..., None, None] * W + c[..., None, None] * (W @ W)


def so3_inverse_left_jacobian(omega: jnp.ndarray) -> jnp.ndarray:
    """J_l^{-1}(omega); the relinearization Jacobian the reference attempts
    (src/run_relin.c:135-151, with its w22/H[2][0] bugs fixed).

    J_l^{-1} = I - W/2 + c W^2,  c = 1/theta^2 - (1 + cos)/(2 theta sin).
    """
    theta2 = jnp.sum(omega * omega, axis=-1)
    theta = jnp.sqrt(jnp.maximum(theta2, _EPS))
    small = theta2 < _SMALL_THETA2
    # Half-angle form of 1/theta^2 - (1+cos)/(2 theta sin): stable at theta=pi.
    half = 0.5 * theta
    c = jnp.where(
        small,
        1.0 / 12.0 + theta2 / 720.0,
        1.0 / theta2
        - jnp.cos(half) / (2.0 * theta * jnp.maximum(jnp.sin(half), _EPS)),
    )
    W = hat(omega)
    eye = jnp.broadcast_to(jnp.eye(3, dtype=omega.dtype), W.shape)
    return eye - 0.5 * W + c[..., None, None] * (W @ W)


def so3_right_jacobian(omega: jnp.ndarray) -> jnp.ndarray:
    """J_r(omega) = J_l(-omega)."""
    return so3_left_jacobian(-omega)


def so3_inverse_right_jacobian(omega: jnp.ndarray) -> jnp.ndarray:
    return so3_inverse_left_jacobian(-omega)


# ---------------------------------------------------------------------------
# SE(3) — stored as (R: (...,3,3), t: (...,3)) pairs
# ---------------------------------------------------------------------------

def se3_compose(Ra, ta, Rb, tb):
    """(Ra,ta) * (Rb,tb): first apply b, then a."""
    R = Ra @ Rb
    t = jnp.einsum("...ij,...j->...i", Ra, tb) + ta
    return R, t


def se3_inverse(R, t):
    Rt = jnp.swapaxes(R, -1, -2)
    return Rt, -jnp.einsum("...ij,...j->...i", Rt, t)


def se3_apply(R, t, points):
    """Transform points (...,3) (reference semantics: src/types.c:70-73)."""
    return jnp.einsum("...ij,...j->...i", R, points) + t


def se3_exp(xi: jnp.ndarray):
    """xi = (rho, omega) -> (R, t) with t = J_l(omega) rho."""
    rho, omega = xi[..., :3], xi[..., 3:]
    R = so3_exp(omega)
    t = jnp.einsum("...ij,...j->...i", so3_left_jacobian(omega), rho)
    return R, t


def se3_log(R, t):
    omega = so3_log(R)
    rho = jnp.einsum("...ij,...j->...i", so3_inverse_left_jacobian(omega), t)
    return jnp.concatenate([rho, omega], axis=-1)
