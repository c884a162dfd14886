"""Batched, branch-free 3x3 SVD for TPU.

The reference carries a scalarized branch-free 3x3 SVD (McAdams et al. 2011,
"Computing the Singular Value Decomposition of 3x3 matrices with minimal
branching and elementary floating point operations"; reference:
include/svd/svd.h:1-447) used for essential-matrix pose recovery
(reference: src/pnp_solver.c:8-25). Here the same *algorithm family* —
fixed-sweep Jacobi eigenanalysis of A^T A followed by explicit orthonormal
reconstruction of U — is re-derived as fully batched jnp ops: every branch is
a `jnp.where`, every iteration count is static, so the whole thing vmaps and
jits onto the VPU with zero divergence.

This is a *signed* SVD: U and V are proper rotations (det=+1) and the sign of
det(A) is carried by the last singular value. |s1| >= |s2| >= |s3| and
A = U @ diag(s) @ V^T exactly. That convention is ideal for pose recovery
(no reflection-R candidates) and harmless for rank-2 projection.
"""

from __future__ import annotations

import jax.numpy as jnp

_EPS = 1e-12

# Jacobi rotation constants (McAdams et al., sec. 2.1).
_GAMMA = 3.0 + 2.0 * jnp.sqrt(2.0)
_COS_PI_8 = jnp.cos(jnp.pi / 8.0)
_SIN_PI_8 = jnp.sin(jnp.pi / 8.0)

_JACOBI_SWEEPS = 6


def _jacobi_rotation(app, aqq, apq, dtype):
    """Approximate Givens angle for the (p,q) Jacobi rotation.

    Returns (c, s) of the rotation that (approximately) annihilates apq.
    Uses the McAdams closed-form test instead of arctan — branch-free.
    """
    ch = 2.0 * (app - aqq)
    sh = apq
    use_big = _GAMMA * sh * sh < ch * ch
    w = jnp.where(
        use_big,
        1.0 / jnp.sqrt(jnp.maximum(ch * ch + sh * sh, _EPS)),
        jnp.zeros_like(ch),
    )
    ch_half = jnp.where(use_big, w * ch, jnp.full_like(ch, _COS_PI_8))
    sh_half = jnp.where(use_big, w * sh, jnp.full_like(sh, _SIN_PI_8))
    # Double-angle: the half-angle quaternion (ch, sh) corresponds to the
    # rotation c = ch^2 - sh^2, s = 2 ch sh (after normalization).
    n = ch_half * ch_half + sh_half * sh_half
    c = (ch_half * ch_half - sh_half * sh_half) / n
    s = (2.0 * ch_half * sh_half) / n
    return c.astype(dtype), s.astype(dtype)


def _apply_jacobi(S, V, p, q):
    """One Jacobi rotation on symmetric S (pivot (p,q)), accumulated into V."""
    dtype = S.dtype
    c, s = _jacobi_rotation(S[..., p, p], S[..., q, q], S[..., p, q], dtype)
    # Build the Givens matrix G (batched identity with the 2x2 rotation).
    G = jnp.zeros_like(S).at[..., 0, 0].set(1.0).at[..., 1, 1].set(1.0).at[..., 2, 2].set(1.0)
    G = G.at[..., p, p].set(c).at[..., q, q].set(c)
    G = G.at[..., p, q].set(-s).at[..., q, p].set(s)
    S_new = jnp.swapaxes(G, -1, -2) @ S @ G
    V_new = V @ G
    return S_new, V_new


def _sort_columns_desc(B, V):
    """Sort columns of B (and V) by descending column norm of B, using
    conditional swaps that preserve det(V) = +1 by negating one column."""
    def norm2(M, i):
        return jnp.sum(M[..., :, i] * M[..., :, i], axis=-1)

    def cond_swap(B, V, i, j):
        do = (norm2(B, i) < norm2(B, j))[..., None]
        bi, bj = B[..., :, i], B[..., :, j]
        vi, vj = V[..., :, i], V[..., :, j]
        # Swap and negate the new j-column to keep orientation.
        B = B.at[..., :, i].set(jnp.where(do, bj, bi))
        B = B.at[..., :, j].set(jnp.where(do, -bi, bj))
        V = V.at[..., :, i].set(jnp.where(do, vj, vi))
        V = V.at[..., :, j].set(jnp.where(do, -vi, vj))
        return B, V

    B, V = cond_swap(B, V, 0, 1)
    B, V = cond_swap(B, V, 0, 2)
    B, V = cond_swap(B, V, 1, 2)
    return B, V


def svd3(A: jnp.ndarray):
    """Signed SVD of batched 3x3 matrices.

    Args:
      A: (..., 3, 3) float array.

    Returns:
      U: (..., 3, 3) rotation (det = +1).
      s: (..., 3) singular values, |s0| >= |s1| >= |s2|; s2 carries sign(det A).
      V: (..., 3, 3) rotation (det = +1).  A == U @ diag(s) @ V^T.

    On TPU dispatches to the single-launch Mosaic kernel
    (ops.pallas_kernels.svd3_pallas, same algorithm in component-major
    layout): as jnp the Jacobi chain compiles to ~350 HLO ops that XLA
    splits into hundreds of micro-fusions, making every svd3 call site
    launch-bound (measured 0.18 ms per call regardless of batch size —
    geometry/epipolar.py's RANSAC pays it once per scoring pass).
    """
    A = jnp.asarray(A)
    from .backend import use_tpu_pallas

    if use_tpu_pallas() and A.dtype == jnp.float32:
        from .pallas_kernels import svd3_pallas

        return svd3_pallas(A, sweeps=_JACOBI_SWEEPS)
    return svd3_ref(A)


def svd3_ref(A: jnp.ndarray):
    """Pure-jnp signed 3x3 SVD (the reference/CPU path of `svd3`)."""
    A = jnp.asarray(A)
    dtype = A.dtype
    S = jnp.swapaxes(A, -1, -2) @ A
    V = jnp.broadcast_to(jnp.eye(3, dtype=dtype), S.shape)
    V = jnp.array(V)  # materialize for .at updates

    for _ in range(_JACOBI_SWEEPS):
        S, V = _apply_jacobi(S, V, 0, 1)
        S, V = _apply_jacobi(S, V, 0, 2)
        S, V = _apply_jacobi(S, V, 1, 2)

    B = A @ V  # columns are orthogonal with norms = singular values
    B, V = _sort_columns_desc(B, V)

    s0 = jnp.linalg.norm(B[..., :, 0], axis=-1)
    s1 = jnp.linalg.norm(B[..., :, 1], axis=-1)

    # u0: first column direction (fallback to e0 for the zero matrix).
    u0 = B[..., :, 0] / jnp.maximum(s0, _EPS)[..., None]
    e0 = jnp.zeros_like(u0).at[..., 0].set(1.0)
    u0 = jnp.where((s0 > 1e-8)[..., None], u0, e0)

    # u1: orthonormalize second column against u0; fall back to an arbitrary
    # vector orthogonal to u0 when the matrix is (near) rank-1.
    b1 = B[..., :, 1]
    b1 = b1 - jnp.sum(b1 * u0, axis=-1, keepdims=True) * u0
    b1_norm = jnp.linalg.norm(b1, axis=-1)
    # Orthogonal completion: cross u0 with the least-aligned axis.
    ax = jnp.abs(u0)
    alt = jnp.where(
        (ax[..., 0:1] <= ax[..., 1:2]) & (ax[..., 0:1] <= ax[..., 2:3]),
        jnp.zeros_like(u0).at[..., 0].set(1.0),
        jnp.where(
            (ax[..., 1:2] <= ax[..., 2:3]),
            jnp.zeros_like(u0).at[..., 1].set(1.0),
            jnp.zeros_like(u0).at[..., 2].set(1.0),
        ),
    )
    alt = jnp.cross(u0, alt)
    alt = alt / jnp.maximum(jnp.linalg.norm(alt, axis=-1, keepdims=True), _EPS)
    u1 = jnp.where(
        (b1_norm > 1e-8)[..., None],
        b1 / jnp.maximum(b1_norm, _EPS)[..., None],
        alt,
    )

    u2 = jnp.cross(u0, u1)  # det(U) = +1 by construction
    # s2 is the (signed) projection of the third column onto u2.
    s2 = jnp.sum(B[..., :, 2] * u2, axis=-1)

    U = jnp.stack([u0, u1, u2], axis=-1)
    s = jnp.stack([s0, s1, s2], axis=-1)
    return U, s, V


def polar_decomposition(A: jnp.ndarray):
    """A = R @ P with R a rotation, P symmetric PSD (reference: svd.h:409-447)."""
    U, s, V = svd3(A)
    R = U @ jnp.swapaxes(V, -1, -2)
    P = V @ (s[..., :, None] * jnp.swapaxes(V, -1, -2))
    return R, P
