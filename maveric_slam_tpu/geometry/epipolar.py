"""Essential-matrix estimation and pose recovery, batched for TPU.

Implements — properly — what the reference stubbed or got wrong:
- the 8-point nullspace solve (reference commented out its 9x9 SVD and
  forced E = I, src/pnp_solver.c:56-85); here it is a batched eigen-solve of
  the 9x9 normal matrix, one per RANSAC hypothesis under vmap.
- pose recovery R = U W V^T (the reference dropped the V^T factor,
  src/pnp_solver.c:183-188) with proper-rotation guarantees from the signed
  svd3, +-t disambiguation by cheirality (the reference had none).
- Sampson distance for inlier scoring (the reference's `||E p1 - p2||^2`,
  src/pnp_solver.c:89-105, is not a geometric error).

Conventions: points are in *normalized camera coordinates* (K^-1 applied);
E satisfies p2^T E p1 = 0; recovered (R, t) maps cam1 points to cam2:
p2 ~ R p1 + t (the cv2.recoverPose convention of the golden pipeline,
python/pairwise_pnp.py:678).
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp

from ..ops.linalg import smallest_eigvec_inverse_iteration, smallest_eigvec_sym
from ..ops.svd3 import svd3


def normalize_points(points: jnp.ndarray, K: jnp.ndarray) -> jnp.ndarray:
    """Pixel -> normalized camera coordinates (reference: pnp_solver.c:28-34)."""
    fx, fy = K[0, 0], K[1, 1]
    cx, cy = K[0, 2], K[1, 2]
    return jnp.stack(
        [(points[..., 0] - cx) / fx, (points[..., 1] - cy) / fy], axis=-1
    )


def eight_point_design(p1: jnp.ndarray, p2: jnp.ndarray) -> jnp.ndarray:
    """Design matrix rows for p2^T E p1 = 0 (reference: pnp_solver.c:38-51).

    p1, p2: (..., M, 2) normalized points. Returns (..., M, 9).
    """
    x1, y1 = p1[..., 0], p1[..., 1]
    x2, y2 = p2[..., 0], p2[..., 1]
    one = jnp.ones_like(x1)
    return jnp.stack(
        [x2 * x1, x2 * y1, x2, y2 * x1, y2 * y1, y2, x1, y1, one], axis=-1
    )


def estimate_essential(
    p1: jnp.ndarray,
    p2: jnp.ndarray,
    weights: jnp.ndarray | None = None,
    project: bool = True,
    nullspace_iters: int = 10,
) -> jnp.ndarray:
    """Least-squares essential matrix from M >= 8 correspondences.

    Solves the 8-point nullspace via eigh of A^T A (exact equivalent of the
    smallest right singular vector of A) and projects to the essential
    manifold (rank 2, equal singular values) with svd3.

    p1, p2: (..., M, 2); weights: optional (..., M) for masked/weighted fits
    (weights broadcast against the design matrix, so a (R, M) stack against
    (M, 2) points yields R fits in one batched solve).
    Returns E: (..., 3, 3).

    project=False skips the essential-manifold projection: svd3 is a ~0.18 ms
    sequential scalar chain on TPU regardless of batch size. Only safe for
    well-seeded non-minimal fits: on small-baseline data the design matrix
    acquires a near-null antisymmetric subspace (p2 ~ p1 makes x1^T E x1 = 0
    for any skew E), and an unprojected minimal-sample nullspace mixed into
    that subspace scores a fake-perfect Sampson error. Minimal hypotheses
    must be scored projected.
    """
    if not project and p1.shape[-2] <= 8:
        # Machine-check of the docstring's invariant (trace-time, free):
        # a minimal 8-point sample fit must be projected before scoring —
        # its unprojected nullspace can mix into the small-baseline
        # antisymmetric subspace and score a fake-perfect Sampson error.
        raise ValueError(
            "estimate_essential(project=False) requires a non-minimal fit "
            f"(got M={p1.shape[-2]} <= 8 correspondences); minimal-sample "
            "hypotheses must be scored on the projected E"
        )
    A = eight_point_design(p1, p2)
    if weights is not None:
        A = A * weights[..., None]
    AtA = jnp.einsum("...mi,...mj->...ij", A, A)
    e = smallest_eigvec_inverse_iteration(AtA, iterations=nullspace_iters)
    E = e.reshape(e.shape[:-1] + (3, 3))
    if not project:
        return E
    # Project: singular values -> (1, 1, 0).
    U, s, V = svd3(E)
    d = jnp.zeros_like(s).at[..., 0].set(1.0).at[..., 1].set(1.0)
    return U @ (d[..., :, None] * jnp.swapaxes(V, -1, -2))


def sampson_distance(E: jnp.ndarray, p1: jnp.ndarray, p2: jnp.ndarray) -> jnp.ndarray:
    """First-order geometric (Sampson) distance, squared.

    E: (..., 3, 3); p1, p2: (..., M, 2) normalized. Returns (..., M).
    """
    ones = jnp.ones_like(p1[..., :1])
    x1 = jnp.concatenate([p1, ones], axis=-1)  # (..., M, 3)
    x2 = jnp.concatenate([p2, ones], axis=-1)
    Ex1 = jnp.einsum("...ij,...mj->...mi", E, x1)
    Etx2 = jnp.einsum("...ji,...mj->...mi", E, x2)
    num = jnp.einsum("...mi,...mi->...m", x2, Ex1) ** 2
    den = (
        Ex1[..., 0] ** 2 + Ex1[..., 1] ** 2 + Etx2[..., 0] ** 2 + Etx2[..., 1] ** 2
    )
    return num / jnp.maximum(den, 1e-12)


def triangulate(
    R: jnp.ndarray,
    t: jnp.ndarray,
    p1: jnp.ndarray,
    p2: jnp.ndarray,
    method: str = "midpoint",
) -> jnp.ndarray:
    """Two-view triangulation for cameras P1 = [I|0], P2 = [R|t].

    R: (..., 3, 3), t: (..., 3), p1/p2: (..., M, 2) normalized.
    Returns X: (..., M, 3) in camera-1 coordinates.

    method="midpoint" (default): closed-form ray midpoint — a 2x2 solve in
    pure element-wise ops, ~400x faster on TPU than the DLT eigen-solve and
    equally good for cheirality voting and VO scale. method="dlt": the
    classic linear 4x4 system (slightly better reprojection under noise;
    used by BA initialization tests).
    """
    if method == "midpoint":
        return _triangulate_midpoint(R, t, p1, p2)
    return _triangulate_dlt(R, t, p1, p2)


def _triangulate_midpoint(R, t, p1, p2):
    ones1 = jnp.ones_like(p1[..., :1])
    a = jnp.concatenate([p1, ones1], axis=-1)  # cam1 ray dirs, (..., M, 3)
    # Cam2 ray direction and origin expressed in cam1 coordinates:
    # x_cam2 = R x_cam1 + t  =>  origin c2 = -R^T t, dir b = R^T [p2;1].
    ones2 = jnp.ones_like(p2[..., :1])
    d2 = jnp.concatenate([p2, ones2], axis=-1)
    b = jnp.einsum("...ji,...mj->...mi", R, d2)
    c2 = -jnp.einsum("...ji,...j->...i", R, t)[..., None, :]  # (..., 1, 3)

    # Closest points on the two rays: min_{s,u} |s a - (c2 + u b)|^2.
    aa = jnp.sum(a * a, axis=-1)
    bb = jnp.sum(b * b, axis=-1)
    ab = jnp.sum(a * b, axis=-1)
    ac = jnp.sum(a * c2, axis=-1)
    bc = jnp.sum(b * c2, axis=-1)
    den = aa * bb - ab * ab
    den = jnp.where(jnp.abs(den) < 1e-12, 1e-12, den)
    s = (ac * bb - bc * ab) / den
    u = (ac * ab - bc * aa) / den
    mid = 0.5 * (s[..., None] * a + c2 + u[..., None] * b)
    return mid


def _triangulate_dlt(R, t, p1, p2):
    batch = R.shape[:-2]
    m = p1.shape[-2]
    P2 = jnp.concatenate([R, t[..., :, None]], axis=-1)  # (..., 3, 4)
    P2 = jnp.broadcast_to(P2[..., None, :, :], batch + (m, 3, 4))

    x1, y1 = p1[..., 0], p1[..., 1]
    x2, y2 = p2[..., 0], p2[..., 1]
    # P1 rows are trivial: r0 = [1,0,0,0], r1 = [0,1,0,0], r2 = [0,0,1,0].
    zeros = jnp.zeros_like(x1)
    ones = jnp.ones_like(x1)
    rowA = jnp.stack([-ones, zeros, x1, zeros], axis=-1)  # x1 * r2 - r0
    rowB = jnp.stack([zeros, -ones, y1, zeros], axis=-1)  # y1 * r2 - r1
    rowC = x2[..., None] * P2[..., 2, :] - P2[..., 0, :]
    rowD = y2[..., None] * P2[..., 2, :] - P2[..., 1, :]
    A = jnp.stack([rowA, rowB, rowC, rowD], axis=-2)  # (..., M, 4, 4)
    AtA = jnp.einsum("...ki,...kj->...ij", A, A)
    Xh = smallest_eigvec_inverse_iteration(AtA)  # (..., M, 4)
    w = Xh[..., 3]
    sign = jnp.where(jnp.abs(w) < 1e-12, 1.0, jnp.sign(w))
    w = jnp.where(jnp.abs(w) < 1e-12, 1e-12, w)
    return Xh[..., :3] / w[..., None] * 1.0


def decompose_essential(E: jnp.ndarray):
    """E -> two rotation candidates + unit translation (reference capability:
    src/pnp_solver.c:168-194, with the missing V^T fixed).

    Returns (R1, R2, t): R = U W^(T) V^T are proper rotations because svd3
    yields det(U) = det(V) = +1 and det(W) = +1.
    """
    U, s, V = svd3(E)
    W = jnp.array([[0.0, -1.0, 0.0], [1.0, 0.0, 0.0], [0.0, 0.0, 1.0]], E.dtype)
    Vt = jnp.swapaxes(V, -1, -2)
    R1 = U @ W @ Vt
    R2 = U @ W.T @ Vt
    t = U[..., :, 2]
    return R1, R2, t


def project_and_decompose(E: jnp.ndarray):
    """One svd3 shared between manifold projection and pose decomposition.

    Returns (E_proj, R1, R2, t): the rank-2 equal-singular-value projection
    of E plus the two rotation candidates and unit translation. Used by
    RANSAC so the final winner pays a single svd3 chain instead of one for
    the projection and another inside decompose_essential.
    """
    U, s, V = svd3(E)
    Vt = jnp.swapaxes(V, -1, -2)
    d = jnp.zeros_like(s).at[..., 0].set(1.0).at[..., 1].set(1.0)
    E_proj = U @ (d[..., :, None] * Vt)
    W = jnp.array([[0.0, -1.0, 0.0], [1.0, 0.0, 0.0], [0.0, 0.0, 1.0]], E.dtype)
    R1 = U @ W @ Vt
    R2 = U @ W.T @ Vt
    t = U[..., :, 2]
    return E_proj, R1, R2, t


def choose_pose_by_cheirality(
    R1: jnp.ndarray,
    R2: jnp.ndarray,
    t: jnp.ndarray,
    p1: jnp.ndarray,
    p2: jnp.ndarray,
    weights: jnp.ndarray | None = None,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Pick among the 4 (R, +-t) candidates by positive-depth voting."""
    cands_R = jnp.stack([R1, R1, R2, R2], axis=0)  # (4, ..., 3, 3)
    cands_t = jnp.stack([t, -t, t, -t], axis=0)

    def count_good(R, tt):
        X = triangulate(R, tt, p1, p2)  # (..., M, 3)
        z1 = X[..., 2]
        z2 = jnp.einsum("...ij,...mj->...mi", R, X)[..., 2] + tt[..., None, 2]
        good = (z1 > 0) & (z2 > 0)
        if weights is not None:
            good = good & (weights > 0)
        return jnp.sum(good, axis=-1)

    counts = jax.vmap(count_good)(cands_R, cands_t)  # (4, ...)
    best = jnp.argmax(counts, axis=0)
    R = jnp.take_along_axis(
        cands_R, best[None, ..., None, None].astype(jnp.int32), axis=0
    )[0]
    t_best = jnp.take_along_axis(
        cands_t, best[None, ..., None].astype(jnp.int32), axis=0
    )[0]
    n_good = jnp.take_along_axis(counts, best[None, ...], axis=0)[0]
    return R, t_best, n_good


def recover_pose(
    E: jnp.ndarray,
    p1: jnp.ndarray,
    p2: jnp.ndarray,
    weights: jnp.ndarray | None = None,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Choose among the 4 (R, +-t) candidates by cheirality voting.

    For each candidate, triangulates all correspondences and counts points
    with positive depth in both cameras (cv2.recoverPose semantics).

    Returns (R, t_unit, num_good). Batched over leading dims of E.
    """
    R1, R2, t = decompose_essential(E)
    return choose_pose_by_cheirality(R1, R2, t, p1, p2, weights)


def essential_from_pose(R: jnp.ndarray, t: jnp.ndarray) -> jnp.ndarray:
    """E = [t]_x R for p2 = R p1 + t."""
    from ..ops.lie import hat

    return hat(t) @ R
