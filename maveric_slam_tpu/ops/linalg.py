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


def jacobi_eigh(A: jnp.ndarray, sweeps: int = 6):
    """Batched symmetric eigendecomposition via cyclic Jacobi rotations.

    XLA's native eigh lowers to sequential QR iterations that run poorly on
    TPU (measured: it dominates the whole RANSAC step); for the small
    matrices SLAM needs (9x9 normal matrices, 4x4 DLT systems) unrolled
    cyclic Jacobi is pure element-wise VPU work, batched over hypotheses.
    Quadratic convergence: `sweeps`=6 reaches f32 machine precision.

    Returns (w, V) with eigenvalues ascending, A == V diag(w) V^T.
    """
    n = A.shape[-1]
    V = jnp.broadcast_to(jnp.eye(n, dtype=A.dtype), A.shape) + jnp.zeros_like(A)
    # One-hot selectors per pivot pair: lets the rotation use dynamic (p, q)
    # inside lax loops (keeps compile time flat — a fully unrolled
    # sweeps x n(n-1)/2 rotation chain took minutes to compile).
    pairs = jnp.array(
        [(p, q) for p in range(n - 1) for q in range(p + 1, n)], jnp.int32
    )

    def rotate(carry, pq):
        A, V = carry
        p, q = pq[0], pq[1]
        ep = jax.nn.one_hot(p, n, dtype=A.dtype)
        eq = jax.nn.one_hot(q, n, dtype=A.dtype)
        app = jnp.einsum("...ij,i,j->...", A, ep, ep)
        aqq = jnp.einsum("...ij,i,j->...", A, eq, eq)
        apq = jnp.einsum("...ij,i,j->...", A, ep, eq)
        # Stable rotation angle (Golub & Van Loan alg. 8.4.1); sgn(0) := +1.
        safe = jnp.abs(apq) > 1e-30
        tau = (aqq - app) / jnp.where(safe, 2.0 * apq, 1.0)
        sgn = jnp.where(tau >= 0, 1.0, -1.0)
        t = sgn / (jnp.abs(tau) + jnp.sqrt(1.0 + tau * tau))
        t = jnp.where(safe, t, 0.0)
        c = 1.0 / jnp.sqrt(1.0 + t * t)
        s = t * c
        # G = I + (c-1)(ep ep^T + eq eq^T) + s(ep eq^T - eq ep^T).
        G = (
            jnp.eye(n, dtype=A.dtype)
            + (c[..., None, None] - 1.0) * (jnp.outer(ep, ep) + jnp.outer(eq, eq))
            + s[..., None, None] * (jnp.outer(ep, eq) - jnp.outer(eq, ep))
        )
        A = jnp.swapaxes(G, -1, -2) @ A @ G
        V = V @ G
        return (A, V), None

    def sweep(_, carry):
        (A, V), _ = jax.lax.scan(rotate, carry, pairs)
        return (A, V)

    A, V = jax.lax.fori_loop(0, sweeps, sweep, (A, V))

    w = jnp.diagonal(A, axis1=-2, axis2=-1)
    order = jnp.argsort(w, axis=-1)
    w_sorted = jnp.take_along_axis(w, order, axis=-1)
    V_sorted = jnp.take_along_axis(V, order[..., None, :], axis=-1)
    return w_sorted, V_sorted


def cholesky_small(A: jnp.ndarray) -> jnp.ndarray:
    """Unrolled batched Cholesky for small n (compile-time loop nest).

    XLA's native cholesky/solve lower to sequential device loops on TPU;
    for the 9x9 / 6x6 systems SLAM needs, the closed-form recurrence as
    ~n^3/3 fused element-wise ops is both faster and vastly cheaper to
    compile than loop-based alternatives.
    """
    n = A.shape[-1]
    L = [[None] * n for _ in range(n)]
    for i in range(n):
        for j in range(i + 1):
            s = A[..., i, j]
            for k in range(j):
                s = s - L[i][k] * L[j][k]
            if i == j:
                L[i][j] = jnp.sqrt(jnp.maximum(s, 1e-30))
            else:
                L[i][j] = s / L[j][j]
    rows = [
        jnp.stack(
            [L[i][j] if j <= i else jnp.zeros_like(A[..., 0, 0]) for j in range(n)],
            axis=-1,
        )
        for i in range(n)
    ]
    return jnp.stack(rows, axis=-2)


def cholesky_solve_small(L: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """Solve L L^T x = b with unrolled forward/back substitution (batched)."""
    n = L.shape[-1]
    y = [None] * n
    for i in range(n):
        s = b[..., i]
        for k in range(i):
            s = s - L[..., i, k] * y[k]
        y[i] = s / L[..., i, i]
    x = [None] * n
    for i in range(n - 1, -1, -1):
        s = y[i]
        for k in range(i + 1, n):
            s = s - L[..., k, i] * x[k]
        x[i] = s / L[..., i, i]
    return jnp.stack(x, axis=-1)


def smallest_eigvec_inverse_iteration(
    A: jnp.ndarray, iterations: int = 10
) -> jnp.ndarray:
    """Smallest eigenvector of symmetric PSD A via shift-0 inverse power
    iteration with an unrolled Cholesky. Converges at rate (l0/l1)^k —
    instant for near-singular normal matrices (the 8-point nullspace) and
    a handful of iterations otherwise. All element-wise: fast on the VPU
    and fast to compile (measured: the Jacobi/eigh alternatives cost
    minutes of XLA compile inside the fused RANSAC program).
    """
    from .backend import use_tpu_pallas

    if use_tpu_pallas():
        # Single-launch Mosaic kernel (same arithmetic, component-major):
        # as jnp the recurrence compiles to ~350 HLO ops whose chain XLA
        # splits into hundreds of micro-fusions; the tracking tail becomes
        # launch-bound (see ops/pallas_kernels.py).
        from .pallas_kernels import nullspace_inverse_iteration

        return nullspace_inverse_iteration(A, iterations=iterations)
    n = A.shape[-1]
    tr = jnp.trace(A, axis1=-2, axis2=-1)
    delta = 1e-7 * jnp.maximum(tr, 1e-30) / n
    M = A + delta[..., None, None] * jnp.eye(n, dtype=A.dtype)
    L = cholesky_small(M)
    x = jnp.ones(A.shape[:-1], A.dtype) / jnp.sqrt(jnp.asarray(n, A.dtype))
    for _ in range(iterations):
        x = cholesky_solve_small(L, x)
        x = x / jnp.maximum(jnp.linalg.norm(x, axis=-1, keepdims=True), 1e-30)
    return x


def smallest_eigvec_sym(A: jnp.ndarray, refine_steps: int = 0) -> jnp.ndarray:
    """Unit eigenvector for the smallest eigenvalue of symmetric A (...,n,n).

    Used for the 8-point nullspace: the right singular vector of the design
    matrix D for its smallest singular value equals the smallest eigenvector
    of D^T D. (The reference commented this SVD out and forced E = I;
    reference: src/pnp_solver.c:56-85.)

    Uses the batched Jacobi eigensolver: XLA's native f32 eigh both runs
    slowly on TPU and loses ~eps*||A||/gap accuracy on near-degenerate
    two-view data (measured 1.6e-3 nullspace error vs 1.4e-4 for Jacobi).
    Optional shifted inverse-power refinement is kept for extreme cases.
    """
    n = A.shape[-1]
    w, v = jacobi_eigh(A)
    x = v[..., :, 0]
    if refine_steps:
        tr = jnp.trace(A, axis1=-2, axis2=-1)
        shift = w[..., 0] - 1e-6 * tr
        M = A - shift[..., None, None] * jnp.eye(n, dtype=A.dtype)
        for _ in range(refine_steps):
            x = jnp.linalg.solve(M, x[..., :, None])[..., 0]
            x = x / jnp.maximum(jnp.linalg.norm(x, axis=-1, keepdims=True), 1e-30)
    return x
