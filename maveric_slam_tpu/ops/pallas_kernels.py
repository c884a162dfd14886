"""Pallas TPU kernels for the per-frame hot loop.

Hand-fused kernels for two different bottlenecks:

- The detector post-processing that the reference runs as scalar C loops
  (src/top_N.c) and that the jnp path expresses as several XLA ops: one
  VMEM-resident pass computes, per cell, the approximate Taylor softmax
  with negative-logit skipping, the winning channel + probability, and the
  3x3-neighborhood soft-argmax sub-pixel keypoint.
- The tiny-matrix linear algebra inside RANSAC (the 8-point nullspace
  solve the reference stubbed out entirely, src/pnp_solver.c:56-85): as
  jnp, the unrolled Cholesky + inverse-iteration recurrence compiles to
  ~350 HLO instructions whose dependency chain XLA splits into hundreds of
  micro-fusions — the tracking tail becomes kernel-LAUNCH bound, not
  compute bound. The Pallas version runs the whole recurrence inside ONE
  kernel in component-major layout ((n*n, B): each of the n^2 matrix
  entries is a full 128-lane vector over the batch), so the serial scalar
  chain becomes a single launch of pure VPU work.

The jnp implementations (ops.softmax_topn, ops.linalg) remain the
reference/CPU path; tests assert agreement (bit-level for the detector,
same-arithmetic tolerance for the solvers).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .softmax_topn import DUSTBIN, FLT_MIN


def _detector_kernel(scale_ref, semi_ref, probs_ref, idx_ref, xy_ref, *, degree, grid_w):
    scale = scale_ref[0, 0]
    semi = semi_ref[:]  # (C, 65) int8
    x = semi.astype(jnp.float32)
    nonneg = x >= 0.0

    # Taylor exp, bit-identical to the scalar reference (top_N.c:61-65).
    acc = jnp.ones_like(x)
    scale_poly = jnp.float32(1.0)
    x_poly = x
    for i in range(1, degree):
        scale_poly = scale_poly * scale / i
        acc = acc + scale_poly * x_poly
        x_poly = x_poly * x
    expx = jnp.where(nonneg, acc, 0.0)  # (C, 65)

    denom = jnp.sum(expx, axis=-1, keepdims=True) + FLT_MIN  # (C, 1)
    point = expx[:, :DUSTBIN]  # (C, 64)
    max_exp = jnp.max(point, axis=-1, keepdims=True)
    # First-max tie-break, explicitly: Mosaic's argmax lowering returns the
    # LAST maximal index on ties, while the jnp/XLA reference (and the
    # scalar C loop, top_N.c:78 `>` scan) keep the FIRST — the approx-exp
    # values are frequently exactly equal across neighboring channels, so
    # plain argmax diverged on 85/1920 real-frame cells (tools/tpu_parity).
    chan = jax.lax.broadcasted_iota(jnp.int32, point.shape, 1)
    arg = jnp.min(
        jnp.where(point == max_exp, chan, DUSTBIN), axis=-1, keepdims=True
    )
    has = max_exp > 0.0
    idx = jnp.where(has, arg, DUSTBIN)
    probs = jnp.where(has, max_exp / denom, -1.0)

    # Sub-pixel soft-argmax over the 3x3 channel neighborhood of the winner.
    c = point.shape[0]
    ix = jax.lax.broadcasted_iota(jnp.int32, (c, DUSTBIN), 1) % 8
    iy = jax.lax.broadcasted_iota(jnp.int32, (c, DUSTBIN), 1) // 8
    wx = idx % 8
    wy = idx // 8
    near = (jnp.abs(ix - wx) <= 1) & (jnp.abs(iy - wy) <= 1)
    p3 = jnp.where(near, point, 0.0)
    den3 = jnp.maximum(jnp.sum(p3, axis=-1, keepdims=True), 1e-20)
    ex = jnp.sum(p3 * ix.astype(jnp.float32), axis=-1, keepdims=True) / den3
    ey = jnp.sum(p3 * iy.astype(jnp.float32), axis=-1, keepdims=True) / den3

    cell = jax.lax.broadcasted_iota(jnp.int32, (c, 1), 0)
    col = (cell % grid_w).astype(jnp.float32)
    row = (cell // grid_w).astype(jnp.float32)

    probs_ref[:] = probs
    idx_ref[:] = idx
    xy_ref[:, 0:1] = col * 8.0 + ex
    xy_ref[:, 1:2] = row * 8.0 + ey


@partial(jax.jit, static_argnames=("degree", "grid_w", "interpret"))
def fused_detector_postproc(
    semi_q: jnp.ndarray,  # (num_cells, 65) int8, row-major cells
    scale,
    degree: int = 5,
    grid_w: int = 80,
    interpret: bool = False,
):
    """Fused approx-softmax + argmax + sub-pixel refinement.

    Returns (probs (C,), indices (C,), xy (C, 2)) matching
    softmax_topn.approx_softmax_grid + subpixel_xy.
    """
    c = semi_q.shape[0]
    scale_arr = jnp.asarray(scale, jnp.float32).reshape(1, 1)
    probs, idx, xy = pl.pallas_call(
        partial(_detector_kernel, degree=degree, grid_w=grid_w),
        out_shape=(
            jax.ShapeDtypeStruct((c, 1), jnp.float32),
            jax.ShapeDtypeStruct((c, 1), jnp.int32),
            jax.ShapeDtypeStruct((c, 2), jnp.float32),
        ),
        in_specs=[
            pl.BlockSpec((1, 1), memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ),
        interpret=interpret,
    )(scale_arr, semi_q)
    return probs[:, 0], idx[:, 0], xy


def _match_kernel(
    desc1_ref, desc0_ref, probs0_ref, indices0_ref, cells1_ref,
    score_ref, best_ref,
    *, grid_h, grid_w, shift, radius, min_prob, signed,
):
    """Fused windowed int8 match: dot/norms on the MXU + masking + argmax,
    no (N, cells) f32 intermediate ever leaving VMEM."""
    q1 = desc1_ref[:].astype(jnp.float32)  # (N, 256) — selected new descs
    d0 = desc0_ref[:].astype(jnp.float32)  # (C, 256)

    dots = jax.lax.dot_general(
        q1, d0.T, dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # (N, C)
    n1 = jnp.sum(q1 * q1, axis=-1, keepdims=True)  # (N, 1)
    n0 = jnp.sum(d0 * d0, axis=-1)[None, :]  # (1, C)
    denom = jnp.maximum(n1 * n0, 1.0)
    cos2 = dots * dots / denom
    if signed:
        cos2 = jnp.where(dots > 0, cos2, 0.0)

    n = q1.shape[0]
    c = d0.shape[0]
    cells1 = cells1_ref[:]  # (N, 1) int32
    row1 = cells1 // grid_w
    col1 = cells1 % grid_w
    cid = jax.lax.broadcasted_iota(jnp.int32, (n, c), 1)
    row0 = cid // grid_w
    col0 = cid % grid_w
    in_window = (jnp.abs(row0 - (row1 + shift[1])) <= radius) & (
        jnp.abs(col0 - (col1 + shift[0])) <= radius
    )
    cell_ok = (indices0_ref[:][:, 0] != 64) & (probs0_ref[:][:, 0] >= min_prob)
    score = jnp.where(in_window & cell_ok[None, :], cos2, -1.0)

    best = jnp.argmax(score, axis=-1)[:, None].astype(jnp.int32)
    best_score = jnp.max(score, axis=-1, keepdims=True)
    score_ref[:] = best_score
    best_ref[:] = best


@partial(
    jax.jit,
    static_argnames=("grid_h", "grid_w", "shift", "radius", "min_prob", "signed", "interpret"),
)
def fused_windowed_match(
    desc1_sel: jnp.ndarray,  # (N, 256) int8 — new-frame selected descriptors
    desc0: jnp.ndarray,  # (C, 256) int8 — previous frame full grid
    probs0: jnp.ndarray,  # (C,)
    indices0: jnp.ndarray,  # (C,)
    cells1: jnp.ndarray,  # (N,)
    grid_h: int,
    grid_w: int,
    shift=(0, 0),
    radius: int = 4,
    min_prob: float = 0.1,
    signed: bool = True,
    interpret: bool = False,
):
    """Returns (best_score (N,), best_cell (N,)) for each query feature."""
    n = desc1_sel.shape[0]
    score, best = pl.pallas_call(
        partial(
            _match_kernel,
            grid_h=grid_h, grid_w=grid_w, shift=shift, radius=radius,
            min_prob=min_prob, signed=signed,
        ),
        out_shape=(
            jax.ShapeDtypeStruct((n, 1), jnp.float32),
            jax.ShapeDtypeStruct((n, 1), jnp.int32),
        ),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ),
        interpret=interpret,
    )(
        desc1_sel,
        desc0,
        probs0[:, None],
        indices0[:, None].astype(jnp.int32),
        cells1[:, None].astype(jnp.int32),
    )
    return score[:, 0], best[:, 0]


# --------------------------------------------------------------------------- #
# Batched tiny-matrix solvers (component-major, single kernel launch)
# --------------------------------------------------------------------------- #

# Lane-tile for the component-major solvers: each grid step processes
# (n_components, _SOLVER_TILE_B) — 81 x 2048 f32 = 648 KiB for the 9x9
# nullspace, far under the ~16 MiB VMEM budget — so arbitrarily large
# hypotheses x points batches tile over the grid instead of hitting a
# Mosaic whole-array VMEM compile error.
_SOLVER_TILE_B = 2048


def _solver_tiling(b: int):
    """(tile_b, padded_b, grid) for a component-major (comp, b) problem."""
    tb = min(b, _SOLVER_TILE_B)
    padded = -(-b // tb) * tb
    return tb, padded, padded // tb

def _nullspace_kernel(ata_ref, x_ref, *, n, iters):
    """Smallest eigenvector of B symmetric PSD n x n matrices.

    ata_ref: (n*n, B) component-major; x_ref out: (n, B). Same arithmetic as
    ops.linalg.smallest_eigvec_inverse_iteration (unrolled Cholesky of the
    trace-shifted matrix + `iters` solve/normalize rounds), with each matrix
    component a (1, B) lane vector, so every scalar line of the recurrence
    is one VPU op over the whole batch and the entire solve is one launch.
    """
    A = [
        [ata_ref[i * n + j : i * n + j + 1, :] for j in range(n)]
        for i in range(n)
    ]
    tr = A[0][0]
    for i in range(1, n):
        tr = tr + A[i][i]
    delta = 1e-7 * jnp.maximum(tr, 1e-30) / n

    L = [[None] * n for _ in range(n)]
    for i in range(n):
        for j in range(i + 1):
            s = A[i][j] + delta if i == j else A[i][j]
            for k in range(j):
                s = s - L[i][k] * L[j][k]
            if i == j:
                L[i][j] = jnp.sqrt(jnp.maximum(s, 1e-30))
            else:
                L[i][j] = s / L[j][j]

    x = [jnp.full_like(tr, 1.0 / (n**0.5)) for _ in range(n)]
    for _ in range(iters):
        y = [None] * n
        for i in range(n):
            s = x[i]
            for k in range(i):
                s = s - L[i][k] * y[k]
            y[i] = s / L[i][i]
        z = [None] * n
        for i in range(n - 1, -1, -1):
            s = y[i]
            for k in range(i + 1, n):
                s = s - L[k][i] * z[k]
            z[i] = s / L[i][i]
        nrm2 = z[0] * z[0]
        for i in range(1, n):
            nrm2 = nrm2 + z[i] * z[i]
        inv = 1.0 / jnp.maximum(jnp.sqrt(nrm2), 1e-30)
        x = [zi * inv for zi in z]

    for i in range(n):
        x_ref[i : i + 1, :] = x[i]


@partial(jax.jit, static_argnames=("iterations", "interpret"))
def nullspace_inverse_iteration(
    AtA: jnp.ndarray,  # (..., n, n) symmetric PSD
    iterations: int = 10,
    interpret: bool = False,
) -> jnp.ndarray:
    """Single-launch batched smallest-eigenvector solve (see kernel doc).

    Returns (..., n) unit vectors; same algorithm/constants as
    ops.linalg.smallest_eigvec_inverse_iteration (which stays the CPU path).
    """
    n = AtA.shape[-1]
    batch = AtA.shape[:-2]
    b = int(np.prod(batch)) if batch else 1
    tb, padded, grid = _solver_tiling(b)
    a2 = jnp.transpose(AtA.reshape(b, n * n))  # (n*n, B) component-major
    if padded != b:
        # Zero matrices are safe through the guarded recurrence (max/eps
        # clamps); the pad lanes are sliced off below.
        a2 = jnp.pad(a2, ((0, 0), (0, padded - b)))
    out = pl.pallas_call(
        partial(_nullspace_kernel, n=n, iters=iterations),
        grid=(grid,),
        out_shape=jax.ShapeDtypeStruct((n, padded), AtA.dtype),
        in_specs=[
            pl.BlockSpec((n * n, tb), lambda i: (0, i), memory_space=pltpu.VMEM)
        ],
        out_specs=pl.BlockSpec((n, tb), lambda i: (0, i), memory_space=pltpu.VMEM),
        interpret=interpret,
    )(a2)
    return jnp.transpose(out[:, :b]).reshape(batch + (n,))


def _svd3_kernel(a_ref, u_ref, s_ref, v_ref, *, sweeps):
    """Signed 3x3 SVD of B matrices, component-major ((9, B) in/out).

    Same algorithm as ops.svd3.svd3 (fixed-sweep Jacobi eigenanalysis of
    A^T A + explicit orthonormal U reconstruction), with every matrix entry
    a (1, B) lane vector so the whole decomposition is one kernel launch.
    The Givens rotations touch only rows/columns (p, q) — two fused
    multiply-adds per affected entry instead of the jnp path's full 3x3
    matmuls — and all branches are lane-wise selects.
    """
    eps = 1e-12
    gamma = 3.0 + 2.0 * (2.0**0.5)
    cos_pi8 = float(np.cos(np.pi / 8.0))
    sin_pi8 = float(np.sin(np.pi / 8.0))

    A = [[a_ref[i * 3 + j : i * 3 + j + 1, :] for j in range(3)] for i in range(3)]

    # S = A^T A (symmetric).
    S = [[None] * 3 for _ in range(3)]
    for i in range(3):
        for j in range(3):
            S[i][j] = A[0][i] * A[0][j] + A[1][i] * A[1][j] + A[2][i] * A[2][j]
    one = jnp.ones_like(S[0][0])
    zero = jnp.zeros_like(S[0][0])
    V = [[one if i == j else zero for j in range(3)] for i in range(3)]

    def jacobi(S, V, p, q):
        app, aqq, apq = S[p][p], S[q][q], S[p][q]
        ch = 2.0 * (app - aqq)
        sh = apq
        use_big = gamma * sh * sh < ch * ch
        w = jnp.where(
            use_big, 1.0 / jnp.sqrt(jnp.maximum(ch * ch + sh * sh, eps)), zero
        )
        ch_h = jnp.where(use_big, w * ch, cos_pi8)
        sh_h = jnp.where(use_big, w * sh, sin_pi8)
        nrm = ch_h * ch_h + sh_h * sh_h
        c = (ch_h * ch_h - sh_h * sh_h) / nrm
        s = (2.0 * ch_h * sh_h) / nrm
        # T = S G (rotate columns p, q), then S' = G^T T (rotate rows p, q).
        T = [row[:] for row in S]
        for i in range(3):
            tp = S[i][p] * c + S[i][q] * s
            tq = -S[i][p] * s + S[i][q] * c
            T[i][p], T[i][q] = tp, tq
        Sn = [row[:] for row in T]
        for j in range(3):
            rp = c * T[p][j] + s * T[q][j]
            rq = -s * T[p][j] + c * T[q][j]
            Sn[p][j], Sn[q][j] = rp, rq
        Vn = [row[:] for row in V]
        for i in range(3):
            vp = V[i][p] * c + V[i][q] * s
            vq = -V[i][p] * s + V[i][q] * c
            Vn[i][p], Vn[i][q] = vp, vq
        return Sn, Vn

    for _ in range(sweeps):
        S, V = jacobi(S, V, 0, 1)
        S, V = jacobi(S, V, 0, 2)
        S, V = jacobi(S, V, 1, 2)

    # B = A V: columns orthogonal with norms = singular values.
    B = [[None] * 3 for _ in range(3)]
    for i in range(3):
        for j in range(3):
            B[i][j] = A[i][0] * V[0][j] + A[i][1] * V[1][j] + A[i][2] * V[2][j]

    def norm2_col(M, j):
        return M[0][j] * M[0][j] + M[1][j] * M[1][j] + M[2][j] * M[2][j]

    def cond_swap(B, V, i, j):
        do = norm2_col(B, i) < norm2_col(B, j)
        for M in (B, V):
            for r in range(3):
                mi, mj = M[r][i], M[r][j]
                M[r][i] = jnp.where(do, mj, mi)
                M[r][j] = jnp.where(do, -mi, mj)
        return B, V

    B, V = cond_swap(B, V, 0, 1)
    B, V = cond_swap(B, V, 0, 2)
    B, V = cond_swap(B, V, 1, 2)

    s0 = jnp.sqrt(norm2_col(B, 0))
    s1 = jnp.sqrt(norm2_col(B, 1))

    inv0 = 1.0 / jnp.maximum(s0, eps)
    big0 = s0 > 1e-8
    u0 = [
        jnp.where(big0, B[0][0] * inv0, one),
        jnp.where(big0, B[1][0] * inv0, zero),
        jnp.where(big0, B[2][0] * inv0, zero),
    ]

    # Orthonormalize column 1 against u0; rank-1 fallback = cross(u0, e_min).
    dot10 = B[0][1] * u0[0] + B[1][1] * u0[1] + B[2][1] * u0[2]
    b1 = [B[k][1] - dot10 * u0[k] for k in range(3)]
    b1n = jnp.sqrt(b1[0] * b1[0] + b1[1] * b1[1] + b1[2] * b1[2])
    ax = [jnp.abs(u0[k]) for k in range(3)]
    pick0 = (ax[0] <= ax[1]) & (ax[0] <= ax[2])
    pick1 = (~pick0) & (ax[1] <= ax[2])
    e = [
        jnp.where(pick0, one, zero),
        jnp.where(pick1, one, zero),
        jnp.where(pick0 | pick1, zero, one),
    ]
    alt = [
        u0[1] * e[2] - u0[2] * e[1],
        u0[2] * e[0] - u0[0] * e[2],
        u0[0] * e[1] - u0[1] * e[0],
    ]
    altn = jnp.maximum(
        jnp.sqrt(alt[0] * alt[0] + alt[1] * alt[1] + alt[2] * alt[2]), eps
    )
    alt = [a / altn for a in alt]
    invb1 = 1.0 / jnp.maximum(b1n, eps)
    bigb1 = b1n > 1e-8
    u1 = [jnp.where(bigb1, b1[k] * invb1, alt[k]) for k in range(3)]

    u2 = [
        u0[1] * u1[2] - u0[2] * u1[1],
        u0[2] * u1[0] - u0[0] * u1[2],
        u0[0] * u1[1] - u0[1] * u1[0],
    ]
    s2 = B[0][2] * u2[0] + B[1][2] * u2[1] + B[2][2] * u2[2]

    U = [u0, u1, u2]  # columns
    for i in range(3):
        for j in range(3):
            u_ref[i * 3 + j : i * 3 + j + 1, :] = U[j][i]
            v_ref[i * 3 + j : i * 3 + j + 1, :] = V[i][j]
    s_ref[0:1, :] = s0
    s_ref[1:2, :] = s1
    s_ref[2:3, :] = s2


@partial(jax.jit, static_argnames=("sweeps", "interpret"))
def svd3_pallas(A: jnp.ndarray, sweeps: int = 6, interpret: bool = False):
    """Single-launch batched signed 3x3 SVD (see ops.svd3.svd3 for the
    contract: U, V proper rotations, |s0| >= |s1| >= |s2|, s2 signed)."""
    batch = A.shape[:-2]
    b = int(np.prod(batch)) if batch else 1
    tb, padded, grid = _solver_tiling(b)
    a2 = jnp.transpose(A.reshape(b, 9))
    if padded != b:
        a2 = jnp.pad(a2, ((0, 0), (0, padded - b)))
    u2, s2, v2 = pl.pallas_call(
        partial(_svd3_kernel, sweeps=sweeps),
        grid=(grid,),
        out_shape=(
            jax.ShapeDtypeStruct((9, padded), A.dtype),
            jax.ShapeDtypeStruct((3, padded), A.dtype),
            jax.ShapeDtypeStruct((9, padded), A.dtype),
        ),
        in_specs=[
            pl.BlockSpec((9, tb), lambda i: (0, i), memory_space=pltpu.VMEM)
        ],
        out_specs=(
            pl.BlockSpec((9, tb), lambda i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((3, tb), lambda i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((9, tb), lambda i: (0, i), memory_space=pltpu.VMEM),
        ),
        interpret=interpret,
    )(a2)
    U = jnp.transpose(u2[:, :b]).reshape(batch + (3, 3))
    s = jnp.transpose(s2[:, :b]).reshape(batch + (3,))
    V = jnp.transpose(v2[:, :b]).reshape(batch + (3, 3))
    return U, s, V


# --------------------------------------------------------------------------- #
# Fused SuperPoint stem: conv1a -> requant -> conv1b -> requant -> maxpool2
# --------------------------------------------------------------------------- #

def _stem_kernel(
    x_ref,  # (1, H+4, W+4) int8 VMEM block: the whole padded image
    w1a_ref,  # (16, 64) bf16: 9 conv1a taps row-major (+7 zero rows)
    w1b_ref,  # (9*64, 64) bf16: conv1b taps, tap-major blocks
    b1_ref,  # (1, 64) f32 quantized conv1a bias
    b2_ref,  # (1, 64) f32 quantized conv1b bias
    m_ref,  # (1, 2) SMEM f32: requant multipliers m1, m2
    out_ref,  # (1, TH//2, W//2, 64) int8 — pooled stage-1 output
    *,
    th: int,
    w: int,
):
    """One (batch, row-tile) program of the fused stage-1 pipeline.

    The jnp/XLA formulation runs conv1a, its requant, conv1b, its requant
    and the 2x2 maxpool as five HBM-roundtripping ops — measured
    bandwidth-bound at ~3.9 ms/16-frame batch (xprof: the three largest
    fusions are exactly conv1a+rq, conv1b+rq, pool). Here each program
    reads an int8 input row window (the whole 126 KiB padded image rides
    in as a VMEM block — halo overlap that BlockSpecs cannot express),
    keeps every intermediate in VMEM, and writes only the pooled int8
    output: HBM activation traffic drops ~7x.

    Arithmetic is the exact integer emulation of models/superpoint.py
    (int8 products in bf16/f32 are exact; accumulators < 2^24): bit-
    identical stage-1 outputs, asserted by tests and tools/tpu_parity.py.
    """
    i = pl.program_id(1)
    x = x_ref[0, pl.ds(i * th, th + 4), :].astype(jnp.float32)  # (TH+4, W+4)
    m1 = m_ref[0, 0]
    m2 = m_ref[0, 1]

    # conv1a: 9 shifted scalar taps, broadcast over 64 output channels.
    # Accumulate (TH+2, W+2, 64) — the +2 halo feeds conv1b.
    h1, w1 = th + 2, w + 2
    acc1 = jnp.zeros((h1, w1, 64), jnp.float32)
    for u in range(3):
        for v in range(3):
            tap = w1a_ref[u * 3 + v : u * 3 + v + 1, :].astype(jnp.float32)
            xs = x[u : u + h1, v : v + w1].reshape(h1, w1, 1)
            acc1 = acc1 + xs * tap.reshape(1, 1, 64)
    b1 = b1_ref[0:1, :].reshape(1, 1, 64)
    q1 = jnp.clip(jnp.round((acc1 + b1) * m1), 0.0, 127.0)
    # conv1b's SAME padding is zeros OUTSIDE the image in the layered
    # formulation; the halo ring of q1 here was computed on zero-extended
    # input (bias can requant to nonzero) — zero it where it falls outside
    # the true image.
    n_rows = pl.num_programs(1) * th
    row_g = jax.lax.broadcasted_iota(jnp.int32, (h1, w1), 0) + i * th - 1
    col_g = jax.lax.broadcasted_iota(jnp.int32, (h1, w1), 1) - 1
    inside = (
        (row_g >= 0) & (row_g < n_rows) & (col_g >= 0) & (col_g < w)
    )
    q1 = jnp.where(inside.reshape(h1, w1, 1), q1, 0.0)  # f32; cast to
    # bf16 AFTER the per-tap reshape (16-bit reshapes need a relayout
    # Mosaic refuses: "insertion of minor dim ... only for 32-bit")

    # conv1b: 9 taps of (TH*W1, 64) x (64, 64) MXU matmuls. Column shifts
    # are lane-preserving rolls of the FULL padded width (mid-dim slices
    # that change the width would need an unsupported relayout); the roll
    # wraparound only contaminates the two rightmost columns, which the
    # final width slice discards.
    acc2 = jnp.zeros((th * w1, 64), jnp.float32)
    for u in range(3):
        base = q1[u : u + th, :, :]  # (TH, W1, 64) leading-dim slice
        for v in range(3):
            shifted = base if v == 0 else pltpu.roll(base, w1 - v, 1)
            patch = shifted.reshape(th * w1, 64).astype(jnp.bfloat16)
            wtap = w1b_ref[(u * 3 + v) * 64 : (u * 3 + v + 1) * 64, :]
            acc2 = acc2 + jax.lax.dot_general(
                patch,
                wtap,
                dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
    q2 = jnp.clip(jnp.round((acc2 + b2_ref[0:1, :]) * m2), 0.0, 127.0)

    # Row-wise half of the 2x2 max pool (the column half runs outside the
    # kernel: Mosaic supports leading-dim splits but not the mid-dim
    # regrouping a W-pool needs). int8 out: (TH/2, W, 64).
    q2 = q2.reshape(th, w1, 64)[:, 0:w, :]
    q2 = q2.reshape(th // 2, 2, w, 64)
    pooled = jnp.max(q2, axis=1)  # (TH/2, W, 64)
    out_ref[:] = pooled.reshape(out_ref.shape).astype(jnp.int8)


@partial(jax.jit, static_argnames=("tile_rows", "interpret"))
def fused_stem(
    images: jnp.ndarray,  # (S, H, W) float32 in [0, 1]
    w1a: jnp.ndarray,  # (3, 3, 1, 64) int8
    w1b: jnp.ndarray,  # (3, 3, 64, 64) int8
    input_scale,
    b1_q: jnp.ndarray,  # (64,) f32 — round(bias1 / (s_in * s_w1))
    m1,
    b2_q: jnp.ndarray,  # (64,) f32
    m2,
    tile_rows: int = 16,
    interpret: bool = False,
) -> jnp.ndarray:
    """Fused SuperPoint stage 1; returns (S, H/2, W/2, 64) int8 activations
    (post conv1a+rq, conv1b+rq, 2x2 maxpool) bit-identical to the layered
    jnp path."""
    s, h, w = images.shape
    assert h % tile_rows == 0, (h, tile_rows)
    x_q = jnp.clip(jnp.round(images / input_scale), -128, 127).astype(jnp.int8)
    x_pad = jnp.pad(x_q, ((0, 0), (2, 2), (2, 2)))

    w1a_rows = jnp.zeros((16, 64), jnp.bfloat16)
    w1a_rows = w1a_rows.at[:9].set(
        w1a.reshape(9, 64).astype(jnp.bfloat16)
    )
    w1b_rows = (
        w1b.reshape(9, 64, 64).reshape(9 * 64, 64).astype(jnp.bfloat16)
    )

    grid = (s, h // tile_rows)
    out = pl.pallas_call(
        partial(_stem_kernel, th=tile_rows, w=w),
        grid=grid,
        out_shape=jax.ShapeDtypeStruct((s, h // 2, w, 64), jnp.int8),
        in_specs=[
            # Whole padded image per program (126 KiB int8): halo-
            # overlapping row windows are sliced inside the kernel.
            pl.BlockSpec(
                (1, h + 4, w + 4),
                lambda b, i: (b, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ],
        out_specs=pl.BlockSpec(
            (1, tile_rows // 2, w, 64),
            lambda b, i: (b, i, 0, 0),
            memory_space=pltpu.VMEM,
        ),
        interpret=interpret,
    )(
        x_pad,
        w1a_rows,
        w1b_rows,
        b1_q[None, :].astype(jnp.float32),
        b2_q[None, :].astype(jnp.float32),
        jnp.asarray([[m1, m2]], jnp.float32),
    )
    # Column half of the 2x2 pool (cheap int8 op XLA fuses; the kernel did
    # the row half).
    return out.reshape(s, h // 2, w // 2, 2, 64).max(axis=3)
