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

def _stem_pair_kernel(
    x_hbm,  # (S, H+2, P, 128) int8 column-paired haloed conv1a output (HBM)
    w0_ref,  # (3*128, 128) bf16 paired conv1b weights, same-pair blocks
    wn_ref,  # (3*128, 128) bf16 paired conv1b weights, next-pair blocks
    b_ref,  # (1, 128) f32 quantized bias, duplicated per lane half
    m_ref,  # (1, 1) SMEM f32 requant multiplier
    out_ref,  # (1, H/2, W/2, 64) int8 pooled stage-1 output (whole frame)
    bufs,  # (2, TH+2, P, 128) int8 VMEM double buffer
    sems,  # (2,) DMA semaphores
    *,
    th: int,
    pairs: int,
    h: int,
    w: int,
):
    """One per-frame program of the fused SuperPoint stage 1.

    Layout: the 64-channel conv1a activation rides with TWO adjacent
    image columns packed into the 128-lane minor dim (lane l<64 = even
    buffer column channel l, l>=64 = odd column) — the full native lane
    width, so the halo-window DMAs are tile-aligned without padding 64
    channels out to 128 (which would double stage-1 HBM traffic).

    conv1b is SIX (TH*P, 128)x(128, 128) MXU matmuls per row tile (3 row
    taps x {same pair, next pair}) against block-structured weights that
    encode the three column taps for both lane halves (built in
    fused_stem; ~1.37x the minimal MACs, far cheaper than the HBM
    round-trips it removes). Requant runs in-register; the 2x2 maxpool
    fuses completely: row half as a leading-dim split, column half as a
    64-lane roll + max (the pooled column IS the lane pair).

    The whole frame runs in ONE program: row tiles are streamed through a
    double-buffered halo-window DMA pipeline (BlockSpec index maps cannot
    express overlapping windows, and one DMA per grid step measured
    ~60 us of serial latency each on the tunneled runtime — 12 x 60 us
    dwarfed the ~60 us of matmul work per frame). Tile t+1's copy is in
    flight while tile t computes.

    Integer arithmetic is exact throughout (int8 products in bf16, f32
    accumulation via preferred_element_type; reordered additions are
    exact-integer), so stage-1 outputs are bit-identical to the layered
    int8 path (tests/test_pallas_kernels.py, tools/tpu_parity.py `stem`).
    The halo ring is zeroed by conv1a's epilogue mask (fused in XLA), not
    here.
    """
    b = pl.program_id(0)
    n_tiles = h // th

    def dma(t):
        return pltpu.make_async_copy(
            x_hbm.at[b, pl.ds(t * th, th + 2)],
            bufs.at[t % 2],
            sems.at[t % 2],
        )

    dma(0).start()
    for t in range(n_tiles):  # static trip count: unrolled, slices static
        if t + 1 < n_tiles:
            dma(t + 1).start()
        dma(t).wait()

        x = bufs[t % 2].astype(jnp.float32)  # (TH+2, P, 128)
        acc = jnp.zeros((th * pairs, 128), jnp.float32)
        for u in range(3):
            base = x[u : u + th, :, :]  # (TH, P, 128)
            nxt = pltpu.roll(base, pairs - 1, 1)  # pair p holds pair p+1
            for src, wref in ((base, w0_ref), (nxt, wn_ref)):
                patch = src.reshape(th * pairs, 128).astype(jnp.bfloat16)
                wt = wref[u * 128 : (u + 1) * 128, :]
                # Explicit DEFAULT precision: the package-global
                # jax_default_matmul_precision="highest" would request an
                # fp32-precision contraction on bf16 operands, which
                # Mosaic rejects ("Bad lhs type"). Exactness comes from
                # the operands being small integers, not the flag.
                acc = acc + jax.lax.dot_general(
                    patch,
                    wt,
                    dimension_numbers=(((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                    precision=jax.lax.Precision.DEFAULT,
                )
        q = jnp.clip(
            jnp.round((acc + b_ref[0:1, :]) * m_ref[0, 0]), 0.0, 127.0
        )
        y = q.reshape(th, pairs, 128)
        y = jnp.max(y.reshape(th // 2, 2, pairs, 128), axis=1)  # row pool
        # Column pool: lane l<64 takes max(channel l of even col, odd col).
        y = jnp.maximum(y, pltpu.roll(y, 64, 2))
        out_ref[0, t * (th // 2) : (t + 1) * (th // 2)] = (
            y[:, 0 : w // 2, 0:64].astype(jnp.int8)
        )


def _stem_pair_weights(w1b: jnp.ndarray):
    """Block-structured paired conv1b weights (see _stem_pair_kernel).

    w1b: (3, 3, 64, 64) int8 HWIO. Returns (W0, Wn), each (3*128, 128)
    bf16: for row tap u, W0[u] maps the SAME input pair (even col -> taps
    v=0 for even out / nothing for odd; odd col -> v=1 even / v=0 odd) and
    Wn[u] the NEXT pair (v=2/v=1 and 0/v=2)."""
    w = jnp.asarray(w1b, jnp.float32)  # (u, v, c, o)
    z = jnp.zeros((64, 64), jnp.float32)

    def block(tl, tr, bl, br):
        return jnp.concatenate(
            [
                jnp.concatenate([tl, tr], axis=1),
                jnp.concatenate([bl, br], axis=1),
            ],
            axis=0,
        )

    w0_blocks = [block(w[u, 0], z, w[u, 1], w[u, 0]) for u in range(3)]
    wn_blocks = [block(w[u, 2], w[u, 1], z, w[u, 2]) for u in range(3)]
    W0 = jnp.concatenate(w0_blocks, 0).astype(jnp.bfloat16)
    Wn = jnp.concatenate(wn_blocks, 0).astype(jnp.bfloat16)
    return W0, Wn


def _stem_pairs(w: int) -> int:
    """Paired-buffer width: image + left halo col + right pad, in column
    pairs, rounded so the pair count is a multiple of 8 (DMA slices must
    be tile-aligned in the second-minor dim)."""
    return -(-(w + 2) // 16) * 8


def _fused_stem_impl(
    images, w1a, w1b, input_scale, b1_q, m1, b2_q, m2, tile_rows, interpret
):
    """Fused SuperPoint stage 1; returns (S, H/2, W/2, 64) int8 activations
    (post conv1a+rq, conv1b+rq, 2x2 maxpool) bit-identical to the layered
    int8 path (reference contract: the quantized stage 1 of
    python/superpoint_inference.py:29-83).

    conv1a (1 input channel) runs as an XLA im2col matmul that emits the
    kernel's haloed, column-paired int8 buffer DIRECTLY: 9 shifted int8
    slices stacked tap-minor, reshaped (free, row-major) so each column
    PAIR carries 32 lanes (2 cols x 16 tap slots), one (.., 32)x(32, 128)
    dot with block-diagonal paired weights, requant + halo-zero mask
    fused into its epilogue. Three equivalent formulations were measured
    before this one (tools/experiments/README_stem_r5.md): a plain
    lax.conv (XLA mis-lowers Cin=1 convs: 0.71 ms for a 0.14 GFLOP
    layer), a conv with asymmetric padding feeding the kernel (XLA
    inserted three full-tensor relayout copies around the Pallas custom
    call, ~0.6 ms), and an unpaired im2col (two f32 relayout copies).
    This version compiles with zero large relayouts: 0.084 ms for the
    whole stage at S=1 vs 0.44 ms layered. conv1b + requant + the full
    2x2 maxpool run in one Pallas kernel (_stem_pair_kernel). Stage-1
    HBM activation traffic: ~13 MB/frame vs ~66 MB layered bf16.
    """
    s, h, w = images.shape
    assert h % 2 == 0 and w % 2 == 0, (h, w)
    pairs = _stem_pairs(w)
    x_q = jnp.clip(jnp.round(images / input_scale), -128, 127).astype(
        jnp.int8
    )
    # Buffer col j corresponds to image col j-1 (left halo); tap (u, v) of
    # buffer (r, j) reads image (r-2+u, j-2+v) — hence pad lo=2.
    xp = jnp.pad(x_q, ((0, 0), (2, 2), (2, 2 * pairs - w)))
    pats = jnp.stack(
        [
            xp[:, u : u + h + 2, v : v + 2 * pairs]
            for u in range(3)
            for v in range(3)
        ],
        -1,
    )  # (S, H+2, 2*pairs, 9) int8
    pats = jnp.pad(pats, ((0, 0), (0, 0), (0, 0), (0, 7))).reshape(
        s, h + 2, pairs, 32
    )
    w16 = (
        jnp.zeros((16, 64), jnp.float32)
        .at[:9]
        .set(w1a.reshape(9, 64).astype(jnp.float32))
    )
    w32 = (
        jnp.zeros((32, 128), jnp.float32)
        .at[0:16, 0:64]
        .set(w16)
        .at[16:32, 64:128]
        .set(w16)
        .astype(jnp.bfloat16)
    )
    b1p = jnp.concatenate([b1_q, b1_q]).astype(jnp.float32)
    # int8 products accumulate exactly in this bf16 dot (values < 2^14,
    # f32 accumulation); DEFAULT precision because the package-global
    # "highest" would reject/slow bf16 operands.
    acc = jax.lax.dot_general(
        pats.astype(jnp.bfloat16),
        w32,
        dimension_numbers=(((3,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.DEFAULT,
    )  # (S, H+2, pairs, 128)
    q1 = jnp.clip(jnp.round((acc + b1p) * m1), 0.0, 127.0)
    # Halo-zero mask, fused into the same epilogue: the halo ring and
    # right-pad region carry conv1a-of-zero-input values (bias through
    # requant, not zeros), but conv1b's SAME semantics need literal zeros.
    row_g = jnp.arange(h + 2)[:, None, None] - 1
    pair_i = jnp.arange(pairs)[None, :, None]
    lane_i = jnp.arange(128)[None, None, :]
    col_g = 2 * pair_i + (lane_i >= 64) - 1
    inside = (row_g >= 0) & (row_g < h) & (col_g >= 0) & (col_g < w)
    q1p = (q1 * inside[None]).astype(jnp.int8)

    W0, Wn = _stem_pair_weights(w1b)
    b2p = jnp.concatenate([b2_q, b2_q]).astype(jnp.float32)

    th = tile_rows or next(
        t for t in (16, 12, 8, 6, 4, 2) if h % t == 0
    )
    out = pl.pallas_call(
        partial(_stem_pair_kernel, th=th, pairs=pairs, h=h, w=w),
        grid=(s,),
        out_shape=jax.ShapeDtypeStruct((s, h // 2, w // 2, 64), jnp.int8),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.HBM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ],
        out_specs=pl.BlockSpec(
            (1, h // 2, w // 2, 64),
            lambda b: (b, 0, 0, 0),
            memory_space=pltpu.VMEM,
        ),
        scratch_shapes=[
            pltpu.VMEM((2, th + 2, pairs, 128), jnp.int8),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        interpret=interpret,
    )(q1p, W0, Wn, b2p[None, :], jnp.asarray(m2, jnp.float32).reshape(1, 1))
    return out


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
    tile_rows: int | None = None,
    interpret: bool = False,
) -> jnp.ndarray:
    """Batch-polymorphic wrapper around _fused_stem_impl (see its doc).

    Under vmap (the stream-batched tracker vmaps track_step), Pallas
    would try to block the kernel's HBM-space input over the new batch
    dim, which the TPU lowering rejects. The custom_vmap rule instead
    collapses any batch dims into the kernel's own leading S grid
    dimension — the kernel is shape-polymorphic in S — and reshapes the
    result back.
    """

    @jax.custom_batching.custom_vmap
    def run(imgs, w1a, w1b, s_in, b1, m1, b2, m2):
        return _fused_stem_impl(
            imgs, w1a, w1b, s_in, b1, m1, b2, m2, tile_rows, interpret
        )

    @run.def_vmap
    def _rule(axis_size, in_batched, imgs, w1a, w1b, s_in, b1, m1, b2, m2):
        del axis_size
        # Only the image argument may carry a batch dim (weights/scales
        # are per-model constants under the tracker's stream vmap).
        assert in_batched[0] and not any(in_batched[1:]), in_batched
        flat = imgs.reshape((-1,) + imgs.shape[2:])
        out = run(flat, w1a, w1b, s_in, b1, m1, b2, m2)
        return out.reshape(imgs.shape[:2] + out.shape[1:]), True

    return run(
        images,
        w1a,
        w1b,
        jnp.asarray(input_scale, jnp.float32),
        b1_q,
        jnp.asarray(m1, jnp.float32),
        b2_q,
        jnp.asarray(m2, jnp.float32),
    )
