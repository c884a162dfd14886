"""Pallas TPU kernels for the feature-frontend hot loop.

Hand-fused kernels for the detector post-processing that the reference runs
as scalar C loops (src/top_N.c) and that the jnp path expresses as several
XLA ops. One VMEM-resident pass computes, per cell: the approximate Taylor
softmax with negative-logit skipping, the winning channel + probability,
and the 3x3-neighborhood soft-argmax sub-pixel keypoint — the whole
(1920, 65) grid lives in ~128 KB of VMEM, so the kernel is a single block
with zero HBM round-trips between stages.

The jnp implementations in ops.softmax_topn remain the reference/CPU path;
tests assert bit-level agreement (same f32 ops in the same order).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
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
    arg = jnp.argmax(point, axis=-1)[:, None].astype(jnp.int32)  # (C, 1)
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
