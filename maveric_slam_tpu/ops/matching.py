"""Descriptor matching kernels.

The reference matches features with scalar loops: a windowed int8 search
(reference: src/tracking_main.c:104-194, ~100 x 81 cells x 256-d dots, one at
a time), a float O(N^2) one-way dot match (python/pairwise_pnp.py:639-659),
and a two-way-consistent NN matcher (python/superpoint_inference.py:290-332).

On TPU all three become one batched matmul on the MXU plus masked argmax on
the VPU: the windowed search computes the *full* (N x num_cells) int8 score
matrix in a single (N,256)x(256,cells) matmul — 50 MMACs, trivial for the
MXU — and applies the search window as a mask, instead of gathering windows.
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp


class WindowedMatches(NamedTuple):
    """Fixed-capacity match set between a query frame and a reference frame."""

    cell0: jnp.ndarray  # (N,) int32 matched cell in frame0 (-ignore if !mask)
    xy0: jnp.ndarray  # (N, 2) float32 pixel coords in frame0
    xy1: jnp.ndarray  # (N, 2) float32 pixel coords in frame1
    score: jnp.ndarray  # (N,) float32 cosine^2 similarity
    mask: jnp.ndarray  # (N,) bool
    num_matches: jnp.ndarray  # () int32


@partial(jax.jit, static_argnames=("grid_h", "grid_w", "shift", "radius", "match_threshold", "min_prob", "signed"))
def windowed_match(
    desc0: jnp.ndarray,  # (Hc*Wc, 256) int8, frame0 descriptors (row-major cells)
    probs0: jnp.ndarray,  # (Hc*Wc,) float32 frame0 cell probabilities
    indices0: jnp.ndarray,  # (Hc*Wc,) int32 frame0 in-cell argmax (64 = none)
    desc1: jnp.ndarray,  # (Hc*Wc, 256) int8, frame1 descriptors
    cells1: jnp.ndarray,  # (N,) int32 selected frame1 cells (row-major)
    indices1: jnp.ndarray,  # (N,) int32 frame1 in-cell argmax
    mask1: jnp.ndarray,  # (N,) bool
    grid_h: int,
    grid_w: int,
    shift: tuple = (0, 0),
    radius: int = 4,
    match_threshold: float = 0.9,
    min_prob: float = 0.2,
    signed: bool = True,
    xy0_cells: jnp.ndarray | None = None,  # (Hc*Wc, 2) sub-pixel coords/cell
    xy1_cells: jnp.ndarray | None = None,
) -> WindowedMatches:
    """Windowed quantized descriptor match (tracking_main.c:104-194 redesigned).

    For each selected frame1 feature, finds the best-cosine frame0 cell within
    a (2*radius+1)^2 grid window around its shifted location, subject to
    prob0 >= min_prob and cos^2 > match_threshold^2.

    `signed=True` additionally requires a positive dot product; the reference
    compares squared cosine only (tracking_main.c:155), which would also
    accept strongly anti-correlated descriptors — set signed=False for
    bug-compatible behavior.
    """
    n = cells1.shape[0]
    num_cells = grid_h * grid_w

    from .backend import use_tpu_pallas

    if use_tpu_pallas():
        # Fused Mosaic kernel: dots + norms + window mask + argmax in one
        # VMEM-resident pass; scores are bit-identical to the jnp path (the
        # int8 dot fits f32's exact-integer range: 127*127*256 < 2^24), see
        # tests/test_pallas_kernels.py::TestFusedMatch.
        from .pallas_kernels import fused_windowed_match

        best_score, best_cell = fused_windowed_match(
            desc1[cells1], desc0, probs0, indices0, cells1,
            grid_h=grid_h, grid_w=grid_w, shift=shift, radius=radius,
            min_prob=min_prob, signed=signed,
        )
    else:
        q1 = desc1[cells1].astype(jnp.int32)  # (N, 256)
        d0 = desc0.astype(jnp.int32)  # (C, 256)

        # One MXU matmul for every (query, cell) pair.
        dots = jax.lax.dot_general(
            desc1[cells1],
            desc0.T,
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.int32,
        ).astype(jnp.float32)  # (N, C)

        n1 = jnp.sum(q1 * q1, axis=-1).astype(jnp.float32)  # (N,)
        n0 = jnp.sum(d0 * d0, axis=-1).astype(jnp.float32)  # (C,)
        denom = jnp.maximum(n1[:, None] * n0[None, :], 1.0)
        cos2 = dots * dots / denom
        if signed:
            cos2 = jnp.where(dots > 0, cos2, 0.0)

        # Window mask in grid coordinates.
        row1 = (cells1 // grid_w)[:, None]  # (N, 1)
        col1 = (cells1 % grid_w)[:, None]
        cell_ids = jnp.arange(num_cells)
        row0 = (cell_ids // grid_w)[None, :]  # (1, C)
        col0 = (cell_ids % grid_w)[None, :]
        in_window = (
            (jnp.abs(row0 - (row1 + shift[1])) <= radius)
            & (jnp.abs(col0 - (col1 + shift[0])) <= radius)
        )
        cell_ok = (indices0 != 64) & (probs0 >= min_prob)
        score = jnp.where(in_window & cell_ok[None, :], cos2, -1.0)

        best_cell = jnp.argmax(score, axis=-1).astype(jnp.int32)  # (N,)
        best_score = jnp.take_along_axis(score, best_cell[:, None], axis=-1)[:, 0]
    matched = mask1 & (best_score > match_threshold**2)

    # Pixel coordinates: sub-pixel per-cell maps when provided, else the
    # integer cell*8 + (channel % 8, channel // 8) of the reference.
    if xy0_cells is not None:
        xy0 = xy0_cells[best_cell]
    else:
        idx0 = indices0[best_cell]
        x0 = (best_cell % grid_w) * 8 + idx0 % 8
        y0 = (best_cell // grid_w) * 8 + idx0 // 8
        xy0 = jnp.stack([x0, y0], axis=-1).astype(jnp.float32)
    if xy1_cells is not None:
        xy1 = xy1_cells[cells1]
    else:
        x1 = (cells1 % grid_w) * 8 + indices1 % 8
        y1 = (cells1 // grid_w) * 8 + indices1 // 8
        xy1 = jnp.stack([x1, y1], axis=-1).astype(jnp.float32)

    return WindowedMatches(
        cell0=jnp.where(matched, best_cell, -1),
        xy0=xy0.astype(jnp.float32),
        xy1=xy1.astype(jnp.float32),
        score=best_score,
        mask=matched,
        num_matches=jnp.sum(matched).astype(jnp.int32),
    )


class NNMatches(NamedTuple):
    index: jnp.ndarray  # (Na,) int32 best match in B (argmax)
    score: jnp.ndarray  # (Na,) float32 dot product
    mask: jnp.ndarray  # (Na,) bool


@partial(jax.jit, static_argnames=("dot_thresh",))
def nn_match_dot(
    descA: jnp.ndarray,  # (Na, D) float, L2-normalized
    descB: jnp.ndarray,  # (Nb, D)
    maskA: jnp.ndarray,
    maskB: jnp.ndarray,
    dot_thresh: float = 0.8,
) -> NNMatches:
    """One-way best-dot match (golden pipeline, pairwise_pnp.py:639-659)."""
    dots = descA @ descB.T  # (Na, Nb)
    dots = jnp.where(maskB[None, :], dots, -jnp.inf)
    idx = jnp.argmax(dots, axis=-1).astype(jnp.int32)
    score = jnp.take_along_axis(dots, idx[:, None], axis=-1)[:, 0]
    ok = maskA & (score > dot_thresh)
    return NNMatches(index=idx, score=score, mask=ok)


@partial(jax.jit, static_argnames=("nn_thresh",))
def nn_match_two_way(
    descA: jnp.ndarray,  # (Na, D) L2-normalized
    descB: jnp.ndarray,  # (Nb, D)
    maskA: jnp.ndarray,
    maskB: jnp.ndarray,
    nn_thresh: float = 0.7,
) -> NNMatches:
    """Two-way-consistent NN match on L2 distance (PointTracker's matcher,
    superpoint_inference.py:290-332): keep (i, j) iff j = argmin_j d(i,j),
    i = argmin_i d(i,j), and d < nn_thresh, with d = sqrt(2 - 2 dot)."""
    dots = jnp.clip(descA @ descB.T, -1.0, 1.0)
    dist = jnp.sqrt(jnp.maximum(2.0 - 2.0 * dots, 0.0))
    big = jnp.inf
    dist = jnp.where(maskA[:, None] & maskB[None, :], dist, big)
    j_of_i = jnp.argmin(dist, axis=1).astype(jnp.int32)  # (Na,)
    i_of_j = jnp.argmin(dist, axis=0).astype(jnp.int32)  # (Nb,)
    d = jnp.take_along_axis(dist, j_of_i[:, None], axis=1)[:, 0]
    mutual = i_of_j[j_of_i] == jnp.arange(descA.shape[0])
    ok = maskA & mutual & (d < nn_thresh)
    return NNMatches(index=j_of_i, score=d, mask=ok)
