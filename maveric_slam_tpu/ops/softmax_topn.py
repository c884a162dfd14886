"""Detector-head post-processing: approximate softmax + top-N selection.

Vectorized re-design of the reference's scalar kernels (reference:
src/top_N.c): the per-cell 65-way approximate softmax with Taylor-series exp
(top_N.c:12-49), the full-grid softmax (top_N.c:136-165), and the top-N
selection with interpolated probability threshold (top_N.c:53-134). One cell
per VPU lane instead of one cell per loop iteration; selection becomes a
single `top_k` instead of a data-dependent scan.

Shapes are fixed: a (Hc, Wc, 65) int8 grid in, (Hc*Wc,) probability/argmax
maps and a fixed-capacity (N,) selection (index + mask) out.
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp

FLT_MIN = 1.175494e-38
DUSTBIN = 64


def _taylor_exp_ref(x_int: jnp.ndarray, scale: jnp.ndarray, degree: int = 5) -> jnp.ndarray:
    """Bit-faithful variant: accumulates scale_poly exactly like top_N.c:61-65."""
    x = x_int.astype(jnp.float32)
    acc = jnp.ones_like(x)
    scale_poly = jnp.float32(1.0)
    x_poly = x
    for i in range(1, degree):
        scale_poly = scale_poly * scale / i
        acc = acc + scale_poly * x_poly
        x_poly = x_poly * x
    return acc


class SoftmaxGrid(NamedTuple):
    probs: jnp.ndarray  # (..., Hc, Wc) float32; -1 where dustbin wins
    indices: jnp.ndarray  # (..., Hc, Wc) int32 in [0, 64]; 64 = no keypoint


@partial(jax.jit, static_argnames=("degree",))
def approx_softmax_grid(semi_q: jnp.ndarray, scale: jnp.ndarray, degree: int = 5) -> SoftmaxGrid:
    """Approximate per-cell softmax over 65 channels, negatives skipped.

    Semantics of compute_softmax/approx_softmax (top_N.c:22-49, :136-165):
    channels with negative logits contribute nothing; the winner is the
    largest Taylor-exp among channels 0..63; prob = max_exp / (FLT_MIN +
    sum of exps over all non-negative channels incl. dustbin).
    """
    nonneg = semi_q >= 0
    expx = jnp.where(nonneg, _taylor_exp_ref(semi_q, scale, degree), 0.0)
    denom = jnp.sum(expx, axis=-1) + FLT_MIN
    point_exp = expx[..., :DUSTBIN]
    max_exp = jnp.max(point_exp, axis=-1)
    argmax = jnp.argmax(point_exp, axis=-1).astype(jnp.int32)
    has_point = max_exp > 0.0
    indices = jnp.where(has_point, argmax, DUSTBIN)
    probs = jnp.where(has_point, max_exp / denom, -1.0)
    return SoftmaxGrid(probs=probs, indices=indices)


@jax.jit
def exact_softmax_grid(semi: jnp.ndarray) -> SoftmaxGrid:
    """Float softmax over 65 channels (golden path, pairwise_pnp.py:206-209).

    probs are the dustbin-free channel maxima; the +1e-5 in the denominator
    mirrors the reference.
    """
    e = jnp.exp(semi)
    dense = e / (jnp.sum(e, axis=-1, keepdims=True) + 1e-5)
    nodust = dense[..., :DUSTBIN]
    probs = jnp.max(nodust, axis=-1)
    indices = jnp.argmax(nodust, axis=-1).astype(jnp.int32)
    return SoftmaxGrid(probs=probs, indices=indices)


class TopN(NamedTuple):
    cells: jnp.ndarray  # (N,) int32 flat cell index (row-major: r*Wc + c)
    indices: jnp.ndarray  # (N,) int32 in-cell argmax channel
    probs: jnp.ndarray  # (N,) float32
    mask: jnp.ndarray  # (N,) bool — True where a feature was selected
    num_selected: jnp.ndarray  # () int32


@partial(jax.jit, static_argnames=("n", "mode"))
def top_n_select(
    grid: SoftmaxGrid, n: int = 100, valid_thresh: float = 0.01, mode: str = "reference"
) -> TopN:
    """Select ~N features by the reference's interpolated-threshold rule.

    compute_top_N (top_N.c:53-134): valid cells are those with a non-dustbin
    winner and prob > valid_thresh. If more than N are valid, keep cells with
    prob >= max*split + min*(1-split), split = N/num_valid, scanning in cell
    order and stopping at N. Fixed-shape formulation: the scan-in-cell-order
    with early stop == take the first N (by cell index) cells passing the
    threshold, which is one top_k over a composite key.
    """
    hc, wc = grid.probs.shape[-2:]
    probs = grid.probs.reshape(-1)
    indices = grid.indices.reshape(-1)
    num_cells = probs.shape[0]
    # The reference scans cells in its baked patch order (column-major,
    # patch = col*Hc + row — superpoint_inference.py:637); rank ties the
    # same way so the *same* N cells are kept when over-subscribed.
    rows = jnp.arange(num_cells) // wc
    cols = jnp.arange(num_cells) % wc
    scan_rank = cols * hc + rows

    valid = (indices != DUSTBIN) & (probs > valid_thresh)
    num_valid = jnp.sum(valid).astype(jnp.int32)

    min_prob = jnp.min(jnp.where(valid, probs, jnp.inf))
    max_prob = jnp.max(jnp.where(valid, probs, -jnp.inf))
    split = n / jnp.maximum(num_valid.astype(jnp.float32), 1.0)
    threshold = max_prob * split + min_prob * (1.0 - split)

    # If few enough, keep everything valid; else apply the threshold.
    keep = jnp.where(num_valid <= n, valid, valid & (probs >= threshold))

    if mode == "prob":
        # Keep the N highest-probability valid cells. Spatially unbiased —
        # the reference's scan-order cap clips features to the leftmost
        # columns whenever more than N cells pass its threshold, which
        # starves the epipolar geometry on one side of the image.
        key = jnp.where(valid, probs, 0.0)
    else:
        # Bug-compatible reference semantics (top_N.c:108-131):
        # first-N-in-scan-order among threshold survivors.
        key = jnp.where(keep, (num_cells - scan_rank).astype(jnp.float32), 0.0)
    vals, cells = jax.lax.top_k(key, n)
    mask = vals > 0
    cells = jnp.where(mask, cells, 0).astype(jnp.int32)
    selected_pool = valid if mode == "prob" else keep
    return TopN(
        cells=cells,
        indices=indices[cells],
        probs=jnp.where(mask, probs[cells], -1.0),
        mask=mask,
        num_selected=jnp.minimum(jnp.sum(selected_pool), n).astype(jnp.int32),
    )


@partial(jax.jit, static_argnames=("degree",))
def subpixel_xy(
    semi_q: jnp.ndarray, scale: jnp.ndarray, grid: SoftmaxGrid, degree: int = 5
) -> jnp.ndarray:
    """Sub-pixel keypoint coordinates per cell via local soft-argmax.

    The 64 point channels form an 8x8 sub-cell grid; the integer argmax
    (what the reference uses, tracking_main.c:168-180) quantizes keypoint
    positions to 1 px. Here the expected position over the 3x3 channel
    neighborhood of the winner refines it to sub-pixel — measured to cut
    per-step translation-direction error substantially on KITTI.

    Returns (..., Hc, Wc, 2) absolute float pixel (x, y) per cell (garbage
    where indices == 64; gate with the grid's validity).
    """
    nonneg = semi_q[..., :DUSTBIN] >= 0
    expx = jnp.where(
        nonneg, _taylor_exp_ref(semi_q[..., :DUSTBIN], scale, degree), 0.0
    )
    hc, wc = semi_q.shape[-3:-1]
    # 3x3 neighborhood of the winner as a channel mask (no clamped gather —
    # edge winners must not double-count their own channel).
    ch = jnp.arange(DUSTBIN)
    ix = (ch % 8).astype(jnp.int32)
    iy = (ch // 8).astype(jnp.int32)
    wy = grid.indices[..., None] // 8  # (..., Hc, Wc, 1)
    wx = grid.indices[..., None] % 8
    near = (jnp.abs(ix - wx) <= 1) & (jnp.abs(iy - wy) <= 1)
    p3 = jnp.where(near, expx, 0.0)
    denom = jnp.maximum(jnp.sum(p3, axis=-1), 1e-20)
    ex = jnp.sum(p3 * ix, axis=-1) / denom
    ey = jnp.sum(p3 * iy, axis=-1) / denom
    rows = jnp.arange(hc)[:, None].astype(jnp.float32)
    cols = jnp.arange(wc)[None, :].astype(jnp.float32)
    x = cols * 8 + ex
    y = rows * 8 + ey
    return jnp.stack([x, y], axis=-1)


def cell_to_xy(cells: jnp.ndarray, in_cell_idx: jnp.ndarray, grid_w: int) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Flat row-major cell index + in-cell channel -> full-res pixel (x, y).

    The 65-channel head encodes an 8x8 sub-cell position: channel k ->
    (dx, dy) = (k % 8, k // 8) (reference: src/tracking_main.c:168-180).
    """
    row = cells // grid_w
    col = cells % grid_w
    x = col * 8 + in_cell_idx % 8
    y = row * 8 + in_cell_idx // 8
    return x, y
