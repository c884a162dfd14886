"""Non-maximum suppression kernels.

Two TPU-native variants covering the reference's NMS algorithms:

- `heatmap_nms`: TPU-native local-max NMS on the full-resolution heatmap via
  max-pooling — the fixed-shape replacement for the golden pipeline's
  sequential greedy `nms_fast` (reference: python/pairwise_pnp.py:116-179).
  Keeps a pixel iff it is the maximum of its (2*dist+1)^2 neighborhood.
- `quadrant_nms`: vectorized equivalent of the quantized-grid 2x2-quadrant
  NMS (reference: src/run_nms.c:43-175) that suppresses cell winners within
  L_inf < min_dist pixels of a stronger neighbor in the 4 surrounding cells.

The exact host-side greedy oracle lives in tests/golden_nms.py (test-only;
heatmap_nms is differential-tested against it).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from .softmax_topn import DUSTBIN, SoftmaxGrid


@partial(jax.jit, static_argnames=("dist", "conf_thresh", "border"))
def heatmap_nms(
    heatmap: jnp.ndarray, dist: int = 4, conf_thresh: float = 0.015, border: int = 4
) -> jnp.ndarray:
    """Local-max NMS mask over an (H, W) heatmap.

    Returns a bool mask: pixel kept iff above conf_thresh, equal to the max
    of its (2*dist+1)^2 window, and at least `border` px from the edge
    (reference border removal: pairwise_pnp.py:233-237).
    Ties inside a window are broken toward the lexicographically first pixel.
    """
    h, w = heatmap.shape
    k = 2 * dist + 1
    pooled = jax.lax.reduce_window(
        heatmap,
        -jnp.inf,
        jax.lax.max,
        window_dimensions=(k, k),
        window_strides=(1, 1),
        padding="SAME",
    )
    is_max = heatmap >= pooled
    # Tie dedup (quantized heatmaps produce exact ties at adjacent pixels):
    # among pixels achieving their window max, keep the earliest (row-major).
    # Indices < 2^24 are exact in f32.
    idx = jnp.arange(h * w, dtype=jnp.float32).reshape(h, w)
    cand = jnp.where(heatmap >= pooled, -idx, -jnp.inf)
    pooled_cand = jax.lax.reduce_window(
        cand, -jnp.inf, jax.lax.max, (k, k), (1, 1), "SAME"
    )
    is_max = is_max & (-idx >= pooled_cand)

    ys = jnp.arange(h)[:, None]
    xs = jnp.arange(w)[None, :]
    in_border = (ys >= border) & (ys < h - border) & (xs >= border) & (xs < w - border)
    return (heatmap >= conf_thresh) & is_max & in_border


@partial(jax.jit, static_argnames=("min_dist",))
def quadrant_nms(grid: SoftmaxGrid, min_dist: int = 4) -> SoftmaxGrid:
    """Suppress cell winners that lie within L_inf < min_dist px of a
    stronger winner in an adjacent cell.

    Redesign of run_nms.c: instead of iterating 2x2 quadrants with interior-
    margin tests, compare every cell's keypoint against its 8 neighbors'
    keypoints directly (a superset of the reference's candidate set) and
    keep only keypoints that are not dominated. One shot, no loops.
    """
    probs, indices = grid.probs, grid.indices
    hc, wc = probs.shape
    # Full-res coordinates of each cell's winner.
    rows = jnp.arange(hc)[:, None]
    cols = jnp.arange(wc)[None, :]
    x = cols * 8 + indices % 8
    y = rows * 8 + indices // 8
    valid = indices != DUSTBIN

    key = jnp.where(valid, probs, -jnp.inf)
    dominated = jnp.zeros_like(valid)
    for dr in (-1, 0, 1):
        for dc in (-1, 0, 1):
            if dr == 0 and dc == 0:
                continue
            np_probs = jnp.roll(key, (-dr, -dc), axis=(0, 1))
            np_x = jnp.roll(x, (-dr, -dc), axis=(0, 1))
            np_y = jnp.roll(y, (-dr, -dc), axis=(0, 1))
            np_valid = jnp.roll(valid, (-dr, -dc), axis=(0, 1))
            # Mask off wrap-around neighbors.
            r_ok = (rows + dr >= 0) & (rows + dr < hc)
            c_ok = (cols + dc >= 0) & (cols + dc < wc)
            near = (jnp.abs(np_x - x) < min_dist) & (jnp.abs(np_y - y) < min_dist)
            stronger = (np_probs > key) | (
                (np_probs == key) & ((dr, dc) < (0, 0))  # deterministic tie-break
            )
            dominated = dominated | (np_valid & r_ok & c_ok & near & stronger & valid)
    new_indices = jnp.where(dominated, DUSTBIN, indices)
    new_probs = jnp.where(dominated, -1.0, probs)
    return SoftmaxGrid(probs=new_probs, indices=new_indices)


