"""Feature extraction pipelines: image -> keypoints + descriptors.

Two TPU-resident pipelines over the SuperPoint int8 backbone:

- **quantized**: int8 grids -> approximate softmax -> (optional quadrant NMS)
  -> top-N cells with int8 cell descriptors. This is the tracking frontend
  (capability of reference src/top_N.c + src/run_nms.c + frame.h).
- **golden**: dequantized heatmap -> local-max NMS -> fixed-capacity keypoint
  set -> bilinear descriptor interpolation + L2 norm. This mirrors the
  reference's float post-processing (python/pairwise_pnp.py:181-256,
  grid_sample semantics at :243-254) with fixed shapes for jit.

Everything below `extract_*` is a single jitted program per input shape.
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..config import SlamConfig
from ..models import superpoint as sp
from ..ops import nms as nms_ops
from ..ops import softmax_topn as st


class QuantizedFeatures(NamedTuple):
    semi_q: jnp.ndarray  # (Hc, Wc, 65) int8
    desc_q: jnp.ndarray  # (Hc, Wc, 256) int8
    probs: jnp.ndarray  # (Hc, Wc) float32 approx softmax winner prob
    indices: jnp.ndarray  # (Hc, Wc) int32 winner channel (64 = none)
    xy: jnp.ndarray  # (Hc, Wc, 2) float32 sub-pixel keypoint coords per cell
    top: st.TopN  # fixed-capacity top-N selection
    semi_scale: jnp.ndarray
    desc_scale: jnp.ndarray


class GoldenFeatures(NamedTuple):
    xy: jnp.ndarray  # (K, 2) float32 pixel coords
    conf: jnp.ndarray  # (K,) float32 heatmap confidence
    desc: jnp.ndarray  # (K, 256) float32 L2-normalized descriptors
    mask: jnp.ndarray  # (K,) bool
    num: jnp.ndarray  # () int32


def _unfold_heatmap(semi: jnp.ndarray, cell: int = 8) -> jnp.ndarray:
    """(Hc, Wc, 65) logits -> (Hc*8, Wc*8) dustbin-free softmax heatmap
    (golden reshape semantics, pairwise_pnp.py:206-220)."""
    e = jnp.exp(semi)
    dense = e / (jnp.sum(e, axis=-1, keepdims=True) + 1e-5)
    nodust = dense[..., :64]
    hc, wc = nodust.shape[:2]
    heat = nodust.reshape(hc, wc, cell, cell)
    return heat.transpose(0, 2, 1, 3).reshape(hc * cell, wc * cell)


def _use_pallas() -> bool:
    # The fused Mosaic kernel measures 2.4x faster than the XLA-fused jnp
    # path on v5e; CPU/interpret stays on the jnp path.
    from ..ops.backend import use_tpu_pallas

    return use_tpu_pallas()


@partial(jax.jit, static_argnames=("config", "apply_nms"))
def extract_quantized(
    params, image: jnp.ndarray, config: SlamConfig, apply_nms: bool = False
) -> QuantizedFeatures:
    """Full quantized frontend on one (H, W) image."""
    fc = config.frontend
    semi_q, desc_q, scales = sp.superpoint_int8(params, image[None])
    semi_q, desc_q = semi_q[0], desc_q[0]
    if _use_pallas():
        from ..ops.pallas_kernels import fused_detector_postproc

        probs_f, idx_f, xy_f = fused_detector_postproc(
            semi_q.reshape(-1, 65),
            scales["semi_scale"],
            degree=fc.exp_taylor_degree,
            grid_w=fc.grid_w,
        )
        grid = st.SoftmaxGrid(
            probs=probs_f.reshape(fc.grid_h, fc.grid_w),
            indices=idx_f.reshape(fc.grid_h, fc.grid_w),
        )
        xy = xy_f.reshape(fc.grid_h, fc.grid_w, 2)
        if apply_nms:
            # Chained after the fused kernel (the grid is 24x80 — the
            # vectorized suppression is a handful of rolls XLA fuses, so
            # NMS no longer forces the slow jnp detector path). xy is
            # computed per-cell winner and suppression only dustbins
            # cells, so pre-NMS xy is bit-identical for survivors.
            grid = nms_ops.quadrant_nms(grid, min_dist=fc.nms_dist)
    else:
        grid = st.approx_softmax_grid(
            semi_q, scales["semi_scale"], fc.exp_taylor_degree
        )
        if apply_nms:
            grid = nms_ops.quadrant_nms(grid, min_dist=fc.nms_dist)
        xy = st.subpixel_xy(semi_q, scales["semi_scale"], grid, fc.exp_taylor_degree)
    top = st.top_n_select(
        grid, n=fc.top_n, valid_thresh=fc.valid_prob_thresh, mode=fc.top_n_mode
    )
    return QuantizedFeatures(
        semi_q=semi_q,
        desc_q=desc_q,
        probs=grid.probs,
        indices=grid.indices,
        xy=xy,
        top=top,
        semi_scale=scales["semi_scale"],
        desc_scale=scales["desc_scale"],
    )


def _bilinear_sample(grid: jnp.ndarray, u: jnp.ndarray, v: jnp.ndarray) -> jnp.ndarray:
    """Sample (Hc, Wc, C) at fractional (v, u) with border clamp.

    Matches torch grid_sample(align_corners=False) inside the valid region;
    keypoints live >= border px from the edge so padding never triggers.
    """
    hc, wc = grid.shape[:2]
    u0 = jnp.clip(jnp.floor(u).astype(jnp.int32), 0, wc - 1)
    v0 = jnp.clip(jnp.floor(v).astype(jnp.int32), 0, hc - 1)
    u1 = jnp.minimum(u0 + 1, wc - 1)
    v1 = jnp.minimum(v0 + 1, hc - 1)
    fu = jnp.clip(u - u0, 0.0, 1.0)[:, None]
    fv = jnp.clip(v - v0, 0.0, 1.0)[:, None]
    g00 = grid[v0, u0]
    g01 = grid[v0, u1]
    g10 = grid[v1, u0]
    g11 = grid[v1, u1]
    return (
        g00 * (1 - fu) * (1 - fv)
        + g01 * fu * (1 - fv)
        + g10 * (1 - fu) * fv
        + g11 * fu * fv
    )


@partial(jax.jit, static_argnames=("config",))
def extract_golden(params, image: jnp.ndarray, config: SlamConfig) -> GoldenFeatures:
    """Golden float frontend with fixed capacity K = config.frontend.max_keypoints.

    Uses the quantized backbone (the reference's golden pipeline runs the
    quantized model too) with float post-processing.
    """
    fc = config.frontend
    semi_q, desc_q, scales = sp.superpoint_int8(params, image[None])
    semi = semi_q[0].astype(jnp.float32) * scales["semi_scale"]
    desc_grid = desc_q[0].astype(jnp.float32) * scales["desc_scale"]

    heat = _unfold_heatmap(semi, fc.cell)  # (H, W)
    keep = nms_ops.heatmap_nms(
        heat, dist=fc.nms_dist, conf_thresh=fc.conf_thresh, border=fc.border_remove
    )
    h, w = heat.shape
    conf_flat = jnp.where(keep, heat, 0.0).reshape(-1)
    k = fc.max_keypoints
    vals, flat_idx = jax.lax.top_k(conf_flat, k)
    mask = vals > 0.0
    ys = (flat_idx // w).astype(jnp.float32)
    xs = (flat_idx % w).astype(jnp.float32)

    # Descriptor interpolation at (x/8 - 0.5, y/8 - 0.5) + L2 norm
    # (grid_sample semantics of pairwise_pnp.py:243-254).
    u = xs / fc.cell - 0.5
    v = ys / fc.cell - 0.5
    desc = _bilinear_sample(desc_grid, u, v)  # (K, 256)
    desc = desc / jnp.maximum(jnp.linalg.norm(desc, axis=-1, keepdims=True), 1e-12)

    return GoldenFeatures(
        xy=jnp.stack([xs, ys], axis=-1),
        conf=vals,
        desc=jnp.where(mask[:, None], desc, 0.0),
        mask=mask,
        num=jnp.sum(mask).astype(jnp.int32),
    )
