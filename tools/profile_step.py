#!/usr/bin/env python
"""Stage-by-stage latency breakdown of one tracking step on the device.

Each stage is timed as its own jitted program in steady state (block until
ready), so the numbers include per-dispatch overhead — which is the point:
single-stream tracking is latency-bound, and the budget is dominated by the
dependent-stage chain, not FLOPs.
"""

import os
import time

import jax
import jax.numpy as jnp

from maveric_slam_tpu.config import DEFAULT_CONFIG
from maveric_slam_tpu.data import kitti
from maveric_slam_tpu.frontend import extractor, tracker as trk
from maveric_slam_tpu.geometry import epipolar, pnp, ransac
from maveric_slam_tpu.models import superpoint as sp
from maveric_slam_tpu.ops import matching


def timeit(fn, *args, iters=50, **kw):
    out = fn(*args, **kw)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args, **kw)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / iters * 1e3, out


def main():
    base = "/root/reference/datasets/kitti/sequences/00/image_0"
    frames = [
        kitti.load_frame(os.path.join(base, f"{f:06d}.png")) for f in (160, 161)
    ]
    params = sp.load_params()
    cfg = DEFAULT_CONFIG
    img0 = jax.device_put(jnp.asarray(frames[0]))
    img1 = jax.device_put(jnp.asarray(frames[1]))

    ms, _ = timeit(
        lambda im: trk.init_state(params, im, cfg), img0, iters=20
    )
    print(f"full init_state (extract):      {ms:8.3f} ms")

    state = trk.init_state(params, img0, cfg)

    step_fn = jax.jit(
        lambda s, im: trk.track_step.__wrapped__(params, s, im, cfg)
    )
    ms, _ = timeit(step_fn, state, img1, iters=50)
    print(f"full track_step:                {ms:8.3f} ms")

    # --- stage 1: backbone + detector postproc -----------------------------
    ex = jax.jit(lambda im: extractor.extract_quantized(params, im, cfg))
    ms, feats = timeit(ex, img1, iters=50)
    print(f"  extract_quantized:            {ms:8.3f} ms")

    bb = jax.jit(lambda im: sp.superpoint_int8(params, im[None]))
    ms, _ = timeit(bb, img1, iters=50)
    print(f"    superpoint_int8 only:       {ms:8.3f} ms")

    # --- stage 2: windowed match -------------------------------------------
    fc, mc = cfg.frontend, cfg.matcher
    n_cells = fc.num_cells
    desc1 = feats.desc_q.reshape(n_cells, 256)
    top = feats.top

    match_fn = jax.jit(
        lambda st, d1, tp, xy1: matching.windowed_match(
            st.desc, st.probs, st.indices, d1, tp.cells, tp.indices, tp.mask,
            grid_h=fc.grid_h, grid_w=fc.grid_w, shift=mc.window_shift,
            radius=mc.window_radius, match_threshold=mc.match_threshold,
            min_prob=mc.min_prob, xy0_cells=st.xy,
            xy1_cells=xy1,
        )
    )
    xy1_cells = feats.xy.reshape(n_cells, 2)
    ms, m = timeit(match_fn, state, desc1, top, xy1_cells, iters=50)
    print(f"  windowed_match:               {ms:8.3f} ms")

    # --- stage 3: RANSAC ----------------------------------------------------
    K = jnp.asarray(cfg.working_camera.K)
    norm_fn = jax.jit(
        lambda m: (
            epipolar.normalize_points(m.xy0, K),
            epipolar.normalize_points(m.xy1, K),
        )
    )
    ms, (p_prev, p_new) = timeit(norm_fn, m, iters=50)
    print(f"  normalize_points:             {ms:8.3f} ms")

    key = jax.random.PRNGKey(0)
    rs_fn = jax.jit(
        lambda k, p1, p2, msk: ransac.ransac_essential(
            k, p1, p2, msk,
            inlier_thresh=cfg.ransac.inlier_thresh,
            num_hypotheses=cfg.ransac.num_hypotheses,
        )
    )
    ms, res = timeit(rs_fn, key, p_prev, p_new, m.mask, iters=50)
    print(f"  ransac_essential:             {ms:8.3f} ms")

    # --- stage 4: triangulate + scale + refine ------------------------------
    tri_fn = jax.jit(lambda r, p1, p2: epipolar.triangulate(r.R, r.t, p1, p2))
    ms, X = timeit(tri_fn, res, p_prev, p_new, iters=50)
    print(f"  triangulate:                  {ms:8.3f} ms")

    depth_ok = res.inliers & (X[..., 2] > 1e-3) & (X[..., 2] < 1e3)
    refine_fn = jax.jit(
        lambda r, Xs, xy, ok: pnp.refine_pose(
            K, r.R, r.t, Xs, xy, ok,
            huber_delta=cfg.ba.huber_delta, damping=cfg.ba.lm_damping,
        )
    )
    ms, _ = timeit(refine_fn, res, X, m.xy1, depth_ok, iters=50)
    print(f"  refine_pose (GN PnP):         {ms:8.3f} ms")


if __name__ == "__main__":
    main()
