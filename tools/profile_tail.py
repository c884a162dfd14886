#!/usr/bin/env python
"""Component breakdown of the vmapped sequential tail at several widths.

Answers the round-2 verdict's open question: which stage of
`_step_from_feats` keeps aggregate multi-stream fps from scaling.
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


def timeit(fn, *args, iters=30):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / iters * 1e3


def main():
    base = "/root/reference/datasets/kitti/sequences/00/image_0"
    frames = [
        kitti.load_frame(os.path.join(base, f"{f:06d}.png"))
        for f in range(160, 170)
    ]
    params = sp.load_params()
    cfg = DEFAULT_CONFIG
    fc, mc = cfg.frontend, cfg.matcher

    for S in (16,):
        imgs0 = jnp.stack([jnp.asarray(frames[i % 9]) for i in range(S)])
        imgs1 = jnp.stack([jnp.asarray(frames[(i + 1) % 9]) for i in range(S)])
        states = trk.init_states_batched(params, imgs0, cfg)
        ex = jax.jit(
            jax.vmap(
                lambda im: extractor.extract_quantized.__wrapped__(params, im, cfg)
            )
        )
        feats = jax.block_until_ready(ex(imgs1))
        n_cells = fc.num_cells

        def vm(f):
            return jax.jit(jax.vmap(f))

        match_fn = vm(
            lambda st, ft: matching.windowed_match.__wrapped__(
                st.desc, st.probs, st.indices,
                ft.desc_q.reshape(n_cells, 256),
                ft.top.cells, ft.top.indices, ft.top.mask,
                grid_h=fc.grid_h, grid_w=fc.grid_w,
                shift=mc.window_shift, radius=mc.window_radius,
                match_threshold=mc.match_threshold, min_prob=mc.min_prob,
                xy0_cells=st.xy, xy1_cells=ft.xy.reshape(n_cells, 2),
            )
        )
        m = jax.block_until_ready(match_fn(states, feats))
        print(f"S={S:3d} vmapped windowed_match:  {timeit(match_fn, states, feats):8.3f} ms")

        K = jnp.asarray(cfg.working_camera.K)
        p_prev = jax.jit(jax.vmap(lambda xy: epipolar.normalize_points(xy, K)))(m.xy0)
        p_new = jax.jit(jax.vmap(lambda xy: epipolar.normalize_points(xy, K)))(m.xy1)
        keys = jax.random.split(jax.random.PRNGKey(0), S)

        ransac_fn = vm(
            lambda k, a, b, msk: ransac.ransac_essential.__wrapped__(
                k, a, b, msk,
                inlier_thresh=cfg.ransac.inlier_thresh,
                num_hypotheses=cfg.ransac.num_hypotheses,
            )
        )
        res = jax.block_until_ready(ransac_fn(keys, p_prev, p_new, m.mask))
        print(f"S={S:3d} vmapped ransac:          {timeit(ransac_fn, keys, p_prev, p_new, m.mask):8.3f} ms")

        tri_fn = vm(lambda R, t, a, b: epipolar.triangulate(R, t, a, b))
        X = jax.block_until_ready(tri_fn(res.R, res.t, p_prev, p_new))
        print(f"S={S:3d} vmapped triangulate:     {timeit(tri_fn, res.R, res.t, p_prev, p_new):8.3f} ms")

        depth_ok = res.inliers & (X[..., 2] > 1e-3) & (X[..., 2] < 1e3)
        refine_fn = vm(
            lambda R, t, Xs, uv, ok: pnp.refine_pose(
                K, R, t, Xs, uv, ok,
                huber_delta=cfg.ba.huber_delta,
                damping=cfg.ba.lm_damping,
            )
        )
        out = jax.block_until_ready(refine_fn(res.R, res.t, X, m.xy1, depth_ok))
        print(f"S={S:3d} vmapped refine_pose:     {timeit(refine_fn, res.R, res.t, X, m.xy1, depth_ok):8.3f} ms")

        # RANSAC internals
        est_fn = vm(lambda a, b: epipolar.estimate_essential(a, b))
        kk = cfg.ransac.num_hypotheses
        s1 = jnp.broadcast_to(p_prev[:, None, :8, :], (S, kk, 8, 2))
        s2 = jnp.broadcast_to(p_new[:, None, :8, :], (S, kk, 8, 2))
        s1 = jnp.ascontiguousarray(s1) if hasattr(jnp, "ascontiguousarray") else s1 + 0
        s2 = s2 + 0
        E = jax.block_until_ready(est_fn(s1, s2))
        print(f"S={S:3d} vmapped est_essential K={kk}: {timeit(est_fn, s1, s2):8.3f} ms")

        dec_fn = vm(lambda e: epipolar.project_and_decompose(e))
        d = jax.block_until_ready(dec_fn(E[:, 0]))
        print(f"S={S:3d} vmapped project_and_decompose: {timeit(dec_fn, E[:, 0]):8.3f} ms")


if __name__ == "__main__":
    main()
