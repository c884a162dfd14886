#!/usr/bin/env python
"""Throughput of the three tracking execution modes on the device.

- single-stream track_step (latency-bound: one dispatch per frame)
- pipelined track_chunk (K frames per dispatch, batched extraction)
- multi-stream track_step_batched (S streams per dispatch)
"""

import os
import sys
import time

import jax
import jax.numpy as jnp

from maveric_slam_tpu.config import DEFAULT_CONFIG
from maveric_slam_tpu.frontend import tracker as trk
from maveric_slam_tpu.data import kitti
from maveric_slam_tpu.models import superpoint as sp


def main():
    base = "/root/reference/datasets/kitti/sequences/00/image_0"
    frames = [
        kitti.load_frame(os.path.join(base, f"{f:06d}.png"))
        for f in range(160, 170)
    ]
    params = sp.load_params()
    cfg = DEFAULT_CONFIG
    dev_frames = [jax.device_put(jnp.asarray(f)) for f in frames]

    # --- single-stream -------------------------------------------------------
    state = trk.init_state(params, dev_frames[0], cfg)
    state, step = trk.track_step(params, state, dev_frames[1], cfg)
    jax.block_until_ready(step.t)
    n = 0
    t0 = time.perf_counter()
    for _ in range(10):
        for img in dev_frames[1:]:
            state, step = trk.track_step(params, state, img, cfg)
            n += 1
    jax.block_until_ready(step.t)
    dt = time.perf_counter() - t0
    print(f"single-stream:        {n/dt:9.1f} fps  ({dt/n*1e3:.3f} ms/frame)")

    # --- pipelined chunks ----------------------------------------------------
    for K in (4, 8, 16):
        imgs = jnp.stack(dev_frames[1 : 1 + K]) if K <= 9 else jnp.stack(
            (dev_frames[1:] * 3)[:K]
        )
        state = trk.init_state(params, dev_frames[0], cfg)
        state, res = trk.track_chunk(params, state, imgs, cfg)
        jax.block_until_ready(res.t)
        n = 0
        t0 = time.perf_counter()
        for _ in range(max(40 // K, 5)):
            state, res = trk.track_chunk(params, state, imgs, cfg)
            n += K
        jax.block_until_ready(res.t)
        dt = time.perf_counter() - t0
        print(f"chunked K={K:3d}:        {n/dt:9.1f} fps  ({dt/n*1e3:.3f} ms/frame)")

    # --- multi-stream --------------------------------------------------------
    for S in (16, 32, 64):
        first = jnp.stack([dev_frames[i % 9] for i in range(S)])
        states = trk.init_states_batched(params, first, cfg)
        batch = jnp.stack([dev_frames[(i + 1) % 9] for i in range(S)])
        states, res = trk.track_step_batched(params, states, batch, cfg)
        jax.block_until_ready(res.t)
        n = 0
        t0 = time.perf_counter()
        for r in range(max(256 // S, 4)):
            batch = jnp.stack([dev_frames[(i + r) % 9] for i in range(S)])
            states, res = trk.track_step_batched(params, states, batch, cfg)
            n += S
        jax.block_until_ready(res.t)
        dt = time.perf_counter() - t0
        print(f"multi-stream S={S:3d}:  {n/dt:9.1f} agg fps  ({dt/n*1e3:.3f} ms/frame)")


if __name__ == "__main__":
    main()
