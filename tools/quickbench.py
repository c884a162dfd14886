#!/usr/bin/env python
"""Fast iteration bench: single-stream + S-stream tracked fps (fewer rounds
than bench.py; for kernel-tuning loops, not for BENCH_r*.json)."""

import os
import sys
import time

import jax
import jax.numpy as jnp

from maveric_slam_tpu.config import DEFAULT_CONFIG
from maveric_slam_tpu.data import kitti
from maveric_slam_tpu.frontend import tracker as trk
from maveric_slam_tpu.models import superpoint as sp


def main():
    base = "/root/reference/datasets/kitti/sequences/00/image_0"
    frames = [
        kitti.load_frame(os.path.join(base, f"{f:06d}.png"))
        for f in range(160, 170)
    ]
    params = sp.load_params()
    cfg = DEFAULT_CONFIG
    dev = [jax.device_put(jnp.asarray(f)) for f in frames]

    if "single" in sys.argv or len(sys.argv) == 1:
        state = trk.init_state(params, dev[0], cfg)
        state, step = trk.track_step(params, state, dev[1], cfg)
        jax.block_until_ready(step.t)
        n = 0
        t0 = time.perf_counter()
        for _ in range(8):
            for img in dev[1:]:
                state, step = trk.track_step(params, state, img, cfg)
                n += 1
        jax.block_until_ready(step.t)
        print(f"single-stream: {n / (time.perf_counter() - t0):8.1f} fps")

    for arg in sys.argv[1:]:
        if not arg.startswith("S="):
            continue
        S = int(arg[2:])
        first = jnp.stack([dev[i % len(dev)] for i in range(S)])
        states = trk.init_states_batched(params, first, cfg)
        batch = jnp.stack([dev[(i + 1) % len(dev)] for i in range(S)])
        states, res = trk.track_step_batched(params, states, batch, cfg)
        jax.block_until_ready(res.t)
        n = 0
        t0 = time.perf_counter()
        for r in range(12):
            batch = jnp.stack([dev[(i + r) % len(dev)] for i in range(S)])
            states, res = trk.track_step_batched(params, states, batch, cfg)
            n += S
        jax.block_until_ready(res.t)
        dt = time.perf_counter() - t0
        print(f"S={S:3d} aggregate: {n / dt:8.1f} fps  ({dt / 12 * 1e3:6.2f} ms/step)")


if __name__ == "__main__":
    main()
