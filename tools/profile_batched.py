#!/usr/bin/env python
"""Where does the multi-stream step spend its time? Batched extraction vs
the vmapped sequential tail, at several widths."""

import os
import time

import jax
import jax.numpy as jnp

from maveric_slam_tpu.config import DEFAULT_CONFIG
from maveric_slam_tpu.data import kitti
from maveric_slam_tpu.frontend import extractor, tracker as trk
from maveric_slam_tpu.models import superpoint as sp


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

    for S in (1, 16):
        imgs0 = jnp.stack([jnp.asarray(frames[i % 9]) for i in range(S)])
        imgs1 = jnp.stack([jnp.asarray(frames[(i + 1) % 9]) for i in range(S)])

        ex = jax.jit(
            jax.vmap(
                lambda im: extractor.extract_quantized.__wrapped__(
                    params, im, cfg
                )
            )
        )
        ms = timeit(ex, imgs1)
        print(f"S={S:3d} batched extract_quantized: {ms:8.3f} ms "
              f"({ms/S*1000:7.1f} us/frame)")

        bb = jax.jit(lambda ims: sp.superpoint_int8(params, ims))
        ms = timeit(bb, imgs1)
        print(f"S={S:3d} batched superpoint_int8:   {ms:8.3f} ms "
              f"({ms/S*1000:7.1f} us/frame)")

        states = trk.init_states_batched(params, imgs0, cfg)
        feats = ex(imgs1)

        tail = jax.jit(
            jax.vmap(lambda st, ft: trk._step_from_feats(st, ft, cfg))
        )
        ms = timeit(tail, states, feats)
        print(f"S={S:3d} vmapped tail:              {ms:8.3f} ms "
              f"({ms/S*1000:7.1f} us/frame)")


if __name__ == "__main__":
    main()
