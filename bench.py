#!/usr/bin/env python
"""Headline benchmark: tracked frames/s/chip on the KITTI tracking loop.

Runs the full quantized tracking step (SuperPoint int8 inference + approx
softmax/top-N + windowed int8 match + 256-hypothesis RANSAC + triangulation
+ scale + GN PnP refine) in steady state on the available accelerator and
prints ONE JSON line.

Baseline: the reference publishes no numbers (BASELINE.md); its golden
pipeline is a PyTorch-CPU quantized SuperPoint + numpy post-processing.
The comparable baseline measured here is the same SuperPoint workload as a
torch-CPU float forward pass (the quantized torchscript model does not run
on this torch build) plus nothing else — i.e. a *lower bound* on reference
frame time. vs_baseline = our full-tracking fps / torch-CPU
SuperPoint-forward-only fps.
"""

import json
import os
import sys
import time

import numpy as np


def measure_tracker_fps(frames, rounds=12):
    import jax

    from maveric_slam_tpu.config import DEFAULT_CONFIG
    from maveric_slam_tpu.frontend import tracker as trk
    from maveric_slam_tpu.models import superpoint as sp

    params = sp.load_params()

    # Input pipelining: frames are prefetched to the device, as a real
    # streaming pipeline would (decode/resize on host overlaps compute).
    import jax.numpy as jnp

    dev_frames = [jax.device_put(jnp.asarray(f)) for f in frames]

    # Warm up: compile init + step.
    state = trk.init_state(params, dev_frames[0], DEFAULT_CONFIG)
    state, step = trk.track_step(params, state, dev_frames[1], DEFAULT_CONFIG)
    jax.block_until_ready(step.t)

    n_steps = 0
    t0 = time.perf_counter()
    for _ in range(rounds):
        for img in dev_frames[1:]:
            state, step = trk.track_step(params, state, img, DEFAULT_CONFIG)
            n_steps += 1
    jax.block_until_ready(step.t)
    dt = time.perf_counter() - t0
    return n_steps / dt


def measure_multistream_fps(frames, streams=16, rounds=16):
    """Aggregate tracked frames/s over S independent streams per chip
    (production serving mode, frontend/tracker.py track_step_batched)."""
    import jax
    import jax.numpy as jnp

    from maveric_slam_tpu.config import DEFAULT_CONFIG
    from maveric_slam_tpu.frontend import tracker as trk
    from maveric_slam_tpu.models import superpoint as sp

    params = sp.load_params()
    dev = [jax.device_put(jnp.asarray(f)) for f in frames]
    first = jnp.stack([dev[i % len(dev)] for i in range(streams)])
    states = trk.init_states_batched(params, first, DEFAULT_CONFIG)
    batch = jnp.stack([dev[(i + 1) % len(dev)] for i in range(streams)])
    states, res = trk.track_step_batched(params, states, batch, DEFAULT_CONFIG)
    jax.block_until_ready(res.t)
    n = 0
    t0 = time.perf_counter()
    for r in range(rounds):
        batch = jnp.stack([dev[(i + r) % len(dev)] for i in range(streams)])
        states, res = trk.track_step_batched(
            params, states, batch, DEFAULT_CONFIG
        )
        n += streams
    jax.block_until_ready(res.t)
    return n / (time.perf_counter() - t0)


def measure_torch_baseline_fps(frames, iters=10):
    """torch-CPU SuperPoint forward on the same input (reference's engine)."""
    import torch

    from maveric_slam_tpu.models.superpoint import LAYERS, _DEFAULT_WEIGHTS

    raw = np.load(_DEFAULT_WEIGHTS)
    convs = {}
    with torch.no_grad():
        for name in LAYERS:
            w = torch.from_numpy(
                raw[f"{name}_w"].astype(np.float32) * raw[f"{name}_wscale"]
            )
            b = torch.from_numpy(raw[f"{name}_b"])
            o, i, kh, kw = w.shape
            conv = torch.nn.Conv2d(i, o, kh, padding=kh // 2)
            conv.weight.copy_(w)
            conv.bias.copy_(b)
            convs[name] = conv

    pool = torch.nn.MaxPool2d(2, 2)
    relu = torch.nn.functional.relu

    def forward(x):
        x = relu(convs["conv1a"](x))
        x = relu(convs["conv1b"](x))
        x = pool(x)
        x = relu(convs["conv2a"](x))
        x = relu(convs["conv2b"](x))
        x = pool(x)
        x = relu(convs["conv3a"](x))
        x = relu(convs["conv3b"](x))
        x = pool(x)
        x = relu(convs["conv4a"](x))
        x = relu(convs["conv4b"](x))
        semi = convs["convPb"](relu(convs["convPa"](x)))
        desc = convs["convDb"](relu(convs["convDa"](x)))
        return semi, desc

    x = torch.from_numpy(frames[0][None, None])
    with torch.no_grad():
        forward(x)  # warm up
        t0 = time.perf_counter()
        for k in range(iters):
            forward(torch.from_numpy(frames[k % len(frames)][None, None]))
        dt = time.perf_counter() - t0
    return iters / dt


def main():
    base = "/root/reference/datasets/kitti/sequences/00/image_0"
    from maveric_slam_tpu.data import kitti

    frames = [
        kitti.load_frame(os.path.join(base, f"{f:06d}.png"))
        for f in range(160, 170)
    ]

    fps = measure_tracker_fps(frames)
    try:
        agg_fps = measure_multistream_fps(frames, streams=16)
    except Exception as e:  # noqa: BLE001 — secondary metric
        print(f"multistream measurement failed: {e}", file=sys.stderr)
        agg_fps = float("nan")
    try:
        baseline_fps = measure_torch_baseline_fps(frames)
    except Exception as e:  # noqa: BLE001 — baseline is best-effort
        print(f"baseline measurement failed: {e}", file=sys.stderr)
        baseline_fps = float("nan")

    print(
        json.dumps(
            {
                "metric": "tracked_frames_per_s_chip",
                "value": round(fps, 3),
                "unit": "frames/s",
                "vs_baseline": round(fps / baseline_fps, 3)
                if baseline_fps == baseline_fps
                else None,
                "aggregate_fps_16_streams": round(agg_fps, 1)
                if agg_fps == agg_fps
                else None,
            }
        )
    )


if __name__ == "__main__":
    main()
