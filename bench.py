#!/usr/bin/env python
"""Headline benchmark: tracked frames/s/chip on the KITTI tracking loop.

Runs the full quantized tracking step (SuperPoint int8 inference + approx
softmax/top-N + windowed int8 match + 256-hypothesis RANSAC + triangulation
+ scale + GN PnP refine) in steady state on the available accelerator and
prints ONE JSON line.

Measurement protocol (round 4 — IMPORTANT): on the tunneled TPU runtime
used here, `jax.block_until_ready` does NOT synchronize with device
execution (it returns at dispatch-acknowledge; verified by chained-matmul
experiments whose "latency" stayed constant at any chain depth, implying
>1 PFLOP/s on a v5e — physically impossible). Every number in rounds 1-3
therefore measured host dispatch rate, not compute. The honest protocol,
used below for every figure:

  1. pre-upload all inputs and force the uploads (host fetch of one
     element each);
  2. dispatch N *state-chained* steps with *content-unique* inputs (frames
     get per-round noise at ~2.5 int8 input quantization steps, so no
     layer's work can be elided or cached);
  3. host-fetch the final step's result — the only operation that truly
     waits — and amortize its one ~27 ms tunnel round-trip over N.

Baseline: the reference publishes no numbers (BASELINE.md); its golden
pipeline is a PyTorch-CPU quantized SuperPoint + numpy post-processing.
The comparable baseline measured here is the same SuperPoint workload as a
torch-CPU float forward pass (the quantized torchscript model does not run
on this torch build) plus nothing else — i.e. a *lower bound* on reference
frame time. vs_baseline = our full-tracking fps / torch-CPU
SuperPoint-forward-only fps.

MFU accounting: the SuperPoint conv stack is 20.84 GFLOP/frame at 192x640
(dominates the step; matching/RANSAC add <0.5 GFLOP). Peak for the chip
this runs on (TPU v5e) is 197 TFLOP/s bf16.
"""

import json
import os
import sys
import time

import numpy as np

SUPERPOINT_GFLOP_PER_FRAME = 20.84  # conv stack at 192x640 (see README)
V5E_BF16_PEAK_TFLOPS = 197.0


def _unique_frames(frames, count, rng, stack=None):
    """Content-unique variants of the KITTI frames: additive noise at ~2.5
    input-quantization steps, so every SuperPoint input grid differs and
    no cross-call reuse is possible."""
    out = []
    for r in range(count):
        if stack is None:
            base = frames[r % len(frames)]
            out.append(
                np.clip(base + rng.normal(0, 0.02, base.shape), 0, 1).astype(
                    np.float32
                )
            )
        else:
            b = np.stack(
                [frames[(i + r) % len(frames)] for i in range(stack)]
            )
            out.append(
                np.clip(b + rng.normal(0, 0.02, b.shape), 0, 1).astype(
                    np.float32
                )
            )
    return out


def _force_uploads(dev_arrays):
    for x in dev_arrays:
        np.asarray(x.ravel()[0])


def measure_tracker_fps(frames, rounds=128):
    import jax
    import jax.numpy as jnp

    from maveric_slam_tpu.config import DEFAULT_CONFIG
    from maveric_slam_tpu.frontend import tracker as trk
    from maveric_slam_tpu.models import superpoint as sp

    params = sp.load_params()
    rng = np.random.default_rng(0)
    imgs = [
        jax.device_put(jnp.asarray(f))
        for f in _unique_frames(frames, rounds, rng)
    ]
    _force_uploads(imgs)

    state = trk.init_state(params, imgs[0], DEFAULT_CONFIG)
    state, step = trk.track_step(params, state, imgs[1], DEFAULT_CONFIG)
    np.asarray(step.t)  # true barrier (compile + execute)

    t0 = time.perf_counter()
    for r in range(rounds):
        state, step = trk.track_step(params, state, imgs[r], DEFAULT_CONFIG)
    np.asarray(step.t)  # the ONLY real synchronization point
    dt = time.perf_counter() - t0
    return rounds / dt


def measure_multistream_fps(frames, streams=16, rounds=48):
    """Aggregate tracked frames/s over S independent streams per chip
    (production serving mode, frontend/tracker.py track_step_batched).
    Batches are pre-stacked and pre-uploaded OUTSIDE the timed loop (the
    round-1..3 harness stacked on the fly inside it)."""
    import jax
    import jax.numpy as jnp

    from maveric_slam_tpu.config import DEFAULT_CONFIG
    from maveric_slam_tpu.frontend import tracker as trk
    from maveric_slam_tpu.models import superpoint as sp

    params = sp.load_params()
    rng = np.random.default_rng(1)
    batches = [
        jax.device_put(jnp.asarray(b))
        for b in _unique_frames(frames, rounds, rng, stack=streams)
    ]
    _force_uploads(batches)

    first = jnp.stack([jnp.asarray(frames[i % len(frames)]) for i in range(streams)])
    states = trk.init_states_batched(params, first, DEFAULT_CONFIG)
    states, res = trk.track_step_batched(params, states, batches[0], DEFAULT_CONFIG)
    np.asarray(res.t)

    t0 = time.perf_counter()
    for r in range(rounds):
        states, res = trk.track_step_batched(
            params, states, batches[r], DEFAULT_CONFIG
        )
    np.asarray(res.t)
    return streams * rounds / (time.perf_counter() - t0)


def measure_chunked_fps(frames, chunk=8, chunks=32):
    """Single-stream throughput mode: track_chunk batches extraction over
    K frames and scans the sequential tail (bit-identical to K track_steps,
    K-1 frames extra latency)."""
    import jax
    import jax.numpy as jnp

    from maveric_slam_tpu.config import DEFAULT_CONFIG
    from maveric_slam_tpu.frontend import tracker as trk
    from maveric_slam_tpu.models import superpoint as sp

    params = sp.load_params()
    rng = np.random.default_rng(2)
    dev_chunks = [
        jax.device_put(jnp.asarray(b))
        for b in _unique_frames(frames, chunks, rng, stack=chunk)
    ]
    _force_uploads(dev_chunks)

    state = trk.init_state(params, dev_chunks[0][0], DEFAULT_CONFIG)
    state, res = trk.track_chunk(params, state, dev_chunks[0], DEFAULT_CONFIG)
    np.asarray(res.t)

    t0 = time.perf_counter()
    for c in range(chunks):
        state, res = trk.track_chunk(params, state, dev_chunks[c], DEFAULT_CONFIG)
    np.asarray(res.t)
    return chunk * chunks / (time.perf_counter() - t0)


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
    extras = {}
    for name, fn in (
        ("aggregate_fps_16_streams", lambda: measure_multistream_fps(frames, 16)),
        ("aggregate_fps_32_streams", lambda: measure_multistream_fps(frames, 32)),
        ("chunked_fps_k8", lambda: measure_chunked_fps(frames)),
    ):
        try:
            extras[name] = round(fn(), 1)
        except Exception as e:  # noqa: BLE001 — secondary metric
            print(f"{name} measurement failed: {e}", file=sys.stderr)
            extras[name] = None
    try:
        baseline_fps = measure_torch_baseline_fps(frames)
    except Exception as e:  # noqa: BLE001 — baseline is best-effort
        print(f"baseline measurement failed: {e}", file=sys.stderr)
        baseline_fps = float("nan")

    best_agg = max(
        [v for k, v in extras.items() if k.startswith("aggregate") and v]
        or [fps]
    )
    tflops = best_agg * SUPERPOINT_GFLOP_PER_FRAME / 1e3
    print(
        json.dumps(
            {
                "metric": "tracked_frames_per_s_chip",
                "value": round(fps, 3),
                "unit": "frames/s",
                "vs_baseline": round(fps / baseline_fps, 3)
                if baseline_fps == baseline_fps
                else None,
                **extras,
                "ms_per_frame_single": round(1e3 / fps, 3),
                "superpoint_gflop_per_frame": SUPERPOINT_GFLOP_PER_FRAME,
                "achieved_tflops_best": round(tflops, 1),
                "mfu_vs_v5e_bf16_peak": round(
                    tflops / V5E_BF16_PEAK_TFLOPS, 3
                ),
                "sync": "host-fetch barrier, content-unique chained inputs "
                "(block_until_ready is dispatch-only on this runtime; "
                "rounds 1-3 numbers measured dispatch rate)",
            }
        )
    )


if __name__ == "__main__":
    main()
