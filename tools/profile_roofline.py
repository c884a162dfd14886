#!/usr/bin/env python
"""Per-stage roofline of the tracking step on the real TPU.

Slope-timing protocol (see tools/experiments/README_stem_r5.md): each
stage runs inside a device-side fori_loop at two trip counts; the
per-iteration time is the slope (T_hi - T_lo) / (n_hi - n_lo), which
cancels both the ~28 ms tunnel round-trip of the fetch barrier and the
per-dispatch floor. A trailing data dependency threads each iteration's
result back into the loop carry so XLA cannot elide or overlap
iterations.

For every stage the table reports measured ms, FLOPs, achieved TFLOP/s,
minimum HBM bytes (activations in+out at the stage's dtype), achieved
GB/s, and which v5e roofline resource (197 TFLOP/s bf16, ~820 GB/s HBM)
the stage is actually limited by.

Writes the markdown table to stdout; SCALING.md quotes the committed
output.
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

V5E_BF16_TFLOPS = 197.0
V5E_HBM_GBS = 820.0


def slope(run_lo, run_hi, n_lo, n_hi, x0, reps=4):
    import jax  # noqa: F401

    t = {}
    for key, fn in (("lo", run_lo), ("hi", run_hi)):
        out = fn(x0)
        np.asarray(out.ravel()[0])
        best = 1e9
        for _ in range(reps):
            t0 = time.perf_counter()
            out = fn(out)
            np.asarray(out.ravel()[0])
            best = min(best, time.perf_counter() - t0)
        t[key] = best
    return (t["hi"] - t["lo"]) / (n_hi - n_lo)


def make_loop(op, iters):
    import jax
    import jax.numpy as jnp

    @jax.jit
    def run(x):
        def body(i, x):
            p = op(x)
            return x + p * 1e-12 + i.astype(jnp.float32) * 0.0

        return jax.lax.fori_loop(0, iters, body, x)

    return run


def main(streams=1):
    import jax
    import jax.numpy as jnp

    from maveric_slam_tpu.config import DEFAULT_CONFIG
    from maveric_slam_tpu.frontend import tracker as trk
    from maveric_slam_tpu.models import superpoint as sp

    params = sp.load_params()
    rng = np.random.default_rng(0)
    S = streams
    h, w = 192, 640
    img0 = jax.device_put(jnp.asarray(rng.random((S, h, w), np.float32)))
    np.asarray(img0.ravel()[0])

    s_in = params["input_scale"]

    def partial_net(x, upto):
        """Quantized net truncated after layer index `upto` (fused stage 1
        counts as index 1); returns a scalar data dependency."""
        semi = sp.superpoint_int8(params, x, stem="auto")
        return semi[0][0, 0, 0, 0].astype(jnp.float32)

    # Layer geometry: (name, Hc, Wc, Cin, Cout, K) after the preceding pools.
    L = [
        ("stage1 (fused kernel)", h, w, 1, 64, None),
        ("conv2a", h // 2, w // 2, 64, 64, 3),
        ("conv2b+pool2", h // 2, w // 2, 64, 64, 3),
        ("conv3a", h // 4, w // 4, 64, 128, 3),
        ("conv3b+pool3", h // 4, w // 4, 128, 128, 3),
        ("conv4a", h // 8, w // 8, 128, 128, 3),
        ("conv4b", h // 8, w // 8, 128, 128, 3),
        ("convPa+convPb", h // 8, w // 8, 128, 256, 3),
        ("convDa+convDb", h // 8, w // 8, 128, 256, 3),
    ]

    # Cumulative-truncation timing: run the net cut after each layer; the
    # per-layer time is the difference of consecutive cuts.
    from maveric_slam_tpu.models.superpoint import _conv, _requant

    def net_upto(x, n_layers):
        sc = s_in
        carrier = jnp.bfloat16
        q = None
        names = [
            "conv2a", "conv2b", "conv3a", "conv3b", "conv4a", "conv4b",
        ]
        # stage 1 fused
        from maveric_slam_tpu.ops import pallas_kernels as pk

        o1a = params["conv1a_oscale"]
        b1_q = jnp.round(params["conv1a_b"] / (s_in * params["conv1a_wscale"]))
        m1 = (s_in * params["conv1a_wscale"]) / o1a
        b2_q = jnp.round(
            params["conv1b_b"] / (o1a * params["conv1b_wscale"])
        )
        m2 = (o1a * params["conv1b_wscale"]) / params["conv1b_oscale"]
        q = pk.fused_stem(
            x, params["conv1a_w"], params["conv1b_w"], s_in,
            b1_q, m1, b2_q, m2,
        ).astype(carrier)
        sc = params["conv1b_oscale"]
        done = 1

        def qconv(q, name, in_scale, relu=True):
            acc = _conv(q, params[f"{name}_wq"], jnp.float32)
            out = _requant(
                acc, in_scale, params[f"{name}_wscale"],
                params[f"{name}_b"], params[f"{name}_oscale"], relu,
            )
            return out.astype(carrier), params[f"{name}_oscale"]

        for k, name in enumerate(names):
            if done >= n_layers:
                break
            q, sc = qconv(q, name, sc)
            if name in ("conv2b", "conv3b"):
                q = sp._maxpool2(q)
            done += 1
        enc = q
        if n_layers >= 8:
            pa, sca = qconv(enc, "convPa", sc)
            semi, _ = qconv(pa, "convPb", sca, relu=False)
            q = semi
        if n_layers >= 9:
            da, scd = qconv(enc, "convDa", sc)
            desc, _ = qconv(da, "convDb", scd, relu=False)
            q = q + 0 * desc[..., :65]
        return q[0, 0, 0, 0].astype(jnp.float32)

    n_lo, n_hi = 10, 110
    cum = []
    for n_layers in range(1, 10):
        op = lambda x, n=n_layers: net_upto(x, n)
        per = slope(
            make_loop(op, n_lo), make_loop(op, n_hi), n_lo, n_hi, img0,
            reps=6,
        )
        cum.append(per)
    # Per-layer deltas of independently-measured cumulative cuts carry
    # +-10 us of tunnel jitter each; enforce monotone cumulative time so a
    # noisy cut cannot produce a negative layer.
    for k in range(1, len(cum)):
        cum[k] = max(cum[k], cum[k - 1])

    # FLOPs and minimum bytes per layer (int8 activations on the fused
    # stage-1 path; bf16 carriers between layered convs).
    def conv_flops(hc, wc, cin, cout, k=3):
        return 2 * hc * wc * cin * cout * k * k

    stats = []
    f1 = conv_flops(h, w, 1, 64) + conv_flops(h, w, 64, 64) * 1.37
    stats.append((f1, (h * w) * 4 + h * w * 64 * 2 + (h // 2) * (w // 2) * 64))
    stats.append((conv_flops(h // 2, w // 2, 64, 64), (h // 2) * (w // 2) * 64 * 2 * 2))
    stats.append((conv_flops(h // 2, w // 2, 64, 64), (h // 2) * (w // 2) * 64 * 2 + (h // 4) * (w // 4) * 64 * 2))
    stats.append((conv_flops(h // 4, w // 4, 64, 128), (h // 4) * (w // 4) * (64 + 128) * 2))
    stats.append((conv_flops(h // 4, w // 4, 128, 128), (h // 4) * (w // 4) * 128 * 2 + (h // 8) * (w // 8) * 128 * 2))
    stats.append((conv_flops(h // 8, w // 8, 128, 128), (h // 8) * (w // 8) * 128 * 2 * 2))
    stats.append((conv_flops(h // 8, w // 8, 128, 128), (h // 8) * (w // 8) * 128 * 2 * 2))
    stats.append(
        (
            conv_flops(h // 8, w // 8, 128, 256) + 2 * (h // 8) * (w // 8) * 256 * 65,
            (h // 8) * (w // 8) * (128 + 256 + 65) * 2,
        )
    )
    stats.append(
        (
            conv_flops(h // 8, w // 8, 128, 256) + 2 * (h // 8) * (w // 8) * 256 * 256,
            (h // 8) * (w // 8) * (128 + 256 + 256) * 2,
        )
    )

    print(f"# Per-layer roofline, S={S} stream(s), slope protocol\n")
    print("| stage | ms | GFLOP | TFLOP/s | min MB moved | GB/s | bound by |")
    print("|---|---|---|---|---|---|---|")
    prev = 0.0
    rows = []
    for k, (name, *_rest) in enumerate(L):
        dt = cum[k] - prev if k else cum[0]
        prev = cum[k]
        fl, by = stats[k]
        fl *= S
        by *= S
        tf = fl / max(dt, 1e-9) / 1e12
        gbs = by / max(dt, 1e-9) / 1e9
        frac_c = tf / V5E_BF16_TFLOPS
        frac_m = gbs / V5E_HBM_GBS
        bound = "compute" if frac_c > frac_m else "bandwidth"
        if max(frac_c, frac_m) < 0.15:
            bound = "neither (launch/serial overhead)"
        rows.append(dt)
        print(
            f"| {name} | {dt*1e3:.3f} | {fl/1e9:.2f} | {tf:.1f} "
            f"| {by/1e6:.2f} | {gbs:.0f} | {bound} |"
        )
    total = cum[-1]
    gf = sum(st[0] for st in stats) * S / 1e9
    print(
        f"| **net total** | {total*1e3:.3f} | {gf:.2f} "
        f"| {gf/total/1e3:.1f} | | | |"
    )

    # Full track_step for context (batched variant when S > 1, matching
    # the multi-stream serving mode bench.py measures).
    from maveric_slam_tpu.frontend.tracker import track_step

    if S == 1:
        state0 = trk.init_state(params, img0[0], DEFAULT_CONFIG)

        def op_step(x):
            _st, step = track_step.__wrapped__(
                params, state0, x[0], DEFAULT_CONFIG
            )
            return step.t[0]

    else:
        states0 = trk.init_states_batched(params, img0, DEFAULT_CONFIG)

        def op_step(x):
            _st, res = trk.track_step_batched.__wrapped__(
                params, states0, x, DEFAULT_CONFIG
            )
            return res.t[0, 0]

    per = slope(
        make_loop(op_step, n_lo), make_loop(op_step, n_hi), n_lo, n_hi,
        img0, reps=6,
    )
    print(
        f"\nfull track_step (net + detector + match + RANSAC + GN): "
        f"{per*1e3:.3f} ms ({per/S*1e3:.3f} ms/frame); "
        f"non-net tail = {(per-total)*1e3:.3f} ms"
    )


if __name__ == "__main__":
    main(int(sys.argv[1]) if len(sys.argv) > 1 else 1)
