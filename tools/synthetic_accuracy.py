#!/usr/bin/env python
"""Long-horizon accuracy artifact on the exact-ground-truth synthetic orbit.

Runs the full engine (tracking + window BA + BoW loop closure + pose-graph
correction) and the odometry-only baseline over a 125-frame closing orbit
(maveric_slam_tpu/data/synthetic.py — photometrically consistent ray-cast
frames, exact poses, a real loop), and writes SYNTH_ACCURACY.json. The
same scenario is asserted in CI by tests/test_synthetic_accuracy.py; this
tool records the measured numbers as a committed artifact.

Deterministic (fixed seed, CPU backend recommended):

    env -u PALLAS_AXON_POOL_IPS JAX_PLATFORMS=cpu \
        python tools/synthetic_accuracy.py
"""

import dataclasses
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main() -> int:
    from maveric_slam_tpu.config import DEFAULT_CONFIG, CameraConfig
    from maveric_slam_tpu.data import synthetic
    from maveric_slam_tpu.models import superpoint as sp
    from maveric_slam_tpu.slam import SlamSystem
    from maveric_slam_tpu.utils import evaluation

    H, W, ORBIT_N, N_TOTAL = 96, 320, 96, 125
    cam = CameraConfig(fx=400.0, fy=400.0, cx=160.0, cy=48.0, width=W, height=H)
    cfg = dataclasses.replace(
        DEFAULT_CONFIG,
        camera=cam,
        frontend=dataclasses.replace(DEFAULT_CONFIG.frontend, height=H, width=W),
        ransac=dataclasses.replace(
            DEFAULT_CONFIG.ransac, inlier_thresh=3.0 / 400.0
        ),
    )
    K = cfg.working_camera.K
    base = synthetic.orbit_poses(ORBIT_N, radius=8.0)
    gt = np.stack([base[k % ORBIT_N] for k in range(N_TOTAL)])
    frames = [synthetic.render_box_room(K, gt[k], H, W) for k in range(N_TOTAL)]

    params = sp.load_params()
    slam = SlamSystem(params, cfg, ba_every=4, enable_loop_closure=True)
    for f in frames:
        slam.process(f)
    traj = slam.trajectory()
    odo = slam.odometry_trajectory()
    slam.close()

    m_full = evaluation.ate(traj, gt)
    m_odo = evaluation.ate(odo, gt)
    r_full = evaluation.rpe(traj, gt)
    out = {
        "scenario": "closing orbit, 125 frames (~65 m), exact rendered GT",
        "config": "96x320, fx=400 (44deg FOV), ba_every=4, loop closure on",
        "ate_rmse_full_engine_m": round(m_full["ate_rmse"], 3),
        "ate_rmse_odometry_only_m": round(m_odo["ate_rmse"], 3),
        "improvement": round(m_odo["ate_rmse"] / m_full["ate_rmse"], 3),
        "rpe_rot_deg_mean": round(r_full["rpe_rot_deg_mean"], 4),
        "loop_closures": [
            {
                "frame": e.frame,
                "matched_frame": e.matched_frame,
                "num_inliers": e.num_inliers,
            }
            for e in slam.loop_events
        ],
        "asserted_by": "tests/test_synthetic_accuracy.py",
    }
    path = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "SYNTH_ACCURACY.json")
    with open(path, "w") as f:
        json.dump(out, f, indent=2)
    print(json.dumps(out, indent=2))
    return 0


if __name__ == "__main__":
    sys.exit(main())
