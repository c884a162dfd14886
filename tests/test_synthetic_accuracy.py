"""Long-horizon accuracy harness on an exact-ground-truth synthetic orbit.

The reference's accuracy envelope is the 4541-pose KITTI 00 ground truth
(reference: outputs/00.txt:1) but only 14 images ship in this snapshot, so
long-horizon accuracy is pinned here on a rendered sequence instead
(maveric_slam_tpu/data/synthetic.py): a camera orbiting inside a textured
box room, every frame ray-cast from a continuous procedural texture
(photometrically consistent to float precision), every pose exact, and the
orbit closing on itself so the loop-closure path gets a real loop with
ground truth. This upgrades tests/test_long_sequence.py's ping-pong replay
of 10 real frames: tracking + windowed BA + BoW loop detection +
geometric verification + pose-graph correction are exercised jointly at a
125-frame horizon with genuinely novel viewpoints per frame.

Camera: 44-degree FOV (KITTI-like). The frame-to-frame scale chain is
measurably FOV-sensitive — at 90-degree FOV (fx=160 at 320 px) the
monocular scale chain collapses ~20x over 100 frames on orbital motion,
while at fx=400 it holds; the engine's domain is KITTI-class optics.

Deterministic end to end (fixed SlamSystem seed, CPU backend from
conftest), so the asserted bounds carry no run-to-run jitter.
"""

import dataclasses

import numpy as np
import pytest

from maveric_slam_tpu.config import DEFAULT_CONFIG, CameraConfig
from maveric_slam_tpu.data import synthetic
from maveric_slam_tpu.models import superpoint as sp
from maveric_slam_tpu.slam import SlamSystem
from maveric_slam_tpu.utils import evaluation

H, W = 96, 320
ORBIT_N = 96  # frames per full orbit
N_TOTAL = 125  # ~1.3 orbits: the last ~30 frames revisit mapped poses


@pytest.fixture(scope="module")
def scene():
    cam = CameraConfig(fx=400.0, fy=400.0, cx=160.0, cy=48.0, width=W, height=H)
    cfg = dataclasses.replace(
        DEFAULT_CONFIG,
        camera=cam,
        frontend=dataclasses.replace(
            DEFAULT_CONFIG.frontend, height=H, width=W
        ),
        # Inlier threshold is a normalized-coordinate quantity: keep it at
        # ~3 px for THIS focal length (the default encodes 3 px at KITTI's
        # fx=718.856).
        ransac=dataclasses.replace(
            DEFAULT_CONFIG.ransac, inlier_thresh=3.0 / 400.0
        ),
    )
    K = cfg.working_camera.K
    base = synthetic.orbit_poses(ORBIT_N, radius=8.0)
    gt = np.stack([base[k % ORBIT_N] for k in range(N_TOTAL)])
    frames = [
        synthetic.render_box_room(K, gt[k], H, W) for k in range(N_TOTAL)
    ]
    return cfg, frames, gt


def test_long_horizon_engine_vs_odometry(scene):
    cfg, frames, gt = scene
    params = sp.load_params()
    slam = SlamSystem(params, cfg, ba_every=4, enable_loop_closure=True)
    for f in frames:
        slam.process(f)
    traj = slam.trajectory()
    odo = slam.odometry_trajectory()
    slam.close()

    st = slam.stats
    assert sum(s["valid"] for s in st) == len(st), "tracking dropout"
    assert int(np.median([s["inliers"] for s in st])) >= 40

    # Loop closures must fire on the revisit arc and match the right
    # frames: a revisit pair's indices differ by ~one orbit.
    assert slam.loop_events, "no loop closures accepted on a closing orbit"
    for e in slam.loop_events:
        assert abs((e.frame - e.matched_frame) - ORBIT_N) <= 6, (
            e.frame,
            e.matched_frame,
        )
        assert e.num_inliers >= 30

    m_full = evaluation.ate(traj, gt)
    m_odo = evaluation.ate(odo, gt)
    # Measured (deterministic): full 1.19 m, odometry 1.55 m over a
    # 125-frame / ~65 m path. Bounds carry margin for dependency bumps.
    assert m_full["ate_rmse"] < 2.0, m_full
    assert m_full["ate_rmse"] < 0.85 * m_odo["ate_rmse"], (m_full, m_odo)
