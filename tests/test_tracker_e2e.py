"""Frame-to-frame tracking over a KITTI 00 subsequence vs ground truth.

Workload config #2 (BASELINE.json): the tracking loop with quantized
SuperPoint features. Frames 160-169 are the longest consecutive run shipped
with the reference's dataset subset.
"""

import os

import numpy as np
import pytest

from maveric_slam_tpu.config import DEFAULT_CONFIG
from maveric_slam_tpu.data import kitti
from maveric_slam_tpu.frontend.tracker import Tracker
from maveric_slam_tpu.models import superpoint as sp
from maveric_slam_tpu.utils import evaluation

BASE = "/root/reference/datasets/kitti/sequences/00/image_0"
GT = "/root/reference/outputs/00.txt"

pytestmark = pytest.mark.skipif(
    not os.path.exists(GT), reason="reference artifacts not mounted"
)


@pytest.fixture(scope="module")
def tracked():
    params = sp.load_params()
    tracker = Tracker(params, DEFAULT_CONFIG)
    for f in range(160, 170):
        tracker.process(kitti.load_frame(f"{BASE}/{f:06d}.png"))
    gt = kitti.read_poses(GT)[160:170]
    return tracker, gt


def test_match_and_inlier_counts(tracked):
    tracker, _ = tracked
    for s in tracker.stats:
        assert s["matches"] > 30, s
        assert s["inliers"] > 15, s


def test_ate_against_gt(tracked):
    tracker, gt = tracked
    est = tracker.trajectory()
    m = evaluation.ate(est, gt)
    # ~7.3 m of path over 9 steps; ATE parity bound for the subsequence.
    assert m["ate_rmse"] < 0.25, m


def test_rpe_against_gt(tracked):
    tracker, gt = tracked
    est = tracker.trajectory()
    m = evaluation.rpe(est, gt)
    assert m["rpe_rot_deg_mean"] < 1.0, m
    assert m["rpe_tdir_deg_mean"] < 5.0, m


def test_scale_chain_is_sane(tracked):
    tracker, gt = tracked
    # GT step length is ~0.80 m and nearly constant; the monocular scale
    # chain is arbitrary globally but should stay within a factor ~2 of its
    # own median step-to-step.
    steps = np.array([np.linalg.norm(t) for _, t in tracker.rel_poses])
    med = np.median(steps)
    assert (steps > 0.4 * med).all() and (steps < 2.5 * med).all(), steps


def test_batched_streams_match_single():
    """Multi-stream batched tracking: stream 0 (same PRNG seed) must equal
    the single-stream tracker exactly."""
    import jax.numpy as jnp

    from maveric_slam_tpu.frontend import tracker as trk

    params = sp.load_params()
    f0 = kitti.load_frame(f"{BASE}/000160.png")
    f1 = kitti.load_frame(f"{BASE}/000161.png")
    states = trk.init_states_batched(
        params, jnp.asarray(np.stack([f0, f0])), DEFAULT_CONFIG
    )
    states, out = trk.track_step_batched(
        params, states, jnp.asarray(np.stack([f1, f1])), DEFAULT_CONFIG
    )
    s1 = trk.init_state(params, jnp.asarray(f0), DEFAULT_CONFIG, 0)
    s1, out1 = trk.track_step(params, s1, jnp.asarray(f1), DEFAULT_CONFIG)
    np.testing.assert_allclose(
        np.asarray(out.t)[0], np.asarray(out1.t), atol=1e-5
    )
    np.testing.assert_allclose(
        np.asarray(out.R)[0], np.asarray(out1.R), atol=1e-5
    )
