"""End-to-end pairwise PnP vs KITTI ground truth.

The minimum end-to-end slice (SURVEY.md section 7, step 6): image pair ->
features -> matches -> [R|t], checked against relative transforms derived
from outputs/00.txt (the reference's own GT artifact, via the
compute_pairwise_diff.py capability reimplemented in utils.trajectory).
"""

import os

import numpy as np
import pytest

from maveric_slam_tpu.config import DEFAULT_CONFIG
from maveric_slam_tpu.data import kitti
from maveric_slam_tpu.frontend import pairwise
from maveric_slam_tpu.models import superpoint as sp
from maveric_slam_tpu.ops import lie
from maveric_slam_tpu.utils import trajectory

BASE = "/root/reference/datasets/kitti/sequences/00/image_0"
GT = "/root/reference/outputs/00.txt"

pytestmark = pytest.mark.skipif(
    not os.path.exists(GT), reason="reference artifacts not mounted"
)


@pytest.fixture(scope="module")
def params():
    return sp.load_params()


@pytest.fixture(scope="module")
def gt_poses():
    return kitti.read_poses(GT)


def run_pair(params, a, b):
    img0 = kitti.load_frame(f"{BASE}/{a:06d}.png")
    img1 = kitti.load_frame(f"{BASE}/{b:06d}.png")
    return pairwise.pairwise_pose(params, img0, img1, DEFAULT_CONFIG)


def errors(res, gt_poses, a, b):
    R, t = np.array(res.R), np.array(res.t)
    T_rel = np.linalg.inv(gt_poses[b]) @ gt_poses[a]
    Rr, tr = T_rel[:3, :3].astype(np.float32), T_rel[:3, 3]
    w = np.array(lie.so3_log((R.T @ Rr)[None]))[0]
    rot_deg = np.degrees(np.linalg.norm(w))
    cos = float(np.dot(t, tr) / np.linalg.norm(tr))
    tdir_deg = np.degrees(np.arccos(np.clip(abs(cos), -1, 1)))
    return rot_deg, tdir_deg, np.sign(cos)


@pytest.mark.parametrize("a,b", [(0, 1), (160, 161), (165, 166)])
def test_consecutive_pairs(params, gt_poses, a, b):
    res = run_pair(params, a, b)
    assert int(res.num_matches) > 100, int(res.num_matches)
    assert int(res.num_inliers) > 60, int(res.num_inliers)
    rot_deg, tdir_deg, sign = errors(res, gt_poses, a, b)
    assert rot_deg < 0.5, rot_deg
    assert tdir_deg < 5.0, tdir_deg
    assert sign > 0  # forward motion recovered with the right sign


def test_wider_baseline(params, gt_poses):
    # Frames 10 apart (0 -> 10): more parallax, still tracks.
    res = run_pair(params, 0, 10)
    # ~8.6 m baseline: far fewer dot>0.8 survivors, but pose still recovers.
    assert int(res.num_inliers) > 15
    rot_deg, tdir_deg, sign = errors(res, gt_poses, 0, 10)
    assert rot_deg < 5.0, rot_deg
    assert tdir_deg < 6.0, tdir_deg
    assert sign > 0
