"""Checkpoint/resume: a resumed run must continue identically."""

import os

import numpy as np
import pytest

from maveric_slam_tpu.config import DEFAULT_CONFIG
from maveric_slam_tpu.data import kitti
from maveric_slam_tpu.models import superpoint as sp
from maveric_slam_tpu.slam import SlamSystem
from maveric_slam_tpu.utils import checkpoint

BASE = "/root/reference/datasets/kitti/sequences/00/image_0"

pytestmark = pytest.mark.skipif(
    not os.path.exists(BASE), reason="reference dataset not mounted"
)


def test_save_restore_roundtrip(tmp_path):
    params = sp.load_params()
    frames = [kitti.load_frame(f"{BASE}/{f:06d}.png") for f in range(160, 166)]

    # Run 4 frames, checkpoint, run 2 more.
    a = SlamSystem(params, DEFAULT_CONFIG, ba_every=0, enable_loop_closure=True)
    for img in frames[:4]:
        a.process(img)
    ckpt = str(tmp_path / "ckpt")
    checkpoint.save(a, ckpt)
    for img in frames[4:]:
        a.process(img)

    # Fresh system restored from the checkpoint, then the same 2 frames.
    b = SlamSystem(params, DEFAULT_CONFIG, ba_every=0, enable_loop_closure=True)
    checkpoint.restore(b, ckpt)
    assert b.frame_idx == 3
    for img in frames[4:]:
        b.process(img)

    np.testing.assert_allclose(a.trajectory(), b.trajectory(), atol=1e-5)
    assert len(a.tracks.observations) == len(b.tracks.observations)
    assert a.stats == b.stats
