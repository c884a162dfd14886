"""Failure detection + elastic recovery (utils/elastic.py).

Scenarios: an injected mid-run crash, a wedged (hanging) step, and a
corrupted-state step — each must be *detected*, recovered from the last
checkpoint, and the finished trajectory must equal an unbroken run's
exactly (the jitted step is deterministic, so checkpoint + replay is
bit-reproducing). The reference's behavior at any of these points is
exit(1) / a hang (src/top_N.c:91-94; no recovery exists there).
"""

import os
import time

import numpy as np
import pytest

from maveric_slam_tpu.config import DEFAULT_CONFIG
from maveric_slam_tpu.data import kitti
from maveric_slam_tpu.models import superpoint as sp
from maveric_slam_tpu.utils import elastic

BASE = "/root/reference/datasets/kitti/sequences/00/image_0"

pytestmark = pytest.mark.skipif(
    not os.path.exists(BASE), reason="reference dataset not mounted"
)


@pytest.fixture(scope="module")
def params():
    return sp.load_params()


@pytest.fixture(scope="module")
def frames():
    return [
        kitti.load_frame(os.path.join(BASE, f"{f:06d}.png"))
        for f in range(160, 170)
    ]


@pytest.fixture(scope="module")
def unbroken(params, frames):
    runner = elastic.ElasticRunner(
        params, DEFAULT_CONFIG, checkpoint_every=4, ba_every=0,
        enable_loop_closure=False,
    )
    system = runner.run(frames)
    assert runner.restarts == 0
    return system.trajectory()


def test_crash_recovers_to_identical_trajectory(
    params, frames, tmp_path, unbroken
):
    fired = []

    def hook(i, img):
        if i == 7 and not fired:
            fired.append(i)
            raise RuntimeError("injected device fault")

    runner = elastic.ElasticRunner(
        params, DEFAULT_CONFIG, checkpoint_dir=str(tmp_path),
        checkpoint_every=4, ba_every=0, enable_loop_closure=False,
        fault_hook=hook,
    )
    system = runner.run(frames)
    assert runner.restarts == 1
    assert "frame 7" in runner.failures[0]
    np.testing.assert_array_equal(system.trajectory(), unbroken)


def test_hang_detected_and_recovered(params, frames, tmp_path, unbroken):
    fired = []

    # Emulate a wedged *step* (device/tunnel hang): the first engine
    # instance's process() sleeps past the detector deadline at frame 6;
    # the replacement engine built by recovery is honest — a transient
    # wedge, which is the realistic failure mode.
    runner = elastic.ElasticRunner(
        params, DEFAULT_CONFIG, checkpoint_dir=str(tmp_path),
        checkpoint_every=4, ba_every=0, enable_loop_closure=False,
        step_timeout_s=1.0,
    )

    orig_process = None

    def make_sluggish(system):
        nonlocal orig_process
        orig_process = system.process.__func__

        def sluggish(self, image):
            if self.frame_idx + 1 == 6 and not fired:
                fired.append(6)
                time.sleep(3.0)  # exceeds the 1s deadline
            return orig_process(self, image)

        system.process = sluggish.__get__(system)

    make_sluggish(runner.system)
    system = runner.run(frames)
    assert runner.restarts == 1
    assert isinstance(runner.failures[0], str) and "frame 6" in runner.failures[0]
    np.testing.assert_array_equal(system.trajectory(), unbroken)


def test_state_corruption_detected(params, frames):
    runner = elastic.ElasticRunner(
        params, DEFAULT_CONFIG, checkpoint_every=0, max_restarts=0,
        ba_every=0, enable_loop_closure=False,
    )
    # Poison the composed pose after a step via the validate hook directly.
    runner.system.process(frames[0])
    runner.system.process(frames[1])
    runner.system.poses[-1][:3, :3] *= 3.0  # breaks det(R) == 1
    with pytest.raises(elastic.StateCorruption):
        elastic.FailureDetector.validate(runner.system)


def test_restart_budget_exhausts(params, frames, tmp_path):
    def hook(i, img):
        if i == 5:
            raise RuntimeError("permanent fault")

    runner = elastic.ElasticRunner(
        params, DEFAULT_CONFIG, checkpoint_dir=str(tmp_path),
        checkpoint_every=4, max_restarts=2, ba_every=0,
        enable_loop_closure=False, fault_hook=hook,
    )
    with pytest.raises(elastic.StepCrash):
        runner.run(frames)
    assert runner.restarts == 3  # budget (2) + the final raising attempt
