"""Long-sequence structural correctness: bounded state + LCD wraparound.

Drives the full SLAM engine for 500+ frames by ping-ponging over the 10
contiguous KITTI frames (160..169), which injects genuine revisits every
~18 frames. The loop-closure ring is deliberately tiny (24 slots) so it
wraps many times; the pose-graph cap is small so skeleton subsampling is
exercised. This is the regime the reference never reaches (its largest
driver runs 14 frames) and where slot-arithmetic recency gating breaks.
"""

import dataclasses
import os

import numpy as np
import pytest

from maveric_slam_tpu.config import DEFAULT_CONFIG
from maveric_slam_tpu.data import kitti
from maveric_slam_tpu.models import superpoint as sp
from maveric_slam_tpu.slam import SlamSystem

BASE = "/root/reference/datasets/kitti/sequences/00/image_0"

pytestmark = pytest.mark.skipif(
    not os.path.exists(BASE), reason="reference dataset not mounted"
)

N_IMAGES = 10
PERIOD = 2 * (N_IMAGES - 1)


def img_of(frame: int) -> int:
    """Image index shown at a ping-pong frame."""
    k = frame % PERIOD
    return k if k < N_IMAGES else PERIOD - k


def test_500_frames_bounded_state_and_wrapped_loop_closures():
    params = sp.load_params()
    images = [
        kitti.load_frame(f"{BASE}/{160 + i:06d}.png") for i in range(N_IMAGES)
    ]

    ring = 24
    cfg = dataclasses.replace(
        DEFAULT_CONFIG,
        loop=dataclasses.replace(
            DEFAULT_CONFIG.loop,
            max_db_frames=ring,
            min_frame_gap=12,
            min_score=0.3,
            max_graph_nodes=32,
        ),
    )
    slam = SlamSystem(params, cfg, ba_every=0, enable_loop_closure=True)

    n_frames = 520
    for f in range(n_frames):
        slam.process(images[img_of(f)])

    # --- bounded state -------------------------------------------------- #
    assert len(slam.kf_store) == ring  # fixed ring, never grows
    stored = [e for e in slam.kf_store if e is not None]
    assert len(stored) == ring  # fully wrapped (many times over)
    assert slam.db.multihot.shape[0] == ring
    # Keyframe cadence bounded by the policy's max_interval.
    n_kf = len(slam.kf_frames)
    assert n_kf <= n_frames // cfg.keyframe.min_interval
    assert n_kf >= n_frames // cfg.keyframe.max_interval - 1
    # Track table is bounded by cell count regardless of sequence length.
    assert len(slam.tracks.observations) <= 4 * cfg.frontend.num_cells

    # --- the ring wrapped: stored frames are only recent keyframes ------- #
    stored_frames = sorted(e["frame"] for e in stored)
    assert stored_frames[0] >= n_frames - ring * cfg.keyframe.max_interval - 1
    db_frames = np.asarray(slam.db.frames)
    assert set(db_frames.tolist()) == set(e["frame"] for e in stored)

    # --- loop closures fire, including far past ring wraparound ---------- #
    assert slam.loop_events, "no loop closures on a looping sequence"
    wrap_point = ring * cfg.keyframe.max_interval  # frames until first wrap
    late = [e for e in slam.loop_events if e.frame > 3 * wrap_point]
    assert late, (
        f"no loop closures after frame {3 * wrap_point} "
        f"(events: {[(e.frame, e.matched_frame) for e in slam.loop_events]})"
    )
    # Every match must pair frames showing (near-)identical imagery.
    for ev in slam.loop_events:
        assert abs(img_of(ev.frame) - img_of(ev.matched_frame)) <= 1, ev
        assert ev.frame - ev.matched_frame >= cfg.loop.min_frame_gap, ev

    # --- trajectory stays finite over the whole run ---------------------- #
    traj = slam.trajectory()
    assert traj.shape == (n_frames, 4, 4)
    assert np.isfinite(traj).all()
