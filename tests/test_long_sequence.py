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


def test_loop_closure_repairs_odometry_error_at_long_horizon():
    """Loop closure must EARN its place: after a real odometry fault, the
    corrected trajectory must re-align revisits with their first-epoch
    twins measurably better than odometry alone (round-3 verdict #7 — the
    structural test above cannot show this because deterministic ping-pong
    odometry is periodic and essentially drift-free between epochs).

    Fault injection: five consecutive frames are blacked out around a
    ping-pong turnaround; the tracker flags them degenerate and emits
    constant-velocity fallback steps, extrapolating FORWARD while the true
    motion reverses — a persistent multi-meter offset for everything after.
    Loop edges (metric scale recovered from stored keyframe depths by
    depth-ratio triangulation) connect post-fault keyframes to pre-fault
    ones, and the persistent-edge pose graph must pull the trajectory back.
    """
    params = sp.load_params()
    images = [
        kitti.load_frame(f"{BASE}/{160 + i:06d}.png") for i in range(N_IMAGES)
    ]
    n_frames = 270
    rng = np.random.default_rng(42)
    stream = [
        np.clip(
            images[img_of(f)]
            + rng.normal(0, 0.02, images[0].shape).astype(np.float32),
            0,
            1,
        ).astype(np.float32)
        for f in range(n_frames)
    ]
    for g in (88, 89, 90, 91, 92):  # spans the f=90 turnaround
        stream[g] = np.zeros_like(stream[g]) + 0.02

    cfg = dataclasses.replace(
        DEFAULT_CONFIG,
        loop=dataclasses.replace(
            DEFAULT_CONFIG.loop,
            max_db_frames=128,  # large enough to retain pre-fault keyframes
            min_frame_gap=12,
            min_score=0.3,
            max_graph_nodes=32,
        ),
    )

    def run(lc):
        slam = SlamSystem(params, cfg, ba_every=0, enable_loop_closure=lc)
        for f in stream:
            slam.process(f)
        return slam.trajectory()[:, :3, 3]

    P_on = run(True)
    P_off = run(False)

    def epoch_drift(P):
        """Distance of late mid-corridor frames from their first-epoch
        (pre-fault) same-image twins — the pseudo-GT says it should be 0."""
        ds = []
        for f in range(160, n_frames):
            if 3 <= img_of(f) <= 7:
                ds.append(np.linalg.norm(P[f] - P[f % PERIOD]))
        return np.array(ds)

    d_on = epoch_drift(P_on)
    d_off = epoch_drift(P_off)
    # The fault leaves odometry ~2 m off its first epoch forever; loop
    # closure must recover a solid fraction of it (measured ~38%).
    assert d_on.mean() < 0.8 * d_off.mean(), (d_on.mean(), d_off.mean())
    # And not by corrupting the rest: corrected drift stays bounded.
    assert d_on.max() < d_off.max() + 1.5, (d_on.max(), d_off.max())
