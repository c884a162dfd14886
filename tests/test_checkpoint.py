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

    # The restored keyframe entries must carry the loop-closure scale
    # fields (depth/depth_ok) — _verify_and_close_loop reads them
    # unconditionally, so a resume without them crash-loops on the first
    # accepted loop candidate.
    for entry_a, entry_b in zip(a.kf_store, b.kf_store):
        assert (entry_a is None) == (entry_b is None)
        if entry_a is not None:
            assert "depth" in entry_b and "depth_ok" in entry_b
            np.testing.assert_array_equal(entry_a["depth"], entry_b["depth"])
            np.testing.assert_array_equal(
                entry_a["depth_ok"], entry_b["depth_ok"]
            )
    # The host db-cursor mirror must track the restored device cursor.
    import jax.numpy as jnp  # noqa: F401

    assert b._next_slot == int(np.asarray(b.db.next_slot))


def test_loop_edges_and_cursor_roundtrip(tmp_path):
    """Retained loop edges survive a restore (a solve missing earlier
    edges silently reverts their corrections — slam.MAX_LOOP_EDGES
    invariant), and the kf_store slot cursor re-syncs to the db ring."""
    params = sp.load_params()
    frames = [kitti.load_frame(f"{BASE}/{f:06d}.png") for f in range(160, 164)]
    a = SlamSystem(params, DEFAULT_CONFIG, ba_every=0, enable_loop_closure=True)
    for img in frames:
        a.process(img)
    # Inject synthetic retained edges (as if loops had been accepted).
    rng = np.random.default_rng(0)
    for k in range(3):
        R = np.eye(3) + 0.01 * rng.standard_normal((3, 3))
        t = rng.standard_normal(3)
        a.loop_edges.append((k, k + 10, R.astype(np.float32), t.astype(np.float32)))
    ckpt = str(tmp_path / "ckpt")
    checkpoint.save(a, ckpt)

    b = SlamSystem(params, DEFAULT_CONFIG, ba_every=0, enable_loop_closure=True)
    checkpoint.restore(b, ckpt)
    assert len(b.loop_edges) == 3
    for (fi, fj, R, t), (gi, gj, S, u) in zip(a.loop_edges, b.loop_edges):
        assert (fi, fj) == (gi, gj)
        np.testing.assert_allclose(R, S)
        np.testing.assert_allclose(t, u)
    assert b._next_slot == a._next_slot == int(np.asarray(a.db.next_slot))
    a.close()
    b.close()
