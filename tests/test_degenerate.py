"""Degenerate-input robustness: the engine must keep streaming, flagged.

The reference's failure mode for any of these is printf + exit(1)
(src/top_N.c:91-94, src/local_feature_matching.c:116-118). Fixed-shape TPU
kernels instead risk silently producing NaN/garbage through -inf argmaxes
and rank-deficient SVDs; these tests pin the contract: degenerate frames
yield a *flagged* constant-velocity fallback step with finite outputs.
"""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from maveric_slam_tpu.config import DEFAULT_CONFIG
from maveric_slam_tpu.data import kitti
from maveric_slam_tpu.frontend import tracker as trk
from maveric_slam_tpu.geometry import ransac
from maveric_slam_tpu.models import superpoint as sp
from maveric_slam_tpu.ops import softmax_topn as st

BASE = "/root/reference/datasets/kitti/sequences/00/image_0"

needs_data = pytest.mark.skipif(
    not os.path.exists(BASE), reason="reference dataset not mounted"
)


class TestRansacDegenerate:
    def test_zero_valid_matches(self):
        key = jax.random.PRNGKey(0)
        m = 64
        p1 = jnp.zeros((m, 2))
        p2 = jnp.zeros((m, 2))
        mask = jnp.zeros((m,), bool)
        res = ransac.ransac_essential(
            key, p1, p2, mask, inlier_thresh=1e-2, num_hypotheses=64
        )
        assert int(res.num_inliers) == 0
        # inliers can only come from masked correspondences.
        assert not bool(res.inliers.any())

    def test_fewer_than_sample_size_valid(self):
        rng = np.random.default_rng(7)
        m = 64
        p1 = rng.normal(0, 0.3, (m, 2)).astype(np.float32)
        p2 = p1 + rng.normal(0, 0.01, (m, 2)).astype(np.float32)
        mask = np.zeros(m, bool)
        mask[:5] = True  # < 8-point minimum
        res = ransac.ransac_essential(
            jax.random.PRNGKey(1),
            jnp.asarray(p1),
            jnp.asarray(p2),
            jnp.asarray(mask),
            inlier_thresh=1e-2,
            num_hypotheses=64,
        )
        # No crash; inliers restricted to the 5 valid rows.
        assert int(res.num_inliers) <= 5
        assert not bool(res.inliers[~mask].any())

    def test_identical_points_zero_baseline(self):
        """A pure-revisit pair (identical frames) is E-degenerate; the call
        must not emit NaN counts and inliers stay within the mask."""
        rng = np.random.default_rng(8)
        m = 128
        p = rng.normal(0, 0.3, (m, 2)).astype(np.float32)
        mask = np.ones(m, bool)
        res = ransac.ransac_essential(
            jax.random.PRNGKey(2),
            jnp.asarray(p),
            jnp.asarray(p),
            jnp.asarray(mask),
            inlier_thresh=1e-2,
            num_hypotheses=64,
        )
        n = int(res.num_inliers)
        assert 0 <= n <= m


class TestTopNDegenerate:
    def test_all_dustbin_grid(self):
        grid = st.SoftmaxGrid(
            probs=jnp.full((24, 80), -1.0),
            indices=jnp.full((24, 80), 64, jnp.int32),
        )
        top = st.top_n_select(grid, n=100, mode="prob")
        assert int(top.num_selected) == 0
        assert not bool(top.mask.any())


@needs_data
class TestTrackerDegenerate:
    @pytest.fixture(scope="class")
    def params(self):
        return sp.load_params()

    @pytest.fixture(scope="class")
    def imgs(self):
        return [
            kitti.load_frame(f"{BASE}/{f:06d}.png") for f in (160, 161, 162)
        ]

    def test_black_frame_yields_flagged_fallback(self, params, imgs):
        cfg = DEFAULT_CONFIG
        black = np.zeros_like(imgs[0])
        state = trk.init_state(params, jnp.asarray(imgs[0]), cfg)
        # Establish motion so the constant-velocity fallback is nontrivial.
        state, step0 = trk.track_step(params, state, jnp.asarray(imgs[1]), cfg)
        assert bool(step0.valid)
        prev_R = np.asarray(step0.R)
        prev_t = np.asarray(step0.t)

        state, step1 = trk.track_step(params, state, jnp.asarray(black), cfg)
        assert not bool(step1.valid)
        np.testing.assert_allclose(np.asarray(step1.R), prev_R, atol=1e-6)
        np.testing.assert_allclose(np.asarray(step1.t), prev_t, atol=1e-6)
        assert np.isfinite(np.asarray(step1.R)).all()
        assert not bool(step1.match_mask.any())

        # Real -> black is also degenerate; then real -> real recovers.
        state, step2 = trk.track_step(params, state, jnp.asarray(imgs[1]), cfg)
        assert not bool(step2.valid)
        assert np.isfinite(np.asarray(step2.t)).all()
        state, step3 = trk.track_step(params, state, jnp.asarray(imgs[2]), cfg)
        assert bool(step3.valid)
        assert int(step3.num_inliers) > 20
        assert np.isfinite(np.asarray(step3.R)).all()
        # State never went non-finite.
        assert np.isfinite(np.asarray(state.scale))

    def test_repeated_identical_frames(self, params, imgs):
        """Zero-baseline stream: no crash, finite poses throughout."""
        cfg = DEFAULT_CONFIG
        state = trk.init_state(params, jnp.asarray(imgs[0]), cfg)
        for _ in range(3):
            state, step = trk.track_step(
                params, state, jnp.asarray(imgs[0]), cfg
            )
            assert np.isfinite(np.asarray(step.R)).all()
            assert np.isfinite(np.asarray(step.t)).all()
            assert np.isfinite(np.asarray(state.scale))
