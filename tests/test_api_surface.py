"""Unit coverage for reference-parity API functions with no other caller.

These back rows of the SURVEY.md component inventory (cited per test) but
are not exercised by the engine's hot path; round-4 verdict's
"test-or-evict" rule says library surface must either carry a test or go.
Each test pins the function against an independent numerical reference.
"""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from scipy.spatial.transform import Rotation

from maveric_slam_tpu.backend import pose_graph
from maveric_slam_tpu.geometry import projection
from maveric_slam_tpu.models import superpoint as sp
from maveric_slam_tpu.ops import lie, linalg, matching, softmax_topn
from maveric_slam_tpu.utils import trajectory

REF = "/root/reference"


class TestTwoWayMatcher:
    """Component #20 (PointTracker's nn_match_two_way,
    superpoint_inference.py:290-332)."""

    def test_mutual_consistency_and_threshold(self):
        rng = np.random.default_rng(0)
        a = rng.normal(size=(40, 32)).astype(np.float32)
        a /= np.linalg.norm(a, axis=-1, keepdims=True)
        # b = permuted noisy copies of a: ground-truth matches are known.
        perm = rng.permutation(40)
        b = a[perm] + 0.05 * rng.normal(size=(40, 32)).astype(np.float32)
        b /= np.linalg.norm(b, axis=-1, keepdims=True)
        m = matching.nn_match_two_way(
            jnp.asarray(a), jnp.asarray(b),
            jnp.ones(40, bool), jnp.ones(40, bool), nn_thresh=0.7,
        )
        idx = np.asarray(m.index)
        ok = np.asarray(m.mask)
        # Every accepted match must be the true permutation target.
        assert ok.sum() >= 35
        assert (perm[idx[ok]] == np.nonzero(ok)[0]).all()
        # Distances are the L2 metric on the unit sphere.
        d_ref = np.linalg.norm(a - b[idx], axis=-1)
        np.testing.assert_allclose(np.asarray(m.score)[ok], d_ref[ok], atol=1e-5)
        # Threshold respected.
        assert (np.asarray(m.score)[ok] < 0.7).all()

    def test_masked_rows_never_match(self):
        rng = np.random.default_rng(1)
        a = rng.normal(size=(8, 16)).astype(np.float32)
        a /= np.linalg.norm(a, axis=-1, keepdims=True)
        maskA = np.array([True] * 4 + [False] * 4)
        m = matching.nn_match_two_way(
            jnp.asarray(a), jnp.asarray(a),
            jnp.asarray(maskA), jnp.ones(8, bool),
        )
        assert not np.asarray(m.mask)[4:].any()


class TestRelativeTransforms:
    """Component #23 (GT relative-transform extractor,
    compute_pairwise_diff.py:15-41) and its trajectory-side inverse."""

    def _poses(self, n=6):
        rng = np.random.default_rng(2)
        T = np.tile(np.eye(4), (n, 1, 1))
        for k in range(n):
            T[k, :3, :3] = Rotation.random(random_state=int(rng.integers(1 << 16))).as_matrix()
            T[k, :3, 3] = rng.normal(size=3) * 5
        return T

    def test_kitti_relative_roundtrip(self):
        from maveric_slam_tpu.data import kitti

        poses = self._poses()
        R, t = kitti.relative_transforms(poses)
        # Definition: T_rel = T2 @ inv(T1); verify by recomposition.
        for k in range(len(poses) - 1):
            T_rel = np.eye(4)
            T_rel[:3, :3], T_rel[:3, 3] = R[k], t[k]
            np.testing.assert_allclose(T_rel @ poses[k], poses[k + 1], atol=1e-9)

    def test_trajectory_relative_inverts_compose(self):
        poses = self._poses()
        R, t = trajectory.relative_from_poses(poses)
        # compose_trajectory chains T_c(i+1)_ci steps back into poses
        # anchored at identity; pre-multiply by the true first pose.
        rebuilt = poses[0] @ trajectory.compose_trajectory(list(R), list(t))
        np.testing.assert_allclose(rebuilt, poses, atol=1e-8)


class TestLieExtras:
    """Component #3/#13 math-core surface (types.c / run_relin.c parity)."""

    def test_vee_inverts_hat(self):
        w = jnp.asarray([0.3, -1.2, 0.7])
        np.testing.assert_allclose(np.asarray(lie.vee(lie.hat(w))), np.asarray(w))

    def test_quat_conjugate_is_inverse_rotation(self):
        rng = np.random.default_rng(3)
        q = rng.normal(size=4)
        q /= np.linalg.norm(q)
        v = rng.normal(size=3).astype(np.float32)
        r = lie.quat_rotate(jnp.asarray(q, jnp.float32), jnp.asarray(v))
        back = lie.quat_rotate(lie.quat_conjugate(jnp.asarray(q, jnp.float32)), r)
        np.testing.assert_allclose(np.asarray(back), v, atol=1e-5)

    def test_right_jacobian_matches_numerical(self):
        # Jr(w) satisfies Exp(w + dw) ~ Exp(w) Exp(Jr dw).
        rng = np.random.default_rng(4)
        w = rng.normal(size=3).astype(np.float32) * 0.7
        Jr = np.asarray(lie.so3_right_jacobian(jnp.asarray(w)))
        eps = 1e-4
        num = np.zeros((3, 3))
        R0 = np.asarray(lie.so3_exp(jnp.asarray(w)))
        for k in range(3):
            dw = np.zeros(3, np.float32)
            dw[k] = eps
            R1 = np.asarray(lie.so3_exp(jnp.asarray(w + dw)))
            num[:, k] = np.asarray(lie.so3_log(jnp.asarray(R0.T @ R1))) / eps
        np.testing.assert_allclose(Jr, num, atol=5e-3)
        # Inverse right jacobian is the matrix inverse.
        Jri = np.asarray(lie.so3_inverse_right_jacobian(jnp.asarray(w)))
        np.testing.assert_allclose(Jri @ Jr, np.eye(3), atol=1e-4)


class TestLinalgExtras:
    """Component #11's solver surface: the Cholesky the reference stubbed
    (local_bundle_adjustment.c:86-88) and the block-diagonal inverse
    (:79-84)."""

    def test_solve_psd(self):
        rng = np.random.default_rng(5)
        A = rng.normal(size=(7, 7)).astype(np.float32)
        A = A @ A.T + 7 * np.eye(7, dtype=np.float32)
        b = rng.normal(size=7).astype(np.float32)
        x = np.asarray(linalg.solve_psd(jnp.asarray(A), jnp.asarray(b)))
        np.testing.assert_allclose(A @ x, b, atol=1e-3)

    def test_block_diag_inv(self):
        rng = np.random.default_rng(6)
        B = rng.normal(size=(32, 3, 3)).astype(np.float32)
        B = np.einsum("lij,lkj->lik", B, B) + 3 * np.eye(3, dtype=np.float32)
        inv = np.asarray(linalg.block_diag_inv(jnp.asarray(B)))
        eye = np.einsum("lij,ljk->lik", B, inv)
        np.testing.assert_allclose(eye, np.tile(np.eye(3), (32, 1, 1)), atol=1e-3)


class TestProjectionFactor:
    """Component #10: the projection factor whose Jacobian the reference
    never implemented (src/projection_factor.c:27-33)."""

    def test_residual_definition(self):
        K = np.array([[400.0, 0, 160], [0, 400.0, 96], [0, 0, 1]], np.float32)
        R = Rotation.from_euler("xyz", [0.1, -0.2, 0.05]).as_matrix().astype(np.float32)
        t = np.array([0.3, -0.1, 0.5], np.float32)
        X = np.array([[1.0, -0.5, 8.0]], np.float32)
        p = (R @ X[0] + t)
        z = np.array([[K[0, 0] * p[0] / p[2] + K[0, 2], K[1, 1] * p[1] / p[2] + K[1, 2]]], np.float32)
        r = np.asarray(
            projection.reprojection_residual(
                jnp.asarray(K), jnp.asarray(R), jnp.asarray(t),
                jnp.asarray(X), jnp.asarray(z),
            )
        )
        np.testing.assert_allclose(r, 0.0, atol=1e-4)


class TestPoseGraphEdges:
    def test_odometry_edges_measurement_convention(self):
        rng = np.random.default_rng(7)
        R_rel = Rotation.random(3, random_state=8).as_matrix().astype(np.float32)
        t_rel = rng.normal(size=(3, 3)).astype(np.float32)
        i, j, R_m, t_m = pose_graph.odometry_edges(
            jnp.asarray(R_rel), jnp.asarray(t_rel)
        )
        np.testing.assert_array_equal(np.asarray(i), [0, 1, 2])
        np.testing.assert_array_equal(np.asarray(j), [1, 2, 3])
        # Measurement is the inverse of the step: R_m = R^T, t_m = -R^T t.
        for k in range(3):
            np.testing.assert_allclose(
                np.asarray(R_m)[k], R_rel[k].T, atol=1e-6
            )
            np.testing.assert_allclose(
                np.asarray(t_m)[k], -R_rel[k].T @ t_rel[k], atol=1e-5
            )


class TestDetectorGridUtils:
    def test_cell_to_xy(self):
        cells = jnp.asarray([0, 1, 80, 163])
        idx = jnp.asarray([0, 9, 63, 17])
        x, y = softmax_topn.cell_to_xy(cells, idx, grid_w=80)
        # cell -> (row, col) = (c // 80, c % 80); channel k -> (k%8, k//8).
        np.testing.assert_array_equal(np.asarray(x), [0, 8 + 1, 7, 3 * 8 + 1])
        np.testing.assert_array_equal(np.asarray(y), [0, 1, 8 + 7, 2 * 8 + 2])

    def test_grid_to_patch_major_reference_order(self):
        g = jnp.arange(2 * 3 * 4 * 5).reshape(2, 3, 4, 5)
        out = np.asarray(sp.grid_to_patch_major(g))
        gn = np.asarray(g)
        # patch index = col * Hc + row (reference bake order).
        for col in range(4):
            for row in range(3):
                np.testing.assert_array_equal(
                    out[:, col * 3 + row], gn[:, row, col]
                )


@pytest.mark.skipif(not os.path.exists(REF), reason="reference not mounted")
class TestRefdataFloatFeatures:
    """Component #28's float feature headers (pair0.h:12-21: 395/401
    keypoints with 256-d descriptors)."""

    def test_pair0_shapes(self):
        from maveric_slam_tpu.data import refdata

        d = refdata.float_features("pair0")
        assert d["xs0"].shape == d["ys0"].shape == d["scores0"].shape
        assert d["desc0"].shape == (d["xs0"].shape[0], 256)
        assert d["desc1"].shape == (d["xs1"].shape[0], 256)
        assert {d["xs0"].shape[0], d["xs1"].shape[0]} == {395, 401}


class TestVisualization:
    def test_draw_epilines_smoke(self, tmp_path):
        from maveric_slam_tpu.utils import visualization

        rng = np.random.default_rng(9)
        img = (rng.random((48, 64)) * 255).astype(np.float32) / 255.0
        xy = rng.uniform(5, 40, size=(6, 2)).astype(np.float32)
        F = np.eye(3, dtype=np.float32)
        out = visualization.draw_epilines(
            img, img, xy, xy, F, out_path=str(tmp_path / "epi.png")
        )
        assert out.ndim == 3 and out.shape[2] == 3
        assert (tmp_path / "epi.png").exists()


class TestProfilingTrace:
    def test_xla_trace_writes_profile(self, tmp_path):
        from maveric_slam_tpu.utils import profiling

        with profiling.xla_trace(str(tmp_path)):
            x = jnp.ones((8, 8)) @ jnp.ones((8, 8))
            jax.block_until_ready(x)
        # TensorBoard layout: plugins/profile/<run>/...
        found = list(tmp_path.rglob("*"))
        assert any("profile" in str(p) for p in found), found
