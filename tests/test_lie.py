"""Lie-group ops vs scipy ground truth.

Covers the capability of the reference's quaternion/SE3 library
(reference: src/types.c) and relinearization numerics (reference:
src/run_relin.c), including the regimes where the reference is buggy
(w22 typo at run_relin.c:121, H[2][0] self-add at :129).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from scipy.spatial.transform import Rotation

from maveric_slam_tpu.ops import lie

jax.config.update("jax_enable_x64", False)


def random_rotations(rng, n):
    return Rotation.random(n, random_state=np.random.RandomState(7)).as_matrix().astype(np.float32)


class TestQuaternions:
    def test_multiply_matches_scipy(self, rng):
        q1 = rng.normal(size=(32, 4)).astype(np.float32)
        q2 = rng.normal(size=(32, 4)).astype(np.float32)
        q1 /= np.linalg.norm(q1, axis=-1, keepdims=True)
        q2 /= np.linalg.norm(q2, axis=-1, keepdims=True)
        got = np.asarray(lie.quat_multiply(q1, q2))
        # scipy uses (x, y, z, w); ours is (w, x, y, z).
        r1 = Rotation.from_quat(np.roll(q1, -1, axis=-1))
        r2 = Rotation.from_quat(np.roll(q2, -1, axis=-1))
        want = np.roll((r1 * r2).as_quat(), 1, axis=-1)
        # Quaternion double-cover: compare up to sign.
        sign = np.sign(np.sum(got * want, axis=-1, keepdims=True))
        np.testing.assert_allclose(got, sign * want, atol=1e-5)

    def test_rotate_matches_matrix(self, rng):
        q = rng.normal(size=(16, 4)).astype(np.float32)
        q /= np.linalg.norm(q, axis=-1, keepdims=True)
        v = rng.normal(size=(16, 3)).astype(np.float32)
        got = np.asarray(lie.quat_rotate(q, v))
        R = np.asarray(lie.quat_to_matrix(q))
        want = np.einsum("nij,nj->ni", R, v)
        np.testing.assert_allclose(got, want, atol=1e-5)

    def test_quat_matrix_roundtrip(self, rng):
        R = random_rotations(rng, 64)
        q = lie.matrix_to_quat(R)
        R2 = np.asarray(lie.quat_to_matrix(q))
        np.testing.assert_allclose(R, R2, atol=1e-5)


class TestSO3:
    def test_exp_matches_scipy(self, rng):
        w = rng.normal(size=(64, 3)).astype(np.float32)
        got = np.asarray(lie.so3_exp(w))
        want = Rotation.from_rotvec(w).as_matrix()
        np.testing.assert_allclose(got, want, atol=1e-5)

    def test_log_matches_scipy(self, rng):
        R = random_rotations(rng, 64)
        got = np.asarray(lie.so3_log(R))
        want = Rotation.from_matrix(R).as_rotvec()
        np.testing.assert_allclose(got, want, atol=1e-4)

    def test_log_near_identity(self):
        # The gtsam issue-746 regime the reference cites (run_relin.c:76).
        w = np.array([[1e-6, -2e-6, 1e-7], [0.0, 0.0, 0.0]], dtype=np.float32)
        R = np.asarray(lie.so3_exp(w))
        got = np.asarray(lie.so3_log(R))
        np.testing.assert_allclose(got, w, atol=1e-7)

    def test_log_near_pi(self):
        axis = np.array([0.6, -0.64, 0.48])
        axis /= np.linalg.norm(axis)
        w = (np.pi - 1e-4) * axis
        R = Rotation.from_rotvec(w).as_matrix().astype(np.float32)[None]
        got = np.asarray(lie.so3_log(R))[0]
        np.testing.assert_allclose(got, w, atol=2e-3)

    def test_exp_log_roundtrip(self, rng):
        R = random_rotations(rng, 128)
        R2 = np.asarray(lie.so3_exp(lie.so3_log(R)))
        np.testing.assert_allclose(R, R2, atol=1e-4)

    def test_left_jacobian_finite_diff(self, rng):
        # exp(J_l(w) d) exp(w) ~ exp(w + d) for small d.
        w = rng.normal(size=(8, 3)).astype(np.float64) * 0.8
        d = rng.normal(size=(8, 3)).astype(np.float64) * 1e-5
        Jl = np.asarray(lie.so3_left_jacobian(jnp.asarray(w)))
        lhs = Rotation.from_rotvec(w + d).as_matrix()
        rhs = np.einsum(
            "nij,njk->nik",
            Rotation.from_rotvec(np.einsum("nij,nj->ni", Jl, d)).as_matrix(),
            Rotation.from_rotvec(w).as_matrix(),
        )
        np.testing.assert_allclose(lhs, rhs, atol=1e-8)

    def test_inverse_left_jacobian(self, rng):
        # This is the fixed version of the reference's relinearization H
        # (run_relin.c:135-151): J_l^{-1}(w) J_l(w) = I.
        w = rng.normal(size=(32, 3)).astype(np.float32)
        Jl = np.asarray(lie.so3_left_jacobian(w))
        Jinv = np.asarray(lie.so3_inverse_left_jacobian(w))
        prod = np.einsum("nij,njk->nik", Jinv, Jl)
        np.testing.assert_allclose(prod, np.broadcast_to(np.eye(3), prod.shape), atol=1e-4)

    def test_reference_logmap_case(self):
        # The exact rotation pair exercised by the reference driver
        # (run_relin.c:153-165): R2 is a 30-degree z-rotation.
        R2 = np.array(
            [[0.8660, 0.5, 0.0], [-0.5, 0.8660, 0.0], [0.0, 0.0, 1.0]],
            dtype=np.float32,
        )
        w = np.asarray(lie.so3_log(R2[None]))[0]
        want = Rotation.from_matrix(R2).as_rotvec()
        np.testing.assert_allclose(w, want, atol=1e-4)


class TestSE3:
    def test_compose_apply(self, rng):
        R1 = random_rotations(rng, 8)
        R2 = random_rotations(rng, 8)
        t1 = rng.normal(size=(8, 3)).astype(np.float32)
        t2 = rng.normal(size=(8, 3)).astype(np.float32)
        p = rng.normal(size=(8, 3)).astype(np.float32)
        R, t = lie.se3_compose(R1, t1, R2, t2)
        got = np.asarray(lie.se3_apply(R, t, p))
        want = np.asarray(lie.se3_apply(R1, t1, lie.se3_apply(R2, t2, p)))
        np.testing.assert_allclose(got, want, atol=1e-5)

    def test_inverse(self, rng):
        R = random_rotations(rng, 8)
        t = rng.normal(size=(8, 3)).astype(np.float32)
        Ri, ti = lie.se3_inverse(R, t)
        Rc, tc = lie.se3_compose(R, t, Ri, ti)
        np.testing.assert_allclose(Rc, np.broadcast_to(np.eye(3), Rc.shape), atol=1e-5)
        np.testing.assert_allclose(tc, np.zeros_like(tc), atol=1e-5)

    def test_exp_log_roundtrip(self, rng):
        xi = rng.normal(size=(32, 6)).astype(np.float32)
        # Keep |omega| < pi: log returns the canonical rotation vector, so the
        # roundtrip is only the identity inside the injectivity radius.
        xi[:, 3:] *= 0.5
        R, t = lie.se3_exp(xi)
        xi2 = np.asarray(lie.se3_log(R, t))
        np.testing.assert_allclose(xi, xi2, atol=1e-4)
