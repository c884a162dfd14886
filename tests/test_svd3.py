"""Batched 3x3 SVD vs numpy (capability of reference include/svd/svd.h)."""

import numpy as np

from maveric_slam_tpu.ops.svd3 import polar_decomposition, svd3


def check_svd(A, atol=1e-4):
    U, s, V = (np.asarray(x) for x in svd3(A))
    # Reconstruction.
    recon = np.einsum("...ij,...j,...kj->...ik", U, s, V)
    np.testing.assert_allclose(recon, A, atol=atol)
    # Orthogonality + proper rotations.
    eye = np.broadcast_to(np.eye(3), U.shape)
    np.testing.assert_allclose(np.einsum("...ij,...ik->...jk", U, U), eye, atol=atol)
    np.testing.assert_allclose(np.einsum("...ij,...ik->...jk", V, V), eye, atol=atol)
    np.testing.assert_allclose(np.linalg.det(U), 1.0, atol=atol)
    np.testing.assert_allclose(np.linalg.det(V), 1.0, atol=atol)
    # Magnitudes match numpy's singular values (ours are signed).
    want = np.linalg.svd(A, compute_uv=False)
    np.testing.assert_allclose(np.abs(s), want, atol=atol)
    # Sorted by magnitude.
    assert np.all(np.abs(s)[..., 0] + 1e-6 >= np.abs(s)[..., 1])
    assert np.all(np.abs(s)[..., 1] + 1e-6 >= np.abs(s)[..., 2])


def test_random_matrices(rng):
    A = rng.normal(size=(256, 3, 3)).astype(np.float32)
    check_svd(A, atol=2e-4)


def test_negative_determinant(rng):
    A = rng.normal(size=(64, 3, 3)).astype(np.float32)
    A[: 32] *= -1  # mix signs
    check_svd(A, atol=2e-4)
    U, s, V = (np.asarray(x) for x in svd3(A))
    np.testing.assert_allclose(np.sign(s[..., 2]), np.sign(np.linalg.det(A)), atol=0)


def test_rank2_essential_like(rng):
    # Essential matrices have singular values (s, s, 0) — the exact case
    # pose recovery hits (reference: src/pnp_solver.c:168-194).
    def rot(n):
        from scipy.spatial.transform import Rotation
        return Rotation.random(n, random_state=3).as_matrix()

    R = rot(32)
    t = rng.normal(size=(32, 3))
    t /= np.linalg.norm(t, axis=-1, keepdims=True)
    tx = np.zeros((32, 3, 3))
    tx[:, 0, 1], tx[:, 0, 2] = -t[:, 2], t[:, 1]
    tx[:, 1, 0], tx[:, 1, 2] = t[:, 2], -t[:, 0]
    tx[:, 2, 0], tx[:, 2, 1] = -t[:, 1], t[:, 0]
    E = (tx @ R).astype(np.float32)
    U, s, V = (np.asarray(x) for x in svd3(E))
    np.testing.assert_allclose(np.abs(s[:, 0]), np.abs(s[:, 1]), atol=1e-4)
    np.testing.assert_allclose(s[:, 2], 0.0, atol=1e-4)
    recon = np.einsum("...ij,...j,...kj->...ik", U, s, V)
    np.testing.assert_allclose(recon, E, atol=2e-4)


def test_near_diagonal(rng):
    d = rng.normal(size=(16, 3)).astype(np.float32)
    A = np.zeros((16, 3, 3), dtype=np.float32)
    A[:, np.arange(3), np.arange(3)] = d
    check_svd(A, atol=1e-4)


def test_polar_decomposition(rng):
    A = rng.normal(size=(32, 3, 3)).astype(np.float32)
    # Force positive determinant so R P with P PSD is exact.
    A = np.where(np.linalg.det(A)[:, None, None] < 0, -A, A)
    R, P = (np.asarray(x) for x in polar_decomposition(A))
    np.testing.assert_allclose(R @ P, A, atol=2e-4)
    np.testing.assert_allclose(np.linalg.det(R), 1.0, atol=1e-4)
    np.testing.assert_allclose(P, np.swapaxes(P, -1, -2), atol=2e-4)
