"""Bundle adjustment on synthetic problems with known ground truth.

The reference's BA runs on random Jacobians and never solves anything
(local_bundle_adjustment.c:90-96, :86-88); these tests validate the full
pipeline: linearization -> Schur reduction -> Cholesky -> back-substitution
-> convergence to the true geometry.
"""

import numpy as np
import pytest
from scipy.spatial.transform import Rotation

from maveric_slam_tpu.backend import ba
from maveric_slam_tpu.ops import lie

K = np.array([[370.0, 0.0, 320.0], [0.0, 370.0, 96.0], [0.0, 0.0, 1.0]], np.float32)


def make_ba_problem(
    rng, num_poses=8, num_landmarks=64, pixel_noise=0.5, perturb=0.05
):
    """Forward-moving camera observing a static point cloud."""
    X = np.stack(
        [
            rng.uniform(-8, 8, num_landmarks),
            rng.uniform(-3, 3, num_landmarks),
            rng.uniform(8, 30, num_landmarks),
        ],
        axis=-1,
    )
    R_gt, t_gt = [], []
    for p in range(num_poses):
        w = rng.normal(size=3) * 0.01
        Rp = Rotation.from_rotvec(w).as_matrix()
        tp = np.array([0.0, 0.0, -0.8 * p]) + rng.normal(size=3) * 0.01
        R_gt.append(Rp)
        t_gt.append(tp)
    R_gt = np.stack(R_gt).astype(np.float32)
    t_gt = np.stack(t_gt).astype(np.float32)

    # Observations.
    p_cam = np.einsum("pij,lj->lpi", R_gt, X) + t_gt[None]
    uv = np.stack(
        [
            K[0, 0] * p_cam[..., 0] / p_cam[..., 2] + K[0, 2],
            K[1, 1] * p_cam[..., 1] / p_cam[..., 2] + K[1, 2],
        ],
        axis=-1,
    )
    mask = (
        (p_cam[..., 2] > 1.0)
        & (uv[..., 0] > 0)
        & (uv[..., 0] < 640)
        & (uv[..., 1] > 0)
        & (uv[..., 1] < 192)
    )
    uv = uv + rng.normal(size=uv.shape) * pixel_noise

    # Perturbed initialization (pose 0 stays as gauge anchor).
    R0, t0 = [R_gt[0]], [t_gt[0]]
    for p in range(1, num_poses):
        dw = rng.normal(size=3) * perturb * 0.3
        R0.append(Rotation.from_rotvec(dw).as_matrix() @ R_gt[p])
        t0.append(t_gt[p] + rng.normal(size=3) * perturb)
    X0 = X + rng.normal(size=X.shape) * perturb * 4

    problem = ba.BAProblem(
        K=K,
        R=np.stack(R0).astype(np.float32),
        t=np.stack(t0).astype(np.float32),
        X=X0.astype(np.float32),
        uv=uv.astype(np.float32),
        mask=mask,
    )
    return problem, (R_gt, t_gt, X)


def reproj_rmse(problem):
    r, _, _ = ba._residuals(problem)
    r = np.asarray(r)
    m = np.asarray(problem.mask)
    return float(np.sqrt((np.linalg.norm(r, axis=-1)[m] ** 2).mean()))


class TestBundleAdjust:
    def test_cost_decreases_and_converges(self):
        rng = np.random.default_rng(5)
        problem, _ = make_ba_problem(rng)
        before = reproj_rmse(problem)
        solved, stats = ba.bundle_adjust(problem, iterations=10)
        after = reproj_rmse(solved)
        assert after < before / 5, (before, after)
        # Converged near the noise floor (0.5 px noise).
        assert after < 1.0, after
        costs = np.asarray(stats.cost)
        assert costs[-1] < costs[0] / 10

    def test_recovers_poses_up_to_gauge(self):
        rng = np.random.default_rng(6)
        problem, (R_gt, t_gt, X_gt) = make_ba_problem(rng, pixel_noise=0.05)
        solved, _ = ba.bundle_adjust(problem, iterations=12)
        # Align: pose 0 is the gauge anchor; compare relative poses.
        for p in range(1, 8):
            R_rel_est = np.asarray(solved.R[p]) @ np.asarray(solved.R[0]).T
            R_rel_gt = R_gt[p] @ R_gt[0].T
            w = np.asarray(lie.so3_log((R_rel_est.T @ R_rel_gt)[None]))[0]
            assert np.degrees(np.linalg.norm(w)) < 0.2, p

    def test_noise_free_exact(self):
        rng = np.random.default_rng(7)
        problem, _ = make_ba_problem(rng, pixel_noise=0.0, perturb=0.02)
        solved, _ = ba.bundle_adjust(problem, iterations=12)
        assert reproj_rmse(solved) < 5e-2

    def test_masked_factors_ignored(self):
        rng = np.random.default_rng(8)
        problem, _ = make_ba_problem(rng)
        # Corrupt every masked-out observation; result must be unaffected.
        uv_bad = np.asarray(problem.uv).copy()
        uv_bad[~np.asarray(problem.mask)] = 1e5
        problem_bad = problem._replace(uv=uv_bad)
        s1, _ = ba.bundle_adjust(problem, iterations=5)
        s2, _ = ba.bundle_adjust(problem_bad, iterations=5)
        np.testing.assert_allclose(np.asarray(s1.t), np.asarray(s2.t), atol=1e-5)

    def test_schur_equals_direct_solve(self):
        """The Schur-reduced pose solution must equal solving the full
        (unreduced) normal system directly — validates the elimination
        algebra (the core of the reference kernel)."""
        rng = np.random.default_rng(9)
        problem, _ = make_ba_problem(rng, num_landmarks=24, pixel_noise=0.2)
        H_ll, b_l, H_pp, b_p, W, _ = ba.build_normal_blocks(problem, 2.0)
        lam = 1e-3
        S, rhs, A_inv = ba.reduce_schur(H_ll, b_l, H_pp, b_p, W, lam)
        dx_p = np.asarray(ba.solve_reduced(S, rhs, gauge_weight=1e8))

        # Direct dense solve of the full system.
        L, P = 24, 8
        n = P * 6 + L * 3
        H = np.zeros((n, n))
        b = np.zeros(n)
        H_pp_n = np.asarray(H_pp)
        for p in range(P):
            H[p * 6 : p * 6 + 6, p * 6 : p * 6 + 6] = H_pp_n[p] + lam * np.eye(6)
        b[: P * 6] = np.asarray(b_p).reshape(-1)
        H_ll_n = np.asarray(H_ll)
        W_n = np.asarray(W)
        for l in range(L):
            o = P * 6 + l * 3
            H[o : o + 3, o : o + 3] = H_ll_n[l] + lam * np.eye(3)
            b[o : o + 3] = np.asarray(b_l)[l]
            for p in range(P):
                H[p * 6 : p * 6 + 6, o : o + 3] = W_n[l, p]
                H[o : o + 3, p * 6 : p * 6 + 6] = W_n[l, p].T
        H[:6, :6] += 1e8 * np.eye(6)
        dx = np.linalg.solve(H, b)
        # The elimination algebra is exact (verified 2e-11 in f64); the
        # remaining difference is f32 roundoff through the cond~1e9 gauge
        # prior, so compare with a conditioning-aware tolerance.
        np.testing.assert_allclose(
            dx_p.reshape(-1), dx[: P * 6], atol=0.04 * np.abs(dx[: P * 6]).max()
        )


class TestSparseBA:
    """Factor-list BA (backend.sparse_ba) vs the dense-grid solver at
    realistic ~35% observation density (round-2 verdict #9)."""

    def _sparse_problem(self, density=0.35, seed=21):
        from maveric_slam_tpu.backend import sparse_ba

        rng = np.random.default_rng(seed)
        problem, gt = make_ba_problem(rng, num_landmarks=96)
        keep = rng.random(np.asarray(problem.mask).shape) < density
        # Keep the problem solvable: every landmark needs >= 2 obs, every
        # pose >= a few.
        mask = np.asarray(problem.mask) & keep
        need = mask.sum(1) < 2
        mask[need, :2] = np.asarray(problem.mask)[need, :2]
        import jax.numpy as jnp
        problem = problem._replace(mask=jnp.asarray(mask))
        return problem, sparse_ba.from_dense(problem), gt

    def test_matches_dense_solver(self):
        from maveric_slam_tpu.backend import sparse_ba

        dense, sparse, _ = self._sparse_problem()
        solved_d, stats = ba.bundle_adjust(dense, iterations=6)
        solved_s, costs = sparse_ba.bundle_adjust(sparse, iterations=6)
        # Identical per-factor arithmetic, different summation order.
        np.testing.assert_allclose(
            np.asarray(solved_s.t), np.asarray(solved_d.t), atol=2e-3
        )
        np.testing.assert_allclose(
            np.asarray(solved_s.R), np.asarray(solved_d.R), atol=2e-4
        )
        np.testing.assert_allclose(
            np.asarray(solved_s.X), np.asarray(solved_d.X), atol=5e-3
        )
        # Costs agree at every iteration.
        np.testing.assert_allclose(
            np.asarray(costs), np.asarray(stats.cost[: costs.shape[0]]),
            rtol=1e-3,
        )

    def test_converges(self):
        from maveric_slam_tpu.backend import sparse_ba

        _, sparse, _ = self._sparse_problem(seed=22)
        _, costs = sparse_ba.bundle_adjust(sparse, iterations=8)
        c = np.asarray(costs)
        assert c[-1] < 0.05 * c[0], c
