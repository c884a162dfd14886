"""Relinearization numerics + pose-graph optimization with loop closure."""

import jax.numpy as jnp
import numpy as np
from scipy.spatial.transform import Rotation

from maveric_slam_tpu.backend import pose_graph, relin
from maveric_slam_tpu.ops import lie


class TestBetweenFactor:
    def test_zero_residual_at_truth(self):
        rng = np.random.default_rng(21)
        Ri = Rotation.random(4, random_state=1).as_matrix().astype(np.float32)
        ti = rng.normal(size=(4, 3)).astype(np.float32)
        Rj = Rotation.random(4, random_state=2).as_matrix().astype(np.float32)
        tj = rng.normal(size=(4, 3)).astype(np.float32)
        # Measurement exactly T_i^-1 T_j.
        Rii, tii = lie.se3_inverse(Ri, ti)
        Rm, tm = lie.se3_compose(Rii, tii, Rj, tj)
        r = np.asarray(relin.between_residual(Ri, ti, Rj, tj, Rm, tm))
        np.testing.assert_allclose(r, 0.0, atol=1e-5)

    def test_jacobians_match_finite_difference(self):
        rng = np.random.default_rng(22)
        Ri = Rotation.random(1, random_state=3).as_matrix()[0].astype(np.float32)
        ti = rng.normal(size=3).astype(np.float32)
        Rj = Rotation.random(1, random_state=4).as_matrix()[0].astype(np.float32)
        tj = rng.normal(size=3).astype(np.float32)
        Rm = Rotation.random(1, random_state=5).as_matrix()[0].astype(np.float32)
        tm = rng.normal(size=3).astype(np.float32)

        r0, Ji, Jj = relin.between_residual_jacobians(Ri, ti, Rj, tj, Rm, tm)
        eps = 1e-4
        for arg in (0, 1):
            J = np.asarray(Ji if arg == 0 else Jj)
            for k in range(6):
                xi = np.zeros(6, np.float32)
                xi[k] = eps
                dR, dt = lie.se3_exp(xi)
                if arg == 0:
                    R2, t2 = lie.se3_compose(dR, dt, Ri, ti)
                    r1 = relin.between_residual(R2, t2, Rj, tj, Rm, tm)
                else:
                    R2, t2 = lie.se3_compose(dR, dt, Rj, tj)
                    r1 = relin.between_residual(Ri, ti, R2, t2, Rm, tm)
                fd = (np.asarray(r1) - np.asarray(r0)) / eps
                np.testing.assert_allclose(J[:, k], fd, atol=5e-2, rtol=5e-2)

    def test_so3_local_jacobian_fixes_reference_bugs(self):
        # The reference's H accumulates w22 = w1*w2 (run_relin.c:121) and
        # H[2][0] += H[2][0] (:129). The correct J_l^-1 satisfies
        # J_l^-1(w) J_l(w) = I even for large angles.
        R = Rotation.from_rotvec([0.4, -1.1, 0.7]).as_matrix().astype(np.float32)
        J = np.asarray(relin.so3_local_jacobian(R[None]))[0]
        w = np.asarray(lie.so3_log(R[None]))[0]
        Jl = np.asarray(lie.so3_left_jacobian(w[None]))[0]
        np.testing.assert_allclose(J @ Jl, np.eye(3), atol=1e-5)


class TestPoseGraphOptimize:
    def make_drifting_loop(self, n=20, drift=0.02):
        """Square loop trajectory with odometry drift + one loop closure."""
        rng = np.random.default_rng(33)
        # GT: walk around a square, 5 poses per side.
        R_gt = [np.eye(3)]
        t_gt = [np.zeros(3)]
        headings = [0, np.pi / 2, np.pi, 3 * np.pi / 2]
        for side in range(4):
            Rh = Rotation.from_euler("y", headings[side]).as_matrix()
            for k in range(5):
                t_gt.append(t_gt[-1] + Rh @ np.array([0, 0, 1.0]))
                R_gt.append(Rh)
        R_gt = np.stack(R_gt)[: n + 1].astype(np.float32)
        t_gt = np.stack(t_gt)[: n + 1].astype(np.float32)

        # Odometry measurements with drift.
        Rm, tm = [], []
        for i in range(n):
            Rw, tw = lie.se3_inverse(R_gt[i], t_gt[i])
            Rr, tr = lie.se3_compose(Rw, tw, R_gt[i + 1], t_gt[i + 1])
            dw = rng.normal(size=3) * drift * 0.5
            Rr = Rotation.from_rotvec(dw).as_matrix().astype(np.float32) @ np.asarray(Rr)
            tr = np.asarray(tr) + rng.normal(size=3) * drift
            Rm.append(Rr)
            tm.append(tr)

        # Integrate drifted odometry for the initial guess.
        R0, t0 = [R_gt[0]], [t_gt[0]]
        for i in range(n):
            R0.append(np.asarray(R0[-1]) @ Rm[i])
            t0.append(np.asarray(t0[-1]) + np.asarray(R0[-2]) @ tm[i])
        R0 = np.stack(R0).astype(np.float32)
        t0 = np.stack(t0).astype(np.float32)

        # Loop-closure edge: pose n observes pose 0 at the true relative pose.
        Rw, tw = lie.se3_inverse(R_gt[n], t_gt[n])
        R_lc, t_lc = lie.se3_compose(Rw, tw, R_gt[0], t_gt[0])

        edge_i = np.array(list(range(n)) + [n], np.int32)
        edge_j = np.array(list(range(1, n + 1)) + [0], np.int32)
        R_meas = np.stack(Rm + [np.asarray(R_lc)]).astype(np.float32)
        t_meas = np.stack(tm + [np.asarray(t_lc)]).astype(np.float32)
        weight = np.ones(n + 1, np.float32)
        weight[-1] = 10.0  # trust the loop closure

        graph = pose_graph.PoseGraph(
            R=R0, t=t0, edge_i=edge_i, edge_j=edge_j,
            R_meas=R_meas, t_meas=t_meas, weight=weight,
        )
        return graph, (R_gt, t_gt)

    def test_loop_closure_reduces_drift(self):
        graph, (R_gt, t_gt) = self.make_drifting_loop()
        err_before = np.linalg.norm(np.asarray(graph.t) - t_gt, axis=-1)
        opt, costs = pose_graph.optimize(graph, iterations=10)
        err_after = np.linalg.norm(np.asarray(opt.t) - t_gt, axis=-1)
        assert costs[-1] < costs[0] / 100
        # Loop error is redistributed; random per-edge noise itself is not
        # correctable, so compare means, and require the loop to close.
        assert err_after.mean() < err_before.mean(), (
            err_before.mean(), err_after.mean(),
        )
        # End pose pulled back onto the loop start.
        assert err_after[-1] < 0.02, err_after[-1]

    def test_disabled_edges_have_no_effect(self):
        graph, _ = self.make_drifting_loop()
        # Zero-weight the loop closure: behaves like pure odometry (stays
        # near the drifted initialization, which is consistent already).
        w2 = np.asarray(graph.weight).copy()
        w2[-1] = 0.0
        g2 = graph._replace(weight=w2)
        opt, costs = pose_graph.optimize(g2, iterations=5)
        # Odometry-consistent init => nearly no update.
        assert np.abs(np.asarray(opt.t) - np.asarray(graph.t)).max() < 2e-2
