"""Distributed BA on a virtual 8-device mesh vs the single-chip solver.

Validates the communication pattern (factor ownership partitions, one psum
per iteration) by requiring sharded == unsharded results. Runs on the
xla_force_host_platform_device_count=8 CPU mesh from conftest.
"""

import jax
import numpy as np
import pytest

from maveric_slam_tpu.backend import ba
from maveric_slam_tpu.parallel import mesh as mesh_lib
from maveric_slam_tpu.parallel import sharded_ba
from tests.test_ba import make_ba_problem, reproj_rmse


@pytest.fixture(scope="module")
def mesh8():
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")
    return mesh_lib.make_mesh(8)


class TestShardedBA:
    def test_matches_single_chip(self, mesh8):
        rng = np.random.default_rng(17)
        problem, _ = make_ba_problem(rng, num_landmarks=64)
        solved_1, stats = ba.bundle_adjust(problem, iterations=6)
        sharded_in = sharded_ba.shard_problem(problem, mesh8)
        solved_8, costs = sharded_ba.sharded_bundle_adjust(
            sharded_in, mesh8, iterations=6
        )
        # Same math, different reduction order: tight but not bitwise.
        np.testing.assert_allclose(
            np.asarray(solved_8.t), np.asarray(solved_1.t), atol=1e-3
        )
        np.testing.assert_allclose(
            np.asarray(solved_8.R), np.asarray(solved_1.R), atol=1e-4
        )
        np.testing.assert_allclose(
            np.asarray(costs), np.asarray(stats.cost[:-1]), rtol=1e-3
        )

    def test_converges_sharded(self, mesh8):
        rng = np.random.default_rng(18)
        problem, _ = make_ba_problem(rng, num_landmarks=128, pixel_noise=0.3)
        before = reproj_rmse(problem)
        sharded_in = sharded_ba.shard_problem(problem, mesh8)
        solved, costs = sharded_ba.sharded_bundle_adjust(
            sharded_in, mesh8, iterations=8
        )
        after = reproj_rmse(
            ba.BAProblem(
                K=problem.K,
                R=np.asarray(solved.R),
                t=np.asarray(solved.t),
                X=np.asarray(solved.X),
                uv=problem.uv,
                mask=problem.mask,
            )
        )
        assert after < before / 5, (before, after)
        assert after < 0.8

    def test_mesh_sizes(self):
        # The sharding works at any divisor of L (dryrun_multichip uses
        # several sizes).
        for n in (2, 4):
            if len(jax.devices()) < n:
                pytest.skip("not enough devices")
            m = mesh_lib.make_mesh(n)
            rng = np.random.default_rng(19)
            problem, _ = make_ba_problem(rng, num_landmarks=32)
            sharded_in = sharded_ba.shard_problem(problem, m)
            solved, costs = sharded_ba.sharded_bundle_adjust(
                sharded_in, m, iterations=3
            )
            assert np.isfinite(np.asarray(solved.t)).all()
            assert np.asarray(costs)[-1] < np.asarray(costs)[0]


class TestMultiHostStyleMesh:
    def test_2d_host_chip_mesh(self):
        """The multi-host sharding pattern: landmarks over ('host', 'chip'),
        reductions over both axes (DCN + ICI on real pods)."""
        import numpy as np
        from jax.sharding import Mesh

        if len(jax.devices()) < 8:
            pytest.skip("needs 8 virtual devices")
        mesh = Mesh(np.array(jax.devices()[:8]).reshape(2, 4), ("host", "chip"))
        rng = np.random.default_rng(20)
        problem, _ = make_ba_problem(rng, num_landmarks=64)
        solved_1, stats = ba.bundle_adjust(problem, iterations=4)
        sharded_in = sharded_ba.shard_problem(problem, mesh)
        solved_8, costs = sharded_ba.sharded_bundle_adjust(
            sharded_in, mesh, iterations=4
        )
        np.testing.assert_allclose(
            np.asarray(solved_8.t), np.asarray(solved_1.t), atol=1e-3
        )
        np.testing.assert_allclose(
            np.asarray(costs), np.asarray(stats.cost[:-1]), rtol=1e-3
        )
