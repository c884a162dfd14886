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


class TestShardedTracker:
    def test_sharded_matches_unsharded_streams(self, mesh8):
        """Stream-sharded tracking must reproduce the vmapped single-device
        multi-stream step geometrically. Pure data parallelism runs the same
        math per stream, but the partitioned executable tiles reductions
        differently (per-device batch 1 vs batch 8), so float results carry
        ~1e-5 jitter — assert pose equivalence, not bitwise identity."""
        import dataclasses
        import os

        import jax.numpy as jnp

        from maveric_slam_tpu.config import DEFAULT_CONFIG
        from maveric_slam_tpu.data import kitti
        from maveric_slam_tpu.frontend import tracker as trk
        from maveric_slam_tpu.models import superpoint as sp
        from maveric_slam_tpu.parallel import sharded_tracker

        base = "/root/reference/datasets/kitti/sequences/00/image_0"
        if not os.path.exists(base):
            pytest.skip("reference dataset not mounted")
        cfg = dataclasses.replace(
            DEFAULT_CONFIG,
            ransac=dataclasses.replace(DEFAULT_CONFIG.ransac, num_hypotheses=64),
        )
        params = sp.load_params()
        img0 = kitti.load_frame(f"{base}/000160.png")
        img1 = kitti.load_frame(f"{base}/000161.png")
        s = 8
        imgs0 = jnp.asarray(np.stack([img0] * s))
        imgs1 = jnp.asarray(np.stack([img1] * s))

        ref_states = trk.init_states_batched(params, imgs0, cfg)
        ref_states, ref_step = trk.track_step_batched(
            params, ref_states, imgs1, cfg
        )

        smesh = sharded_tracker.make_stream_mesh(8)
        states = trk.init_states_batched(params, imgs0, cfg)
        states, imgs1_sh = sharded_tracker.shard_streams(states, imgs1, smesh)
        sparams = sharded_tracker.replicate_params(params, smesh)
        states, step = sharded_tracker.track_step_sharded(
            sparams, states, imgs1_sh, cfg
        )
        R, Rr = np.asarray(step.R), np.asarray(ref_step.R)
        t, tr = np.asarray(step.t), np.asarray(ref_step.t)
        for k in range(s):
            dR = R[k] @ Rr[k].T
            ang = np.degrees(
                np.arccos(np.clip((np.trace(dR) - 1.0) / 2.0, -1.0, 1.0))
            )
            assert ang < 0.05, (k, ang)
            cos_t = np.dot(t[k], tr[k]) / (
                np.linalg.norm(t[k]) * np.linalg.norm(tr[k]) + 1e-12
            )
            assert cos_t > 0.99999, (k, cos_t)
        d_inl = np.abs(
            np.asarray(step.num_inliers, np.int64)
            - np.asarray(ref_step.num_inliers, np.int64)
        )
        assert d_inl.max() <= 3, d_inl


class TestShardedLCD:
    def test_sharded_query_matches_single_device(self, mesh8):
        import jax.numpy as jnp

        from maveric_slam_tpu.loopclosure import lcd, sharded_lcd
        from maveric_slam_tpu.parallel import mesh as mesh_lib

        rng = np.random.default_rng(23)
        cap, vocab = 64, 2048
        db = lcd.create_database(cap, vocab)
        sets = []
        for f in range(cap + 9):  # wraps the ring
            ids = rng.choice(vocab, 64, replace=False).astype(np.int32)
            sets.append(ids)
            db = lcd.add_frame(db, jnp.asarray(ids), jnp.int32(f))

        lmesh = mesh_lib.make_mesh(8, axis=sharded_lcd.FRAME_AXIS)
        ldb = sharded_lcd.shard_database(db, lmesh)
        for probe in (cap - 1, cap + 3, 20):
            q = jnp.asarray(sets[probe])
            ref = lcd.query(
                db, q, jnp.int32(cap + 9), min_frame_gap=4, min_score=0.2
            )
            got = sharded_lcd.sharded_query(
                ldb, q, lmesh, jnp.int32(cap + 9),
                min_frame_gap=4, min_score=0.2,
            )
            assert int(got.best_frame) == int(ref.best_frame)
            assert int(got.best) == int(ref.best)
            np.testing.assert_allclose(
                float(got.best_score), float(ref.best_score), atol=1e-6
            )


class TestShardedAddFrame:
    def test_sharded_ring_matches_single_device(self, mesh8):
        """Build the database entirely through sharded_add_frame (including
        ring wraparound) — the table must equal the single-device build."""
        import jax.numpy as jnp

        from maveric_slam_tpu.loopclosure import lcd, sharded_lcd
        from maveric_slam_tpu.parallel import mesh as mesh_lib

        rng = np.random.default_rng(29)
        cap, vocab = 32, 1024
        db_ref = lcd.create_database(cap, vocab)
        lmesh = mesh_lib.make_mesh(8, axis=sharded_lcd.FRAME_AXIS)
        db_sh = sharded_lcd.shard_database(lcd.create_database(cap, vocab), lmesh)
        for f in range(cap + 5):
            ids = rng.choice(vocab, 48, replace=False).astype(np.int32)
            db_ref = lcd.add_frame(db_ref, jnp.asarray(ids), jnp.int32(f))
            db_sh = sharded_lcd.sharded_add_frame(
                db_sh, jnp.asarray(ids), jnp.int32(f), lmesh
            )
        np.testing.assert_array_equal(
            np.asarray(db_sh.multihot), np.asarray(db_ref.multihot)
        )
        np.testing.assert_array_equal(
            np.asarray(db_sh.counts), np.asarray(db_ref.counts)
        )
        np.testing.assert_array_equal(
            np.asarray(db_sh.frames), np.asarray(db_ref.frames)
        )
        assert int(db_sh.next_slot) == int(db_ref.next_slot)


class TestShardedPool:
    def test_word_sharded_pool_matches_single_device(self, mesh8):
        """observe/remove_old/covisibility on the word-axis-sharded pool
        must equal the single-device ops exactly over a multi-frame run."""
        import jax.numpy as jnp

        from maveric_slam_tpu.mapping import feature_pool, sharded_pool
        from maveric_slam_tpu.parallel import mesh as mesh_lib

        rng = np.random.default_rng(31)
        vocab, window = 2048, 4
        pmesh = mesh_lib.make_mesh(8, axis=sharded_pool.WORD_AXIS)
        p_ref = feature_pool.create(vocab, window=window)
        p_sh = sharded_pool.shard_pool(
            feature_pool.create(vocab, window=window), pmesh
        )
        for f in range(12):
            ids = rng.integers(-1, vocab, (96,)).astype(np.int32)
            p_ref = feature_pool.observe_batch(p_ref, jnp.asarray(ids), jnp.int32(f))
            p_ref = feature_pool.remove_old(p_ref, jnp.int32(f))
            p_sh = sharded_pool.observe_batch(p_sh, jnp.asarray(ids), f, pmesh)
            p_sh = sharded_pool.remove_old(p_sh, f, pmesh)
            q = rng.integers(-1, vocab, (64,)).astype(np.int32)
            w_ref = feature_pool.covisibility_weights(p_ref, jnp.asarray(q))
            w_sh = sharded_pool.covisibility_weights(p_sh, jnp.asarray(q), pmesh)
            np.testing.assert_array_equal(np.asarray(w_sh), np.asarray(w_ref))
        for name in ("first_seen", "last_seen", "num_sightings"):
            np.testing.assert_array_equal(
                np.asarray(getattr(p_sh, name)),
                np.asarray(getattr(p_ref, name)),
                err_msg=name,
            )
        assert int(feature_pool.check_invariant(p_sh, jnp.int32(11))) == 0
