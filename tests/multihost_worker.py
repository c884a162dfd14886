"""Worker process for the multi-process jax.distributed BA test.

Launched N times by tests/test_multihost.py with JAX_COORDINATOR_ADDRESS /
JAX_NUM_PROCESSES / JAX_PROCESS_ID set. Each process owns M virtual CPU
devices; the global mesh spans N*M devices, so the psum inside
sharded_bundle_adjust crosses process boundaries over gRPC — the code path
a DCN-connected pod slice uses (SURVEY.md section 4's prescription for
testing >=2-host collectives without a pod).

Exit 0 => this process verified sharded == single-device BA.
"""

import os
import sys

os.environ.setdefault("XLA_FLAGS", "--xla_force_host_platform_device_count=4")
os.environ["JAX_PLATFORMS"] = "cpu"
os.environ.pop("PALLAS_AXON_POOL_IPS", None)

import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np


def build_problem(num_landmarks=64, num_poses=4):
    from maveric_slam_tpu.backend import ba

    rng = np.random.default_rng(0)
    K = np.array(
        [[370.0, 0.0, 320.0], [0.0, 370.0, 96.0], [0.0, 0.0, 1.0]], np.float32
    )
    X = np.stack(
        [
            rng.uniform(-8, 8, num_landmarks),
            rng.uniform(-3, 3, num_landmarks),
            rng.uniform(8, 30, num_landmarks),
        ],
        axis=-1,
    ).astype(np.float32)
    R = np.broadcast_to(np.eye(3, dtype=np.float32), (num_poses, 3, 3)).copy()
    t = np.stack(
        [np.array([0.0, 0.0, -0.8 * p], np.float32) for p in range(num_poses)]
    )
    p_cam = np.einsum("pij,lj->lpi", R, X) + t[None]
    uv = np.stack(
        [
            K[0, 0] * p_cam[..., 0] / p_cam[..., 2] + K[0, 2],
            K[1, 1] * p_cam[..., 1] / p_cam[..., 2] + K[1, 2],
        ],
        axis=-1,
    ).astype(np.float32)
    mask = p_cam[..., 2] > 1.0
    return ba.BAProblem(K=K, R=R, t=t, X=X + 0.05, uv=uv, mask=mask)


def main() -> int:
    from maveric_slam_tpu.backend import ba
    from maveric_slam_tpu.parallel import mesh as mesh_lib
    from maveric_slam_tpu.parallel import sharded_ba

    mesh_lib.maybe_init_distributed()
    nproc = int(os.environ["JAX_NUM_PROCESSES"])
    pid = int(os.environ["JAX_PROCESS_ID"])
    assert jax.process_count() == nproc, jax.process_count()
    n_dev = len(jax.devices())
    n_local = len(jax.local_devices())
    assert n_dev == nproc * n_local, (n_dev, nproc, n_local)

    problem = build_problem()

    # Single-device reference (local computation, no mesh).
    import jax.numpy as jnp

    local = ba.BAProblem(*[jnp.asarray(x) for x in problem])
    ref, ref_stats = ba.bundle_adjust(local, iterations=3)
    ref_R = np.asarray(ref.R)
    ref_t = np.asarray(ref.t)
    ref_X = np.asarray(ref.X)

    # Global mesh over every process's devices.
    mesh = mesh_lib.global_mesh()
    from jax.sharding import NamedSharding, PartitionSpec as P

    def globalize(x, spec):
        sh = NamedSharding(mesh, spec)
        arr = np.asarray(x)
        return jax.make_array_from_callback(arr.shape, sh, lambda idx: arr[idx])

    def globalize2(x, m, spec):
        sh = NamedSharding(m, spec)
        arr = np.asarray(x)
        return jax.make_array_from_callback(arr.shape, sh, lambda idx: arr[idx])

    ax = mesh_lib.LANDMARK_AXIS
    gproblem = ba.BAProblem(
        K=globalize(problem.K, P()),
        R=globalize(problem.R, P()),
        t=globalize(problem.t, P()),
        X=globalize(problem.X, P(ax)),
        uv=globalize(problem.uv, P(ax)),
        mask=globalize(problem.mask, P(ax)),
    )
    solved, costs = sharded_ba.sharded_bundle_adjust(gproblem, mesh, iterations=3)

    # Replicated outputs: every process holds a full copy in shard 0.
    costs_np = np.asarray(solved.R.addressable_data(0)), np.asarray(
        solved.t.addressable_data(0)
    )
    R_np, t_np = costs_np
    cost_curve = np.asarray(costs.addressable_data(0))
    assert np.isfinite(cost_curve).all(), cost_curve
    np.testing.assert_allclose(R_np, ref_R, rtol=0, atol=2e-4)
    np.testing.assert_allclose(t_np, ref_t, rtol=0, atol=2e-3)
    # Landmark shards: compare each addressable shard against the reference.
    for shard in solved.X.addressable_shards:
        sl = shard.index[0]
        np.testing.assert_allclose(
            np.asarray(shard.data), ref_X[sl], rtol=0, atol=2e-3
        )
    # --- word-axis-sharded feature pool across both processes ----------- #
    from maveric_slam_tpu.mapping import feature_pool, sharded_pool

    rng = np.random.default_rng(5)
    vocab = 2048
    p_ref = feature_pool.create(vocab, window=4)
    pmesh = mesh_lib.global_mesh(axis=sharded_pool.WORD_AXIS)
    p_sh = feature_pool.DevicePool(
        first_seen=globalize2(p_ref.first_seen, pmesh, P(sharded_pool.WORD_AXIS)),
        last_seen=globalize2(p_ref.last_seen, pmesh, P(sharded_pool.WORD_AXIS)),
        num_sightings=globalize2(
            p_ref.num_sightings, pmesh, P(sharded_pool.WORD_AXIS)
        ),
        coords=globalize2(p_ref.coords, pmesh, P(sharded_pool.WORD_AXIS)),
        window=globalize2(p_ref.window, pmesh, P()),
    )
    for f in range(6):
        ids = rng.integers(-1, vocab, (64,)).astype(np.int32)
        jids = globalize2(ids, pmesh, P())
        p_ref = feature_pool.observe_batch(p_ref, jnp.asarray(ids), jnp.int32(f))
        p_ref = feature_pool.remove_old(p_ref, jnp.int32(f))
        p_sh = sharded_pool.observe_batch(p_sh, jids, f, pmesh)
        p_sh = sharded_pool.remove_old(p_sh, f, pmesh)
    q = rng.integers(-1, vocab, (48,)).astype(np.int32)
    w_ref = np.asarray(feature_pool.covisibility_weights(p_ref, jnp.asarray(q)))
    w_sh = sharded_pool.covisibility_weights(
        p_sh, globalize2(q, pmesh, P()), pmesh
    )
    np.testing.assert_array_equal(np.asarray(w_sh.addressable_data(0)), w_ref)
    for shard in p_sh.num_sightings.addressable_shards:
        sl = shard.index[0]
        np.testing.assert_array_equal(
            np.asarray(shard.data), np.asarray(p_ref.num_sightings)[sl]
        )

    # --- frame-axis-sharded LCD across both processes -------------------- #
    # Mirrors the mesh-mode engine's keyframe step (slam._keyframe_step):
    # sharded_query before sharded_add_frame, with the engine's HOST-side
    # ring-cursor mirror (slam.py's _next_slot) tracked alongside — the
    # cross-process behavior VERDICT r4 flagged as untested. Parity bar:
    # every query must equal the single-process lcd.query on an identical
    # local database, and the host mirror must match the device cursor.
    from maveric_slam_tpu.loopclosure import lcd, sharded_lcd

    cap, vocab_l = 4 * n_dev, 512
    db_ref = lcd.create_database(cap, vocab_l)
    lmesh = mesh_lib.global_mesh(axis=sharded_lcd.FRAME_AXIS)
    lspec = P(sharded_lcd.FRAME_AXIS)
    db_sh = lcd.LoopDatabase(
        multihot=globalize2(db_ref.multihot, lmesh, lspec),
        counts=globalize2(db_ref.counts, lmesh, lspec),
        frames=globalize2(db_ref.frames, lmesh, lspec),
        valid=globalize2(db_ref.valid, lmesh, lspec),
        next_slot=globalize2(db_ref.next_slot, lmesh, P()),
    )
    host_cursor = 0  # the engine's _next_slot mirror
    rng_l = np.random.default_rng(9)
    word_hist = []
    n_kf = cap + 3  # wraps the ring across the process boundary
    for f in range(n_kf):
        if f == n_kf - 1 and len(word_hist) > 4:
            ids = word_hist[2]  # revisit: query must find frame 2
        else:
            ids = rng_l.choice(vocab_l, 40, replace=False).astype(np.int32)
        word_hist.append(ids)
        gids = globalize2(ids, lmesh, P())
        got = sharded_lcd.sharded_query(
            db_sh, gids, lmesh, jnp.int32(f), min_frame_gap=3, min_score=0.3
        )
        ref_q = lcd.query(
            db_ref, jnp.asarray(ids), jnp.int32(f),
            min_frame_gap=3, min_score=0.3,
        )
        assert int(np.asarray(got.best_frame.addressable_data(0))) == int(
            ref_q.best_frame
        ), (f, int(np.asarray(got.best_frame.addressable_data(0))),
            int(ref_q.best_frame))
        assert (
            abs(
                float(np.asarray(got.best_score.addressable_data(0)))
                - float(ref_q.best_score)
            )
            < 1e-6
        )
        db_sh = sharded_lcd.sharded_add_frame(db_sh, gids, jnp.int32(f), lmesh)
        db_ref = lcd.add_frame(db_ref, jnp.asarray(ids), jnp.int32(f))
        host_cursor = (host_cursor + 1) % cap
    assert host_cursor == int(np.asarray(db_sh.next_slot.addressable_data(0))), (
        host_cursor,
        int(np.asarray(db_sh.next_slot.addressable_data(0))),
    )
    last_best = int(np.asarray(got.best_frame.addressable_data(0)))
    assert last_best == 2, f"revisit query found frame {last_best}, wanted 2"

    print(
        f"OK p{pid}: {nproc} processes x {n_local} devices, "
        f"cost {cost_curve[0]:.4f} -> {cost_curve[-1]:.6f}, pool sharded ok, "
        f"LCD sharded ok ({n_kf} keyframes, ring wrapped, cursor mirror in "
        f"sync, revisit hit frame {last_best})",
        flush=True,
    )
    return 0


if __name__ == "__main__":
    sys.exit(main())
