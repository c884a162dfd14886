"""Feature pools: native C++ hash map + device-resident table.

Property tests mirror the reference's randomized stress driver
(src/local_feature_matching.c:129-173: 100 synthetic frames, ~200 features
each with controlled overlap, invariant check per frame) and its runtime
invariant checker (include/local_feature_pool.h:279-336).
"""

import os

import numpy as np
import pytest

from maveric_slam_tpu.mapping import feature_pool as device_pool
from maveric_slam_tpu.runtime import FeaturePool, lcd_intersect


def synthetic_frames(rng, num_frames=100, per_frame=200, overlap=75, max_id=5000):
    """Frames with ~`overlap` ids carried over from the previous frame
    (the stress pattern of local_feature_matching.c:53-127)."""
    frames = []
    prev = rng.choice(max_id, per_frame, replace=False)
    frames.append(prev)
    for _ in range(num_frames - 1):
        keep = rng.choice(prev, overlap, replace=False)
        fresh_pool = np.setdiff1d(np.arange(max_id), keep)
        fresh = rng.choice(fresh_pool, per_frame - overlap, replace=False)
        cur = np.concatenate([keep, fresh])
        frames.append(cur)
        prev = cur
    return frames


class TestNativePool:
    def test_stress_with_invariants(self):
        rng = np.random.default_rng(41)
        pool = FeaturePool(capacity=3000, max_frames=8)
        frames = synthetic_frames(rng)
        for f, ids in enumerate(frames):
            pool.observe_batch(ids, f)
            pool.remove_old(f)
            assert pool.check_invariant(f) == 0, f
            assert len(pool) <= 3000
        # After 100 frames with an 8-frame window, the pool holds the union
        # of the last 8 frames' ids.
        want = set()
        for ids in frames[-8:]:
            want |= set(ids.tolist())
        got = set(pool.valid_keys().tolist())
        assert got == want

    def test_observe_semantics(self):
        pool = FeaturePool(capacity=64, max_frames=4)
        assert pool.observe(7, 0) is True  # new
        assert pool.observe(7, 1) is False  # update
        assert pool.observe(7, 1) is False  # same frame: idempotent
        assert pool.last_seen(7) == 1
        assert pool.num_sightings(7) == 2
        assert pool.last_seen(99) == -1

    def test_age_out_and_ring_overflow(self):
        pool = FeaturePool(capacity=64, max_frames=4)
        for f in range(10):
            pool.observe(5, f)
        assert pool.num_sightings(5) == 4  # ring capped
        pool.observe(6, 9)
        pool.remove_old(9)
        assert len(pool) == 2
        pool.remove_old(20)  # both now stale
        assert len(pool) == 0
        assert pool.check_invariant(20) == 0

    def test_collision_chains_survive_deletion(self):
        # Keys colliding mod capacity exercise probe-chain repair (the
        # reference's chain_replacement, local_feature_pool.h:137-168).
        pool = FeaturePool(capacity=8, max_frames=2)
        keys = [1, 9, 17, 25]  # all hash to slot 1
        for k in keys:
            pool.observe(k, 0)
        pool.observe(1, 1)  # keep 1 fresh... then age out the others later
        for k in [9, 17, 25]:
            pool.observe(k, 1)
        # Age out nothing yet; delete the head of the chain via age-out.
        pool.observe(9, 2)
        pool.observe(17, 2)
        pool.observe(25, 2)
        pool.remove_old(3)  # window 2: drops key 1 (last seen 1)
        assert pool.last_seen(1) == -1
        for k in [9, 17, 25]:
            assert pool.last_seen(k) == 2, k  # still reachable
        assert pool.check_invariant(3) == 0

    def test_overflow_raises(self):
        pool = FeaturePool(capacity=4, max_frames=2)
        for k in range(4):
            pool.observe(k, 0)
        with pytest.raises(OverflowError):
            pool.observe(99, 0)

    def test_lcd_intersect_matches_python(self):
        rng = np.random.default_rng(43)
        for _ in range(20):
            a = np.unique(rng.choice(1000, rng.integers(1, 200)))
            b = np.unique(rng.choice(1000, rng.integers(1, 200)))
            want = len(set(a.tolist()) & set(b.tolist()))
            assert lcd_intersect(a, b) == want


class TestDevicePool:
    def test_stress_matches_native(self):
        rng = np.random.default_rng(44)
        frames = synthetic_frames(rng, num_frames=30)
        dpool = device_pool.create(vocab_size=5000, window=8)
        npool = FeaturePool(capacity=4999, max_frames=8)
        for f, ids in enumerate(frames):
            dpool = device_pool.observe_batch(dpool, ids, np.int32(f))
            dpool = device_pool.remove_old(dpool, np.int32(f))
            npool.observe_batch(ids, f)
            npool.remove_old(f)
            assert int(device_pool.check_invariant(dpool, np.int32(f))) == 0
        assert int(device_pool.size(dpool)) == len(npool)
        present = np.where(np.asarray(dpool.last_seen) >= 0)[0]
        assert set(present.tolist()) == set(npool.valid_keys().tolist())

    def test_covisibility_weights(self):
        dpool = device_pool.create(vocab_size=100, window=8)
        for f in range(3):
            dpool = device_pool.observe_batch(
                dpool, np.array([5, 7], np.int32), np.int32(f)
            )
        dpool = device_pool.observe_batch(dpool, np.array([9], np.int32), np.int32(2))
        w = np.asarray(
            device_pool.covisibility_weights(
                dpool, np.array([5, 7, 9, 11, -1], np.int32)
            )
        )
        np.testing.assert_array_equal(w, [3, 3, 1, 0, 0])

    def test_duplicate_ids_in_batch_count_once(self):
        dpool = device_pool.create(vocab_size=50, window=8)
        dpool = device_pool.observe_batch(
            dpool, np.array([3, 3, 3], np.int32), np.int32(0)
        )
        assert int(np.asarray(dpool.num_sightings)[3]) == 1


class TestSanitizerBuild:
    def test_pool_stress_under_asan_ubsan(self):
        """Build and run the native stress driver under ASan+UBSan.

        The memory-safety check the reference build never had (its analogue
        is the unsanitized driver src/local_feature_matching.c:129-173).
        5000 adversarial frames + full-capacity/age-out edge cases; any
        heap error, UB, or leak fails the binary (-fno-sanitize-recover +
        LeakSanitizer on exit).
        """
        import subprocess

        native = os.path.join(
            os.path.dirname(__file__), "..", "maveric_slam_tpu", "runtime", "native"
        )
        build = subprocess.run(
            ["make", "-s", "-C", native, "pool_stress_asan"],
            capture_output=True, text=True,
        )
        if build.returncode != 0 and "sanitize" in (build.stderr or "").lower():
            pytest.skip(f"toolchain lacks sanitizers: {build.stderr[:200]}")
        assert build.returncode == 0, build.stderr
        run = subprocess.run(
            [os.path.join(native, "pool_stress_asan")],
            capture_output=True, text=True, timeout=120,
        )
        assert run.returncode == 0, run.stdout + run.stderr
        assert "pool_stress: OK" in run.stdout
