"""Pallas kernels vs their jnp reference implementations (interpret mode on
CPU; the same kernels compile natively on TPU)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from maveric_slam_tpu.data import refdata
from maveric_slam_tpu.ops import matching, pallas_kernels, softmax_topn


@pytest.fixture(scope="module")
def qdata():
    return refdata.quantized_image0()


class TestFusedDetector:
    def test_matches_jnp_reference(self, qdata):
        semi = qdata["semi"]  # (24, 80, 65)
        scale = np.float32(qdata["semi_scale"])
        flat = semi.reshape(-1, 65)

        probs_p, idx_p, xy_p = pallas_kernels.fused_detector_postproc(
            flat, scale, interpret=True
        )
        grid = softmax_topn.approx_softmax_grid(semi, scale)
        xy_ref = softmax_topn.subpixel_xy(semi, scale, grid)

        np.testing.assert_array_equal(
            np.asarray(idx_p), np.asarray(grid.indices).reshape(-1)
        )
        np.testing.assert_allclose(
            np.asarray(probs_p), np.asarray(grid.probs).reshape(-1), rtol=1e-6
        )
        valid = np.asarray(grid.indices).reshape(-1) != 64
        np.testing.assert_allclose(
            np.asarray(xy_p)[valid],
            np.asarray(xy_ref).reshape(-1, 2)[valid],
            atol=1e-4,
        )


class TestFusedMatch:
    def test_matches_jnp_reference(self, qdata):
        semi = qdata["semi"]
        desc = qdata["desc"].reshape(-1, 256)
        scale = np.float32(qdata["semi_scale"])
        grid = softmax_topn.approx_softmax_grid(semi, scale)
        top = softmax_topn.top_n_select(grid, n=100, mode="prob")

        probs0 = np.asarray(grid.probs).reshape(-1)
        indices0 = np.asarray(grid.indices).reshape(-1)
        cells1 = np.asarray(top.cells)

        score_p, best_p = pallas_kernels.fused_windowed_match(
            desc[cells1], desc, probs0, indices0, cells1,
            grid_h=24, grid_w=80, shift=(0, 0), radius=4, min_prob=0.1,
            interpret=True,
        )
        ref = matching.windowed_match(
            desc, probs0, indices0, desc,
            top.cells, top.indices, top.mask,
            grid_h=24, grid_w=80, shift=(0, 0), radius=4,
            match_threshold=0.8, min_prob=0.1,
        )
        # Compare against the matcher's internal best (cell0 is -1 where
        # unmatched; the kernel returns the raw argmax + score).
        np.testing.assert_allclose(
            np.asarray(score_p), np.asarray(ref.score), rtol=1e-5
        )
        matched = np.asarray(ref.mask)
        np.testing.assert_array_equal(
            np.asarray(best_p)[matched], np.asarray(ref.cell0)[matched]
        )


class TestNullspaceKernel:
    def test_matches_jnp_reference(self):
        from maveric_slam_tpu.ops.linalg import (
            smallest_eigvec_inverse_iteration,
        )

        rng = np.random.default_rng(0)
        for shape in [(256, 9, 9), (3, 9, 9), (150, 4, 4), (16, 32, 9, 9)]:
            A = rng.normal(size=shape).astype(np.float32)
            A = np.einsum("...ij,...kj->...ik", A, A)
            ref = np.asarray(smallest_eigvec_inverse_iteration(A))
            got = np.asarray(
                pallas_kernels.nullspace_inverse_iteration(A, interpret=True)
            )
            # Eigenvector sign is arbitrary; align before comparing.
            s = np.sign(np.sum(ref * got, axis=-1, keepdims=True))
            np.testing.assert_allclose(got * s, ref, atol=1e-4)

    def test_batch_tiling(self):
        """Batches beyond one lane-tile (2048) grid over VMEM blocks,
        including a ragged final block, instead of one whole-array block."""
        from maveric_slam_tpu.ops.linalg import (
            smallest_eigvec_inverse_iteration,
        )

        rng = np.random.default_rng(7)
        A = rng.normal(size=(2600, 4, 4)).astype(np.float32)
        A = np.einsum("...ij,...kj->...ik", A, A)
        ref = np.asarray(smallest_eigvec_inverse_iteration(A))
        got = np.asarray(
            pallas_kernels.nullspace_inverse_iteration(A, interpret=True)
        )
        s = np.sign(np.sum(ref * got, axis=-1, keepdims=True))
        np.testing.assert_allclose(got * s, ref, atol=1e-4)

    def test_vmap(self):
        from maveric_slam_tpu.ops.linalg import (
            smallest_eigvec_inverse_iteration,
        )

        rng = np.random.default_rng(1)
        A = rng.normal(size=(4, 64, 9, 9)).astype(np.float32)
        A = np.einsum("...ij,...kj->...ik", A, A)
        got = np.asarray(
            jax.vmap(
                lambda a: pallas_kernels.nullspace_inverse_iteration(
                    a, interpret=True
                )
            )(jnp.asarray(A))
        )
        ref = np.asarray(smallest_eigvec_inverse_iteration(A))
        s = np.sign(np.sum(ref * got, axis=-1, keepdims=True))
        np.testing.assert_allclose(got * s, ref, atol=1e-4)


class TestSvd3Kernel:
    """svd3_pallas is the TPU dispatch target of ops.svd3.svd3 (the jnp
    svd3_ref stays the CPU path); interpret mode must reproduce it."""

    def _check(self, A, got):
        from maveric_slam_tpu.ops.svd3 import svd3_ref

        U, s, V = (np.asarray(x) for x in got)
        Ur, sr, Vr = (np.asarray(x) for x in svd3_ref(jnp.asarray(A)))
        # Singular values match the reference path tightly.
        np.testing.assert_allclose(s, sr, atol=2e-5 * max(1.0, np.abs(A).max()))
        # Contract checks: reconstruction, proper rotations.
        recon = np.einsum("...ik,...k,...jk->...ij", U, s, V)
        np.testing.assert_allclose(recon, A, atol=1e-4 * max(1.0, np.abs(A).max()))
        np.testing.assert_allclose(np.linalg.det(U), 1.0, atol=1e-4)
        np.testing.assert_allclose(np.linalg.det(V), 1.0, atol=1e-4)
        eye = np.broadcast_to(np.eye(3, dtype=np.float32), U.shape)
        np.testing.assert_allclose(
            np.einsum("...ij,...ik->...jk", U, U), eye, atol=1e-4
        )
        np.testing.assert_allclose(
            np.einsum("...ij,...ik->...jk", V, V), eye, atol=1e-4
        )

    def test_matches_jnp_reference(self):
        rng = np.random.default_rng(2)
        mats = [
            rng.normal(size=(64, 3, 3)).astype(np.float32),
            rng.normal(size=(3, 3)).astype(np.float32),  # unbatched
            rng.normal(size=(4, 16, 3, 3)).astype(np.float32),
        ]
        # Degenerate cases the RANSAC path hits: rank-2 essential-like,
        # negative determinant, (near-)rank-1.
        E = np.zeros((3, 3), np.float32)
        E[0, 1], E[1, 0], E[2, 2] = 1.0, -1.0, 0.0
        neg = np.diag([1.0, 2.0, -3.0]).astype(np.float32)
        r1 = np.outer([1.0, 2.0, 3.0], [0.5, -1.0, 2.0]).astype(np.float32)
        mats.append(np.stack([E, neg, r1]))
        for A in mats:
            got = pallas_kernels.svd3_pallas(jnp.asarray(A), interpret=True)
            self._check(A, got)

    def test_batch_tiling(self):
        rng = np.random.default_rng(8)
        A = rng.normal(size=(2100, 3, 3)).astype(np.float32)
        got = pallas_kernels.svd3_pallas(jnp.asarray(A), interpret=True)
        self._check(A, got)

    def test_vmap(self):
        rng = np.random.default_rng(3)
        A = rng.normal(size=(5, 32, 3, 3)).astype(np.float32)
        got = jax.vmap(
            lambda a: pallas_kernels.svd3_pallas(a, interpret=True)
        )(jnp.asarray(A))
        self._check(A, got)

    def test_dispatch_from_svd3(self, monkeypatch):
        """ops.svd3.svd3 routes through the kernel when the TPU gate is on
        (kernel forced to interpret mode so the test runs on CPU)."""
        from maveric_slam_tpu.ops import backend, svd3 as svd3_mod

        monkeypatch.setattr(backend, "use_tpu_pallas", lambda: True)
        orig = pallas_kernels.svd3_pallas
        monkeypatch.setattr(
            pallas_kernels,
            "svd3_pallas",
            lambda A, sweeps=6: orig(A, sweeps=sweeps, interpret=True),
        )
        rng = np.random.default_rng(4)
        A = rng.normal(size=(8, 3, 3)).astype(np.float32)
        self._check(A, svd3_mod.svd3(jnp.asarray(A)))


class TestNmsOnFastPath:
    def test_extract_quantized_nms_parity_pallas_vs_jnp(self, qdata, monkeypatch):
        """apply_nms=True stays on the Pallas fast path (round-3 verdict #6):
        the fused detector chains quadrant_nms instead of falling back to
        the slow jnp detector. Forced through the TPU gate in interpret
        mode, the result must equal the jnp path bit-for-bit."""
        import dataclasses

        from maveric_slam_tpu.config import DEFAULT_CONFIG
        from maveric_slam_tpu.frontend import extractor
        from maveric_slam_tpu.models import superpoint as sp
        from maveric_slam_tpu.ops import backend

        params = sp.load_params()
        from maveric_slam_tpu.data import kitti

        img = kitti.load_frame(
            "/root/reference/datasets/kitti/sequences/00/image_0/000160.png"
        )

        ref = extractor.extract_quantized(
            params, jnp.asarray(img), DEFAULT_CONFIG, apply_nms=True
        )

        monkeypatch.setattr(backend, "use_tpu_pallas", lambda: True)
        orig = pallas_kernels.fused_detector_postproc
        monkeypatch.setattr(
            pallas_kernels,
            "fused_detector_postproc",
            lambda *a, **k: orig(*a, **k, interpret=True),
        )
        extractor.extract_quantized.clear_cache()
        got = extractor.extract_quantized(
            params, jnp.asarray(img), DEFAULT_CONFIG, apply_nms=True
        )
        extractor.extract_quantized.clear_cache()

        np.testing.assert_array_equal(
            np.asarray(got.indices), np.asarray(ref.indices)
        )
        np.testing.assert_allclose(
            np.asarray(got.probs), np.asarray(ref.probs), rtol=1e-6
        )
        np.testing.assert_array_equal(
            np.asarray(got.top.cells), np.asarray(ref.top.cells)
        )
        valid = np.asarray(ref.indices).reshape(-1) != 64
        np.testing.assert_allclose(
            np.asarray(got.xy).reshape(-1, 2)[valid],
            np.asarray(ref.xy).reshape(-1, 2)[valid],
            atol=1e-4,
        )
        # NMS actually suppressed something (otherwise the test is vacuous).
        no_nms = extractor.extract_quantized(
            params, jnp.asarray(img), DEFAULT_CONFIG, apply_nms=False
        )
        n_valid_nms = int((np.asarray(got.indices) != 64).sum())
        n_valid_raw = int((np.asarray(no_nms.indices) != 64).sum())
        assert n_valid_nms < n_valid_raw, (n_valid_nms, n_valid_raw)


class TestFusedStem:
    """The fused SuperPoint stage-1 kernel (conv1a+rq, conv1b+rq, 2x2 pool
    in one VMEM-resident pass) must be bit-identical to the layered int8
    path — it replaces stage 1 inside superpoint_int8 on TPU backends."""

    IMG = "/root/reference/datasets/kitti/sequences/00/image_0/000160.png"

    def test_stage1_bit_parity_real_frame(self):
        from maveric_slam_tpu.data import kitti
        from maveric_slam_tpu.models import superpoint as sp

        params = sp.load_params()
        img = kitti.load_frame(self.IMG)  # (192, 640)

        # Layered stage-1 reference (exactly superpoint_int8's first block).
        s = params["input_scale"]
        x = jnp.clip(jnp.round(jnp.asarray(img)[None, ..., None] / s), -128, 127)

        def qconv(x, name, in_scale, relu):
            acc = sp._conv(x, params[f"{name}_w"].astype(jnp.float32), jnp.float32)
            q = sp._requant(
                acc, in_scale, params[f"{name}_wscale"], params[f"{name}_b"],
                params[f"{name}_oscale"], relu,
            )
            return q, params[f"{name}_oscale"]

        x, sc = qconv(x, "conv1a", s, True)
        x, sc = qconv(x, "conv1b", sc, True)
        ref = np.asarray(sp._maxpool2(x)).astype(np.int8)

        o1a = params["conv1a_oscale"]
        b1_q = jnp.round(params["conv1a_b"] / (s * params["conv1a_wscale"]))
        m1 = (s * params["conv1a_wscale"]) / o1a
        b2_q = jnp.round(params["conv1b_b"] / (o1a * params["conv1b_wscale"]))
        m2 = (o1a * params["conv1b_wscale"]) / params["conv1b_oscale"]
        got = np.asarray(
            pallas_kernels.fused_stem(
                jnp.asarray(img)[None],
                params["conv1a_w"], params["conv1b_w"], s,
                b1_q, m1, b2_q, m2, interpret=True,
            )
        )
        assert got.shape == ref.shape == (1, 96, 320, 64)
        np.testing.assert_array_equal(got, ref)

    def test_full_net_parity_via_stem_flag(self):
        """superpoint_int8(stem='interpret') (fused stage 1) must produce
        bitwise the same semi/desc grids as stem='off' (layered)."""
        from maveric_slam_tpu.data import kitti
        from maveric_slam_tpu.models import superpoint as sp

        params = sp.load_params()
        img = jnp.asarray(kitti.load_frame(self.IMG))[None]
        semi_a, desc_a, sc_a = sp.superpoint_int8(params, img, stem="off")
        semi_b, desc_b, sc_b = sp.superpoint_int8(params, img, stem="interpret")
        np.testing.assert_array_equal(np.asarray(semi_a), np.asarray(semi_b))
        np.testing.assert_array_equal(np.asarray(desc_a), np.asarray(desc_b))
        assert float(sc_a["semi_scale"]) == float(sc_b["semi_scale"])
