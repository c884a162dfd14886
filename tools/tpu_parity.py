#!/usr/bin/env python
"""On-TPU parity check: Mosaic-compiled Pallas kernels vs jnp references.

The unit tests exercise the Pallas kernels in interpret mode on CPU
(tests/test_pallas_kernels.py); this tool closes the remaining gap — a
Mosaic LOWERING bug would ship invisibly — by running the compiled kernels
on the real accelerator against the jnp reference implementations, on real
KITTI data where the kernel consumes it (round-3 verdict #4).

Run from the repo root on the TPU machine:

    python tools/tpu_parity.py

Prints one PASS/FAIL line per kernel and exits nonzero on any failure.
The committed artifact TPU_PARITY.txt records the latest run.
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main() -> int:
    import jax
    import jax.numpy as jnp

    from maveric_slam_tpu.data import refdata
    from maveric_slam_tpu.ops import linalg, matching, pallas_kernels, softmax_topn, svd3

    backend = jax.default_backend()
    print(f"backend={backend} device={jax.devices()[0].device_kind}")
    failures = 0

    def report(name, ok, detail=""):
        nonlocal failures
        status = "PASS" if ok else "FAIL"
        failures += not ok
        print(f"{status} {name} {detail}")

    qd = refdata.quantized_image0()
    semi = qd["semi"]  # (24, 80, 65) int8
    desc = qd["desc"].reshape(-1, 256)
    scale = np.float32(qd["semi_scale"])
    flat = jnp.asarray(semi.reshape(-1, 65))

    # --- fused detector post-processing (compiled) vs jnp ---------------- #
    probs_p, idx_p, xy_p = jax.tree.map(
        np.asarray, pallas_kernels.fused_detector_postproc(flat, scale)
    )
    grid = softmax_topn.approx_softmax_grid(jnp.asarray(semi), scale)
    xy_ref = np.asarray(
        softmax_topn.subpixel_xy(jnp.asarray(semi), scale, grid)
    ).reshape(-1, 2)
    idx_ref = np.asarray(grid.indices).reshape(-1)
    probs_ref = np.asarray(grid.probs).reshape(-1)
    valid = idx_ref != 64
    det_ok = (
        np.array_equal(idx_p, idx_ref)
        and np.allclose(probs_p, probs_ref, rtol=1e-6)
        and np.allclose(xy_p[valid], xy_ref[valid], atol=1e-3)
    )
    report(
        "detector",
        det_ok,
        f"(argmax exact on {valid.sum()} cells, probs rtol 1e-6, xy atol 1e-3)",
    )

    # --- fused windowed matcher (compiled) vs jnp ------------------------ #
    top = softmax_topn.top_n_select(grid, n=100, mode="prob")
    cells1 = np.asarray(top.cells)
    score_p, best_p = jax.tree.map(
        np.asarray,
        pallas_kernels.fused_windowed_match(
            jnp.asarray(desc[cells1]),
            jnp.asarray(desc),
            jnp.asarray(probs_ref),
            jnp.asarray(idx_ref),
            jnp.asarray(cells1),
            grid_h=24,
            grid_w=80,
            shift=(0, 0),
            radius=4,
            min_prob=0.1,
        ),
    )
    ref = matching.windowed_match(
        jnp.asarray(desc),
        jnp.asarray(probs_ref),
        jnp.asarray(idx_ref),
        jnp.asarray(desc),
        top.cells,
        top.indices,
        top.mask,
        grid_h=24,
        grid_w=80,
        shift=(0, 0),
        radius=4,
        match_threshold=0.8,
        min_prob=0.1,
    )
    matched = np.asarray(ref.mask)
    match_ok = np.allclose(
        score_p, np.asarray(ref.score), rtol=1e-5
    ) and np.array_equal(best_p[matched], np.asarray(ref.cell0)[matched])
    report(
        "matcher",
        match_ok,
        f"({matched.sum()} matches, argmax cells exact, scores rtol 1e-5)",
    )

    # --- nullspace inverse iteration (compiled) vs jnp ------------------- #
    rng = np.random.default_rng(0)
    ns_ok = True
    for shape in [(256, 9, 9), (150, 4, 4), (3000, 9, 9)]:  # last tiles grid
        A = rng.normal(size=shape).astype(np.float32)
        A = np.einsum("...ij,...kj->...ik", A, A)
        got = np.asarray(pallas_kernels.nullspace_inverse_iteration(A))
        refv = np.asarray(linalg.smallest_eigvec_inverse_iteration(A))
        s = np.sign(np.sum(refv * got, axis=-1, keepdims=True))
        ns_ok &= np.allclose(got * s, refv, atol=1e-3)
    report("nullspace", bool(ns_ok), "(3 shapes incl. 3000-batch grid tiling)")

    # --- fused SuperPoint stem (compiled Mosaic) vs layered int8 --------- #
    from maveric_slam_tpu.data import kitti
    from maveric_slam_tpu.models import superpoint as sp

    img_path = "/root/reference/datasets/kitti/sequences/00/image_0/000160.png"
    if os.path.exists(img_path):
        params = sp.load_params()
        img = jnp.asarray(kitti.load_frame(img_path))[None]
        semi_a, desc_a = (
            np.asarray(x) for x in sp.superpoint_int8(params, img, stem="off")[:2]
        )
        semi_b, desc_b = (
            np.asarray(x)
            for x in sp.superpoint_int8(params, img, stem="auto")[:2]
        )
        stem_ok = np.array_equal(semi_a, semi_b) and np.array_equal(
            desc_a, desc_b
        )
        n_tot = semi_a.size + desc_a.size
        n_diff = int((semi_a != semi_b).sum() + (desc_a != desc_b).sum())
        report(
            "stem",
            stem_ok,
            f"(full int8 net, fused vs layered stage 1: {n_diff}/{n_tot} "
            "elements differ, bitwise)",
        )
    else:
        report("stem", True, "(SKIPPED: reference dataset not mounted)")

    # --- svd3 (compiled) vs jnp reference -------------------------------- #
    mats = rng.normal(size=(2100, 3, 3)).astype(np.float32)
    E = np.zeros((3, 3), np.float32)
    E[0, 1], E[1, 0] = 1.0, -1.0
    mats[0] = E  # essential-matrix-like rank-2
    mats[1] = np.diag([1.0, 2.0, -3.0]).astype(np.float32)
    U, s, V = (np.asarray(x) for x in pallas_kernels.svd3_pallas(jnp.asarray(mats)))
    Ur, sr, Vr = (np.asarray(x) for x in svd3.svd3_ref(jnp.asarray(mats)))
    recon = np.einsum("...ik,...k,...jk->...ij", U, s, V)
    svd_ok = (
        np.allclose(s, sr, atol=2e-4 * np.abs(mats).max())
        and np.allclose(recon, mats, atol=1e-3 * np.abs(mats).max())
        and np.allclose(np.linalg.det(U), 1.0, atol=1e-3)
        and np.allclose(np.linalg.det(V), 1.0, atol=1e-3)
    )
    report("svd3", bool(svd_ok), "(2100 batch, sv + reconstruction + rotations)")

    print("ALL PASS" if failures == 0 else f"{failures} FAILURES")
    return 1 if failures else 0


if __name__ == "__main__":
    sys.exit(main())
