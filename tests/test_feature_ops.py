"""Feature post-processing kernels vs scalar C-semantics oracles.

Oracles re-state the reference algorithms (src/top_N.c, src/tracking_main.c,
python/pairwise_pnp.py nms_fast) in plain numpy and are run on the actual
baked int8 grids (include/data/quantized/quantized_image0.h).
"""

import numpy as np
import pytest

from maveric_slam_tpu.data import refdata
from maveric_slam_tpu.ops import matching, nms, softmax_topn


@pytest.fixture(scope="module")
def qdata():
    return refdata.quantized_image0()


# --- numpy oracles (scalar semantics of the C code) -----------------------

def oracle_approx_softmax(semi_row, scale_poly):
    """top_N.c:22-49 for one cell."""
    max_index, max_exp, denom = 64, 0.0, 1.175494e-38
    for i in range(65):
        v = int(semi_row[i])
        if v < 0:
            continue
        x, xp = 1.0, 1
        for p in range(1, 5):
            xp *= v
            x += scale_poly[p] * xp
        if i != 64 and x > max_exp:
            max_exp = x
            max_index = i
        denom += x
    prob = max_exp / denom if max_index != 64 else -1.0
    return max_index, prob


def scale_poly_of(scale, degree=5):
    poly = [1.0]
    for i in range(1, degree):
        poly.append(poly[-1] * scale / i)
    return poly


class TestApproxSoftmax:
    def test_matches_oracle_on_reference_grid(self, qdata):
        semi = qdata["semi"]  # (24, 80, 65) int8
        scale = np.float32(qdata["semi_scale"])
        grid = softmax_topn.approx_softmax_grid(semi, scale)
        probs = np.asarray(grid.probs)
        idx = np.asarray(grid.indices)

        poly = scale_poly_of(scale)
        rng = np.random.default_rng(0)
        cells = [(int(r), int(c)) for r, c in zip(rng.integers(0, 24, 200), rng.integers(0, 80, 200))]
        for r, c in cells:
            want_idx, want_prob = oracle_approx_softmax(semi[r, c], poly)
            assert idx[r, c] == want_idx, (r, c)
            if want_idx != 64:
                np.testing.assert_allclose(probs[r, c], want_prob, rtol=1e-4)

    def test_matches_float_softmax_closely(self, qdata):
        # The approximation should track the exact softmax on confident cells
        # (the reference's own validity regime, prob > 0.01).
        semi = qdata["semi"].astype(np.float32) * qdata["semi_scale"]
        exact = softmax_topn.exact_softmax_grid(semi)
        approx = softmax_topn.approx_softmax_grid(qdata["semi"], np.float32(qdata["semi_scale"]))
        conf = np.asarray(exact.probs) > 0.1
        agree = (np.asarray(approx.indices)[conf] == np.asarray(exact.indices)[conf]).mean()
        assert agree > 0.98, agree


class TestTopN:
    def oracle_top_n(self, semi, scale, n):
        """compute_top_N (top_N.c:53-134), scanning in column-major order."""
        hc, wc = semi.shape[:2]
        poly = scale_poly_of(scale)
        valid = []
        for c in range(wc):
            for r in range(hc):
                i, p = oracle_approx_softmax(semi[r, c], poly)
                if i != 64 and p > 0.01:
                    valid.append((r * wc + c, i, p))
        if len(valid) <= n:
            return valid
        probs = [v[2] for v in valid]
        split = n / len(valid)
        thresh = max(probs) * split + min(probs) * (1 - split)
        out = []
        for v in valid:
            if v[2] >= thresh:
                out.append(v)
                if len(out) >= n:
                    break
        return out

    def test_matches_oracle(self, qdata):
        semi = qdata["semi"]
        scale = np.float32(qdata["semi_scale"])
        grid = softmax_topn.approx_softmax_grid(semi, scale)
        got = softmax_topn.top_n_select(grid, n=100, valid_thresh=0.01)
        want = self.oracle_top_n(semi, scale, 100)
        k = len(want)
        assert int(got.num_selected) == k
        got_cells = np.asarray(got.cells)[np.asarray(got.mask)]
        want_cells = np.array([w[0] for w in want])
        assert set(got_cells.tolist()) == set(want_cells.tolist())

    def test_under_subscribed(self, qdata):
        # With a huge N all valid cells are returned.
        semi = qdata["semi"]
        scale = np.float32(qdata["semi_scale"])
        grid = softmax_topn.approx_softmax_grid(semi, scale)
        got = softmax_topn.top_n_select(grid, n=1000, valid_thresh=0.01)
        valid = (np.asarray(grid.indices) != 64) & (np.asarray(grid.probs) > 0.01)
        assert int(got.num_selected) == int(valid.sum())


class TestWindowedMatch:
    def oracle_match(self, desc0, probs0, indices0, desc1, cells1, indices1,
                     grid_h, grid_w, shift, radius, thresh, min_prob):
        """tracking_main.c:114-194 semantics (full 256-d dot, positive only)."""
        out = {}
        for qi, (cell1, idx1) in enumerate(zip(cells1, indices1)):
            r1, c1 = divmod(int(cell1), grid_w)
            best, best_cell = 0.0, -1
            for r0 in range(max(r1 + shift[1] - radius, 0), min(r1 + shift[1] + radius, grid_h - 1) + 1):
                for c0 in range(max(c1 + shift[0] - radius, 0), min(c1 + shift[0] + radius, grid_w - 1) + 1):
                    cell0 = r0 * grid_w + c0
                    if indices0[cell0] == 64 or probs0[cell0] < min_prob:
                        continue
                    d0 = desc0[cell0].astype(np.int64)
                    d1 = desc1[cell1].astype(np.int64)
                    dot = int(d0 @ d1)
                    if dot <= 0:
                        continue
                    cos2 = dot * dot / float((d0 @ d0) * (d1 @ d1))
                    if cos2 > thresh**2 and cos2 > best:
                        best, best_cell = cos2, cell0
            out[qi] = (best_cell, best)
        return out

    def test_matches_oracle(self, qdata):
        # Match image0 against itself shifted — uses real descriptors.
        desc = qdata["desc"].reshape(-1, 256)
        scale = np.float32(qdata["semi_scale"])
        grid = softmax_topn.approx_softmax_grid(qdata["semi"], scale)
        top = softmax_topn.top_n_select(grid, n=50)
        probs0 = np.asarray(grid.probs).reshape(-1)
        indices0 = np.asarray(grid.indices).reshape(-1)
        cells1 = np.asarray(top.cells)
        indices1 = np.asarray(top.indices)

        got = matching.windowed_match(
            desc, probs0, indices0, desc, cells1, indices1, np.asarray(top.mask),
            grid_h=24, grid_w=80, shift=(0, 0), radius=4,
            match_threshold=0.9, min_prob=0.2,
        )
        want = self.oracle_match(
            desc, probs0, indices0, desc, cells1, indices1,
            24, 80, (0, 0), 4, 0.9, 0.2,
        )
        mask = np.asarray(top.mask)
        for qi in range(len(cells1)):
            if not mask[qi]:
                continue
            want_cell, want_cos2 = want[qi]
            if want_cell >= 0:
                assert np.asarray(got.mask)[qi]
                assert int(np.asarray(got.cell0)[qi]) == want_cell, qi
            else:
                assert not np.asarray(got.mask)[qi]

    def test_self_match_is_identity(self, qdata):
        # A feature matched against its own frame with no shift must find
        # itself (cos = 1 with itself is always the max).
        desc = qdata["desc"].reshape(-1, 256)
        scale = np.float32(qdata["semi_scale"])
        grid = softmax_topn.approx_softmax_grid(qdata["semi"], scale)
        top = softmax_topn.top_n_select(grid, n=100)
        probs0 = np.asarray(grid.probs).reshape(-1)
        indices0 = np.asarray(grid.indices).reshape(-1)
        got = matching.windowed_match(
            desc, probs0, indices0, desc,
            np.asarray(top.cells), np.asarray(top.indices), np.asarray(top.mask),
            grid_h=24, grid_w=80, shift=(0, 0), radius=4,
            match_threshold=0.9, min_prob=0.0,
        )
        mask = np.asarray(got.mask) & np.asarray(top.mask)
        # Top-N cells all have prob > 0.01 >= min_prob, so each matches itself.
        assert (np.asarray(got.cell0)[mask] == np.asarray(top.cells)[mask]).all()


class TestNMS:
    def test_heatmap_nms_vs_greedy_on_real_heatmap(self, qdata):
        # Build the real full-resolution heatmap from the baked grid, the way
        # the golden pipeline does (pairwise_pnp.py:206-220): dense softmax,
        # drop dustbin, unfold 64 channels into 8x8 sub-cells.
        semi = qdata["semi"].astype(np.float64) * qdata["semi_scale"]
        e = np.exp(semi)
        dense = e / (e.sum(-1, keepdims=True) + 1e-5)
        nodust = dense[..., :64]  # (24, 80, 64)
        heat = (
            nodust.reshape(24, 80, 8, 8)
            .transpose(0, 2, 1, 3)
            .reshape(192, 640)
            .astype(np.float32)
        )
        h, w = heat.shape
        mask = np.asarray(nms.heatmap_nms(heat, dist=4, conf_thresh=0.015, border=4))
        ys, xs = np.where(heat >= 0.015)
        corners = np.stack([xs, ys, heat[ys, xs]]).astype(np.float64)
        from golden_nms import nms_fast_numpy

        out, _ = nms_fast_numpy(corners, h, w, 4)
        keep = out[:, (out[0] >= 4) & (out[0] < w - 4) & (out[1] >= 4) & (out[1] < h - 4)]
        got = {(int(x), int(y)) for y, x in zip(*np.where(mask))}
        want = {(int(x), int(y)) for x, y in zip(keep[0], keep[1])}
        # Local-max survivors track greedy survivors up to (a) chain points
        # greedy additionally keeps and (b) tie-pick differences at +-1 px
        # (the quantized heatmap has exact ties; greedy's argsort order on
        # ties is arbitrary). Require every local max to be a greedy survivor
        # within 1 px, and high coverage.
        def near(p, S, r=2):
            x, y = p
            return any(
                (x + dx, y + dy) in S
                for dx in range(-r, r + 1)
                for dy in range(-r, r + 1)
            )

        assert all(near(p, want) for p in got)
        covered = sum(near(p, got) for p in want)
        assert covered > 0.85 * len(want), (len(got), len(want), covered)

    def test_quadrant_nms_suppresses_near_duplicates(self, qdata):
        scale = np.float32(qdata["semi_scale"])
        grid = softmax_topn.approx_softmax_grid(qdata["semi"], scale)
        out = nms.quadrant_nms(grid, min_dist=4)
        idx_in = np.asarray(grid.indices)
        idx_out = np.asarray(out.indices)
        # Some suppression happened, survivors are a subset.
        assert ((idx_out == 64) & (idx_in != 64)).sum() > 0
        assert np.all((idx_out == idx_in) | (idx_out == 64))
        # No two surviving keypoints within L_inf < 4 px in adjacent cells.
        probs = np.asarray(out.probs)
        hc, wc = idx_out.shape
        pts = []
        for r in range(hc):
            for c in range(wc):
                if idx_out[r, c] != 64:
                    pts.append((c * 8 + idx_out[r, c] % 8, r * 8 + idx_out[r, c] // 8))
        pts = np.array(pts)
        from scipy.spatial import cKDTree

        tree = cKDTree(pts)
        pairs = tree.query_pairs(r=3.99, p=np.inf)
        assert len(pairs) == 0, f"{len(pairs)} too-close survivor pairs"
