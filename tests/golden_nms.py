"""Host-side golden NMS oracle for differential tests.

Exact sequential greedy grid NMS matching the golden pipeline's behavior
(reference: python/pairwise_pnp.py:116-179, originally MagicLeap's public
SuperPointPretrainedNetwork). Test-only: the shipping TPU path is
maveric_slam_tpu.ops.nms.heatmap_nms, which tests diff against this oracle.
"""

from __future__ import annotations

from typing import Tuple

import numpy as np


def nms_fast_numpy(
    in_corners: np.ndarray, h: int, w: int, dist_thresh: int
) -> Tuple[np.ndarray, np.ndarray]:
    """Greedy grid NMS. in_corners: (3, N) rows [x, y, conf]."""
    grid = np.zeros((h, w), dtype=int)
    inds = np.zeros((h, w), dtype=int)
    inds1 = np.argsort(-in_corners[2, :])
    corners = in_corners[:, inds1]
    rcorners = corners[:2, :].round().astype(int)
    if rcorners.shape[1] == 0:
        return np.zeros((3, 0), dtype=int), np.zeros(0, dtype=int)
    if rcorners.shape[1] == 1:
        out = np.vstack((rcorners, in_corners[2])).reshape(3, 1)
        return out, np.zeros(1, dtype=int)
    for i in range(rcorners.shape[1]):
        grid[rcorners[1, i], rcorners[0, i]] = 1
        inds[rcorners[1, i], rcorners[0, i]] = i
    pad = dist_thresh
    grid = np.pad(grid, ((pad, pad), (pad, pad)), mode="constant")
    for i, rc in enumerate(rcorners.T):
        pt = (rc[0] + pad, rc[1] + pad)
        if grid[pt[1], pt[0]] == 1:
            grid[pt[1] - pad : pt[1] + pad + 1, pt[0] - pad : pt[0] + pad + 1] = 0
            grid[pt[1], pt[0]] = -1
    keepy, keepx = np.where(grid == -1)
    keepy, keepx = keepy - pad, keepx - pad
    inds_keep = inds[keepy, keepx]
    out = corners[:, inds_keep]
    inds2 = np.argsort(-out[-1, :])
    out = out[:, inds2]
    out_inds = inds1[inds_keep[inds2]]
    return out, out_inds
