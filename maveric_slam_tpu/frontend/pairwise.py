"""Pairwise relative-pose estimation between two frames.

End-to-end slice: image pair -> SuperPoint features -> descriptor match ->
RANSAC essential matrix -> (R, t) with |t| = 1. This is the TPU-native
equivalent of the reference's golden pipeline
(python/pairwise_pnp.py:577-694: fe.run x2, O(N^2) dot match at :639-659,
cv2.findEssentialMat + cv2.recoverPose at :672-678), with the whole
compute path jitted on device; only image decode stays on host.

Convention: returned (R, t) satisfy p2 ~ R p1 + t for camera points
(cv2.recoverPose convention). The camera matrix is the *rescaled* working-
resolution K (the reference forgot to rescale; see config.py).
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..config import SlamConfig
from ..geometry import epipolar, ransac
from ..ops import matching
from . import extractor


class PairwiseResult(NamedTuple):
    R: jnp.ndarray  # (3, 3)
    t: jnp.ndarray  # (3,) unit norm
    E: jnp.ndarray  # (3, 3)
    num_matches: jnp.ndarray  # () int32
    num_inliers: jnp.ndarray  # () int32


@partial(jax.jit, static_argnames=("config",))
def pairwise_pose(
    params,
    image0: jnp.ndarray,
    image1: jnp.ndarray,
    config: SlamConfig,
    key: jax.Array | None = None,
) -> PairwiseResult:
    """Relative pose from frame0 to frame1 (p1 in frame0, p2 in frame1)."""
    if key is None:
        key = jax.random.PRNGKey(0)
    feats0 = extractor.extract_golden(params, image0, config)
    feats1 = extractor.extract_golden(params, image1, config)

    # One-way best-dot match, golden semantics (dot > 0.8).
    m = matching.nn_match_dot(
        feats0.desc,
        feats1.desc,
        feats0.mask,
        feats1.mask,
        dot_thresh=config.matcher.dot_thresh,
    )
    xy0 = feats0.xy
    xy1 = feats1.xy[m.index]

    K = jnp.asarray(config.working_camera.K)
    p1n = epipolar.normalize_points(xy0, K)
    p2n = epipolar.normalize_points(xy1, K)

    res = ransac.ransac_essential(
        key,
        p1n,
        p2n,
        m.mask,
        inlier_thresh=config.ransac.inlier_thresh,
        num_hypotheses=config.ransac.num_hypotheses,
    )
    return PairwiseResult(
        R=res.R,
        t=res.t,
        E=res.E,
        num_matches=jnp.sum(m.mask).astype(jnp.int32),
        num_inliers=res.num_inliers,
    )
