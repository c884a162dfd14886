"""Frame-to-frame visual odometry tracker.

The TPU-native successor of the reference's tracking driver
(src/tracking_main.c:68-228: softmax frame0, top-N frame1, windowed int8
match, RANSAC, pose recovery) extended into an actual odometry loop, which
the reference never closed: per-step monocular scale is propagated by
triangulating matched features and comparing depths against the previous
step's triangulation (classic depth-ratio VO), then the pose is tightened
with a batched Gauss-Newton PnP refine on the scaled structure.

All per-frame compute is one jitted `track_step`; the host loop only feeds
images and collects poses.
"""

from __future__ import annotations

from functools import partial
from typing import List, NamedTuple, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..config import SlamConfig
from ..geometry import epipolar, pnp, ransac
from ..ops import matching
from . import extractor


class TrackerState(NamedTuple):
    desc: jnp.ndarray  # (num_cells, 256) int8 — previous frame descriptors
    probs: jnp.ndarray  # (num_cells,) float32
    indices: jnp.ndarray  # (num_cells,) int32
    xy: jnp.ndarray  # (num_cells, 2) float32 sub-pixel keypoint coords
    depth: jnp.ndarray  # (num_cells,) float32 — per-cell landmark depth
    depth_valid: jnp.ndarray  # (num_cells,) bool
    scale: jnp.ndarray  # () float32 — last step length in global units
    prev_R: jnp.ndarray  # (3, 3) last accepted step rotation (constant-
    prev_t: jnp.ndarray  # (3,)   velocity fallback for degenerate frames)
    key: jnp.ndarray  # PRNG key, split on-device each step (one host
    #     dispatch per frame matters on tunneled/remote devices)


class StepResult(NamedTuple):
    R: jnp.ndarray  # (3, 3) p_new = R p_prev + t
    t: jnp.ndarray  # (3,) scaled translation
    valid: jnp.ndarray  # () bool — False: degenerate frame (textureless /
    #     zero matches / RANSAC failure); R, t are the constant-velocity
    #     fallback, not a measurement. The reference exit(1)s here
    #     (src/top_N.c:91-94); a production tracker must keep streaming.
    num_matches: jnp.ndarray
    num_inliers: jnp.ndarray
    num_scale_pairs: jnp.ndarray
    scale: jnp.ndarray
    # Per-feature match data (fixed capacity top_n) for track building:
    cells_new: jnp.ndarray  # (N,) cell of each new-frame feature
    xy_new: jnp.ndarray  # (N, 2) sub-pixel coords in the new frame
    matched_prev_cell: jnp.ndarray  # (N,) matched prev-frame cell or -1
    match_score: jnp.ndarray  # (N,) cosine^2
    match_mask: jnp.ndarray  # (N,) bool — RANSAC inlier matches
    desc_top: jnp.ndarray  # (N, 256) int8 descriptors of the new features
    desc_scale: jnp.ndarray  # () descriptor scale
    depth_top: jnp.ndarray  # (N,) metric depth of each new feature in the
    #     NEW camera frame (0 where invalid) — loop closure uses these to
    #     recover the metric scale of a loop edge via depth-ratio
    #     triangulation instead of trusting the (drifted) pose guess
    depth_top_ok: jnp.ndarray  # (N,) bool


def _masked_median(x: jnp.ndarray, mask: jnp.ndarray, default: jnp.ndarray) -> jnp.ndarray:
    vals = jnp.where(mask, x, jnp.inf)
    order = jnp.sort(vals)
    n = jnp.sum(mask).astype(jnp.int32)
    med = order[jnp.maximum(n - 1, 0) // 2]
    return jnp.where(n > 0, med, default)


@partial(jax.jit, static_argnames=("config", "seed"))
def init_state(
    params, image: jnp.ndarray, config: SlamConfig, seed: int = 0
) -> TrackerState:
    fc = config.frontend
    feats = extractor.extract_quantized(params, image, config)
    n = fc.num_cells
    return TrackerState(
        desc=feats.desc_q.reshape(n, 256),
        probs=feats.probs.reshape(n),
        indices=feats.indices.reshape(n),
        xy=feats.xy.reshape(n, 2),
        depth=jnp.zeros((n,), jnp.float32),
        depth_valid=jnp.zeros((n,), bool),
        scale=jnp.float32(1.0),
        prev_R=jnp.eye(3, dtype=jnp.float32),
        prev_t=jnp.zeros((3,), jnp.float32),
        key=jax.random.PRNGKey(seed),
    )


@partial(jax.jit, static_argnames=("config",), donate_argnames=("state",))
def track_step(
    params,
    state: TrackerState,
    image: jnp.ndarray,
    config: SlamConfig,
) -> Tuple[TrackerState, StepResult]:
    feats = extractor.extract_quantized(params, image, config)
    return _step_from_feats(state, feats, config)


def _step_from_feats(
    state: TrackerState,
    feats: extractor.QuantizedFeatures,
    config: SlamConfig,
) -> Tuple[TrackerState, StepResult]:
    """The sequential tail of a tracking step (everything after extraction)."""
    fc, mc = config.frontend, config.matcher
    n_cells = fc.num_cells
    key, next_key = jax.random.split(state.key)

    desc1 = feats.desc_q.reshape(n_cells, 256)
    top = feats.top

    m = matching.windowed_match(
        state.desc,
        state.probs,
        state.indices,
        desc1,
        top.cells,
        top.indices,
        top.mask,
        grid_h=fc.grid_h,
        grid_w=fc.grid_w,
        shift=mc.window_shift,
        radius=mc.window_radius,
        match_threshold=mc.match_threshold,
        min_prob=mc.min_prob,
        xy0_cells=state.xy,
        xy1_cells=feats.xy.reshape(n_cells, 2),
    )

    K = jnp.asarray(config.working_camera.K)
    p_prev = epipolar.normalize_points(m.xy0, K)  # in previous frame
    p_new = epipolar.normalize_points(m.xy1, K)

    res = ransac.ransac_essential(
        key,
        p_prev,
        p_new,
        m.mask,
        inlier_thresh=config.ransac.inlier_thresh,
        num_hypotheses=config.ransac.num_hypotheses,
    )

    # Unit-baseline structure in the *previous* frame's coordinates.
    X_unit = epipolar.triangulate(res.R, res.t, p_prev, p_new)  # (N, 3)
    depth_ok = res.inliers & (X_unit[..., 2] > 1e-3) & (X_unit[..., 2] < 1e3)

    # Depth-ratio scale: compare against last step's landmark depths at the
    # matched previous-frame cells.
    prev_depth = state.depth[m.cell0]
    prev_ok = state.depth_valid[m.cell0] & (m.cell0 >= 0)
    ratio = prev_depth / jnp.maximum(X_unit[..., 2], 1e-6)
    pair_ok = depth_ok & prev_ok
    scale = _masked_median(ratio, pair_ok, state.scale)
    scale = jnp.clip(scale, 1e-3, 1e3)

    # GN refine on the scaled structure (observations in the new frame).
    X_scaled = X_unit * scale
    refined = pnp.refine_pose(
        K,
        res.R,
        res.t * scale,
        X_scaled,
        m.xy1,
        depth_ok,
        huber_delta=config.ba.huber_delta,
        damping=config.ba.lm_damping,
    )
    # Guard: fall back to the RANSAC pose if GN diverged (cheap sanity: the
    # refined translation should stay within 2x of the scale estimate).
    t_norm = jnp.linalg.norm(refined.t)
    ok = (t_norm > 0.25 * scale) & (t_norm < 4.0 * scale) & (res.num_inliers > 10)
    R_out = jnp.where(ok, refined.R, res.R)
    t_out = jnp.where(ok, refined.t, res.t * scale)

    # Degenerate-frame gate: a textureless frame (all-dustbin grid), zero
    # valid matches, or <8 usable correspondences leaves RANSAC with
    # rank-deficient solves whose SVDs can emit NaN. Detect it and emit a
    # flagged constant-velocity step instead of garbage; the next good
    # frame re-acquires tracking against this frame's (still stored)
    # features. Reference behavior at this point is exit(1) (top_N.c:91).
    step_valid = (
        (m.num_matches >= 8)
        & (res.num_inliers >= 5)
        & jnp.all(jnp.isfinite(R_out))
        & jnp.all(jnp.isfinite(t_out))
    )
    R_out = jnp.where(step_valid, R_out, state.prev_R)
    t_out = jnp.where(step_valid, t_out, state.prev_t)

    # New per-cell depth map in the new frame's coordinates.
    p_cam_new = (
        jnp.einsum("ij,nj->ni", R_out, X_scaled) + t_out
    )  # scaled points in new frame
    new_depth = jnp.zeros((n_cells,), jnp.float32)
    new_valid = jnp.zeros((n_cells,), bool)
    write = depth_ok & step_valid & jnp.all(jnp.isfinite(p_cam_new), axis=-1)
    cells_new = jnp.where(write, top.cells, 0)
    new_depth = new_depth.at[cells_new].set(
        jnp.where(write, p_cam_new[..., 2], 0.0)
    )
    new_valid = new_valid.at[cells_new].set(write)
    # Cell 0 may have been clobbered by masked writes.
    new_valid = new_valid.at[0].set(
        new_valid[0] & (jnp.sum(write & (top.cells == 0)) > 0)
    )

    new_state = TrackerState(
        desc=desc1,
        probs=feats.probs.reshape(n_cells),
        indices=feats.indices.reshape(n_cells),
        xy=feats.xy.reshape(n_cells, 2),
        depth=new_depth,
        depth_valid=new_valid,
        scale=jnp.where(step_valid, jnp.linalg.norm(t_out), state.scale),
        prev_R=R_out,
        prev_t=t_out,
        key=next_key,
    )
    inliers_out = res.inliers & step_valid
    return new_state, StepResult(
        R=R_out,
        t=t_out,
        valid=step_valid,
        num_matches=m.num_matches,
        num_inliers=jnp.where(step_valid, res.num_inliers, 0),
        num_scale_pairs=jnp.sum(pair_ok).astype(jnp.int32),
        scale=scale,
        cells_new=top.cells,
        xy_new=m.xy1,
        matched_prev_cell=jnp.where(inliers_out, m.cell0, -1),
        match_score=m.score,
        match_mask=m.mask & inliers_out,
        desc_top=desc1[top.cells],
        desc_scale=feats.desc_scale,
        depth_top=jnp.where(write, p_cam_new[..., 2], 0.0),
        depth_top_ok=write,
    )


class Tracker:
    """Host-side odometry loop around the jitted track_step."""

    def __init__(self, params, config: SlamConfig, seed: int = 0):
        self.params = params
        self.config = config
        self.seed = seed
        self.state: TrackerState | None = None
        self.rel_poses: List[Tuple[np.ndarray, np.ndarray]] = []
        self.stats: List[dict] = []

    def process(self, image: np.ndarray) -> StepResult | None:
        img = jnp.asarray(image)
        if self.state is None:
            self.state = init_state(self.params, img, self.config, self.seed)
            return None
        self.state, step = track_step(self.params, self.state, img, self.config)
        self.rel_poses.append((np.asarray(step.R), np.asarray(step.t)))
        self.stats.append(
            {
                "matches": int(step.num_matches),
                "inliers": int(step.num_inliers),
                "scale_pairs": int(step.num_scale_pairs),
                "scale": float(step.scale),
                "valid": bool(step.valid),
            }
        )
        return step

    def trajectory(self) -> np.ndarray:
        from ..utils.trajectory import compose_trajectory

        R = [p[0] for p in self.rel_poses]
        t = [p[1] for p in self.rel_poses]
        return compose_trajectory(R, t)


# --------------------------------------------------------------------------- #
# Pipelined (chunked) tracking — batched extraction + scanned sequential tail
# --------------------------------------------------------------------------- #

@partial(jax.jit, static_argnames=("config",), donate_argnames=("state",))
def track_chunk(
    params,
    state: TrackerState,
    images: jnp.ndarray,  # (K, H, W)
    config: SlamConfig,
) -> Tuple[TrackerState, StepResult]:
    """Track K frames in ONE device program.

    Only the match/RANSAC/scale/refine tail is sequential frame-to-frame;
    feature extraction is not, so the SuperPoint convs run *batched* over
    the whole chunk (≈2x better MXU utilization than frame-at-a-time at
    K=8) and the tail runs as a `lax.scan` over the extracted features.
    Results are bit-identical to K calls of `track_step`; the chunk adds
    K-1 frames of latency and removes K-1 host dispatches.
    """
    feats = jax.vmap(
        lambda im: extractor.extract_quantized.__wrapped__(params, im, config)
    )(images)

    def body(st, ft):
        return _step_from_feats(st, ft, config)

    return jax.lax.scan(body, state, feats)


class PipelinedTracker:
    """Host loop around `track_chunk`: buffers frames, flushes per chunk.

    The streaming analogue of `Tracker` for throughput-bound deployments
    (offline mapping, multi-camera ingest): results arrive chunk-at-a-time.
    """

    def __init__(self, params, config: SlamConfig, chunk: int = 8, seed: int = 0):
        self.params = params
        self.config = config
        self.chunk = chunk
        self.seed = seed
        self.state: TrackerState | None = None
        self._buf: List[jnp.ndarray] = []
        self.rel_poses: List[Tuple[np.ndarray, np.ndarray]] = []
        self.stats: List[dict] = []

    def process(self, image: np.ndarray) -> None:
        img = jnp.asarray(image)
        if self.state is None:
            self.state = init_state(self.params, img, self.config, self.seed)
            return
        self._buf.append(img)
        if len(self._buf) >= self.chunk:
            self.flush()

    def flush(self) -> None:
        if not self._buf or self.state is None:
            return
        if len(self._buf) == self.chunk:
            imgs = jnp.stack(self._buf)
            self._buf = []
            self.state, res = track_chunk(self.params, self.state, imgs, self.config)
            self._record(res, batched=True)
        else:
            # Partial tail (only trajectory()/manual flushes produce one):
            # per-frame track_step instead of a track_chunk retrace — a
            # length-K chunk would compile a whole new executable per
            # distinct K for a few leftover frames.
            buf, self._buf = self._buf, []
            for img in buf:
                self.state, res = track_step(
                    self.params, self.state, img, self.config
                )
                self._record(res, batched=False)

    def _record(self, res: StepResult, batched: bool) -> None:
        R = np.asarray(res.R).reshape(-1, 3, 3)
        t = np.asarray(res.t).reshape(-1, 3)
        matches = np.asarray(res.num_matches).reshape(-1)
        inliers = np.asarray(res.num_inliers).reshape(-1)
        pairs = np.asarray(res.num_scale_pairs).reshape(-1)
        scale = np.asarray(res.scale).reshape(-1)
        for k in range(R.shape[0]):
            self.rel_poses.append((R[k], t[k]))
            self.stats.append(
                {
                    "matches": int(matches[k]),
                    "inliers": int(inliers[k]),
                    "scale_pairs": int(pairs[k]),
                    "scale": float(scale[k]),
                }
            )

    def trajectory(self) -> np.ndarray:
        from ..utils.trajectory import compose_trajectory

        self.flush()
        R = [p[0] for p in self.rel_poses]
        t = [p[1] for p in self.rel_poses]
        return compose_trajectory(R, t)


# --------------------------------------------------------------------------- #
# Multi-stream (batched) tracking — production serving mode
# --------------------------------------------------------------------------- #

def init_states_batched(params, images: jnp.ndarray, config: SlamConfig):
    """Initialize S independent tracker states from (S, H, W) first frames.

    Streams get decorrelated PRNG keys. Batching keeps the MXU busy through
    the small-matrix stages; see BENCH_ALL.json / README for the measured
    single-stream vs aggregate throughput (numbers move per round — the
    benchmark artifacts are the source of truth, not this docstring).
    """
    s = images.shape[0]
    states = jax.vmap(lambda im: init_state(params, im, config, 0))(images)
    keys = jax.vmap(jax.random.PRNGKey)(jnp.arange(s, dtype=jnp.uint32))
    return states._replace(key=keys)


@partial(jax.jit, static_argnames=("config",), donate_argnames=("states",))
def track_step_batched(
    params,
    states: TrackerState,  # batched over the leading axis
    images: jnp.ndarray,  # (S, H, W)
    config: SlamConfig,
) -> Tuple[TrackerState, StepResult]:
    """One tracking step for S independent streams in a single program."""
    return jax.vmap(
        lambda st, im: track_step.__wrapped__(params, st, im, config)
    )(states, images)
