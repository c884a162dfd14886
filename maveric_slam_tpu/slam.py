"""The full SLAM system: tracking + windowed BA + loop closure.

Composes every subsystem into the end-to-end engine the reference never
assembled (its components are seven standalone benchmark mains —
SURVEY.md section 0): the quantized frame-to-frame tracker
(frontend.tracker), multi-frame track table (tracks), sliding-window
Schur-complement BA over the tracked landmarks (backend.ba), BoW
loop-closure detection (loopclosure), relative-pose verification of loop
candidates (geometry.ransac), and pose-graph correction
(backend.pose_graph).

Host orchestration only — every numeric kernel runs jitted on device.
Pose bookkeeping: self.poses[k] is T_w_ck (camera-to-world, KITTI format).
"""

from __future__ import annotations

import dataclasses
from typing import List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from .backend import ba, pose_graph
from .config import SlamConfig
from .frontend import tracker as trk
from .geometry import epipolar, ransac
from .loopclosure import lcd, vocab as vocab_lib
from .ops import lie, matching
from .tracks import TrackTable
from .utils.trajectory import compose_trajectory


@dataclasses.dataclass
class LoopClosureEvent:
    frame: int
    matched_frame: int
    score: float
    num_inliers: int


class SlamSystem:
    def __init__(
        self,
        params,
        config: SlamConfig,
        seed: int = 0,
        ba_every: int = 4,
        enable_loop_closure: bool = True,
    ):
        self.params = params
        self.config = config
        self.key = jax.random.PRNGKey(seed)
        self.ba_every = ba_every
        self.enable_loop_closure = enable_loop_closure

        self.state: Optional[trk.TrackerState] = None
        self.frame_idx = -1
        self.poses: List[np.ndarray] = []  # T_w_c per frame (4, 4)
        self.rel_poses: List[tuple] = []  # (R, t) odometry steps T_c(i+1)_ci
        self.tracks = TrackTable(
            config.frontend.num_cells, max_length=config.ba.num_poses
        )
        self.stats: List[dict] = []
        self.loop_events: List[LoopClosureEvent] = []

        if enable_loop_closure:
            self.vocab = vocab_lib.load_reference_vocabulary()
            self.db = lcd.create_database(
                config.loop.max_db_frames, self.config.loop.vocab_size
            )
            # Per-db-slot stored features for loop verification (slot k
            # was inserted at frame self.kf_frame[k]; frame 0 has no step
            # output, so slots start at frame 1).
            self.kf_desc: List[np.ndarray] = []
            self.kf_xy: List[np.ndarray] = []
            self.kf_mask: List[np.ndarray] = []
            self.kf_frame: List[int] = []

    # ------------------------------------------------------------------ #

    def process(self, image: np.ndarray) -> None:
        img = jnp.asarray(image)
        self.frame_idx += 1
        if self.state is None:
            self.state = trk.init_state(self.params, img, self.config, 0)
            self.poses.append(np.eye(4))
            return

        self.state, step = trk.track_step(self.params, self.state, img, self.config)

        R = np.asarray(step.R)
        t = np.asarray(step.t)
        self.rel_poses.append((R, t))
        T_rel = np.eye(4)
        T_rel[:3, :3] = R
        T_rel[:3, 3] = t
        self.poses.append(self.poses[-1] @ np.linalg.inv(T_rel))

        self.tracks.advance(
            self.frame_idx,
            np.asarray(step.cells_new),
            np.asarray(step.xy_new),
            np.asarray(step.matched_prev_cell),
            np.asarray(step.match_score),
            np.asarray(step.match_mask),
        )
        self.stats.append(
            {
                "matches": int(step.num_matches),
                "inliers": int(step.num_inliers),
                "scale": float(step.scale),
            }
        )

        if (
            self.frame_idx >= 3
            and self.ba_every
            and self.frame_idx % self.ba_every == 0
        ):
            self._run_window_ba()

        if self.enable_loop_closure:
            self._loop_closure_step(step)

    # ------------------------------------------------------------------ #

    def _window_frames(self) -> List[int]:
        p = self.config.ba.num_poses
        first = max(0, self.frame_idx - p + 1)
        return list(range(first, self.frame_idx + 1))

    def _run_window_ba(self) -> None:
        frames = self._window_frames()
        if len(frames) < 3:
            return
        uv, mask, tids = self.tracks.window_problem(
            frames, self.config.ba.max_landmarks
        )
        n_l = int((mask.sum(1) >= 2).sum())
        if n_l < 16:
            return

        # Camera-from-world poses for the window.
        T_w = np.stack([self.poses[f] for f in frames])
        T_cw = np.linalg.inv(T_w)
        R_cw = np.ascontiguousarray(T_cw[:, :3, :3], np.float32)
        t_cw = np.ascontiguousarray(T_cw[:, :3, 3], np.float32)

        # Landmark init: triangulate each track's first/last in-window obs.
        X0 = self._triangulate_landmarks(uv, mask, R_cw, t_cw)
        ok = np.isfinite(X0).all(-1)
        mask = mask & ok[:, None]

        # Pad poses to the full window size (dense problem shape is static).
        p = self.config.ba.num_poses
        if len(frames) < p:
            pad = p - len(frames)
            R_cw = np.concatenate([R_cw, np.repeat(R_cw[-1:], pad, 0)])
            t_cw = np.concatenate([t_cw, np.repeat(t_cw[-1:], pad, 0)])
            uv = np.concatenate(
                [uv, np.zeros((uv.shape[0], pad, 2), np.float32)], 1
            )
            mask = np.concatenate([mask, np.zeros((mask.shape[0], pad), bool)], 1)

        problem = ba.BAProblem(
            K=jnp.asarray(self.config.working_camera.K),
            R=jnp.asarray(R_cw),
            t=jnp.asarray(t_cw),
            X=jnp.asarray(np.nan_to_num(X0), jnp.float32),
            uv=jnp.asarray(uv),
            mask=jnp.asarray(mask),
        )
        solved, stats = ba.bundle_adjust(
            problem,
            iterations=self.config.ba.max_iterations,
            damping=self.config.ba.lm_damping,
            huber_delta=self.config.ba.huber_delta,
            # Two anchors: gauge + monocular scale (a single anchor lets BA
            # slide the window scale, which shows up directly as ATE drift).
            num_anchored=2,
        )
        # Write optimized poses back (cam-from-world -> cam-to-world).
        R_opt = np.asarray(solved.R)[: len(frames)]
        t_opt = np.asarray(solved.t)[: len(frames)]
        for k, f in enumerate(frames):
            T = np.eye(4)
            T[:3, :3] = R_opt[k].T
            T[:3, 3] = -R_opt[k].T @ t_opt[k]
            self.poses[f] = T

    def _triangulate_landmarks(self, uv, mask, R_cw, t_cw) -> np.ndarray:
        """Two-view DLT per landmark from its first/last in-window obs."""
        L, P = mask.shape
        first = np.argmax(mask, axis=1)
        last = P - 1 - np.argmax(mask[:, ::-1], axis=1)
        K = self.config.working_camera.K
        fx, fy, cx, cy = K[0, 0], K[1, 1], K[0, 2], K[1, 2]

        def norm(uv_sel):
            return np.stack(
                [(uv_sel[..., 0] - cx) / fx, (uv_sel[..., 1] - cy) / fy], -1
            )

        p1 = norm(uv[np.arange(L), first])[:, None, :]
        p2 = norm(uv[np.arange(L), last])[:, None, :]
        # Relative pose cam_first -> cam_last.
        R1, t1 = R_cw[first], t_cw[first]
        R2, t2 = R_cw[last], t_cw[last]
        R_rel = np.einsum("lij,lkj->lik", R2, R1)  # R2 @ R1^T
        t_rel = t2 - np.einsum("lij,lj->li", R_rel, t1)
        X_c1 = np.asarray(
            epipolar.triangulate(
                jnp.asarray(R_rel, jnp.float32),
                jnp.asarray(t_rel, jnp.float32),
                jnp.asarray(p1, jnp.float32),
                jnp.asarray(p2, jnp.float32),
            )
        )[:, 0]
        # cam-1 -> world.
        X_w = np.einsum("lji,lj->li", R_cw[first], X_c1 - t_cw[first])
        bad = (X_c1[:, 2] < 0.1) | (X_c1[:, 2] > 500)
        X_w[bad] = np.nan
        return X_w

    # ------------------------------------------------------------------ #

    def _loop_closure_step(self, step: trk.StepResult) -> None:
        cfg = self.config.loop
        desc = np.asarray(step.desc_top)
        xy = np.asarray(step.xy_new)
        fmask = np.asarray(step.cells_new) >= 0
        wa = vocab_lib.assign_words(
            jnp.asarray(desc), step.desc_scale, jnp.asarray(fmask), self.vocab
        )
        word_ids = wa.word_id

        res = lcd.query(
            self.db,
            word_ids,
            current_index=jnp.int32(len(self.kf_frame)),
            min_frame_gap=cfg.min_frame_gap,
            min_score=cfg.min_score,
        )
        self.db = lcd.add_frame(self.db, word_ids)
        self.kf_desc.append(desc)
        self.kf_xy.append(xy)
        self.kf_mask.append(fmask)
        self.kf_frame.append(self.frame_idx)

        best = int(res.best)
        if best < 0 or best >= len(self.kf_frame) - 1:
            return
        accepted = self._verify_and_close_loop(best, float(res.best_score))
        if accepted:
            self.loop_events.append(accepted)

    def _verify_and_close_loop(
        self, matched_slot: int, score: float
    ) -> Optional[LoopClosureEvent]:
        """Geometric check of an LCD candidate + pose-graph correction."""
        cur = self.frame_idx
        matched_frame = self.kf_frame[matched_slot]
        d_a = self.kf_desc[matched_slot].astype(np.float32)
        d_b = self.kf_desc[-1].astype(np.float32)
        d_a /= np.maximum(np.linalg.norm(d_a, axis=-1, keepdims=True), 1e-9)
        d_b /= np.maximum(np.linalg.norm(d_b, axis=-1, keepdims=True), 1e-9)
        m = matching.nn_match_dot(
            jnp.asarray(d_a),
            jnp.asarray(d_b),
            jnp.asarray(self.kf_mask[matched_slot]),
            jnp.asarray(self.kf_mask[-1]),
            dot_thresh=self.config.matcher.dot_thresh,
        )
        K = jnp.asarray(self.config.working_camera.K)
        p1 = epipolar.normalize_points(jnp.asarray(self.kf_xy[matched_slot]), K)
        p2 = epipolar.normalize_points(
            jnp.asarray(self.kf_xy[-1][np.asarray(m.index)]), K
        )
        self.key, sub = jax.random.split(self.key)
        rr = ransac.ransac_essential(
            sub, p1, p2, m.mask,
            inlier_thresh=self.config.ransac.inlier_thresh,
            num_hypotheses=self.config.ransac.num_hypotheses,
        )
        n_in = int(rr.num_inliers)
        if n_in < 30:
            return None

        # Pose-graph over all frames: odometry edges + the loop edge.
        n = len(self.rel_poses)
        rel_R = np.stack([p[0] for p in self.rel_poses]).astype(np.float32)
        rel_t = np.stack([p[1] for p in self.rel_poses]).astype(np.float32)
        ei, ej, Rm, tm = pose_graph.odometry_edges(
            jnp.asarray(rel_R), jnp.asarray(rel_t)
        )
        # Loop edge measurement T_c_matched_c_cur: rotation from RANSAC;
        # translation direction from RANSAC scaled by the current estimate
        # (monocular: the magnitude is unobservable from one pair).
        R_lc = np.asarray(rr.R)  # p_cur = R p_matched + t
        T_guess = np.linalg.inv(self.poses[matched_frame]) @ self.poses[cur]
        t_scale = np.linalg.norm(T_guess[:3, 3])
        R_m_lc, t_m_lc = lie.se3_inverse(
            jnp.asarray(R_lc), jnp.asarray(np.asarray(rr.t) * t_scale, jnp.float32)
        )
        edge_i = np.concatenate([np.asarray(ei), [matched_frame]]).astype(np.int32)
        edge_j = np.concatenate([np.asarray(ej), [cur]]).astype(np.int32)
        R_meas = np.concatenate([np.asarray(Rm), np.asarray(R_m_lc)[None]])
        t_meas = np.concatenate([np.asarray(tm), np.asarray(t_m_lc)[None]])
        weight = np.ones(n + 1, np.float32)
        weight[-1] = 5.0

        poses_R = np.stack([T[:3, :3] for T in self.poses]).astype(np.float32)
        poses_t = np.stack([T[:3, 3] for T in self.poses]).astype(np.float32)
        graph = pose_graph.PoseGraph(
            R=jnp.asarray(poses_R),
            t=jnp.asarray(poses_t),
            edge_i=jnp.asarray(edge_i),
            edge_j=jnp.asarray(edge_j),
            R_meas=jnp.asarray(R_meas, jnp.float32),
            t_meas=jnp.asarray(t_meas, jnp.float32),
            weight=jnp.asarray(weight),
        )
        opt, costs = pose_graph.optimize(graph, iterations=8)
        R_new = np.asarray(opt.R)
        t_new = np.asarray(opt.t)
        for k in range(len(self.poses)):
            T = np.eye(4)
            T[:3, :3] = R_new[k]
            T[:3, 3] = t_new[k]
            self.poses[k] = T
        return LoopClosureEvent(
            frame=cur, matched_frame=matched_frame, score=score, num_inliers=n_in
        )

    # ------------------------------------------------------------------ #

    def trajectory(self) -> np.ndarray:
        return np.stack(self.poses)

    def odometry_trajectory(self) -> np.ndarray:
        """Raw odometry chain (no BA / loop corrections)."""
        R = [p[0] for p in self.rel_poses]
        t = [p[1] for p in self.rel_poses]
        return compose_trajectory(R, t)
