"""Checkpoint/resume of the SLAM system state.

The reference's only persistence is one .npy per pairwise transform
(python/pairwise_pnp.py:694) with resume-by-skipping in the trajectory
composer (compute_trajectory.py:63-87). Here the *entire* engine state —
tracker device state, pose chain, track table, loop-closure database —
round-trips through a checkpoint directory, so a crashed or preempted run
resumes mid-sequence with identical downstream results.

Format: one .npz for array state + one JSON for scalars/metadata. (Small
state; orbax would be overkill and ties the format to its layout rules.)

Crash consistency: the array file is written under a per-frame name first
and meta.json — which names it — is committed last via an atomic
os.replace. A SIGKILL at any instant leaves either the previous complete
checkpoint or the new complete checkpoint, never a torn one
(tests/test_fault_injection.py kills a live run mid-sequence to prove it).
"""

from __future__ import annotations

import json
import os
from typing import TYPE_CHECKING

import numpy as np

if TYPE_CHECKING:  # pragma: no cover
    from ..slam import SlamSystem


def save(slam: "SlamSystem", path: str) -> None:
    os.makedirs(path, exist_ok=True)
    arrays = {}

    if slam.state is not None:
        for name, val in slam.state._asdict().items():
            arrays[f"tracker_{name}"] = np.asarray(val)
    arrays["rng_key"] = np.asarray(slam.key)

    arrays["poses"] = np.stack(slam.poses) if slam.poses else np.zeros((0, 4, 4))
    if slam.rel_poses:
        arrays["rel_R"] = np.stack([p[0] for p in slam.rel_poses])
        arrays["rel_t"] = np.stack([p[1] for p in slam.rel_poses])

    # Track table.
    tt = slam.tracks
    arrays["tracks_cell_to_track"] = tt.cell_to_track
    tids, frames_flat, xy_flat, lens, scores = [], [], [], [], []
    for tid, obs in tt.observations.items():
        tids.append(tid)
        lens.append(len(obs))
        scores.append(tt.scores.get(tid, 0.0))
        for o in obs:
            frames_flat.append(o.frame)
            xy_flat.append(o.xy)
    arrays["tracks_ids"] = np.array(tids, np.int64)
    arrays["tracks_lens"] = np.array(lens, np.int64)
    arrays["tracks_scores"] = np.array(scores, np.float64)
    arrays["tracks_frames"] = np.array(frames_flat, np.int64)
    arrays["tracks_xy"] = (
        np.array(xy_flat, np.float64) if xy_flat else np.zeros((0, 2))
    )
    arrays["tracks_words"] = np.array(
        [tt.words.get(t, -1) for t in tids], np.int64
    )

    if slam.enable_loop_closure:
        for name, val in slam.db._asdict().items():
            arrays[f"db_{name}"] = np.asarray(val)
        for name, val in slam.pool._asdict().items():
            arrays[f"pool_{name}"] = np.asarray(val)
        slots = [k for k, e in enumerate(slam.kf_store) if e is not None]
        if slots:
            arrays["kf_slot"] = np.array(slots, np.int64)
            arrays["kf_frame"] = np.array(
                [slam.kf_store[k]["frame"] for k in slots], np.int64
            )
            arrays["kf_desc"] = np.stack(
                [slam.kf_store[k]["desc"] for k in slots]
            )
            arrays["kf_xy"] = np.stack([slam.kf_store[k]["xy"] for k in slots])
            arrays["kf_mask"] = np.stack(
                [slam.kf_store[k]["mask"] for k in slots]
            )
            # Metric feature depths per keyframe: the loop-closure scale
            # recovery reads entry["depth"]/["depth_ok"] unconditionally
            # (slam._verify_and_close_loop), so a checkpoint without them
            # would KeyError on the first post-resume loop candidate.
            arrays["kf_depth"] = np.stack(
                [slam.kf_store[k]["depth"] for k in slots]
            )
            arrays["kf_depth_ok"] = np.stack(
                [slam.kf_store[k]["depth_ok"] for k in slots]
            )
        # Retained loop edges: a pose-graph solve after resume re-applies
        # ALL retained edges (see slam.MAX_LOOP_EDGES invariant) — dropping
        # them across a restart would silently revert their corrections.
        if slam.loop_edges:
            arrays["loop_edge_ij"] = np.array(
                [(fi, fj) for fi, fj, _, _ in slam.loop_edges], np.int64
            )
            arrays["loop_edge_R"] = np.stack(
                [np.asarray(R) for _, _, R, _ in slam.loop_edges]
            )
            arrays["loop_edge_t"] = np.stack(
                [np.asarray(t) for _, _, _, t in slam.loop_edges]
            )

    state_file = f"state_{slam.frame_idx:08d}.npz"
    np.savez_compressed(os.path.join(path, state_file), **arrays)
    meta = {
        "state_file": state_file,
        "frame_idx": slam.frame_idx,
        "next_track_id": tt.next_id,
        "stats": slam.stats,
        "loop_events": [
            {
                "frame": e.frame,
                "matched_frame": e.matched_frame,
                "score": e.score,
                "num_inliers": e.num_inliers,
            }
            for e in slam.loop_events
        ],
        "enable_loop_closure": slam.enable_loop_closure,
        "kf_frames": slam.kf_frames,
        "last_kf": slam._last_kf,
    }
    # Commit point: meta.json names the (already fully written) state file.
    tmp = os.path.join(path, ".meta.json.tmp")
    with open(tmp, "w") as f:
        json.dump(meta, f)
        f.flush()
        os.fsync(f.fileno())
    os.replace(tmp, os.path.join(path, "meta.json"))
    # GC superseded state files (crash here just leaves an orphan).
    for name in os.listdir(path):
        if name.startswith("state_") and name != state_file:
            os.remove(os.path.join(path, name))


def restore(slam: "SlamSystem", path: str) -> None:
    """Load a checkpoint into an initialized (fresh) SlamSystem."""
    import jax.numpy as jnp

    from ..frontend.tracker import TrackerState
    from ..loopclosure.lcd import LoopDatabase
    from ..slam import LoopClosureEvent
    from ..tracks import Observation

    with open(os.path.join(path, "meta.json")) as f:
        meta = json.load(f)
    with np.load(os.path.join(path, meta.get("state_file", "state.npz"))) as z:
        arrays = dict(z)

    slam.frame_idx = meta["frame_idx"]
    slam.stats = meta["stats"]
    slam.loop_events = [LoopClosureEvent(**e) for e in meta["loop_events"]]
    slam.kf_frames = [int(f) for f in meta.get("kf_frames", [0])]
    slam._last_kf = int(meta.get("last_kf", 0))
    if "rng_key" in arrays:
        slam.key = jnp.asarray(arrays["rng_key"])

    if "tracker_desc" in arrays:
        slam.state = TrackerState(
            **{
                name: jnp.asarray(arrays[f"tracker_{name}"])
                for name in TrackerState._fields
            }
        )
    slam.poses = [p for p in arrays["poses"]]
    slam.rel_poses = (
        [(r, t) for r, t in zip(arrays["rel_R"], arrays["rel_t"])]
        if "rel_R" in arrays
        else []
    )

    tt = slam.tracks
    tt.cell_to_track = arrays["tracks_cell_to_track"]
    tt.next_id = meta["next_track_id"]
    tt.observations = {}
    tt.scores = {}
    tt.words = {}
    pos = 0
    words = arrays.get("tracks_words")
    for row, (tid, n, sc) in enumerate(
        zip(arrays["tracks_ids"], arrays["tracks_lens"], arrays["tracks_scores"])
    ):
        obs = []
        for k in range(n):
            obs.append(
                Observation(
                    int(arrays["tracks_frames"][pos + k]),
                    tuple(arrays["tracks_xy"][pos + k]),
                )
            )
        pos += n
        tt.observations[int(tid)] = obs
        tt.scores[int(tid)] = float(sc)
        if words is not None and words[row] >= 0:
            tt.words[int(tid)] = int(words[row])

    if meta["enable_loop_closure"] and "db_multihot" in arrays:
        from ..mapping.feature_pool import DevicePool

        slam.db = LoopDatabase(
            **{
                name: jnp.asarray(arrays[f"db_{name}"])
                for name in LoopDatabase._fields
            }
        )
        if "pool_first_seen" in arrays:
            slam.pool = DevicePool(
                **{
                    name: jnp.asarray(arrays[f"pool_{name}"])
                    for name in DevicePool._fields
                }
            )
        if "kf_slot" in arrays:
            has_depth = "kf_depth" in arrays
            n_top = arrays["kf_desc"].shape[1]
            for row, slot in enumerate(arrays["kf_slot"]):
                slam.kf_store[int(slot)] = {
                    "frame": int(arrays["kf_frame"][row]),
                    "desc": arrays["kf_desc"][row],
                    "xy": arrays["kf_xy"][row],
                    "mask": arrays["kf_mask"][row],
                    # Pre-depth checkpoints: depth_ok=False everywhere so
                    # the scale recovery takes its guess_norm fallback
                    # instead of crashing on a missing key.
                    "depth": arrays["kf_depth"][row]
                    if has_depth
                    else np.zeros((n_top,), np.float32),
                    "depth_ok": arrays["kf_depth_ok"][row]
                    if has_depth
                    else np.zeros((n_top,), bool),
                }
        # Host mirror of the db ring cursor must match the restored device
        # cursor, or post-resume keyframes write kf_store slots that
        # disagree with where the db actually scored them.
        if "db_next_slot" in arrays:
            slam._next_slot = int(
                np.asarray(arrays["db_next_slot"]).reshape(-1)[0]
            )
        if "loop_edge_ij" in arrays:
            slam.loop_edges = [
                (
                    int(ij[0]),
                    int(ij[1]),
                    arrays["loop_edge_R"][k],
                    arrays["loop_edge_t"][k],
                )
                for k, ij in enumerate(arrays["loop_edge_ij"])
            ]
