"""Run the SLAM engine over an image sequence.

CLI capability of the reference's intended end-to-end flow (tracking_main +
compute_trajectory + PLY export), as one command:

  python -m maveric_slam_tpu.cli.track IMAGE_DIR --out-dir out/
      [--no-ba] [--no-loop-closure] [--gt poses.txt] [--checkpoint ckpt/]
      [--resume ckpt/]

Writes KITTI-format poses, a PLY polyline, an optional top-down plot, and
(with --gt) ATE/RPE metrics.
"""

import argparse
import json
import os


def main() -> None:
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("image_dir")
    parser.add_argument("--img-glob", default="*.png")
    parser.add_argument("--out-dir", default="out")
    parser.add_argument("--skip", type=int, default=1)
    parser.add_argument("--max-frames", type=int, default=None)
    parser.add_argument("--no-ba", action="store_true")
    parser.add_argument("--no-loop-closure", action="store_true")
    parser.add_argument("--gt", default=None, help="KITTI GT pose file")
    parser.add_argument("--gt-offset", type=int, default=0)
    parser.add_argument("--checkpoint", default=None, help="save state here")
    parser.add_argument(
        "--checkpoint-every",
        type=int,
        default=0,
        help="also checkpoint every N frames during the run (crash-safe: "
        "a kill mid-save leaves the previous checkpoint intact)",
    )
    parser.add_argument("--resume", default=None, help="restore state first")
    parser.add_argument("--plot", action="store_true")
    parser.add_argument(
        "--mesh",
        type=int,
        default=0,
        help="run the engine distributed over an N-device mesh (window BA "
        "landmark-sharded, LCD frame-sharded, pool word-sharded); 0 = "
        "single device",
    )
    args = parser.parse_args()

    import numpy as np

    from ..config import DEFAULT_CONFIG
    from ..data import kitti
    from ..models import superpoint as sp
    from ..slam import SlamSystem
    from ..utils import checkpoint, evaluation, trajectory

    os.makedirs(args.out_dir, exist_ok=True)
    cfg = DEFAULT_CONFIG
    seq = kitti.ImageSequence(
        args.image_dir,
        cfg.frontend.height,
        cfg.frontend.width,
        img_glob=args.img_glob,
        skip=args.skip,
    )
    params = sp.load_params()
    mesh = None
    if args.mesh:
        from ..parallel import mesh as mesh_lib

        mesh = mesh_lib.make_mesh(args.mesh)
    slam = SlamSystem(
        params,
        cfg,
        ba_every=0 if args.no_ba else 4,
        enable_loop_closure=not args.no_loop_closure,
        mesh=mesh,
    )
    start = 0
    if args.resume:
        checkpoint.restore(slam, args.resume)
        start = slam.frame_idx + 1
        print(f"resumed at frame {start}")

    n = len(seq) if args.max_frames is None else min(len(seq), args.max_frames)
    for i in range(start, n):
        slam.process(seq[i])
        if (
            args.checkpoint
            and args.checkpoint_every
            and (i + 1) % args.checkpoint_every == 0
        ):
            checkpoint.save(slam, args.checkpoint)
        if slam.stats and i % 10 == 0:
            s = slam.stats[-1]
            print(
                f"frame {i}/{n}: matches={s['matches']} inliers={s['inliers']}"
                f" scale={s['scale']:.3f}"
            )

    poses = slam.trajectory()
    trajectory.save_kitti_poses(os.path.join(args.out_dir, "poses.txt"), poses)
    trajectory.write_ply(
        os.path.join(args.out_dir, "trajectory.ply"), poses[:, :3, 3]
    )
    print(f"wrote {args.out_dir}/poses.txt ({len(poses)} poses)")
    if slam.loop_events:
        print(f"loop closures: {[(e.frame, e.matched_frame) for e in slam.loop_events]}")

    if args.checkpoint:
        checkpoint.save(slam, args.checkpoint)
        print(f"checkpointed to {args.checkpoint}")

    if args.gt:
        gt = kitti.read_poses(args.gt)[args.gt_offset : args.gt_offset + len(poses)]
        metrics = {
            **evaluation.ate(poses, gt),
            **evaluation.rpe(poses, gt),
        }
        with open(os.path.join(args.out_dir, "metrics.json"), "w") as f:
            json.dump(metrics, f, indent=2)
        print(json.dumps(metrics, indent=2))
    slam.close()

    if args.plot:
        from ..utils import visualization

        tracks = [("estimate", poses)]
        if args.gt:
            tracks.append(("ground truth", gt))
        visualization.plot_trajectories(
            tracks, os.path.join(args.out_dir, "trajectory.png")
        )
        print(f"wrote {args.out_dir}/trajectory.png")


if __name__ == "__main__":
    main()
