"""Pairwise relative pose between two frames.

CLI capability of the reference's pairwise driver (scripts/run_pairwise_pnp.sh
+ python/pairwise_pnp.py __main__): estimates [R|t] for an image pair and
saves it as .npy, optionally with a match/epiline visualization.

Usage:
  python -m maveric_slam_tpu.cli.pairwise IMG0 IMG1 [--outfile out.npy]
      [--viz matches.png]
"""

import argparse

import numpy as np


def main() -> None:
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("img0_path")
    parser.add_argument("img1_path")
    parser.add_argument("--outfile", default=None, help="save 3x4 [R|t] .npy")
    parser.add_argument("--viz", default=None, help="save match visualization")
    parser.add_argument("--seed", type=int, default=0)
    args = parser.parse_args()

    import jax

    from ..config import DEFAULT_CONFIG
    from ..data import kitti
    from ..frontend import pairwise
    from ..models import superpoint as sp

    cfg = DEFAULT_CONFIG
    params = sp.load_params()
    img0 = kitti.load_frame(args.img0_path, cfg.frontend.height, cfg.frontend.width)
    img1 = kitti.load_frame(args.img1_path, cfg.frontend.height, cfg.frontend.width)

    res = pairwise.pairwise_pose(
        params, img0, img1, cfg, key=jax.random.PRNGKey(args.seed)
    )
    R, t = np.asarray(res.R), np.asarray(res.t)
    T = np.hstack([R, t[:, None]])
    print(f"matches: {int(res.num_matches)}  inliers: {int(res.num_inliers)}")
    print("Rotation matrix R:")
    print(R)
    print("Translation vector t (unit):")
    print(t)
    print("Transformation matrix [R|t]:")
    print(T)
    if args.outfile:
        np.save(args.outfile, T)
        print(f"saved {args.outfile}")
    if args.viz:
        from ..frontend import extractor
        from ..ops import matching
        from ..utils import visualization

        f0 = extractor.extract_golden(params, img0, cfg)
        f1 = extractor.extract_golden(params, img1, cfg)
        m = matching.nn_match_dot(
            f0.desc, f1.desc, f0.mask, f1.mask, dot_thresh=cfg.matcher.dot_thresh
        )
        visualization.draw_matches(
            img0,
            img1,
            np.asarray(f0.xy),
            np.asarray(f1.xy)[np.asarray(m.index)],
            np.asarray(m.mask),
            out_path=args.viz,
        )
        print(f"saved {args.viz}")


if __name__ == "__main__":
    main()
