"""Extract and serialize SuperPoint features for frames.

The capability of the reference's header baker (superpoint_inference.py
__main__: quantized semi/desc grids + scales written as C headers, GT
softmax grids alongside) with npz as the serialization format:

  python -m maveric_slam_tpu.cli.extract IMG [IMG ...] --out features.npz
      [--gt gt.npz] [--c-header features.h]

--c-header additionally emits the reference's exact C layout
(`imageN_semi[1920][65]` etc., column-of-grid-major) for drop-in
compatibility with C consumers.
"""

import argparse

import numpy as np


def main() -> None:
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("images", nargs="+")
    parser.add_argument("--out", default="features.npz")
    parser.add_argument("--gt", default=None, help="also write float softmax grids")
    parser.add_argument("--c-header", default=None, help="emit reference-format C header")
    args = parser.parse_args()

    from ..config import DEFAULT_CONFIG
    from ..data import kitti
    from ..models import superpoint as sp

    cfg = DEFAULT_CONFIG
    params = sp.load_params()
    arrays = {}
    gt_arrays = {}
    headers = []

    for i, path in enumerate(args.images):
        img = kitti.load_frame(path, cfg.frontend.height, cfg.frontend.width)
        semi_q, desc_q, scales = sp.superpoint_int8(params, img[None])
        semi = np.asarray(semi_q[0])  # (Hc, Wc, 65)
        desc = np.asarray(desc_q[0])
        s_semi = float(scales["semi_scale"])
        s_desc = float(scales["desc_scale"])
        arrays[f"image{i}_semi"] = semi
        arrays[f"image{i}_desc"] = desc
        arrays[f"image{i}_semi_scale"] = np.float32(s_semi)
        arrays[f"image{i}_desc_scale"] = np.float32(s_desc)

        if args.gt:
            dense = np.exp(semi.astype(np.float64) * s_semi)
            dense /= dense.sum(-1, keepdims=True) + 1e-5
            nodust = dense[..., :64]
            gt_arrays[f"image{i}_probs_gt"] = nodust.max(-1).astype(np.float32)
            gt_arrays[f"image{i}_indices_gt"] = nodust.argmax(-1).astype(np.int32)

        if args.c_header:
            hc, wc = semi.shape[:2]
            lines = [
                f"const int image{i}_rows = {cfg.frontend.height};",
                f"const int image{i}_cols = {cfg.frontend.width};",
                f"const int image{i}_channels = 1;",
                f"const int image{i}_feature_rows = {hc};",
                f"const int image{i}_feature_cols = {wc};",
                f"const float image{i}_semi_scale = {s_semi};",
                f"const int8_t image{i}_semi[{hc * wc}][65] = {{",
            ]
            # Reference patch order: for c in cols, for r in rows.
            for c in range(wc):
                for r in range(hc):
                    lines.append(", ".join(str(v) for v in semi[r, c]) + ",")
            lines.append("};")
            lines.append(f"const float image{i}_desc_scale = {s_desc};")
            lines.append(f"const int8_t image{i}_desc[{hc * wc}][256] = {{")
            for c in range(wc):
                for r in range(hc):
                    lines.append(", ".join(str(v) for v in desc[r, c]) + ",")
            lines.append("};")
            headers.append("\n".join(lines))
        print(f"{path}: semi_scale={s_semi:.6f} desc_scale={s_desc:.6f}")

    np.savez_compressed(args.out, **arrays)
    print(f"wrote {args.out}")
    if args.gt:
        np.savez_compressed(args.gt, **gt_arrays)
        print(f"wrote {args.gt}")
    if args.c_header:
        with open(args.c_header, "w") as f:
            f.write("#pragma once\n\n#include <stdint.h>\n\n")
            f.write("const int cell_size = 8;\n\n")
            f.write("\n\n".join(headers) + "\n")
        print(f"wrote {args.c_header}")


if __name__ == "__main__":
    main()
