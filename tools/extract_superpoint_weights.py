#!/usr/bin/env python
"""Extract SuperPoint weights + quantization params from the reference's
TorchScript quantized model into an npz the JAX model can load.

The reference ships `superpoint_quantized_nonorm.pt` (qnnpack backend,
reference: python/superpoint_inference.py:109-114). Its forward() does not run
on this torch build (engine mismatch), but the packed conv params unpack fine
and the per-layer requantization scales are embedded in the TorchScript code.

Extracted per conv layer:
  {name}_w      int8   (out_ch, in_ch, kh, kw)  weight (per-tensor, zp=0)
  {name}_wscale float  weight scale
  {name}_b      float32 (out_ch,)               bias (float domain)
  {name}_oscale float  output (re)quantization scale, zp=0, dtype qint8
Plus `input_scale` (input quantization, zp=0).

Usage: python tools/extract_superpoint_weights.py [out.npz]
"""

import re
import sys

import numpy as np
import torch

LAYERS = [
    "conv1a", "conv1b", "conv2a", "conv2b",
    "conv3a", "conv3b", "conv4a", "conv4b",
    "convPa", "convPb", "convDa", "convDb",
]

MODEL_PATH = "/root/reference/python/superpoint_quantized_nonorm.pt"


def main(out_path: str) -> None:
    torch.backends.quantized.engine = "qnnpack"
    m = torch.jit.load(MODEL_PATH)

    arrays = {"input_scale": np.float32(float(m.quant.scale))}
    assert int(m.quant.zero_point) == 0

    for name in LAYERS:
        conv = getattr(m, name)
        match = re.search(
            r"quantized\.conv2d\(.*?, ([\d.eE+-]+), (\d+)\)", conv.code
        )
        assert match, f"no requant params found for {name}"
        out_scale, out_zp = float(match.group(1)), int(match.group(2))
        assert out_zp == 0, f"{name} has nonzero output zero-point"

        w, b = torch.ops.quantized.conv2d_unpack(conv._packed_params)
        assert w.qscheme() == torch.per_tensor_affine
        assert w.q_zero_point() == 0

        arrays[f"{name}_w"] = w.int_repr().numpy().astype(np.int8)
        arrays[f"{name}_wscale"] = np.float32(w.q_scale())
        arrays[f"{name}_b"] = b.detach().numpy().astype(np.float32)
        arrays[f"{name}_oscale"] = np.float32(out_scale)
        print(
            f"{name}: w{tuple(w.shape)} wscale={w.q_scale():.6g} "
            f"oscale={out_scale:.6g}"
        )

    np.savez_compressed(out_path, **arrays)
    print(f"wrote {out_path}")


if __name__ == "__main__":
    out = sys.argv[1] if len(sys.argv) > 1 else "maveric_slam_tpu/data/superpoint_weights.npz"
    main(out)
