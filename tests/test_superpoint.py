"""SuperPoint inference parity vs the reference's baked golden artifacts.

Differential-testing strategy mirrors the reference's own GT-header method
(SURVEY.md section 4.1): the quantized int8 path is compared against the int8
grids the reference baked from its qnnpack run
(include/data/quantized/quantized_image0.h), and the float path's softmax
grid against pair0_gt.h.
"""

import os

import numpy as np
import pytest

from maveric_slam_tpu.data import kitti, refdata
from maveric_slam_tpu.models import superpoint as sp

FRAME0 = "/root/reference/datasets/kitti/sequences/00/image_0/000000.png"

pytestmark = pytest.mark.skipif(
    not os.path.exists(FRAME0), reason="reference dataset not mounted"
)


@pytest.fixture(scope="module")
def params():
    return sp.load_params()


@pytest.fixture(scope="module")
def img0():
    return kitti.load_frame(FRAME0)


class TestAccumulatorBound:
    def test_int8_accumulators_below_f32_exact_range(self, params):
        """The float-carried int8 path is exactly integer only while every
        conv accumulator stays below 2^24 (superpoint_int8 docstring). Audit
        the bound over diverse real frames and require a 2x margin."""
        base = os.path.dirname(FRAME0)
        frames = [
            kitti.load_frame(os.path.join(base, f"{f:06d}.png"))
            for f in (0, 10, 160, 165)
        ]
        worst = {}
        for img in frames:
            maxima = sp.int8_accumulator_maxima(params, img[None])
            for name, v in maxima.items():
                worst[name] = max(worst.get(name, 0.0), float(v))
        for name, v in worst.items():
            assert v < 2.0**23, (name, v)


class TestInt8Parity:
    def test_semi_grid_matches_reference(self, params, img0):
        semi_q, desc_q, scales = sp.superpoint_int8(params, img0[None])
        ref = refdata.quantized_image0()
        semi = np.asarray(semi_q[0])
        exact = (semi == ref["semi"]).mean()
        within1 = (np.abs(semi.astype(int) - ref["semi"].astype(int)) <= 1).mean()
        assert exact > 0.95, f"exact-match fraction {exact:.4f}"
        assert within1 > 0.99, f"within-1 fraction {within1:.4f}"

    def test_desc_grid_matches_reference(self, params, img0):
        semi_q, desc_q, scales = sp.superpoint_int8(params, img0[None])
        ref = refdata.quantized_image0()
        desc = np.asarray(desc_q[0])
        within1 = (np.abs(desc.astype(int) - ref["desc"].astype(int)) <= 1).mean()
        assert within1 > 0.97, f"within-1 fraction {within1:.4f}"

    def test_scales_match_reference(self, params, img0):
        _, _, scales = sp.superpoint_int8(params, img0[None])
        ref = refdata.quantized_image0()
        # The reference derives scales empirically from unique-value gaps
        # (superpoint_inference.py:199-208); ours are the true q-params.
        assert abs(float(scales["semi_scale"]) - ref["semi_scale"]) < 1e-4
        assert abs(float(scales["desc_scale"]) - ref["desc_scale"]) < 1e-3


class TestFloatPath:
    def test_dequantized_softmax_grid_matches_gt(self, params, img0):
        # The reference's "float" GT grids (pair0_gt.h) are softmaxes of the
        # *quantized* model's dequantized outputs (superpoint_inference.py:666),
        # so the golden comparison runs through the int8 path.
        semi_q, _, scales = sp.superpoint_int8(params, img0[None])
        semi = np.asarray(semi_q[0]).astype(np.float64) * float(scales["semi_scale"])
        e = np.exp(semi)
        dense = e / (e.sum(-1, keepdims=True) + 1e-5)
        nodust = dense[..., :64]
        probs = nodust.max(-1)
        idx = nodust.argmax(-1)
        gt = refdata.gt_softmax_grids()
        # Argmax agreement on confident cells (prob > 0.1).
        conf = gt["probs0"] > 0.1
        agree = (idx[conf] == gt["indices0"][conf]).mean()
        assert agree > 0.95, f"argmax agreement {agree:.4f}"
        med = np.median(np.abs(probs[conf] - gt["probs0"][conf]))
        assert med < 0.02, f"median prob err {med:.4f}"

    def test_float_int8_consistency(self, params, img0):
        semi_f, _ = sp.superpoint_float(params, img0[None])
        semi_q, _, scales = sp.superpoint_int8(params, img0[None])
        deq = np.asarray(semi_q[0]).astype(np.float32) * float(scales["semi_scale"])
        err = np.abs(np.asarray(semi_f[0]) - deq)
        # Quantization error across the net accumulates to a few LSB.
        assert np.median(err) < 2.0 * float(scales["semi_scale"])


class TestInt8DivergenceLocalization:
    """Round-3 verdict #5: localize the residual ~2% bit-mismatch vs the
    reference's baked grids. Verdict of the investigation:

    - The requant ROUNDING MODE is not the cause: half-even, half-away and
      half-up all produce the identical 98.05%/97.68% exact-match fractions
      vs the baked grids (and a float64 multiplier makes things WORSE —
      qnnpack's multiplier is fp32).
    - The network + requant chain is EXACT: an independent torch emulation
      of the same qnnpack graph (f32-carried integer convs, quantized bias,
      fp32 multiplier, round-half-even) agrees with the JAX int8 path
      100.0% bitwise on the same input (the test below).
    - The divergence therefore enters BEFORE conv1a, at the input resize:
      the reference baked its grids through torchvision tensor Resize
      (superpoint_inference.py:607), whose exact ulps depend on the
      torchvision build; pixels landing on round(img/s_in) boundaries flip
      the int8 input by 1 LSB and scatter +-1 LSB through the stack. Our
      half-pixel bilinear is the closest reconstruction measured (98.05%
      semi exact vs 93.6% for torch.nn.functional.interpolate and 18.6%
      for cv2.INTER_AREA).
    """

    def test_network_and_requant_bitwise_exact_vs_independent_emulation(
        self, params, img0
    ):
        import torch

        semi_j, desc_j, _ = sp.superpoint_int8(params, np.asarray(img0)[None])
        semi_j = np.asarray(semi_j[0])
        desc_j = np.asarray(desc_j[0])

        raw = np.load(sp._DEFAULT_WEIGHTS)
        s_in = np.float32(raw["input_scale"])
        x = torch.from_numpy(
            np.clip(np.round(np.asarray(img0) / s_in), -128, 127).astype(
                np.float32
            )
        )[None, None]

        def qconv(x, name, in_scale, relu):
            w = torch.from_numpy(raw[f"{name}_w"].astype(np.float32))
            pad = 1 if w.shape[-1] == 3 else 0
            acc = torch.nn.functional.conv2d(x, w, padding=pad)
            wsc = np.float32(raw[f"{name}_wscale"])
            osc = np.float32(raw[f"{name}_oscale"])
            b = torch.from_numpy(raw[f"{name}_b"].astype(np.float32))
            bias_q = torch.round(
                b / torch.tensor(np.float32(in_scale) * wsc)
            )
            m = torch.tensor((np.float32(in_scale) * wsc) / osc)
            q = torch.round((acc + bias_q[None, :, None, None]) * m)
            lo = 0.0 if relu else -128.0
            return torch.clamp(q, lo, 127.0), osc

        with torch.no_grad():
            sc = s_in
            for name in sp._ENCODER:
                x, sc = qconv(x, name, sc, True)
                if name in ("conv1b", "conv2b", "conv3b"):
                    x = torch.nn.functional.max_pool2d(x, 2, 2)
            pa, sca = qconv(x, "convPa", sc, True)
            semi_t, _ = qconv(pa, "convPb", sca, False)
            da, scd = qconv(x, "convDa", sc, True)
            desc_t, _ = qconv(da, "convDb", scd, False)
        semi_t = semi_t[0].permute(1, 2, 0).numpy().astype(np.int8)
        desc_t = desc_t[0].permute(1, 2, 0).numpy().astype(np.int8)
        np.testing.assert_array_equal(semi_j, semi_t)
        np.testing.assert_array_equal(desc_j, desc_t)
