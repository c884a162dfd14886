"""SuperPoint feature network, TPU-native.

Re-implements the capability of the reference's SuperPoint inference
(architecture: python/superpoint_inference.py:29-83; quantized TorchScript
execution: :109-114, :178-208) as pure-functional JAX with two paths:

- **float**: dequantized weights, f32/bf16 convs in NHWC — the golden path
  used for differential testing and for the full-precision pipeline.
- **int8**: faithful emulation of the reference's per-tensor qint8 graph
  (all zero-points are 0): int8 activations x int8 weights accumulated in
  int32 on the MXU, float requantization per layer. Its raw outputs are the
  same int8 semi/desc grids the reference bakes into C headers
  (include/data/quantized/quantized_image0.h), which gives us bit-level
  validation targets.

Layout is NHWC (TPU-friendly); weights are stored HWIO. The network:
VGG-style encoder (8 convs, 3 maxpools) -> detector head (65ch semi) and
descriptor head (256ch, unnormalized — the "nonorm" variant).
"""

from __future__ import annotations

import os
from functools import partial
from typing import Dict, Tuple

import jax
import jax.numpy as jnp
import numpy as np

_ENCODER = ["conv1a", "conv1b", "conv2a", "conv2b", "conv3a", "conv3b", "conv4a", "conv4b"]
_HEADS = ["convPa", "convPb", "convDa", "convDb"]
LAYERS = _ENCODER + _HEADS

_DEFAULT_WEIGHTS = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "data",
    "superpoint_weights.npz",
)

Params = Dict[str, jnp.ndarray]


def load_params(path: str | None = None) -> Params:
    """Load weights extracted by tools/extract_superpoint_weights.py.

    Returns a flat dict with, per layer: `{name}_w` int8 HWIO weight,
    `{name}_wf` float32 HWIO dequantized weight, `{name}_b` float32 bias,
    `{name}_wscale`/`{name}_oscale` scalars; plus `input_scale`.
    """
    raw = np.load(path or _DEFAULT_WEIGHTS)
    # int8 carrier dtype for the quantized path (see superpoint_int8): the
    # conversion is done ONCE here — converting inside the jitted step costs
    # a convert + layout copy of every weight tensor per frame.
    from ..ops.backend import is_mxu_backend

    carrier = jnp.bfloat16 if is_mxu_backend() else jnp.float32
    params: Params = {"input_scale": jnp.float32(raw["input_scale"])}
    for name in LAYERS:
        w_oihw = raw[f"{name}_w"]  # (O, I, KH, KW) int8
        w_hwio = np.transpose(w_oihw, (2, 3, 1, 0))
        params[f"{name}_w"] = jnp.asarray(w_hwio, jnp.int8)
        params[f"{name}_wq"] = jnp.asarray(w_hwio.astype(np.float32), carrier)
        params[f"{name}_wf"] = jnp.asarray(
            w_hwio.astype(np.float32) * raw[f"{name}_wscale"]
        )
        params[f"{name}_b"] = jnp.asarray(raw[f"{name}_b"], jnp.float32)
        params[f"{name}_wscale"] = jnp.float32(raw[f"{name}_wscale"])
        params[f"{name}_oscale"] = jnp.float32(raw[f"{name}_oscale"])
    return params


def _conv(x: jnp.ndarray, w: jnp.ndarray, accum_dtype) -> jnp.ndarray:
    kh = w.shape[0]
    pad = "SAME" if kh == 3 else "VALID"  # 1x1 head convs need no padding
    return jax.lax.conv_general_dilated(
        x,
        w,
        window_strides=(1, 1),
        padding=pad,
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=accum_dtype,
    )


def _maxpool2(x: jnp.ndarray) -> jnp.ndarray:
    if jnp.issubdtype(x.dtype, jnp.floating):
        init = jnp.array(-jnp.inf, dtype=x.dtype)
    else:
        init = jnp.array(jnp.iinfo(x.dtype).min, dtype=x.dtype)
    return jax.lax.reduce_window(
        x,
        init,
        jax.lax.max,
        window_dimensions=(1, 2, 2, 1),
        window_strides=(1, 2, 2, 1),
        padding="VALID",
    )


# ---------------------------------------------------------------------------
# Float path
# ---------------------------------------------------------------------------

@partial(jax.jit, static_argnames=("dtype",))
def superpoint_float(
    params: Params, images: jnp.ndarray, dtype=jnp.float32
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Float inference.

    Args:
      params: from load_params().
      images: (N, H, W) grayscale in [0, 1], H and W multiples of 8.

    Returns:
      semi: (N, H/8, W/8, 65) detector logits.
      desc: (N, H/8, W/8, 256) unnormalized descriptors.
    """
    x = images[..., None].astype(dtype)
    # Mirror the reference's input quantization grid (scale ~1/128, zp 0) so
    # the float path matches the quantized model's effective input.
    s_in = params["input_scale"].astype(dtype)
    x = jnp.round(x / s_in) * s_in

    def conv_relu(x, name):
        y = _conv(x, params[f"{name}_wf"].astype(dtype), dtype)
        y = y + params[f"{name}_b"].astype(dtype)
        return jax.nn.relu(y)

    def conv_linear(x, name):
        y = _conv(x, params[f"{name}_wf"].astype(dtype), dtype)
        return y + params[f"{name}_b"].astype(dtype)

    x = conv_relu(x, "conv1a")
    x = conv_relu(x, "conv1b")
    x = _maxpool2(x)
    x = conv_relu(x, "conv2a")
    x = conv_relu(x, "conv2b")
    x = _maxpool2(x)
    x = conv_relu(x, "conv3a")
    x = conv_relu(x, "conv3b")
    x = _maxpool2(x)
    x = conv_relu(x, "conv4a")
    x = conv_relu(x, "conv4b")

    semi = conv_linear(conv_relu(x, "convPa"), "convPb")
    desc = conv_linear(conv_relu(x, "convDa"), "convDb")
    return semi, desc


# ---------------------------------------------------------------------------
# int8 path (bit-faithful to the reference's qint8 graph)
# ---------------------------------------------------------------------------

def _requant(acc_f32, in_scale, w_scale, bias, out_scale, relu: bool):
    """Exact-integer f32 accumulator -> qint8 values, qnnpack semantics.

    The reference runtime quantizes the float bias to int32 at scale
    s_in*s_w, adds it in the integer domain, then applies a single fp32
    multiplier M = s_in*s_w/s_out with round-half-even. Zero-points are 0
    throughout (verified at extraction time). Validated 98% bit-exact against
    the reference's baked grids (include/data/quantized/quantized_image0.h).

    The residual ~2% is NOT a requant artifact: rounding mode (half-even /
    half-away / half-up) does not change the match fraction, and an
    independent torch emulation of this exact graph agrees with this
    implementation 100.0% bitwise on the same input
    (tests/test_superpoint.py::TestInt8DivergenceLocalization). The
    divergence enters before conv1a — the reference baked its grids through
    torchvision tensor Resize (superpoint_inference.py:607), whose exact
    output ulps depend on the torchvision build; input pixels on
    round(img/s_in) boundaries flip by 1 LSB and scatter +-1 LSB through
    the stack.
    """
    bias_q = jnp.round(bias / (in_scale * w_scale))
    m = (in_scale * w_scale) / out_scale
    q = jnp.round((acc_f32.astype(jnp.float32) + bias_q) * m)
    lo = 0.0 if relu else -128.0
    return jnp.clip(q, lo, 127.0)


def _stem_tile_rows(h: int) -> int | None:
    """Row-tile for the fused stem kernel: largest even divisor of H <= 16
    (each grid program processes tile_rows input rows; 16 keeps the
    (TH+2, W+2, 64) f32 conv1a accumulator ~21 MiB-free in VMEM at KITTI
    width). None = shape not tileable, take the layered path."""
    for tr in (16, 12, 8, 6, 4, 2):
        if h % tr == 0:
            return tr
    return None


@partial(jax.jit, static_argnames=("stem",))
def superpoint_int8(params: Params, images: jnp.ndarray, stem: str = "auto"):
    """Quantized inference, int8 semantics on the MXU.

    The quantized values are *carried* as floats (bf16 on TPU, f32
    elsewhere) rather than int8: int8 x int8 products (<= 2^14) are exact in
    bf16/f32 and the MXU accumulates them in f32, so the integer arithmetic
    is exact while the convolutions hit the fast float conv path — XLA's
    int8 conv lowering is ~15% slower on TPU and ~30x slower on CPU than
    this, for bit-identical outputs (verified element-for-element on KITTI
    frames). bf16 is enabled only on TPU: the exactness argument requires
    bf16 products accumulated in true f32 (`preferred_element_type`), which
    the MXU guarantees; other backends may route through reduced-precision
    fast paths and are unvalidated, so they carry f32.

    Exactness bound: an f32 accumulator holds integers exactly up to 2^24.
    The worst-case int8 conv accumulation here is 3x3 x 128ch x 127^2
    ~= 1.9e7 > 2^24, so exactness is data-dependent rather than guaranteed.
    On natural images activations are sparse/small post-ReLU and the
    observed accumulators stay far below the bound (validated 98% bit-exact
    vs the reference's baked grids, residual +-1 LSB from round-half-even
    at the requant step, not accumulator overflow); tests/test_superpoint.py
    asserts the max |accumulator| margin on real frames.

    Args:
      params: from load_params().
      images: (N, H, W) grayscale in [0, 1].

    Returns:
      semi_q: (N, H/8, W/8, 65) int8; dequantize with semi_scale.
      desc_q: (N, H/8, W/8, 256) int8; dequantize with desc_scale.
      scales: dict with 'semi_scale' and 'desc_scale' (f32 scalars), matching
        the reference's per-tensor scales (quantized_image0.h:14, :1938).
      stem: "auto" dispatches stage 1 (conv1a+rq, conv1b+rq, 2x2 pool) to
        the fused Pallas kernel on TPU backends (ops.pallas_kernels.
        fused_stem — one VMEM-resident pass, ~7x less HBM activation
        traffic than the five layered XLA ops, bit-identical outputs:
        tests/test_pallas_kernels.py + tools/tpu_parity.py `stem`);
        "off" forces the layered path; "interpret" runs the kernel in
        Pallas interpret mode (CPU parity testing).
    """
    # "axon" is a tunneled-TPU PJRT plugin; same MXU guarantees as "tpu".
    from ..ops.backend import is_mxu_backend, use_tpu_pallas

    carrier = jnp.bfloat16 if is_mxu_backend() else jnp.float32
    s = params["input_scale"]

    def qconv(x, name, in_scale, relu):
        wq = params.get(f"{name}_wq")
        if wq is None or wq.dtype != carrier:  # params from an old dump
            wq = params[f"{name}_w"].astype(carrier)
        acc = _conv(x, wq, jnp.float32)
        q = _requant(
            acc,
            in_scale,
            params[f"{name}_wscale"],
            params[f"{name}_b"],
            params[f"{name}_oscale"],
            relu,
        )
        return q.astype(carrier), params[f"{name}_oscale"]

    tr = _stem_tile_rows(images.shape[1]) if images.shape[2] % 2 == 0 else None
    fuse = stem == "interpret" or (
        stem == "auto" and use_tpu_pallas() and tr is not None
    )
    if fuse:
        from ..ops.pallas_kernels import fused_stem

        o1a = params["conv1a_oscale"]
        o1b = params["conv1b_oscale"]
        # Same quantized-bias / multiplier derivation as _requant, hoisted
        # to stem arguments (the kernel applies them in-register).
        b1_q = jnp.round(params["conv1a_b"] / (s * params["conv1a_wscale"]))
        m1 = (s * params["conv1a_wscale"]) / o1a
        b2_q = jnp.round(params["conv1b_b"] / (o1a * params["conv1b_wscale"]))
        m2 = (o1a * params["conv1b_wscale"]) / o1b
        x = fused_stem(
            images,
            params["conv1a_w"],
            params["conv1b_w"],
            s,
            b1_q,
            m1,
            b2_q,
            m2,
            tile_rows=None,
            interpret=stem == "interpret",
        ).astype(carrier)
        sc = o1b
    else:
        x = jnp.clip(jnp.round(images[..., None] / s), -128, 127).astype(
            carrier
        )
        x, sc = qconv(x, "conv1a", s, True)
        x, sc = qconv(x, "conv1b", sc, True)
        x = _maxpool2(x)
    x, sc = qconv(x, "conv2a", sc, True)
    x, sc = qconv(x, "conv2b", sc, True)
    x = _maxpool2(x)
    x, sc = qconv(x, "conv3a", sc, True)
    x, sc = qconv(x, "conv3b", sc, True)
    x = _maxpool2(x)
    x, sc = qconv(x, "conv4a", sc, True)
    x, sc = qconv(x, "conv4b", sc, True)

    pa, sca = qconv(x, "convPa", sc, True)
    semi_q, semi_scale = qconv(pa, "convPb", sca, False)
    da, scd = qconv(x, "convDa", sc, True)
    desc_q, desc_scale = qconv(da, "convDb", scd, False)

    return (
        semi_q.astype(jnp.int8),
        desc_q.astype(jnp.int8),
        {"semi_scale": semi_scale, "desc_scale": desc_scale},
    )


@jax.jit
def int8_accumulator_maxima(params: Params, images: jnp.ndarray) -> Dict[str, jnp.ndarray]:
    """Debug audit of the float-carried int8 path's exactness assumption.

    Runs the same quantized graph as superpoint_int8 (f32 carrier) and
    returns, per layer, max |integer accumulator + quantized bias|. Values
    must stay below 2^24 for the f32-carried arithmetic to be exactly
    integer (see superpoint_int8's docstring); tests assert this on real
    KITTI frames.
    """
    s = params["input_scale"]
    x = jnp.clip(jnp.round(images[..., None] / s), -128, 127)
    maxima: Dict[str, jnp.ndarray] = {}

    def qconv(x, name, in_scale, relu):
        acc = _conv(x, params[f"{name}_w"].astype(jnp.float32), jnp.float32)
        bias_q = jnp.round(
            params[f"{name}_b"] / (in_scale * params[f"{name}_wscale"])
        )
        maxima[name] = jnp.max(jnp.abs(acc + bias_q))
        q = _requant(
            acc,
            in_scale,
            params[f"{name}_wscale"],
            params[f"{name}_b"],
            params[f"{name}_oscale"],
            relu,
        )
        return q, params[f"{name}_oscale"]

    sc = s
    for name in _ENCODER:
        x, sc = qconv(x, name, sc, True)
        if name in ("conv1b", "conv2b", "conv3b"):
            x = _maxpool2(x)
    pa, sca = qconv(x, "convPa", sc, True)
    qconv(pa, "convPb", sca, False)
    da, scd = qconv(x, "convDa", sc, True)
    qconv(da, "convDb", scd, False)
    return maxima


def grid_to_patch_major(grid: jnp.ndarray) -> jnp.ndarray:
    """(N, Hc, Wc, C) -> (N, Hc*Wc, C) in the reference's patch order.

    The reference bakes grids column-of-grid-major: patch = col * Hc + row
    (superpoint_inference.py:637-664 writes `for c: for r:`), i.e. transpose
    to (Wc, Hc) before flattening.
    """
    n, hc, wc, c = grid.shape
    return jnp.transpose(grid, (0, 2, 1, 3)).reshape(n, wc * hc, c)
