# Experiment scratch (round 3-4): int8 vs bf16-carrier conv throughput comparison on the MXU; backs the bf16-carrier design choice in models/superpoint.py.
# Kept for provenance; hardcoded /root paths, not part of the package.
import time
import numpy as np, jax, jax.numpy as jnp
from maveric_slam_tpu.models import superpoint as sp
from maveric_slam_tpu.data import kitti

BASE = "/root/reference/datasets/kitti/sequences/00/image_0"
frames = [kitti.load_frame(f"{BASE}/{f:06d}.png") for f in range(160, 170)]
params = sp.load_params()
rng = np.random.default_rng(5)
S, R = 16, 32
def uniq(base):
    return np.clip(base + rng.normal(0, 0.02, base.shape).astype(np.float32), 0, 1)
batches = [jax.device_put(jnp.asarray(np.stack([uniq(frames[(i+r)%10]) for i in range(S)]))) for r in range(R)]
for b in batches: np.asarray(b.ravel()[0])

def _conv_i8(x, w):
    pad = "SAME" if w.shape[0] == 3 else "VALID"
    return jax.lax.conv_general_dilated(
        x, w, (1, 1), pad,
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.int32,
    )

@jax.jit
def superpoint_int8_native(params, images):
    s = params["input_scale"]
    x = jnp.clip(jnp.round(images[..., None] / s), -128, 127).astype(jnp.int8)
    def qconv(x, name, in_scale, relu):
        w = params[f"{name}_w"]  # int8 HWIO
        acc = _conv_i8(x, w).astype(jnp.float32)
        bias_q = jnp.round(params[f"{name}_b"] / (in_scale * params[f"{name}_wscale"]))
        m = (in_scale * params[f"{name}_wscale"]) / params[f"{name}_oscale"]
        q = jnp.round((acc + bias_q) * m)
        lo = 0.0 if relu else -128.0
        return jnp.clip(q, lo, 127.0).astype(jnp.int8), params[f"{name}_oscale"]
    sc = s
    for name in sp._ENCODER:
        x, sc = qconv(x, name, sc, True)
        if name in ("conv1b", "conv2b", "conv3b"):
            x = sp._maxpool2(x)
    pa, sca = qconv(x, "convPa", sc, True)
    semi, semi_scale = qconv(pa, "convPb", sca, False)
    da, scd = qconv(x, "convDa", sc, True)
    desc, desc_scale = qconv(da, "convDb", scd, False)
    return semi, desc, {"semi_scale": semi_scale, "desc_scale": desc_scale}

# correctness vs current path
s0, d0, _ = sp.superpoint_int8(params, batches[0])
s1, d1, _ = superpoint_int8_native(params, batches[0])
print("bitwise semi:", (np.asarray(s0) == np.asarray(s1)).mean(), "desc:", (np.asarray(d0) == np.asarray(d1)).mean())

def bench(fn, label):
    out = fn(params, batches[0]); np.asarray(out[0][:, 0, 0, 0])
    t0 = time.perf_counter()
    for r in range(R):
        out = fn(params, batches[r])
    np.asarray(out[0][:, 0, 0, 0])
    dt = (time.perf_counter()-t0)/R
    print(f"{label}: {dt*1e3:.2f} ms/batch16 -> {S*20.84/dt/1e3:.1f} TOP/s-equiv")

bench(sp.superpoint_int8, "bf16-carrier (current)")
bench(superpoint_int8_native, "int8 native")
