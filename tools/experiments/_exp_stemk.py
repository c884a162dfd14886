# Experiment scratch (round 3-4): Pallas fused_stem kernel development harness (INTERP=1 for interpret mode); measured ~7x HBM-traffic reduction in-kernel.
# Kept for provenance; hardcoded /root paths, not part of the package.
import os
INTERP = os.environ.get("INTERP", "0") == "1"
if INTERP:
    os.environ["JAX_PLATFORMS"] = "cpu"
import numpy as np, jax, jax.numpy as jnp
if INTERP:
    jax.config.update("jax_platforms", "cpu")
from maveric_slam_tpu.models import superpoint as sp
from maveric_slam_tpu.ops import pallas_kernels as pk
from maveric_slam_tpu.data import kitti

BASE = "/root/reference/datasets/kitti/sequences/00/image_0"
img = kitti.load_frame(f"{BASE}/000160.png")
params = sp.load_params()
S = 4 if INTERP else 16
batch = jnp.asarray(np.stack([np.roll(img, k, axis=1) for k in range(S)]))

# reference stage-1 (jnp layered path)
@jax.jit
def stage1_ref(images):
    s = params["input_scale"]
    x = jnp.clip(jnp.round(images[..., None] / s), -128, 127).astype(jnp.float32)
    def qconv(x, name, in_scale):
        acc = sp._conv(x, params[f"{name}_w"].astype(jnp.float32), jnp.float32)
        bias_q = jnp.round(params[f"{name}_b"] / (in_scale * params[f"{name}_wscale"]))
        m = (in_scale * params[f"{name}_wscale"]) / params[f"{name}_oscale"]
        q = jnp.round((acc + bias_q) * m)
        return jnp.clip(q, 0.0, 127.0), params[f"{name}_oscale"]
    a, sc = qconv(x, "conv1a", s)
    b, sc = qconv(a, "conv1b", sc)
    return sp._maxpool2(b).astype(jnp.int8)

s_in = params["input_scale"]
b1_q = jnp.round(params["conv1a_b"] / (s_in * params["conv1a_wscale"]))
m1 = (s_in * params["conv1a_wscale"]) / params["conv1a_oscale"]
b2_q = jnp.round(params["conv1b_b"] / (params["conv1a_oscale"] * params["conv1b_wscale"]))
m2 = (params["conv1a_oscale"] * params["conv1b_wscale"]) / params["conv1b_oscale"]

ref = stage1_ref(batch)
got = pk.fused_stem(batch, params["conv1a_w"], params["conv1b_w"], s_in, b1_q, m1, b2_q, m2, interpret=INTERP)
print("shapes:", ref.shape, got.shape)
print("bitwise:", (np.asarray(ref) == np.asarray(got)).all(), "frac:", (np.asarray(ref) == np.asarray(got)).mean())
if not INTERP:
    import time
    rng = np.random.default_rng(0)
    frames = [kitti.load_frame(f"{BASE}/{f:06d}.png") for f in range(160, 170)]
    def uniq(base): return np.clip(base + rng.normal(0, .02, base.shape).astype(np.float32), 0, 1)
    R = 24
    batches = [jax.device_put(jnp.asarray(np.stack([uniq(frames[(i+r)%10]) for i in range(16)]))) for r in range(R)]
    for b in batches: np.asarray(b.ravel()[0])
    f = lambda b: pk.fused_stem(b, params["conv1a_w"], params["conv1b_w"], s_in, b1_q, m1, b2_q, m2)
    out = f(batches[0]); np.asarray(out[:,0,0,0])
    t0 = time.perf_counter()
    for r in range(R): out = f(batches[r])
    np.asarray(out[:,0,0,0])
    print(f"fused_stem: {(time.perf_counter()-t0)/R*1e3:.2f} ms/batch16")
    out = stage1_ref(batches[0]); np.asarray(out[:,0,0,0])
    t0 = time.perf_counter()
    for r in range(R): out = stage1_ref(batches[r])
    np.asarray(out[:,0,0,0])
    print(f"stage1 jnp: {(time.perf_counter()-t0)/R*1e3:.2f} ms/batch16")
