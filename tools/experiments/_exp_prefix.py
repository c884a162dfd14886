# Experiment scratch (round 3-4): Prefix-of-network timing: cumulative cost by truncating SuperPoint after each layer.
# Kept for provenance; hardcoded /root paths, not part of the package.
import time
import numpy as np, jax, jax.numpy as jnp
from functools import partial
from maveric_slam_tpu.models import superpoint as sp
from maveric_slam_tpu.data import kitti

BASE = "/root/reference/datasets/kitti/sequences/00/image_0"
frames = [kitti.load_frame(f"{BASE}/{f:06d}.png") for f in range(160, 170)]
params = sp.load_params()
rng = np.random.default_rng(5)
S, R = 16, 24
def uniq(base):
    return np.clip(base + rng.normal(0, 0.02, base.shape).astype(np.float32), 0, 1)
batches = [jax.device_put(jnp.asarray(np.stack([uniq(frames[(i+r)%10]) for i in range(S)]))) for r in range(R)]
for b in batches: np.asarray(b.ravel()[0])

LAYERS = sp._ENCODER + ["convPa", "convPb"]

def make_prefix(k):
    @jax.jit
    def f(images):
        s = params["input_scale"]
        x = jnp.clip(jnp.round(images[..., None] / s), -128, 127).astype(jnp.int8)
        sc = s
        for name in LAYERS[:k]:
            w = params[f"{name}_w"]
            pad = "SAME" if w.shape[0] == 3 else "VALID"
            acc = jax.lax.conv_general_dilated(x, w, (1,1), pad,
                dimension_numbers=("NHWC","HWIO","NHWC"), preferred_element_type=jnp.int32).astype(jnp.float32)
            bias_q = jnp.round(params[f"{name}_b"] / (sc * params[f"{name}_wscale"]))
            m = (sc * params[f"{name}_wscale"]) / params[f"{name}_oscale"]
            q = jnp.round((acc + bias_q) * m)
            x = jnp.clip(q, 0.0, 127.0).astype(jnp.int8)
            sc = params[f"{name}_oscale"]
            if name in ("conv1b", "conv2b", "conv3b"):
                x = sp._maxpool2(x)
        return x
    return f

prev = 0.0
for k in range(1, len(LAYERS)+1):
    f = make_prefix(k)
    out = f(batches[0]); np.asarray(out[:,0,0,0])
    t0 = time.perf_counter()
    for r in range(R):
        out = f(batches[r])
    np.asarray(out[:,0,0,0])
    dt = (time.perf_counter()-t0)/R
    print(f"prefix {LAYERS[k-1]:7s}: {dt*1e3:6.2f} ms  (delta {max(0,dt-prev)*1e3:5.2f} ms)")
    prev = dt
