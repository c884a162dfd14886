# Experiment scratch (round 3-4): XLA-level stage-1 stem fusion timing: measured ~3.9 ms/16-frame batch, bandwidth-bound; motivated the fused_stem kernel.
# Kept for provenance; hardcoded /root paths, not part of the package.
import time
import numpy as np, jax, jax.numpy as jnp
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

w1a = params["conv1a_w"]  # (3,3,1,64) int8

@jax.jit
def stem_conv(images):
    s = params["input_scale"]
    x = jnp.clip(jnp.round(images[..., None] / s), -128, 127).astype(jnp.int8)
    return jax.lax.conv_general_dilated(x, w1a, (1,1), "SAME",
        dimension_numbers=("NHWC","HWIO","NHWC"), preferred_element_type=jnp.int32)

@jax.jit
def stem_im2col(images):
    s = params["input_scale"]
    x = jnp.clip(jnp.round(images / s), -128, 127).astype(jnp.int8)  # (S,H,W)
    xp = jnp.pad(x, ((0,0),(1,1),(1,1)))
    H, W = x.shape[1], x.shape[2]
    cols = jnp.stack([
        xp[:, di:di+H, dj:dj+W] for di in range(3) for dj in range(3)
    ], axis=-1)  # (S,H,W,9) int8
    wmat = w1a.reshape(9, 64)  # (3,3,1,64) -> (9,64)
    return jax.lax.dot_general(cols, wmat, (((3,), (0,)), ((), ())),
                               preferred_element_type=jnp.int32)

o0 = stem_conv(batches[0]); o1 = stem_im2col(batches[0])
print("bitwise equal:", (np.asarray(o0) == np.asarray(o1)).all())

def bench(fn, label):
    out = fn(batches[0]); np.asarray(out[:,0,0,0])
    t0 = time.perf_counter()
    for r in range(R): out = fn(batches[r])
    np.asarray(out[:,0,0,0])
    print(f"{label}: {(time.perf_counter()-t0)/R*1e3:.2f} ms/batch16")

bench(stem_conv, "conv (XLA)")
bench(stem_im2col, "im2col+matmul")

@jax.jit
def stem_im2col_rq(images):
    s = params["input_scale"]
    x = jnp.clip(jnp.round(images / s), -128, 127).astype(jnp.int8)
    xp = jnp.pad(x, ((0,0),(1,1),(1,1)))
    H, W = x.shape[1], x.shape[2]
    cols = jnp.stack([
        xp[:, di:di+H, dj:dj+W] for di in range(3) for dj in range(3)
    ], axis=-1)
    wmat = w1a.reshape(9, 64)
    acc = jax.lax.dot_general(cols, wmat, (((3,), (0,)), ((), ())),
                              preferred_element_type=jnp.int32).astype(jnp.float32)
    in_scale = params["input_scale"]; wsc = params["conv1a_wscale"]; osc = params["conv1a_oscale"]
    bias_q = jnp.round(params["conv1a_b"] / (in_scale * wsc))
    m = (in_scale * wsc) / osc
    q = jnp.round((acc + bias_q) * m)
    return jnp.clip(q, 0.0, 127.0).astype(jnp.int8)

out = stem_im2col_rq(batches[0]); np.asarray(out[:,0,0,0])
import time as _t
t0 = _t.perf_counter()
for r in range(R): out = stem_im2col_rq(batches[r])
np.asarray(out[:,0,0,0])
print(f"im2col+matmul+requant->int8: {(_t.perf_counter()-t0)/R*1e3:.2f} ms/batch16")
