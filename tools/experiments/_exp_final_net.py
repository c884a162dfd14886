# Experiment scratch (round 3-4): End-to-end SuperPoint int8 net timing after the stem fusion experiments; backs README conv-stack numbers.
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

w1a_mat = params["conv1a_w"].reshape(9, 64)

@jax.jit
def net_v2(images):
    """int8-native convs + im2col stem; bitwise == superpoint_int8."""
    s = params["input_scale"]
    x2d = jnp.clip(jnp.round(images / s), -128, 127).astype(jnp.int8)
    Sb, H, W = x2d.shape
    xp = jnp.pad(x2d, ((0,0),(1,1),(1,1)))
    cols = jnp.stack([xp[:, di:di+H, dj:dj+W] for di in range(3) for dj in range(3)], axis=-1)
    acc = jax.lax.dot_general(cols, w1a_mat, (((3,), (0,)), ((), ())), preferred_element_type=jnp.int32)
    def rq(acc, name, in_scale, relu=True):
        bias_q = jnp.round(params[f"{name}_b"] / (in_scale * params[f"{name}_wscale"]))
        m = (in_scale * params[f"{name}_wscale"]) / params[f"{name}_oscale"]
        q = jnp.round((acc.astype(jnp.float32) + bias_q) * m)
        lo = 0.0 if relu else -128.0
        return jnp.clip(q, lo, 127.0).astype(jnp.int8), params[f"{name}_oscale"]
    def conv(x, name):
        w = params[f"{name}_w"]
        pad = "SAME" if w.shape[0] == 3 else "VALID"
        return jax.lax.conv_general_dilated(x, w, (1,1), pad,
            dimension_numbers=("NHWC","HWIO","NHWC"), preferred_element_type=jnp.int32)
    x, sc = rq(acc, "conv1a", s)
    x, sc = rq(conv(x, "conv1b"), "conv1b", sc)
    x = sp._maxpool2(x)
    x, sc = rq(conv(x, "conv2a"), "conv2a", sc)
    x, sc = rq(conv(x, "conv2b"), "conv2b", sc)
    x = sp._maxpool2(x)
    x, sc = rq(conv(x, "conv3a"), "conv3a", sc)
    x, sc = rq(conv(x, "conv3b"), "conv3b", sc)
    x = sp._maxpool2(x)
    x, sc = rq(conv(x, "conv4a"), "conv4a", sc)
    x, sc = rq(conv(x, "conv4b"), "conv4b", sc)
    pa, sca = rq(conv(x, "convPa"), "convPa", sc)
    semi, ssc = rq(conv(pa, "convPb"), "convPb", sca, relu=False)
    da, scd = rq(conv(x, "convDa"), "convDa", sc)
    desc, dsc = rq(conv(da, "convDb"), "convDb", scd, relu=False)
    return semi, desc

s0, d0, _ = sp.superpoint_int8(params, batches[0])
s1, d1 = net_v2(batches[0])
print("bitwise semi:", (np.asarray(s0) == np.asarray(s1)).all(), "desc:", (np.asarray(d0) == np.asarray(d1)).all())

def bench(fn, label, unpack):
    out = fn(batches[0]); np.asarray(unpack(out)[:,0,0,0])
    t0 = time.perf_counter()
    for r in range(R): out = fn(batches[r])
    np.asarray(unpack(out)[:,0,0,0])
    dt = (time.perf_counter()-t0)/R
    print(f"{label}: {dt*1e3:.2f} ms/batch16 -> {S*20.84/dt/1e3:.1f} TOP/s-equiv")

bench(lambda b: sp.superpoint_int8(params, b), "current (bf16 carrier)", lambda o: o[0])
bench(net_v2, "v2 (int8 native + im2col stem)", lambda o: o[0])
