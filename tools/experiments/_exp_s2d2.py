# Experiment scratch (round 3-4): Space-to-depth variant 2: measured candidate for the next bandwidth cliff (VERDICT r4 next-step #1).
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

def s2d_kernel(w):
    """(3,3,Cin,Cout) stride-1 SAME conv kernel -> s2d-2 equivalent
    (3,3,4*Cin,4*Cout); s2d channel layout: (p,q,c) -> (p*2+q)*C + c."""
    kh, kw, ci, co = w.shape
    K2 = np.zeros((3, 3, 4 * ci, 4 * co), w.dtype)
    for oi in range(2):
        for oj in range(2):
            for u in range(-1, 2):
                for v in range(-1, 2):
                    si, sj = oi + u, oj + v
                    A, p = si // 2, si % 2
                    B, q = sj // 2, sj % 2
                    K2[A + 1, B + 1,
                       (p * 2 + q) * ci:(p * 2 + q + 1) * ci,
                       (oi * 2 + oj) * co:(oi * 2 + oj + 1) * co] = w[u + 1, v + 1]
    return K2

K1a = jnp.asarray(s2d_kernel(np.asarray(params["conv1a_w"])))  # (3,3,4,256)
K1b = jnp.asarray(s2d_kernel(np.asarray(params["conv1b_w"])))  # (3,3,256,256)

def rq(acc, name, in_scale):
    bias_q = jnp.round(params[f"{name}_b"] / (in_scale * params[f"{name}_wscale"]))
    m = (in_scale * params[f"{name}_wscale"]) / params[f"{name}_oscale"]
    q = jnp.round((acc.astype(jnp.float32) + bias_q) * m)
    return jnp.clip(q, 0.0, 127.0).astype(jnp.int8), params[f"{name}_oscale"]

def conv_i8(x, w):
    return jax.lax.conv_general_dilated(x, w, (1,1), "SAME",
        dimension_numbers=("NHWC","HWIO","NHWC"), preferred_element_type=jnp.int32)

@jax.jit
def stage1_ref(images):
    s = params["input_scale"]
    x = jnp.clip(jnp.round(images[..., None] / s), -128, 127).astype(jnp.int8)
    a, sc = rq(conv_i8(x, params["conv1a_w"]), "conv1a", s)
    b, sc = rq(conv_i8(a, params["conv1b_w"]), "conv1b", sc)
    return sp._maxpool2(b), sc

@jax.jit
def stage1_s2d(images):
    s = params["input_scale"]
    x = jnp.clip(jnp.round(images / s), -128, 127).astype(jnp.int8)
    Sb, H, W = x.shape
    xs = x.reshape(Sb, H//2, 2, W//2, 2).transpose(0, 1, 3, 2, 4).reshape(Sb, H//2, W//2, 4)
    # bias broadcasts: per-tensor scale, per-channel bias -> tile bias x4
    a, sc = rq2(conv_i8(xs, K1a), "conv1a", s)
    b, sc = rq2(conv_i8(a, K1b), "conv1b", sc)
    # maxpool 2x2 in s2d space = max over the 4 (oi,oj) sub-channels
    p = b.reshape(Sb, H//2, W//2, 4, 64).max(axis=3)
    return p, sc

def rq2(acc, name, in_scale):
    bias = jnp.tile(params[f"{name}_b"], 4)
    bias_q = jnp.round(bias / (in_scale * params[f"{name}_wscale"]))
    m = (in_scale * params[f"{name}_wscale"]) / params[f"{name}_oscale"]
    q = jnp.round((acc.astype(jnp.float32) + bias_q) * m)
    return jnp.clip(q, 0.0, 127.0).astype(jnp.int8), params[f"{name}_oscale"]

o0, _ = stage1_ref(batches[0]); o1, _ = stage1_s2d(batches[0])
print("shapes:", o0.shape, o1.shape, "bitwise:", (np.asarray(o0) == np.asarray(o1)).all())

def bench(fn, label):
    out = fn(batches[0]); np.asarray(out[0][:,0,0,0])
    t0 = time.perf_counter()
    for r in range(R): out = fn(batches[r])
    np.asarray(out[0][:,0,0,0])
    print(f"{label}: {(time.perf_counter()-t0)/R*1e3:.2f} ms/batch16")

bench(stage1_ref, "stage1 ref (conv1a+1b+pool)")
bench(stage1_s2d, "stage1 s2d-2")

# sub-stage timings
@jax.jit
def sub_s2d_transform(images):
    s = params["input_scale"]
    x = jnp.clip(jnp.round(images / s), -128, 127).astype(jnp.int8)
    Sb, H, W = x.shape
    return x.reshape(Sb, H//2, 2, W//2, 2).transpose(0, 1, 3, 2, 4).reshape(Sb, H//2, W//2, 4)

xs0 = sub_s2d_transform(batches[0]); np.asarray(xs0[:,0,0,0])
@jax.jit
def sub_conv1a(xs):
    return rq2(conv_i8(xs, K1a), "conv1a", params["input_scale"])[0]
a0 = sub_conv1a(xs0); np.asarray(a0[:,0,0,0])
@jax.jit
def sub_conv1b(a):
    return rq2(conv_i8(a, K1b), "conv1b", params["conv1a_oscale"])[0]
b0 = sub_conv1b(a0); np.asarray(b0[:,0,0,0])

K1b_bf16 = K1b.astype(jnp.bfloat16)
@jax.jit
def sub_conv1b_bf16(a):
    acc = jax.lax.conv_general_dilated(a.astype(jnp.bfloat16), K1b_bf16, (1,1), "SAME",
        dimension_numbers=("NHWC","HWIO","NHWC"), preferred_element_type=jnp.float32)
    bias = jnp.tile(params["conv1b_b"], 4)
    bias_q = jnp.round(bias / (params["conv1a_oscale"] * params["conv1b_wscale"]))
    m = (params["conv1a_oscale"] * params["conv1b_wscale"]) / params["conv1b_oscale"]
    q = jnp.round(acc + bias_q) * m
    return jnp.clip(jnp.round((acc + bias_q) * m), 0.0, 127.0).astype(jnp.int8)

c0 = sub_conv1b_bf16(a0); np.asarray(c0[:,0,0,0])
print("bf16 conv1b_s2d bitwise:", (np.asarray(c0) == np.asarray(b0)).all())

def bench1(fn, arg, label):
    out = fn(arg); np.asarray(out.ravel()[0])
    t0 = time.perf_counter()
    for r in range(R): out = fn(arg if r % 2 == 0 else arg)
    np.asarray(out.ravel()[0])
    print(f"{label}: {(time.perf_counter()-t0)/R*1e3:.2f} ms")

# unique inputs per call to be safe
xss = [sub_s2d_transform(batches[r]) for r in range(R)]
for x in xss: np.asarray(x[:,0,0,0])
def bench_u(fn, args, label):
    out = fn(args[0]); np.asarray(out.ravel()[0])
    t0 = time.perf_counter()
    for r in range(R): out = fn(args[r])
    np.asarray(out.ravel()[0])
    print(f"{label}: {(time.perf_counter()-t0)/R*1e3:.2f} ms")

bench_u(sub_s2d_transform, batches, "s2d transform")
bench_u(sub_conv1a, xss, "conv1a_s2d+rq")
aas = [sub_conv1a(x) for x in xss]
for a in aas: np.asarray(a[:,0,0,0])
bench_u(sub_conv1b, aas, "conv1b_s2d+rq int8")
bench_u(sub_conv1b_bf16, aas, "conv1b_s2d+rq bf16")
