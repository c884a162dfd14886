# Experiment scratch (round 3-4): Space-to-depth input layout experiment for conv1a; backs the stage-2 fusion plan.
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

w1a = np.asarray(params["conv1a_w"])  # (3,3,1,64) int8

# Build the s2d-2 kernel K2: (3,3,4,256), input ch c=(p,q)=2*p+q? define s2d ch = di*2+dj
K2 = np.zeros((3, 3, 4, 256), np.int8)
for oi in range(2):
    for oj in range(2):
        for u in range(-1, 2):
            for v in range(-1, 2):
                si, sj = oi + u, oj + v
                A, p = si // 2, si % 2
                B, q = sj // 2, sj % 2
                cin = p * 2 + q
                for c in range(64):
                    # out channel layout: (oi, oj, c)
                    K2[A + 1, B + 1, cin, (oi * 2 + oj) * 64 + c] = w1a[u + 1, v + 1, 0, c]
K2j = jnp.asarray(K2)

@jax.jit
def stem_ref(images):
    s = params["input_scale"]
    x = jnp.clip(jnp.round(images[..., None] / s), -128, 127).astype(jnp.int8)
    return jax.lax.conv_general_dilated(x, params["conv1a_w"], (1,1), "SAME",
        dimension_numbers=("NHWC","HWIO","NHWC"), preferred_element_type=jnp.int32)

@jax.jit
def stem_s2d(images):
    s = params["input_scale"]
    x = jnp.clip(jnp.round(images / s), -128, 127).astype(jnp.int8)  # (S,192,640)
    Sb, H, W = x.shape
    xs = x.reshape(Sb, H//2, 2, W//2, 2).transpose(0, 1, 3, 2, 4).reshape(Sb, H//2, W//2, 4)
    acc = jax.lax.conv_general_dilated(xs, K2j, (1,1), "SAME",
        dimension_numbers=("NHWC","HWIO","NHWC"), preferred_element_type=jnp.int32)  # (S,96,320,256)
    # depth-to-space: (oi,oj,c) channels -> (192,640,64)
    y = acc.reshape(Sb, H//2, W//2, 2, 2, 64).transpose(0, 1, 3, 2, 4, 5).reshape(Sb, H, W, 64)
    return y

o0 = stem_ref(batches[0]); o1 = stem_s2d(batches[0])
print("bitwise equal:", (np.asarray(o0) == np.asarray(o1)).all())

def bench(fn, label):
    out = fn(batches[0]); np.asarray(out[:,0,0,0])
    t0 = time.perf_counter()
    for r in range(R): out = fn(batches[r])
    np.asarray(out[:,0,0,0])
    print(f"{label}: {(time.perf_counter()-t0)/R*1e3:.2f} ms/batch16")

bench(stem_ref, "stem conv (XLA)")
bench(stem_s2d, "stem s2d-2 conv + d2s")
