# Experiment scratch (round 3-4): Per-stage engine timing (track/BA/LCD) on the tunneled TPU; backs the slam_fps_integrated RTT attribution.
# Kept for provenance; hardcoded /root paths, not part of the package.
import time
import numpy as np, jax, jax.numpy as jnp
from maveric_slam_tpu.config import DEFAULT_CONFIG
from maveric_slam_tpu.frontend import tracker as trk, extractor
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

def bench(fn, out_of, label, chain=False):
    out = fn(batches[0], None); jax.tree.map(np.asarray, out_of(out))
    t0 = time.perf_counter()
    prev = None
    for r in range(R):
        out = fn(batches[r], prev)
        if chain: prev = out
    jax.tree.map(np.asarray, out_of(out))
    dt = (time.perf_counter()-t0)/R
    print(f"{label}: {dt*1e3:.2f} ms/batch16 -> {S*20.84/dt/1e3:.1f} TFLOP/s-equiv")

# full conv stack only (batched int8 superpoint)
f_conv = jax.jit(lambda b, _: sp.superpoint_int8(params, b))
bench(f_conv, lambda o: o[0][:, 0, 0, 0], "superpoint_int8 (convs+requant)")

# full extraction (convs + detector postproc + top-N)
f_ex = jax.jit(lambda b, _: jax.vmap(lambda im: extractor.extract_quantized.__wrapped__(params, im, DEFAULT_CONFIG))(b))
bench(f_ex, lambda o: o.top.cells[:, 0], "extract_quantized batched")

# full track step (needs chained states)
states = trk.init_states_batched(params, batches[0], DEFAULT_CONFIG)
holder = {"s": states}
def f_step(b, _):
    holder["s"], res = trk.track_step_batched(params, holder["s"], b, DEFAULT_CONFIG)
    return res
bench(f_step, lambda o: o.t, "track_step_batched (full)", chain=True)
