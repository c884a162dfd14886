# Experiment scratch (round 3-4): Per-layer SuperPoint conv timing sweep; backs the stage-1-is-bandwidth-bound claim (VERDICT r4 weak #2).
# Kept for provenance; hardcoded /root paths, not part of the package.
import time
import numpy as np, jax, jax.numpy as jnp
from functools import partial
from maveric_slam_tpu.models import superpoint as sp
from maveric_slam_tpu.data import kitti

params = sp.load_params()
S = 16
rng = np.random.default_rng(0)

shapes = {
    "conv1a": (192, 640, 1), "conv1b": (192, 640, 64),
    "conv2a": (96, 320, 64), "conv2b": (96, 320, 64),
    "conv3a": (48, 160, 64), "conv3b": (48, 160, 128),
    "conv4a": (24, 80, 128), "conv4b": (24, 80, 128),
    "convPa": (24, 80, 128), "convPb": (24, 80, 256),
    "convDa": (24, 80, 128), "convDb": (24, 80, 256),
}
total = 0
for name, (h, w, ci) in shapes.items():
    wgt = params[f"{name}_w"]
    x_np = rng.integers(-128, 128, (S, h, w, ci)).astype(np.int8)
    xs = [jax.device_put(jnp.asarray(np.roll(x_np, k, axis=1))) for k in range(8)]
    for x in xs: np.asarray(x.ravel()[0])
    @jax.jit
    def f(x, w=wgt):
        pad = "SAME" if w.shape[0] == 3 else "VALID"
        return jax.lax.conv_general_dilated(x, w, (1,1), pad,
            dimension_numbers=("NHWC","HWIO","NHWC"), preferred_element_type=jnp.int32)
    out = f(xs[0]); np.asarray(out[:,0,0,0])
    t0 = time.perf_counter()
    for r in range(24):
        out = f(xs[r % 8])
    np.asarray(out[:,0,0,0])
    dt = (time.perf_counter()-t0)/24
    kh = wgt.shape[0]; co = wgt.shape[3]
    gflop = 2*kh*kh*ci*co*h*w*S/1e9
    total += dt
    print(f"{name}: {dt*1e3:6.2f} ms  {gflop:6.1f} GOP  -> {gflop/dt/1e3:6.1f} TOP/s")
print(f"sum: {total*1e3:.2f} ms")
