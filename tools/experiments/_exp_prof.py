# Experiment scratch (round 3-4): Whole-tracker profiling pass over real KITTI frames (round-3 fps work).
# Kept for provenance; hardcoded /root paths, not part of the package.
import numpy as np, jax, jax.numpy as jnp
from maveric_slam_tpu.models import superpoint as sp
from maveric_slam_tpu.data import kitti
BASE = "/root/reference/datasets/kitti/sequences/00/image_0"
img = kitti.load_frame(f"{BASE}/000160.png")
params = sp.load_params()
batch = jnp.asarray(np.stack([img]*16))
out = sp.superpoint_int8(params, batch); np.asarray(out[0][:,0,0,0])
import tempfile, os, glob
d = "/tmp/jaxprof"
jax.profiler.start_trace(d)
for _ in range(3):
    out = sp.superpoint_int8(params, batch)
np.asarray(out[0][:,0,0,0])
jax.profiler.stop_trace()
for f in glob.glob(d + "/**/*", recursive=True):
    print(f, os.path.getsize(f) if os.path.isfile(f) else "(dir)")
