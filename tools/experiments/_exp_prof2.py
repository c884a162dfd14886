# Experiment scratch (round 3-4): Tracker profiling pass 2: isolates dispatch vs compute on the tunneled runtime.
# Kept for provenance; hardcoded /root paths, not part of the package.
import numpy as np, jax, jax.numpy as jnp
from maveric_slam_tpu.models import superpoint as sp
from maveric_slam_tpu.data import kitti
BASE = "/root/reference/datasets/kitti/sequences/00/image_0"
img = kitti.load_frame(f"{BASE}/000160.png")
params = sp.load_params()
batch = jnp.asarray(np.stack([img]*16))

@jax.jit
def net(images):
    s = params["input_scale"]
    with jax.named_scope("input_q"):
        x = jnp.clip(jnp.round(images[..., None] / s), -128, 127).astype(jnp.bfloat16)
    def qconv(x, name, in_scale, relu=True):
        with jax.named_scope(name):
            wq = params[f"{name}_wq"]
            acc = sp._conv(x, wq, jnp.float32)
            bias_q = jnp.round(params[f"{name}_b"] / (in_scale * params[f"{name}_wscale"]))
            m = (in_scale * params[f"{name}_wscale"]) / params[f"{name}_oscale"]
            q = jnp.round(acc + bias_q) * 0 + jnp.round((acc + bias_q) * m)
            lo = 0.0 if relu else -128.0
            return jnp.clip(q, lo, 127.0).astype(jnp.bfloat16), params[f"{name}_oscale"]
    sc = s
    for name in sp._ENCODER:
        x, sc = qconv(x, name, sc)
        if name in ("conv1b", "conv2b", "conv3b"):
            with jax.named_scope(f"pool_{name}"):
                x = sp._maxpool2(x)
    pa, sca = qconv(x, "convPa", sc)
    semi, _ = qconv(pa, "convPb", sca, relu=False)
    da, scd = qconv(x, "convDa", sc)
    desc, _ = qconv(da, "convDb", scd, relu=False)
    return semi, desc

out = net(batch); np.asarray(out[0][:,0,0,0])
jax.profiler.start_trace("/tmp/jaxprof2")
for _ in range(3):
    out = net(batch)
np.asarray(out[0][:,0,0,0])
jax.profiler.stop_trace()
import glob, gzip, json, collections
f = sorted(glob.glob("/tmp/jaxprof2/plugins/profile/*/*.trace.json.gz"))[-1]
with gzip.open(f) as fh: tr = json.load(fh)
pids = {e["pid"]: e["args"].get("name","") for e in tr["traceEvents"] if e.get("ph")=="M" and e.get("name")=="process_name"}
agg = collections.Counter()
for e in tr["traceEvents"]:
    if e.get("ph") == "X" and "TPU" in pids.get(e["pid"], ""):
        agg[e["name"][:70]] += e.get("dur", 0)
for name, dur in agg.most_common(20):
    print(f"{dur/3e3:8.3f} ms/run  {name}")
