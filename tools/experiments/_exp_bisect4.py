# Experiment scratch (round 3-4): Mosaic bisection stage 4: final minimal repro backing the jax_default_matmul_precision=highest fix.
# Kept for provenance; hardcoded /root paths, not part of the package.
import numpy as np, jax, jax.numpy as jnp
from functools import partial
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

S, H, W, TH = 2, 64, 640, 16

x_pad = jnp.zeros((S, H + 4, W + 4), jnp.int8)
w1a = jnp.zeros((16, 64), jnp.bfloat16)
w1b = jnp.zeros((576, 64), jnp.bfloat16)
b1 = jnp.zeros((1, 64), jnp.float32)
b2 = jnp.zeros((1, 64), jnp.float32)
m = jnp.zeros((1, 2), jnp.float32)

def make(stage):
    def kern(x_ref, w1a_ref, w1b_ref, b1_ref, b2_ref, m_ref, out_ref, th=TH, w=W):
        i = pl.program_id(1)
        x = x_ref[0, pl.ds(i * th, th + 4), :].astype(jnp.float32)
        h1, w1 = th + 2, w + 2
        if stage == 0:
            out_ref[:] = (jnp.zeros(out_ref.shape, jnp.float32) + x[0, 0]).astype(jnp.int8); return
        acc1 = jnp.zeros((h1, w1, 64), jnp.float32)
        for u in range(3):
            for v in range(3):
                tap = w1a_ref[u*3+v : u*3+v+1, :].astype(jnp.float32)
                xs = x[u:u+h1, v:v+w1].reshape(h1, w1, 1)
                acc1 = acc1 + xs * tap.reshape(1, 1, 64)
        if stage == 1:
            out_ref[:] = (jnp.zeros(out_ref.shape, jnp.float32) + jnp.max(acc1)).astype(jnp.int8); return
        q1 = jnp.clip(jnp.round((acc1 + b1_ref[0:1, :].reshape(1, 1, 64)) * m_ref[0, 0]), 0.0, 127.0)
        n_rows = pl.num_programs(1) * th
        row_g = jax.lax.broadcasted_iota(jnp.int32, (h1, w1), 0) + i * th - 1
        col_g = jax.lax.broadcasted_iota(jnp.int32, (h1, w1), 1) - 1
        inside = (row_g >= 0) & (row_g < n_rows) & (col_g >= 0) & (col_g < w)
        q1 = jnp.where(inside.reshape(h1, w1, 1), q1, 0.0)
        if stage == 2:
            out_ref[:] = (jnp.zeros(out_ref.shape, jnp.float32) + jnp.max(q1)).astype(jnp.int8); return
        acc2 = jnp.zeros((th * w, 64), jnp.float32)
        for u in range(3):
            for v in range(3):
                patch = q1[u:u+th, v:v+w, :].reshape(th * w, 64).astype(jnp.bfloat16)
                wtap = w1b_ref[(u*3+v)*64 : (u*3+v+1)*64, :]
                acc2 = acc2 + jax.lax.dot_general(patch, wtap, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32)
        if stage == 3:
            out_ref[:] = (jnp.zeros(out_ref.shape, jnp.float32) + jnp.max(acc2)).astype(jnp.int8); return
        q2 = jnp.clip(jnp.round((acc2 + b2_ref[0:1, :]) * m_ref[0, 1]), 0.0, 127.0)
        q2 = q2.reshape(th // 2, 2, w // 2, 2, 64)
        pooled = jnp.max(jnp.max(q2, axis=3), axis=1)
        out_ref[:] = pooled.reshape(out_ref.shape).astype(jnp.int8)
    return kern

for stage in range(5):
    try:
        out = pl.pallas_call(
            make(stage),
            grid=(S, H // TH),
            out_shape=jax.ShapeDtypeStruct((S, H // 2, W // 2, 64), jnp.int8),
            in_specs=[pl.BlockSpec((1, H + 4, W + 4), lambda b, i: (b, 0, 0), memory_space=pltpu.VMEM)]
                     + [pl.BlockSpec(memory_space=pltpu.VMEM)]*4 + [pl.BlockSpec(memory_space=pltpu.SMEM)],
            out_specs=pl.BlockSpec((1, TH // 2, W // 2, 64), lambda b, i: (b, i, 0, 0), memory_space=pltpu.VMEM),
        )(x_pad, w1a, w1b, b1, b2, m)
        np.asarray(out[0,0,0,0])
        print(f"stage {stage}: OK")
    except Exception as e:
        print(f"stage {stage}: FAIL {str(e)[:80]}")
