# Experiment scratch (round 3-4): Micro-bench of candidate Pallas ops (softmax/top-N variants).
# Kept for provenance; hardcoded /root paths, not part of the package.
import numpy as np, jax, jax.numpy as jnp
from functools import partial
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

def probe(label, kern, out_shape, out_dtype=jnp.float32):
    try:
        out = pl.pallas_call(
            kern,
            out_shape=jax.ShapeDtypeStruct(out_shape, out_dtype),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        )(jnp.ones((18, 642, 64), jnp.float32))
        np.asarray(out.ravel()[0])
        print(f"{label}: OK")
    except Exception as e:
        msg = str(e)
        key = "minor dim" if "minor dim" in msg else msg[:60]
        print(f"{label}: FAIL {key}")

def k_midslice_reshape(x_ref, o_ref):
    x = x_ref[:]
    o_ref[:] = x[0:16, :, :].reshape(16 * 642, 64)
probe("leadslice+fullwidth reshape", k_midslice_reshape, (16 * 642, 64))

def k_roll(x_ref, o_ref):
    x = x_ref[:]
    o_ref[:] = pltpu.roll(x, -1, 1)
probe("pltpu.roll axis=1 3D", k_roll, (18, 642, 64))

def k_midprefix(x_ref, o_ref):
    x = x_ref[:]
    o_ref[:] = x[:, 0:640, :]
probe("mid prefix slice", k_midprefix, (18, 640, 64))

def k_pool(x_ref, o_ref):
    x = x_ref[:][0:16, 0:640, :]
    q = x.reshape(8, 2, 320, 2, 64)
    o_ref[:] = jnp.max(jnp.max(q, axis=3), axis=1)
probe("pool reshape 5D + max", k_pool, (8, 320, 64))

def k_dot3(x_ref, o_ref):
    x = x_ref[:][0:16, :, :].reshape(16 * 642, 64).astype(jnp.bfloat16)
    w = jnp.ones((64, 64), jnp.bfloat16)
    o_ref[:] = jax.lax.dot_general(x, w, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32)
probe("flatten+bf16 dot", k_dot3, (16 * 642, 64))

def k_broadcast(x_ref, o_ref):
    x2 = x_ref[:][:, :, 0]  # (18, 642)
    o_ref[:] = x2.reshape(18, 642, 1) * jnp.ones((1, 1, 64), jnp.float32)
probe("2D->3D minor insert + broadcast", k_broadcast, (18, 642, 64))
