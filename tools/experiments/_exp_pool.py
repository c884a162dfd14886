# Experiment scratch (round 3-4): Pallas feature-pool scatter experiments (device pool design).
# Kept for provenance; hardcoded /root paths, not part of the package.
import numpy as np, jax, jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

def probe(label, kern, out_shape):
    try:
        out = pl.pallas_call(
            kern,
            out_shape=jax.ShapeDtypeStruct(out_shape, jnp.float32),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        )(jnp.ones((16, 640, 64), jnp.float32))
        np.asarray(out.ravel()[0]); print(f"{label}: OK")
    except Exception as e:
        print(f"{label}: FAIL {str(e)[:60]}")

def k_4d_rows(x_ref, o_ref):
    x = x_ref[:]
    r = x.reshape(8, 2, 640, 64)
    o_ref[:] = jnp.max(r, axis=1)
probe("row pool: 4D leading split + max", k_4d_rows, (8, 640, 64))

def k_strided(x_ref, o_ref):
    x = x_ref[:]
    o_ref[:] = jnp.maximum(x[:, 0:640:2, :], x[:, 1:640:2, :])
probe("col pool: strided mid slices", k_strided, (16, 320, 64))

def k_rolled(x_ref, o_ref):
    x = x_ref[:]
    m = jnp.maximum(x, pltpu.roll(x, 639, 1))  # roll by -1 == +639
    o_ref[:] = m[:, 0:640:2, :]
probe("col pool: roll + strided slice", k_rolled, (16, 320, 64))

def k_4dcol(x_ref, o_ref):
    x = x_ref[:]
    r = x.reshape(16, 320, 2, 64)
    o_ref[:] = jnp.max(r, axis=2)
probe("col pool: 4D mid split + max", k_4dcol, (16, 320, 64))

def k_lanegroup(x_ref, o_ref):
    x = x_ref[:]
    y = x.reshape(16, 320, 128)  # adjacent col pair -> one 128-lane row
    o_ref[:] = jnp.maximum(y[:, :, 0:64], y[:, :, 64:128])
probe("col pool: lane regroup reshape", k_lanegroup, (16, 320, 64))
