# Experiment scratch (round 3-4): Mosaic bisection stage 3: isolates the bf16-default matmul precision as the error source.
# Kept for provenance; hardcoded /root paths, not part of the package.
import numpy as np, jax, jax.numpy as jnp
from functools import partial
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

S, H, W, TH = 2, 64, 640, 16

def trial(label, block_minor):
    x_pad = jnp.zeros((S, H + 4, block_minor), jnp.int8)
    def kern(x_ref, out_ref):
        x = x_ref[0].astype(jnp.float32)
        out_ref[:] = (jnp.zeros(out_ref.shape, jnp.float32) + x[0, 0]).astype(jnp.int8)
    try:
        out = pl.pallas_call(
            kern,
            grid=(S,),
            out_shape=jax.ShapeDtypeStruct((S, H // 2, W // 2, 64), jnp.int8),
            in_specs=[pl.BlockSpec((1, H + 4, block_minor), lambda b: (b, 0, 0), memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec((1, H // 2, W // 2, 64), lambda b: (b, 0, 0, 0), memory_space=pltpu.VMEM),
        )(x_pad)
        np.asarray(out[0,0,0,0])
        print(f"{label}: OK")
    except Exception as e:
        print(f"{label}: FAIL {str(e)[:90]}")

trial("vmem block int8 minor 644", 644)
trial("vmem block int8 minor 768", 768)
