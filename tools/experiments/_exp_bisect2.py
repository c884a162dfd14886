# Experiment scratch (round 3-4): Mosaic bisection stage 2: same divergence hunt, smaller repro.
# Kept for provenance; hardcoded /root paths, not part of the package.
import numpy as np, jax, jax.numpy as jnp
from functools import partial
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

S, H, W, TH = 2, 64, 640, 16

def trial(label, scratch_shape, out_dtype, use_dma, wpad):
    x_pad = jnp.zeros((S, H + 4, wpad), jnp.int8)
    def kern(x_ref, out_ref, x_tile, sem):
        b = pl.program_id(0); i = pl.program_id(1)
        if use_dma:
            dma = pltpu.make_async_copy(x_ref.at[b, pl.ds(i * TH, scratch_shape[0]), :], x_tile, sem)
            dma.start(); dma.wait()
            v = x_tile[0, 0].astype(out_dtype)
        else:
            v = jnp.asarray(0, out_dtype)
        out_ref[:] = jnp.zeros(out_ref.shape, out_dtype) + v
    try:
        out = pl.pallas_call(
            kern,
            grid=(S, H // TH),
            out_shape=jax.ShapeDtypeStruct((S, H // 2, W // 2, 64), out_dtype),
            in_specs=[pl.BlockSpec(memory_space=pltpu.ANY)],
            out_specs=pl.BlockSpec((1, TH // 2, W // 2, 64), lambda b, i: (b, i, 0, 0), memory_space=pltpu.VMEM),
            scratch_shapes=[pltpu.VMEM(scratch_shape, jnp.int8), pltpu.SemaphoreType.DMA],
        )(x_pad)
        np.asarray(out[0,0,0,0])
        print(f"{label}: OK")
    except Exception as e:
        print(f"{label}: FAIL {str(e)[:90]}")

trial("dma int8 scratch(20,644) out int8", (20, 644), jnp.int8, True, 644)
trial("dma int8 scratch(20,644) out f32 ", (20, 644), jnp.float32, True, 644)
trial("no dma                  out int8", (20, 644), jnp.int8, False, 644)
trial("dma int8 scratch(32,768) out int8", (32, 768), jnp.int8, True, 768)
trial("dma int8 scratch(32,768) out f32 ", (32, 768), jnp.float32, True, 768)
