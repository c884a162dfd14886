"""maveric_slam_tpu — a TPU-native visual SLAM engine.

A from-scratch JAX/XLA/Pallas re-design of the capabilities of the
maveric-slam reference (SuperPoint feature frontend, quantized descriptor
matching, RANSAC essential-matrix pose recovery, sliding-window bundle
adjustment with Schur elimination, BoW loop closure), built TPU-first:

- All hot paths are batched, fixed-shape, and jit-compiled.
- int8 descriptor/vocabulary matmuls target the MXU.
- Bundle adjustment shards landmark blocks over a `jax.sharding.Mesh` and
  combines reduced pose systems with `psum` over ICI.
- Host-side map bookkeeping (feature pool, loop-closure database) has a
  native C++ runtime with ctypes bindings.
"""

__version__ = "0.1.0"

# XLA:TPU's default f32 matmul runs bf16 MXU passes; for the geometry /
# BA / SVD math that is a silent ~0.4% (worst measured 119%) error — found
# by tools/tpu_parity.py, where the Pallas svd3 kernel matched numpy to
# 3e-5 while the jnp reference was off by up to 1.19x. "highest" restores
# true f32 matmuls for f32 operands. The SuperPoint int8 path is
# unaffected: it feeds bf16 carriers explicitly and accumulates f32 via
# preferred_element_type, so the conv throughput keeps its MXU fast path
# (measured: tracking fps unchanged).
#
# NOTE this is a process-global setting applied at import time; the
# library's correctness depends on it (geometry/BA/SVD run plain f32
# matmuls). Host programs that need XLA's bf16-pass default for their own
# f32 matmuls can opt out with MAVERIC_SLAM_TPU_KEEP_MATMUL_PRECISION=1
# in the environment — at their own numerical risk for this library's
# geometry paths.
import os as _os

if not _os.environ.get("MAVERIC_SLAM_TPU_KEEP_MATMUL_PRECISION"):
    import jax as _jax

    _jax.config.update("jax_default_matmul_precision", "highest")
    del _jax
del _os
