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
