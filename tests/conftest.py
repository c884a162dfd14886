"""Test configuration: run everything on a virtual 8-device CPU mesh.

Multi-chip sharding tests need several devices; real multi-chip hardware is
not available in CI, so we ask XLA for 8 host devices.

Note: this machine's sitecustomize force-registers a TPU PJRT plugin and
overrides `jax_platforms` via jax.config (so the JAX_PLATFORMS env var alone
is not enough) — we re-override to cpu here, before any backend initializes.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()
os.environ["JAX_PLATFORMS"] = "cpu"

import jax

jax.config.update("jax_platforms", "cpu")

# Persistent compilation cache: DISABLED. It cut the warm suite from
# ~14 min to ~2 min, but this jaxlib's XLA:CPU AOT deserialization
# segfaults on the cache-READ path (jax/_src/compilation_cache.py
# get_executable_and_time, SIGSEGV at ~50% of a warm run; it also warns
# "Compile machine features ... not supported on the host ... could lead
# to execution errors such as SIGILL" on every load). Cold runs — cache
# off or empty — pass 100%. Re-enable by exporting
# MAVERIC_SLAM_TPU_TEST_CACHE=1 if a fixed jaxlib lands.
if os.environ.get("MAVERIC_SLAM_TPU_TEST_CACHE"):
    _CACHE_DIR = os.path.join(os.path.dirname(__file__), ".jax_cache")
    jax.config.update("jax_compilation_cache_dir", _CACHE_DIR)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)

import numpy as np
import pytest


@pytest.fixture(scope="session")
def rng():
    return np.random.default_rng(42)
