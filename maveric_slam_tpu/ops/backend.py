"""Single source of truth for Pallas/MXU backend gating.

Every Pallas dispatch site (frontend.extractor, ops.matching, ops.linalg,
ops.svd3) and the MXU-carrier decision in models.superpoint share this
predicate, so all sites agree on which platforms qualify (round-2 advisor
finding: three modules each rolled their own check and disagreed on the
tunneled "axon" backend).

The check is trace-time: a program traced under `jax.default_device(cpu)`
on a TPU host would still embed TPU kernels. That is an accepted
limitation — tests pin JAX_PLATFORMS=cpu process-wide (tests/conftest.py),
which this predicate respects.
"""

from __future__ import annotations

import jax

# Backends whose PJRT device is a real TPU (MXU + Mosaic support). "axon"
# is a tunneled-TPU PJRT plugin with the same compiler underneath.
_TPU_BACKENDS = ("tpu", "axon")


def use_tpu_pallas() -> bool:
    """True when Mosaic (Pallas TPU) kernels should be dispatched."""
    return jax.default_backend() in _TPU_BACKENDS


def is_mxu_backend() -> bool:
    """True when int8/bf16 MXU matmul semantics are guaranteed.

    Used by models.superpoint to pick the bf16 carrier dtype (bf16 products
    accumulated in true f32 via preferred_element_type are exact for int8
    values only on the MXU).
    """
    return jax.default_backend() in _TPU_BACKENDS
