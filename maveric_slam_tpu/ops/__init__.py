"""Batched TPU-friendly numerical kernels (jnp + Pallas)."""
