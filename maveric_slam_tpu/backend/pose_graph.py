"""Pose-graph optimization over between-factors (odometry + loop closures).

The component the reference's architecture points at but never builds:
loop-closure *correction*. SURVEY.md section 1 records that run_relin.c is
only the numerical seed. Fixed-capacity edge list, dense (6P x 6P) normal
system (window sizes here are tens of poses, so dense is the right TPU
shape), Gauss-Newton with a gauge prior on pose 0.
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp

from ..ops.lie import se3_exp
from . import relin


class PoseGraph(NamedTuple):
    R: jnp.ndarray  # (P, 3, 3) world-from-camera rotations
    t: jnp.ndarray  # (P, 3)
    edge_i: jnp.ndarray  # (E,) int32 source pose index
    edge_j: jnp.ndarray  # (E,) int32 target pose index
    R_meas: jnp.ndarray  # (E, 3, 3) measured T_ci_cj rotation
    t_meas: jnp.ndarray  # (E, 3)
    weight: jnp.ndarray  # (E,) float32 — 0 disables an edge


@partial(jax.jit, static_argnames=("iterations",))
def optimize(
    graph: PoseGraph,
    iterations: int = 10,
    damping: float = 1e-6,
    gauge_weight: float = 1e8,
) -> Tuple[PoseGraph, jnp.ndarray]:
    """Gauss-Newton on all poses; returns (optimized graph, per-iter cost)."""
    p = graph.R.shape[0]

    def linearize(R, t):
        r, J_i, J_j = relin.between_residual_jacobians(
            R[graph.edge_i],
            t[graph.edge_i],
            R[graph.edge_j],
            t[graph.edge_j],
            graph.R_meas,
            graph.t_meas,
        )  # (E, 6), (E, 6, 6), (E, 6, 6)
        w = graph.weight
        cost = 0.5 * jnp.sum(w * jnp.sum(r * r, axis=-1))

        # Dense assembly via scatter-adds on the (P, P, 6, 6) block grid.
        H = jnp.zeros((p, p, 6, 6), r.dtype)
        b = jnp.zeros((p, 6), r.dtype)
        wJi = w[:, None, None] * J_i
        wJj = w[:, None, None] * J_j
        H = H.at[graph.edge_i, graph.edge_i].add(
            jnp.einsum("eki,ekj->eij", wJi, J_i)
        )
        H = H.at[graph.edge_j, graph.edge_j].add(
            jnp.einsum("eki,ekj->eij", wJj, J_j)
        )
        H = H.at[graph.edge_i, graph.edge_j].add(
            jnp.einsum("eki,ekj->eij", wJi, J_j)
        )
        H = H.at[graph.edge_j, graph.edge_i].add(
            jnp.einsum("eki,ekj->eij", wJj, J_i)
        )
        b = b.at[graph.edge_i].add(-jnp.einsum("eki,ek->ei", wJi, r))
        b = b.at[graph.edge_j].add(-jnp.einsum("eki,ek->ei", wJj, r))
        return H, b, cost

    def cost_only(R, t):
        r, _, _ = relin.between_residual_jacobians(
            R[graph.edge_i],
            t[graph.edge_i],
            R[graph.edge_j],
            t[graph.edge_j],
            graph.R_meas,
            graph.t_meas,
        )
        return 0.5 * jnp.sum(graph.weight * jnp.sum(r * r, axis=-1))

    # Adaptive Levenberg-Marquardt: plain GN with a fixed tiny damping
    # oscillates on large loop corrections (measured: cost 49 -> 64 across
    # iterations on 4 m closures) — each candidate step is accepted only if
    # it reduces the cost, with lambda annealed down on success and inflated
    # on rejection.
    def body(carry, _):
        R, t, lam, cost = carry
        H, b, _ = linearize(R, t)
        H = H.at[jnp.arange(p), jnp.arange(p)].add(
            lam * jnp.eye(6, dtype=H.dtype)
        )
        H = H.at[0, 0].add(gauge_weight * jnp.eye(6, dtype=H.dtype))
        H_flat = jnp.swapaxes(H, 1, 2).reshape(p * 6, p * 6)
        dx = jnp.linalg.solve(H_flat, b.reshape(-1)).reshape(p, 6)
        dR, dt = se3_exp(dx)
        R_c = dR @ R
        t_c = jnp.einsum("pij,pj->pi", dR, t) + dt
        new_cost = cost_only(R_c, t_c)
        finite = jnp.isfinite(new_cost)
        accept = finite & (new_cost < cost)
        R_n = jnp.where(accept, R_c, R)
        t_n = jnp.where(accept, t_c, t)
        cost_n = jnp.where(accept, new_cost, cost)
        lam_n = jnp.clip(
            jnp.where(accept, lam * 0.5, lam * 4.0), 1e-8, 1e6
        )
        return (R_n, t_n, lam_n, cost_n), cost_n

    init_cost = cost_only(graph.R, graph.t)
    lam0 = jnp.asarray(max(damping, 1e-4), graph.R.dtype)
    (R, t, _, _), costs = jax.lax.scan(
        body, (graph.R, graph.t, lam0, init_cost), None, length=iterations
    )
    # costs[0] is the pre-optimization cost (callers compare first vs last
    # for convergence); the scan's per-iteration costs follow.
    costs = jnp.concatenate([init_cost[None], costs])
    return graph._replace(R=R, t=t), costs


def odometry_edges(rel_R: jnp.ndarray, rel_t: jnp.ndarray):
    """Consecutive-pose edges from relative measurements T_c(i+1)_ci.

    Our pose convention here is world-from-camera; the measurement of edge
    (i, i+1) as T_ci_c(i+1) is the inverse of the tracker's step output.
    """
    from ..ops import lie

    n = rel_R.shape[0]
    R_m, t_m = lie.se3_inverse(rel_R, rel_t)
    return (
        jnp.arange(n, dtype=jnp.int32),
        jnp.arange(1, n + 1, dtype=jnp.int32),
        R_m,
        t_m,
    )
