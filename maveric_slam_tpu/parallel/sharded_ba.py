"""Distributed Schur-complement bundle adjustment over a TPU mesh.

The multi-host/multi-chip BA the north star calls for (BASELINE.json:
"landmark blocks sharded across a pod slice, reduced systems combined via
psum over ICI"). Landmarks are embarrassingly parallel through
linearization, block inversion, and the Schur contraction; only the reduced
(6P x 6P) pose system needs communication — one `psum` per iteration. The
per-shard math is *identical* to the single-chip kernel in backend.ba
(the functions are reused directly), so sharded == unsharded up to
reduction order; tests assert exactly that.

Factor ownership partitions by construction: each factor (l, p) lives with
landmark l on exactly one shard, so psum never double-counts an H block
(SURVEY.md section 7 "Distributed Schur numerics" hazard).
"""

from __future__ import annotations

from functools import partial
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding
from jax.sharding import PartitionSpec as P

from ..backend import ba
from .mesh import LANDMARK_AXIS


def shard_problem(problem: ba.BAProblem, mesh: Mesh) -> ba.BAProblem:
    """Place landmark-indexed arrays across the mesh, replicate poses.

    L must be divisible by the mesh size (pad with masked landmarks
    beforehand if needed — config.ba.max_landmarks is sized for this).
    """
    ax = tuple(mesh.axis_names)
    spec_l = NamedSharding(mesh, P(ax))
    rep = NamedSharding(mesh, P())
    return ba.BAProblem(
        K=jax.device_put(problem.K, rep),
        R=jax.device_put(problem.R, rep),
        t=jax.device_put(problem.t, rep),
        X=jax.device_put(problem.X, spec_l),
        uv=jax.device_put(problem.uv, spec_l),
        mask=jax.device_put(problem.mask, spec_l),
    )


@partial(jax.jit, static_argnums=(1, 2, 3, 4, 5))
def sharded_bundle_adjust(
    problem: ba.BAProblem,
    mesh: Mesh,
    iterations: int = 10,
    damping: float = 1e-4,
    huber_delta: float = 2.0,
    num_anchored: int = 1,
) -> Tuple[ba.BAProblem, jnp.ndarray]:
    """Distributed damped GN. Returns (solved problem, per-iteration cost).

    Communication per iteration: one psum of (6P x 6P + 6P + scalars) over
    ICI; the Cholesky of the reduced system is computed redundantly on every
    device (cheaper than a gather/scatter at these sizes).

    Works over any mesh shape: landmarks shard over the product of all mesh
    axes, so a multi-host ('host', 'chip') mesh reduces over DCN+ICI with
    the same code (psum over the axis tuple).
    """
    ax = tuple(mesh.axis_names)

    @partial(
        jax.shard_map,
        mesh=mesh,
        in_specs=(
            P(),  # K
            P(),  # R
            P(),  # t
            P(ax),  # X
            P(ax),  # uv
            P(ax),  # mask
        ),
        out_specs=(P(), P(), P(ax), P()),
        check_vma=False,
    )
    def run(K, R, t, X, uv, mask):
        def body(carry, _):
            R, t, X = carry
            local = ba.BAProblem(K=K, R=R, t=t, X=X, uv=uv, mask=mask)
            H_ll, b_l, H_pp_part, b_p_part, W, cost_part = (
                ba.build_normal_blocks(local, huber_delta)
            )
            cost = jax.lax.psum(cost_part, ax)

            # Globally consistent LM damping (psum'd mean diagonal).
            tr_sum = jax.lax.psum(
                jnp.sum(jnp.trace(H_ll, axis1=-2, axis2=-1)), ax
            )
            n_l = jax.lax.psum(jnp.float32(H_ll.shape[0]), ax)
            lam = damping * jnp.maximum(tr_sum / (3.0 * n_l), 1e-6)

            S_part, rhs_part, A_inv = ba.reduce_schur(
                H_ll, b_l, H_pp_part, b_p_part, W, lam
            )
            # The diagonal damping was added per-shard inside reduce_schur;
            # keep exactly one copy after the psum.
            n_dev = jax.lax.psum(jnp.float32(1.0), ax)
            p = S_part.shape[0]
            S_part = S_part.at[jnp.arange(p), jnp.arange(p)].add(
                -(1.0 - 1.0 / n_dev) * lam * jnp.eye(6, dtype=S_part.dtype)
            )
            S = jax.lax.psum(S_part, ax)
            rhs = jax.lax.psum(rhs_part, ax)

            dx_p = ba.solve_reduced(
                S, rhs, num_anchored=num_anchored
            )  # replicated solve
            dx_l = ba.back_substitute(A_inv, b_l, W, dx_p)  # local

            new_local = ba.apply_update(local, dx_p, dx_l)
            r_new, _, _ = ba._residuals(new_local)
            w_new = ba._robust_weights(r_new, mask, huber_delta)
            new_cost = jax.lax.psum(ba._cost(r_new, w_new), ax)
            accept = new_cost < cost
            R_out = jnp.where(accept, new_local.R, R)
            t_out = jnp.where(accept, new_local.t, t)
            X_out = jnp.where(accept, new_local.X, X)
            return (R_out, t_out, X_out), cost

        (R_f, t_f, X_f), costs = jax.lax.scan(
            body, (R, t, X), None, length=iterations
        )
        return R_f, t_f, X_f, costs

    R_f, t_f, X_f, costs = run(
        problem.K, problem.R, problem.t, problem.X, problem.uv, problem.mask
    )
    return problem._replace(R=R_f, t=t_f, X=X_f), costs
