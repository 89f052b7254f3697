"""Sim3 pose-graph optimization (loop closure for hierarchical merging).

The reference hierarchical mapper merges cluster models by greedy pairwise
alignment only (controllers/hierarchical_mapper.h:45-80); this module adds
the missing global step: given per-cluster Sim3 placements and measured
relative Sim3 edges between overlapping clusters, jointly refine all
placements with batched Gauss-Newton so loop-closure error distributes
over the whole graph instead of accumulating along the merge order.

Design: each node i carries a global_from_cluster_i Sim3, parametrized by
a 7-dof tangent (log scale, rotation vector, translation). Edge (i, j)
with measurement Sji = cluster_j_from_cluster_i contributes the residual
tangent(inv(Sji) . (S_j^-1 . S_i)). All residuals evaluate in one vmapped
pass; the normal equations are dense (7N x 7N — cluster counts are tiny)
and solve in one linalg call per iteration. Node 0 is the gauge.
"""

from __future__ import annotations

from functools import partial
from typing import Optional

import numpy as np

import jax
import jax.numpy as jnp

from colmap_tpu.geometry import rotation as rot
from colmap_tpu.geometry import sim3


def _params_to_sim3(p: jax.Array) -> jax.Array:
    """(7,) tangent [log_s, rotvec(3), t(3)] -> (8,) Sim3."""
    s = jnp.exp(p[0])
    q = rot.quat_from_axis_angle(p[1:4])
    return sim3.make(s, q, p[4:7])


def _sim3_tangent(e: jax.Array) -> jax.Array:
    """(8,) Sim3 near identity -> (7,) tangent residual."""
    return jnp.concatenate([
        jnp.log(jnp.maximum(sim3.scale(e), 1e-12))[None],
        rot.quat_to_axis_angle(rot.quat_normalize(sim3.quat(e))),
        sim3.trans(e),
    ])


@partial(jax.jit, static_argnames=("num_iters",))
def _solve(params0, edges_i, edges_j, meas, weights, num_iters: int = 20):
    n = params0.shape[0]

    def residuals(params):
        S = jax.vmap(_params_to_sim3)(params)  # (n, 8) global_from_cluster

        def edge_res(i, j, m, w):
            pred = sim3.compose(sim3.inverse(S[j]), S[i])  # j_from_i
            err = sim3.compose(sim3.inverse(m), pred)
            return _sim3_tangent(err) * w

        return jax.vmap(edge_res)(edges_i, edges_j, meas, weights).reshape(-1)

    def step(params, lam):
        r = residuals(params)
        J = jax.jacfwd(lambda p: residuals(p.reshape(n, 7)))(
            params.reshape(-1))
        H = J.T @ J
        g = J.T @ r
        # gauge: freeze node 0
        mask = jnp.ones(n * 7).at[:7].set(0.0)
        H = H * mask[:, None] * mask[None, :] + jnp.diag(1.0 - mask)
        H = H + lam * jnp.diag(jnp.maximum(jnp.diag(H), 1e-8))
        delta = -jnp.linalg.solve(H, g * mask)
        return params + delta.reshape(n, 7), 0.5 * jnp.sum(r * r)

    def body(carry, _):
        params, lam, cost = carry
        new_params, _ = step(params, lam)
        new_cost = 0.5 * jnp.sum(residuals(new_params) ** 2)
        accept = new_cost < cost
        params = jnp.where(accept, new_params, params)
        lam = jnp.where(accept, jnp.maximum(lam * 0.5, 1e-9),
                        jnp.minimum(lam * 4.0, 1e4))
        cost = jnp.minimum(new_cost, cost)
        return (params, lam, cost), cost

    cost0 = 0.5 * jnp.sum(residuals(params0) ** 2)
    (params, _, cost), _ = jax.lax.scan(
        body, (params0, jnp.asarray(1e-6, params0.dtype), cost0),
        None, length=num_iters)
    return params, cost


def optimize_sim3_pose_graph(
    initial: np.ndarray,
    edges: np.ndarray,
    measurements: np.ndarray,
    weights: Optional[np.ndarray] = None,
    num_iters: int = 20,
) -> np.ndarray:
    """Jointly refine global_from_cluster Sim3 placements.

    initial: (n, 8) Sim3 per node; edges: (E, 2) int (i, j); measurements:
    (E, 8) Sim3 cluster_j_from_cluster_i; node 0 stays fixed.
    Returns refined (n, 8).
    """
    initial = np.asarray(initial, np.float32)
    n = len(initial)
    if n <= 1 or len(edges) == 0:
        return initial
    params0 = np.zeros((n, 7), np.float32)
    for k in range(n):
        params0[k, 0] = np.log(max(float(initial[k, 0]), 1e-12))
        q = initial[k, 1:5] / max(np.linalg.norm(initial[k, 1:5]), 1e-12)
        params0[k, 1:4] = np.asarray(rot.quat_to_axis_angle(
            jnp.asarray(q, jnp.float32)))
        params0[k, 4:7] = initial[k, 5:8]
    if weights is None:
        weights = np.ones(len(edges), np.float32)
    params, _ = _solve(
        jnp.asarray(params0),
        jnp.asarray(edges[:, 0], jnp.int32),
        jnp.asarray(edges[:, 1], jnp.int32),
        jnp.asarray(measurements, jnp.float32),
        jnp.asarray(weights, jnp.float32),
        num_iters=num_iters,
    )
    return np.asarray(jax.vmap(_params_to_sim3)(params))
