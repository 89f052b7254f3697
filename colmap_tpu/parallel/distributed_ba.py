"""Distributed bundle adjustment: observation-sharded LM over a device mesh.

The reference has no distributed BA (ceres is single-process,
bundle_adjustment.cc). Here the observation tableau shards across the mesh
data axis via shard_map; parameters (poses/intrinsics/points) are
replicated, and every Hessian-block/gradient/matvec reduction inside
estimators/bundle_adjustment.lm_step gains a psum over ICI — per-shard
Hessian assembly + Schur-complement reduction with collectives, per
SURVEY.md §2.11.
"""

from __future__ import annotations

from functools import partial

import numpy as np

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

from colmap_tpu.estimators import bundle_adjustment as ba
from colmap_tpu.parallel.mesh import DATA_AXIS, make_mesh, pad_to_multiple


def shard_problem(problem: ba.BAProblem, n_shards: int) -> ba.BAProblem:
    """Pad observation arrays so they split evenly across shards."""
    def pad_obs(x, fill=0):
        return jnp.asarray(pad_to_multiple(np.asarray(x), n_shards, fill=fill))

    return problem._replace(
        obs_pose_idx=pad_obs(problem.obs_pose_idx),
        obs_cam_idx=pad_obs(problem.obs_cam_idx),
        obs_point_idx=pad_obs(problem.obs_point_idx),
        obs_xy=pad_obs(problem.obs_xy),
        obs_weight=pad_obs(problem.obs_weight),  # padding rows weight 0
        # the single-device gather layouts don't shard — the distributed
        # path reduces with segment_sum + psum instead
        pt_gather=None,
        pose_gather=None,
        pose_cam_idx=None,
        pt_gather_ps=None,
        ps_point_idx=None,
    )


def solve_distributed(problem: ba.BAProblem, options: ba.BAOptions,
                      mesh: Mesh | None = None) -> ba.LMState:
    """Run LM with observations sharded across the mesh data axis."""
    if mesh is None:
        mesh = make_mesh()
    n = mesh.devices.size
    problem = shard_problem(problem, n)

    obs_spec = ba.BAProblem(
        poses=P(),
        cam_params=P(),
        points=P(),
        obs_pose_idx=P(DATA_AXIS),
        obs_cam_idx=P(DATA_AXIS),
        obs_point_idx=P(DATA_AXIS),
        obs_xy=P(DATA_AXIS),
        obs_weight=P(DATA_AXIS),
        pose_mask=P(),
        cam_mask=P(),
        point_mask=P(),
    )
    state_spec = ba.LMState(problem=obs_spec, lam=P(), cost=P(), iteration=P(),
                            rel_change=P())

    @partial(
        jax.shard_map,
        mesh=mesh,
        in_specs=(obs_spec,),
        out_specs=state_spec,
        check_vma=False,
    )
    def run(p: ba.BAProblem) -> ba.LMState:
        state = ba.init_state(p, options, axis_name=DATA_AXIS)
        return ba.run_lm(state, options, axis_name=DATA_AXIS)

    with mesh:
        return jax.jit(run)(problem)
