"""Generalized (multi-camera rig) absolute pose estimation.

Reference: src/colmap/estimators/generalized_absolute_pose.h (GP3P),
generalized_pose.h (EstimateGeneralizedAbsolutePose). The TPU design
replaces the algebraic GP3P minimal solver with per-camera P3P hypotheses
lifted to the rig frame (a hypothesis from camera c's triple gives
rig_from_world = inv(cam_from_rig_c) * cam_from_world_c), scored against
ALL observations of ALL rig cameras in one batched residual program, with a
generalized GN refinement over the rig pose as the LO step. Same-camera
triples lose no generality for scoring and keep the solver a pure vmapped
P3P batch.
"""

from __future__ import annotations

import dataclasses
from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np

from colmap_tpu.estimators import absolute_pose as ap
from colmap_tpu.geometry import rigid3
from colmap_tpu.optim.ransac import RansacOptions, ransac


class GeneralizedPoseResult(NamedTuple):
    rig_from_world: jax.Array  # (7,)
    num_inliers: jax.Array
    inlier_mask: jax.Array
    success: jax.Array


def _rig_residuals(rig_pose, data):
    """Squared reprojection error in normalized coords per observation.

    data = (points3d (N,3), uv (N,2), cams_from_rig_per_obs (N,7)).
    """
    points3d, uv, cams = data
    cam_from_world = jax.vmap(rigid3.compose, in_axes=(0, None))(cams, rig_pose)
    pc = jax.vmap(rigid3.apply)(cam_from_world, points3d)
    z = pc[..., 2]
    behind = z < 1e-6
    z_safe = jnp.where(behind, 1.0, z)
    proj = pc[..., :2] / z_safe[..., None]
    r2 = jnp.sum((proj - uv) ** 2, axis=-1)
    return jnp.where(behind, 1e6, r2)


def _rig_gn_refine(rig_pose, points3d, uv, cams, weights, num_iters=8,
                   lm_lambda=1e-4):
    """Damped GN on the rig SE3 tangent over all cameras' observations."""

    def residual_vec(p):
        cam_from_world = jax.vmap(rigid3.compose, in_axes=(0, None))(cams, p)
        pc = jax.vmap(rigid3.apply)(cam_from_world, points3d)
        z = jnp.where(pc[..., 2] > 1e-6, pc[..., 2], 1e-6)
        proj = pc[..., :2] / z[..., None]
        return ((proj - uv) * weights[..., None]).reshape(-1)

    def step(pose, _):
        def r_of(delta):
            return residual_vec(rigid3.exp_update(pose, delta))

        d0 = jnp.zeros(6, pose.dtype)
        J = jax.jacfwd(r_of)(d0)
        r = r_of(d0)
        JtJ = J.T @ J
        H = JtJ + lm_lambda * jnp.diag(jnp.diag(JtJ)) \
            + 1e-8 * jnp.eye(6, dtype=pose.dtype)
        delta = -jnp.linalg.solve(H, J.T @ r)
        new_pose = rigid3.exp_update(pose, delta)
        better = jnp.sum(r_of(delta) ** 2) < jnp.sum(r ** 2)
        return jnp.where(better, new_pose, pose), None

    pose, _ = jax.lax.scan(step, rig_pose, None, length=num_iters)
    return pose


def estimate_generalized_absolute_pose(
    key: jax.Array,
    points3d: jax.Array,  # (N, 3) world
    uv: jax.Array,  # (N, 2) normalized coords in the OBSERVING camera
    cam_idx: jax.Array,  # (N,) int32 rig camera index per observation
    cams_from_rig: jax.Array,  # (C, 7)
    valid: jax.Array,  # (N,)
    options: Optional[RansacOptions] = None,
) -> GeneralizedPoseResult:
    """RANSAC generalized absolute pose (rig registration). Jittable."""
    opts = options or RansacOptions(num_samples=1024, lo_iterations=2)
    cams_per_obs = cams_from_rig[cam_idx]  # (N, 7)
    rigs_from_cams = jax.vmap(rigid3.inverse)(cams_from_rig)  # (C, 7)

    def solver(p3, uv3, cams3, camidx3):
        # P3P in the camera frame of the sample's FIRST observation; all
        # three sample points must come from that camera for the minimal
        # solve — hypotheses from mixed-camera triples are masked invalid
        # (they still occur at rate sum_c (n_c/n)^3 under uniform draws,
        # which the hypothesis budget absorbs).
        poses, ok = ap.solve_p3p(p3, uv3)
        same_cam = (camidx3[0] == camidx3[1]) & (camidx3[0] == camidx3[2])
        rig_from_cam = rigs_from_cams[camidx3[0]]
        rig_poses = jax.vmap(
            lambda cw: rigid3.compose(rig_from_cam, cw))(poses)
        return rig_poses, ok & same_cam

    def residual_fn(model, data):
        return _rig_residuals(model, data[:3])

    def refit_fn(model, data, weights):
        p, u, c, _ = data
        new = _rig_gn_refine(model, p, u, c, weights, num_iters=5)
        return new, jnp.isfinite(new).all()

    res = ransac(
        key,
        solver=solver,
        residual_fn=residual_fn,
        refit_fn=refit_fn,
        data=(points3d, uv, cams_per_obs, cam_idx),
        valid=valid,
        sample_size=3,
        options=opts,
    )
    return GeneralizedPoseResult(
        rig_from_world=res.model,
        num_inliers=res.num_inliers,
        inlier_mask=res.inlier_mask,
        success=res.success,
    )
