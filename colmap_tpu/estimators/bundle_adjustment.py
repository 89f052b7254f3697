"""Bundle adjustment: batched Levenberg-Marquardt with a matrix-free
Schur-complement CG solver.

This replaces the reference's entire ceres stack
(src/colmap/estimators/bundle_adjustment.h:15-197, solver selection
bundle_adjustment.cc:336-385) with a TPU-native design:

  * The problem is a flat, fixed-capacity tableau of observations
    (pose_idx, cam_idx, point_idx, xy, weight) — padding rows carry weight 0,
    so every shape is static and the whole optimizer jits once.
  * Per-observation 2x21 Jacobians (6 pose tangent + 3 point + 12 intrinsics)
    come from forward-mode autodiff, vmapped — the direct analog of ceres
    autodiff cost functors (reference estimators/cost_functions.h:28) but
    evaluated as one dense batched program on the VPU/MXU.
  * The camera system is reduced by the Schur complement *matrix-free*:
    S u = A u - W Hpp^-1 W^T u is evaluated with per-observation
    contractions + segment sums; no sparse matrices are materialized.
    Point blocks (3x3) invert in closed form.
  * Preconditioned CG (block-Jacobi 6x6/12x12) solves the reduced system —
    the equivalent of ceres ITERATIVE_SCHUR + SCHUR_JACOBI, which the
    reference only reaches for >1000 images; here it is the single code path
    and it shards: with `axis_name` set, observation arrays are sharded
    across devices and every reduction gains a psum (distributed BA over
    ICI/DCN).
  * Robust losses (trivial/huber/cauchy) via IRLS reweighting.

Gauge handling: per-dof float masks on poses/points/intrinsics; fixed dofs
have their Jacobian columns zeroed (reference fixes one pose + one
translation coordinate; pass masks to reproduce that).
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp

from colmap_tpu.geometry import rigid3
from colmap_tpu.sensor import models as camera_models


class BAProblem(NamedTuple):
    """Fixed-capacity BA tableau. All arrays device-resident."""

    poses: jax.Array  # (P, 7) cam_from_world
    cam_params: jax.Array  # (C, 12) padded intrinsics
    points: jax.Array  # (M, 3)
    obs_pose_idx: jax.Array  # (N,) int32
    obs_cam_idx: jax.Array  # (N,) int32
    obs_point_idx: jax.Array  # (N,) int32
    obs_xy: jax.Array  # (N, 2)
    obs_weight: jax.Array  # (N,) float; 0 = padding
    pose_mask: jax.Array  # (P, 6) float; 0 = frozen dof
    cam_mask: jax.Array  # (C, 12) float
    point_mask: jax.Array  # (M, 3) float


@dataclasses.dataclass(frozen=True)
class BAOptions:
    max_iterations: int = 50
    cg_iterations: int = 30
    loss: str = "trivial"  # trivial | huber | cauchy | soft_l1
    loss_scale: float = 1.0  # in pixels
    initial_lambda: float = 1e-4
    min_lambda: float = 1e-10
    max_lambda: float = 1e6
    # camera model id shared by the problem (static specialization)
    camera_model_id: int = int(camera_models.CameraModelId.SIMPLE_RADIAL)


# ---------------------------------------------------------------------------
# residuals + jacobians
# ---------------------------------------------------------------------------


def _project_residual(pose, cam, point, xy, model_id: int):
    pc = rigid3.apply(pose, point)
    z = pc[..., 2]
    z_safe = jnp.where(jnp.abs(z) > 1e-8, z, 1e-8)
    uv = pc[..., :2] / z_safe[..., None]
    proj = camera_models.img_from_cam(model_id, cam, uv)
    r = proj - xy
    # behind-camera observations get residuals damped to a large constant
    # gradient-free region (matches reference filtering semantics where
    # negative-depth points are filtered out of the problem)
    return jnp.where(z > 1e-8, r, jnp.zeros_like(r) + 1e3)


def _obs_residual_and_jac(problem: BAProblem, model_id: int):
    """Per-observation residuals (N, 2) and Jacobians wrt local params."""

    poses = problem.poses[problem.obs_pose_idx]  # (N, 7)
    cams = problem.cam_params[problem.obs_cam_idx]  # (N, 12)
    points = problem.points[problem.obs_point_idx]  # (N, 3)

    def res_local(delta_pose, delta_cam, delta_point, pose, cam, point, xy):
        return _project_residual(
            rigid3.exp_update(pose, delta_pose),
            cam + delta_cam,
            point + delta_point,
            xy,
            model_id,
        )

    zeros6 = jnp.zeros(poses.shape[:1] + (6,), poses.dtype)
    zeros12 = jnp.zeros(cams.shape, cams.dtype)
    zeros3 = jnp.zeros(points.shape, points.dtype)

    def single(dp, dc, dx, pose, cam, point, xy):
        return res_local(dp, dc, dx, pose, cam, point, xy)

    r = jax.vmap(single)(zeros6, zeros12, zeros3, poses, cams, points, problem.obs_xy)
    Jp, Jc, Jx = jax.vmap(
        lambda pose, cam, point, xy: jax.jacfwd(single, argnums=(0, 1, 2))(
            jnp.zeros(6, poses.dtype),
            jnp.zeros(12, cams.dtype),
            jnp.zeros(3, points.dtype),
            pose,
            cam,
            point,
            xy,
        )
    )(poses, cams, points, problem.obs_xy)
    return r, Jp, Jc, Jx  # (N,2), (N,2,6), (N,2,12), (N,2,3)


def _robust_weight(r2: jax.Array, loss: str, scale: float) -> jax.Array:
    """IRLS weight rho'(r2) for squared residual norms r2."""
    s2 = scale * scale
    if loss == "trivial":
        return jnp.ones_like(r2)
    if loss == "huber":
        return jnp.where(r2 <= s2, 1.0, jnp.sqrt(s2 / jnp.maximum(r2, 1e-12)))
    if loss == "cauchy":
        return 1.0 / (1.0 + r2 / s2)
    if loss == "soft_l1":
        return 1.0 / jnp.sqrt(1.0 + r2 / s2)
    raise ValueError(f"unknown loss {loss}")


def _robust_cost(r2: jax.Array, loss: str, scale: float) -> jax.Array:
    s2 = scale * scale
    if loss == "trivial":
        return r2
    if loss == "huber":
        r = jnp.sqrt(jnp.maximum(r2, 1e-20))
        return jnp.where(r2 <= s2, r2, 2.0 * scale * r - s2)
    if loss == "cauchy":
        return s2 * jnp.log1p(r2 / s2)
    if loss == "soft_l1":
        return 2.0 * s2 * (jnp.sqrt(1.0 + r2 / s2) - 1.0)
    raise ValueError(f"unknown loss {loss}")


def compute_cost(problem: BAProblem, options: BAOptions) -> jax.Array:
    """Total robust cost (0.5 * sum rho(||r||^2))."""
    poses = problem.poses[problem.obs_pose_idx]
    cams = problem.cam_params[problem.obs_cam_idx]
    points = problem.points[problem.obs_point_idx]
    r = jax.vmap(lambda p, c, x, xy: _project_residual(p, c, x, xy, options.camera_model_id))(
        poses, cams, points, problem.obs_xy
    )
    r2 = jnp.sum(r * r, axis=-1) * problem.obs_weight
    return 0.5 * jnp.sum(_robust_cost(r2, options.loss, options.loss_scale))


# ---------------------------------------------------------------------------
# the LM step
# ---------------------------------------------------------------------------


def _psum(x, axis_name):
    return jax.lax.psum(x, axis_name) if axis_name is not None else x


def _segsum(x, idx, n):
    return jax.ops.segment_sum(x, idx, num_segments=n)


class LMState(NamedTuple):
    problem: BAProblem
    lam: jax.Array
    cost: jax.Array
    iteration: jax.Array


def lm_step(state: LMState, options: BAOptions, axis_name: Optional[str] = None):
    """One damped LM iteration (jittable; shard obs arrays + set axis_name
    for multi-device). Returns the updated LMState."""
    problem = state.problem
    P = problem.poses.shape[0]
    C = problem.cam_params.shape[0]
    M = problem.points.shape[0]

    r, Jp, Jc, Jx = _obs_residual_and_jac(problem, options.camera_model_id)

    # robust IRLS scaling + observation weights + frozen-dof column masks
    r2 = jnp.sum(r * r, axis=-1)
    w = _robust_weight(r2, options.loss, options.loss_scale) * problem.obs_weight
    sw = jnp.sqrt(jnp.maximum(w, 0.0))[:, None]
    r = r * sw
    Jp = Jp * sw[..., None] * problem.pose_mask[problem.obs_pose_idx][:, None, :]
    Jc = Jc * sw[..., None] * problem.cam_mask[problem.obs_cam_idx][:, None, :]
    Jx = Jx * sw[..., None] * problem.point_mask[problem.obs_point_idx][:, None, :]

    # ---- point (landmark) blocks -----------------------------------------
    Hxx = _psum(
        _segsum(jnp.einsum("nki,nkj->nij", Jx, Jx), problem.obs_point_idx, M),
        axis_name,
    )  # (M, 3, 3)
    gx = _psum(
        _segsum(jnp.einsum("nki,nk->ni", Jx, r), problem.obs_point_idx, M), axis_name
    )  # (M, 3) = Jx^T r

    lam = state.lam
    eye3 = jnp.eye(3, dtype=Hxx.dtype)
    dHxx = jnp.maximum(jnp.diagonal(Hxx, axis1=-2, axis2=-1), 1e-6)  # (M, 3)
    Hxx_d = Hxx + lam * dHxx[..., None] * eye3 + 1e-8 * eye3
    Hxx_inv = jnp.linalg.inv(Hxx_d)  # batched 3x3

    # ---- camera-side diagonal blocks (preconditioner + damping) -----------
    Hpp = _psum(
        _segsum(jnp.einsum("nki,nkj->nij", Jp, Jp), problem.obs_pose_idx, P), axis_name
    )  # (P, 6, 6)
    Hcc = _psum(
        _segsum(jnp.einsum("nki,nkj->nij", Jc, Jc), problem.obs_cam_idx, C), axis_name
    )  # (C, 12, 12)
    gp = _psum(_segsum(jnp.einsum("nki,nk->ni", Jp, r), problem.obs_pose_idx, P), axis_name)
    gc = _psum(_segsum(jnp.einsum("nki,nk->ni", Jc, r), problem.obs_cam_idx, C), axis_name)

    eye6 = jnp.eye(6, dtype=Hpp.dtype)
    eye12 = jnp.eye(12, dtype=Hcc.dtype)
    dHpp = jnp.maximum(jnp.diagonal(Hpp, axis1=-2, axis2=-1), 1e-6)
    dHcc = jnp.maximum(jnp.diagonal(Hcc, axis1=-2, axis2=-1), 1e-6)
    Hpp_prec = Hpp + lam * dHpp[..., None] * eye6 + 1e-8 * eye6
    Hcc_prec = Hcc + lam * dHcc[..., None] * eye12 + 1e-8 * eye12
    Hpp_prec_inv = jnp.linalg.inv(Hpp_prec)
    Hcc_prec_inv = jnp.linalg.inv(Hcc_prec)

    # ---- matrix-free Schur operator ---------------------------------------
    def S_matvec(u_pose, u_cam):
        # a_k = Jp u[p] + Jc u[c]                    (N, 2)
        a = jnp.einsum("nki,ni->nk", Jp, u_pose[problem.obs_pose_idx]) + jnp.einsum(
            "nki,ni->nk", Jc, u_cam[problem.obs_cam_idx]
        )
        # v_m = sum Jx^T a                           (M, 3)
        v = _psum(_segsum(jnp.einsum("nki,nk->ni", Jx, a), problem.obs_point_idx, M), axis_name)
        wv = jnp.einsum("mij,mj->mi", Hxx_inv, v)
        b = a - jnp.einsum("nki,ni->nk", Jx, wv[problem.obs_point_idx])
        out_pose = _psum(
            _segsum(jnp.einsum("nki,nk->ni", Jp, b), problem.obs_pose_idx, P), axis_name
        ) + lam * dHpp * u_pose + 1e-8 * u_pose
        out_cam = _psum(
            _segsum(jnp.einsum("nki,nk->ni", Jc, b), problem.obs_cam_idx, C), axis_name
        ) + lam * dHcc * u_cam + 1e-8 * u_cam
        return out_pose, out_cam

    # reduced RHS: -g_cam + W Hxx^-1 g_x
    hg = jnp.einsum("mij,mj->mi", Hxx_inv, gx)  # (M, 3)
    # b_k correction term: Jcam^T Jx Hxx^-1 gx
    t = jnp.einsum("nki,ni->nk", Jx, hg[problem.obs_point_idx])  # (N, 2)
    rhs_pose = -gp + _psum(
        _segsum(jnp.einsum("nki,nk->ni", Jp, t), problem.obs_pose_idx, P), axis_name
    )
    rhs_cam = -gc + _psum(
        _segsum(jnp.einsum("nki,nk->ni", Jc, t), problem.obs_cam_idx, C), axis_name
    )

    def precond(u_pose, u_cam):
        return (
            jnp.einsum("pij,pj->pi", Hpp_prec_inv, u_pose),
            jnp.einsum("cij,cj->ci", Hcc_prec_inv, u_cam),
        )

    def dot(a, b):
        return jnp.sum(a[0] * b[0]) + jnp.sum(a[1] * b[1])

    # ---- PCG --------------------------------------------------------------
    x0 = (jnp.zeros((P, 6), r.dtype), jnp.zeros((C, 12), r.dtype))
    r0 = (rhs_pose, rhs_cam)
    z0 = precond(*r0)
    p0 = z0

    def cg_body(_, carry):
        x, rr, z, p, rz = carry
        Ap = S_matvec(*p)
        pAp = dot(p, Ap)
        alpha = rz / jnp.where(jnp.abs(pAp) > 1e-20, pAp, 1e-20)
        x = (x[0] + alpha * p[0], x[1] + alpha * p[1])
        rr = (rr[0] - alpha * Ap[0], rr[1] - alpha * Ap[1])
        z = precond(*rr)
        rz_new = dot(rr, z)
        beta = rz_new / jnp.where(jnp.abs(rz) > 1e-20, rz, 1e-20)
        p = (z[0] + beta * p[0], z[1] + beta * p[1])
        return (x, rr, z, p, rz_new)

    x, _, _, _, _ = jax.lax.fori_loop(
        0, options.cg_iterations, cg_body, (x0, r0, z0, p0, dot(r0, z0))
    )
    du_pose, du_cam = x

    # ---- back-substitute point updates ------------------------------------
    a = jnp.einsum("nki,ni->nk", Jp, du_pose[problem.obs_pose_idx]) + jnp.einsum(
        "nki,ni->nk", Jc, du_cam[problem.obs_cam_idx]
    )
    rhs_x = -gx - _psum(
        _segsum(jnp.einsum("nki,nk->ni", Jx, a), problem.obs_point_idx, M), axis_name
    )
    dx = jnp.einsum("mij,mj->mi", Hxx_inv, rhs_x)

    # apply masks (frozen dofs stay put even with numerical noise)
    du_pose = du_pose * problem.pose_mask
    du_cam = du_cam * problem.cam_mask
    dx = dx * problem.point_mask

    # ---- trial state + accept/reject ---------------------------------------
    new_poses = rigid3.exp_update(problem.poses, du_pose)
    new_cams = problem.cam_params + du_cam
    new_points = problem.points + dx
    trial = problem._replace(poses=new_poses, cam_params=new_cams, points=new_points)

    new_cost = compute_cost(trial, options)
    if axis_name is not None:
        # compute_cost sums the local observation shard; psum totals it.
        new_cost = jax.lax.psum(new_cost, axis_name)
    cur_cost = state.cost

    accept = new_cost < cur_cost
    lam_new = jnp.where(
        accept,
        jnp.maximum(lam * 0.3333, options.min_lambda),
        jnp.minimum(lam * 4.0, options.max_lambda),
    )

    def pick(a, b):
        return jax.tree.map(lambda x, y: jnp.where(accept, x, y), a, b)

    next_problem = pick(trial, problem)
    next_cost = jnp.where(accept, new_cost, cur_cost)
    return LMState(
        problem=next_problem,
        lam=lam_new,
        cost=next_cost,
        iteration=state.iteration + 1,
    )


@partial(jax.jit, static_argnames=("options", "axis_name"))
def solve(problem: BAProblem, options: BAOptions, axis_name: Optional[str] = None) -> LMState:
    """Run `options.max_iterations` LM iterations (fully on device)."""
    cost0 = compute_cost(problem, options)
    if axis_name is not None:
        cost0 = jax.lax.psum(cost0, axis_name)
    state = LMState(
        problem=problem,
        lam=jnp.asarray(options.initial_lambda, problem.poses.dtype),
        cost=cost0,
        iteration=jnp.asarray(0, jnp.int32),
    )

    def body(_, s):
        return lm_step(s, options, axis_name)

    return jax.lax.fori_loop(0, options.max_iterations, body, state)


# ---------------------------------------------------------------------------
# Problem construction helpers (host side)
# ---------------------------------------------------------------------------


def make_problem(
    poses,
    cam_params,
    points,
    obs_pose_idx,
    obs_cam_idx,
    obs_point_idx,
    obs_xy,
    obs_weight=None,
    fix_poses=(),
    fix_first_pose_and_gauge: bool = False,
    refine_intrinsics: bool = False,
    refine_extra_params: bool = False,
    dtype=jnp.float32,
) -> BAProblem:
    """Build a BAProblem from numpy/JAX arrays with COLMAP-like gauge defaults.

    `fix_first_pose_and_gauge` reproduces the reference's global-BA gauge:
    the first pose is fully fixed and the second pose's tx is fixed
    (reference bundle_adjustment.cc gauge handling).
    """
    import numpy as np

    poses = jnp.asarray(poses, dtype)
    cam_params = jnp.asarray(cam_params, dtype)
    points = jnp.asarray(points, dtype)
    P, C, M = poses.shape[0], cam_params.shape[0], points.shape[0]

    if obs_weight is None:
        obs_weight = jnp.ones(len(obs_xy), dtype)

    pose_mask = np.ones((P, 6), np.float32)
    for i in fix_poses:
        pose_mask[i] = 0.0
    if fix_first_pose_and_gauge and P >= 2:
        pose_mask[0] = 0.0
        pose_mask[1, 3] = 0.0  # tx of second pose
    cam_mask = np.zeros((C, 12), np.float32)
    if refine_intrinsics:
        cam_mask[:, :4] = 1.0
    if refine_extra_params:
        cam_mask[:, 4:] = 1.0

    return BAProblem(
        poses=poses,
        cam_params=cam_params,
        points=points,
        obs_pose_idx=jnp.asarray(obs_pose_idx, jnp.int32),
        obs_cam_idx=jnp.asarray(obs_cam_idx, jnp.int32),
        obs_point_idx=jnp.asarray(obs_point_idx, jnp.int32),
        obs_xy=jnp.asarray(obs_xy, dtype),
        obs_weight=jnp.asarray(obs_weight, dtype),
        pose_mask=jnp.asarray(pose_mask, dtype),
        cam_mask=jnp.asarray(cam_mask, dtype),
        point_mask=jnp.ones((M, 3), dtype),
    )
