"""Tests for EPnP, focal search, covariance estimation, weighted sampling,
L1 solver.

Reference test analogs: estimators/absolute_pose_test.cc (EPnP),
estimators/covariance_test.cc, optim/least_absolute_deviations_test.cc,
optim/progressive_sampler_test.cc.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from colmap_tpu.estimators import absolute_pose as ap
from colmap_tpu.estimators import bundle_adjustment as ba
from colmap_tpu.estimators import covariance as cov_mod
from colmap_tpu.optim import least_absolute_deviations as lad
from colmap_tpu.optim.ransac import draw_minimal_samples
from colmap_tpu.sensor import models as cm


def _random_pose(rng):
    from scipy.spatial.transform import Rotation as R

    Rm = R.from_rotvec(rng.normal(0, 0.3, 3)).as_matrix()
    t = rng.normal(0, 1, 3)
    t[2] += 4
    return Rm, t


def test_epnp_exact(rng):
    Rm, t = _random_pose(rng)
    X = rng.uniform(-2, 2, (40, 3)).astype(np.float32)
    pc = X @ Rm.T + t
    uv = (pc[:, :2] / pc[:, 2:]).astype(np.float32)
    pose, valid = ap.solve_epnp(jnp.asarray(X), jnp.asarray(uv))
    assert bool(valid)
    r2 = np.asarray(ap.reprojection_residuals(pose, (jnp.asarray(X),
                                                     jnp.asarray(uv))))
    assert np.sqrt(r2).max() < 1e-4


def test_epnp_noisy_weighted(rng):
    Rm, t = _random_pose(rng)
    X = rng.uniform(-2, 2, (60, 3)).astype(np.float32)
    pc = X @ Rm.T + t
    uv = (pc[:, :2] / pc[:, 2:]).astype(np.float32)
    uv += rng.normal(0, 1e-3, uv.shape).astype(np.float32)
    # corrupt 10 points, zero their weights
    uv[:10] += 0.5
    w = np.ones(60, np.float32)
    w[:10] = 0.0
    pose, valid = ap.solve_epnp(jnp.asarray(X), jnp.asarray(uv), jnp.asarray(w))
    r2 = np.asarray(ap.reprojection_residuals(pose, (jnp.asarray(X),
                                                     jnp.asarray(uv))))
    assert np.median(np.sqrt(r2[10:])) < 5e-3


def test_focal_length_search(rng):
    Rm, t = _random_pose(rng)
    X = rng.uniform(-2, 2, (100, 3)).astype(np.float32)
    pc = X @ Rm.T + t
    uv_true = (pc[:, :2] / pc[:, 2:]).astype(np.float32)
    # rays computed with a WRONG focal prior: f_prior = f_true / 1.5
    # => rays_prior = uv_true * 1.5
    rays_prior = uv_true * 1.5
    pose, factor, ninl, mask = ap.estimate_pose_with_focal_search(
        jax.random.PRNGKey(0), jnp.asarray(X), jnp.asarray(rays_prior),
        jnp.ones(100, bool), jnp.asarray(4.0 / 800.0),
        num_focal_samples=11)
    assert abs(float(factor) - 1.5) < 0.15
    # the focal grid quantizes the factor, so not all points fall inside
    # the tight threshold at the nearest grid value
    assert int(ninl) > 60


def _small_ba_problem(rng, num_poses=4, num_points=30):
    from colmap_tpu.geometry import rotation as rot

    model_id = int(cm.CameraModelId.SIMPLE_PINHOLE)
    params = cm.pad_params([500.0, 0.0, 0.0])
    X = rng.uniform(-1, 1, (num_points, 3)).astype(np.float32)
    X[:, 2] += 5
    poses = []
    for i in range(num_poses):
        from scipy.spatial.transform import Rotation as R

        Rm = R.from_rotvec(rng.normal(0, 0.1, 3)).as_matrix()
        t = np.array([i * 0.5 - 1, 0, 0]) + rng.normal(0, 0.05, 3)
        q = np.asarray(rot.rotmat_to_quat(jnp.asarray(Rm, jnp.float32)))
        poses.append(np.concatenate([q, t]).astype(np.float32))
    poses = np.stack(poses)
    obs_pose, obs_pt, obs_xy = [], [], []
    from colmap_tpu.geometry import rigid3

    for m in range(num_points):
        for p in range(num_poses):
            pc = np.asarray(rigid3.apply(jnp.asarray(poses[p]),
                                         jnp.asarray(X[m])))
            uv = pc[:2] / pc[2]
            xy = np.asarray(cm.img_from_cam(model_id, jnp.asarray(params),
                                            jnp.asarray(uv[None],
                                                        jnp.float32)))[0]
            obs_pose.append(p)
            obs_pt.append(m)
            obs_xy.append(xy)
    n = len(obs_xy)
    problem = ba.make_problem(
        poses, params[None].astype(np.float32), X,
        np.array(obs_pose, np.int32), np.zeros(n, np.int32),
        np.array(obs_pt, np.int32), np.stack(obs_xy).astype(np.float32),
        obs_weight=np.ones(n, np.float32))
    # gauge: freeze pose 0 entirely + x of pose 1
    pose_mask = np.ones((num_poses, 6), np.float32)
    pose_mask[0] = 0.0
    pose_mask[1, 3] = 0.0
    problem = problem._replace(pose_mask=jnp.asarray(pose_mask))
    return problem, model_id


def test_covariance_matches_full_inverse(rng):
    problem, model_id = _small_ba_problem(rng)
    est = cov_mod.estimate_ba_covariance(
        problem, cov_mod.CovarianceOptions(compute_point_covariances=True),
        camera_model_id=model_id)
    full = cov_mod.estimate_pose_covariance_full_inverse(problem, model_id)
    for p, C in est.pose_covs.items():
        np.testing.assert_allclose(C, full[p, :, p, :], rtol=1e-2, atol=1e-8)
    # sanity: covariances PSD, frozen pose excluded
    assert 0 not in est.pose_covs
    for C in est.pose_covs.values():
        evals = np.linalg.eigvalsh(C)
        assert evals.min() > -1e-9
    assert len(est.point_covs) > 0


def test_weighted_sampling_prefers_quality(rng):
    key = jax.random.PRNGKey(3)
    n = 100
    valid = jnp.ones(n, bool)
    w = jnp.concatenate([jnp.full(10, 100.0), jnp.full(90, 1.0)])
    idx = np.asarray(draw_minimal_samples(key, valid, 2000, 3, weights=w))
    frac_top = (idx < 10).mean()
    assert frac_top > 0.5  # top-10 quality points dominate the samples
    # unweighted is uniform
    idx_u = np.asarray(draw_minimal_samples(key, valid, 2000, 3))
    assert (idx_u < 10).mean() < 0.2


def test_lad_robust_to_outliers(rng):
    n = 200
    A = rng.normal(0, 1, (n, 4)).astype(np.float32)
    x_gt = np.array([1.0, -2.0, 0.5, 3.0], np.float32)
    b = A @ x_gt + rng.normal(0, 0.01, n).astype(np.float32)
    b[:40] += rng.normal(0, 10, 40)  # gross outliers
    x_l1 = np.asarray(lad.solve_lad(jnp.asarray(A), jnp.asarray(b)))
    x_l2, *_ = np.linalg.lstsq(A, b, rcond=None)
    assert np.linalg.norm(x_l1 - x_gt) < 0.05
    assert np.linalg.norm(x_l1 - x_gt) < np.linalg.norm(x_l2 - x_gt) / 3
