"""Camera rig tests: CameraRig math, generalized pose RANSAC, rig BA.

Reference: scene/camera_rig_test.cc, estimators/generalized_absolute_pose_
test.cc, RigBundleAdjuster tests.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from colmap_tpu.estimators import generalized_pose as gp
from colmap_tpu.estimators import rig_bundle_adjustment as rba
from colmap_tpu.geometry import rigid3, rotation as rot
from colmap_tpu.scene.camera_rig import CameraRig


def _quat(rng, scale=0.2):
    from scipy.spatial.transform import Rotation as R

    Rm = R.from_rotvec(rng.normal(0, scale, 3)).as_matrix()
    return np.asarray(rot.rotmat_to_quat(jnp.asarray(Rm, jnp.float32)))


def _rig_setup(rng, num_cams=3):
    """cam_from_rig for a small stereo-ish rig (camera 0 = identity)."""
    cams = [np.array([1, 0, 0, 0, 0, 0, 0], np.float32)]
    for c in range(1, num_cams):
        q = _quat(rng, 0.05)
        t = rng.normal(0, 0.3, 3)
        cams.append(np.concatenate([q, t]).astype(np.float32))
    return np.stack(cams)


def test_generalized_absolute_pose(rng):
    cams_from_rig = _rig_setup(rng)
    q = _quat(rng)
    t = rng.normal(0, 1, 3)
    t[2] += 4
    rig_gt = np.concatenate([q, t]).astype(np.float32)

    n = 150
    X = rng.uniform(-3, 3, (n, 3)).astype(np.float32)
    cam_idx = rng.integers(0, 3, n).astype(np.int32)
    cam_from_world = np.stack([
        np.asarray(rigid3.compose(jnp.asarray(cams_from_rig[c]),
                                  jnp.asarray(rig_gt))) for c in cam_idx])
    pc = np.stack([np.asarray(rigid3.apply(jnp.asarray(p), jnp.asarray(x)))
                   for p, x in zip(cam_from_world, X)])
    ok = pc[:, 2] > 0.5
    X, cam_idx, pc = X[ok], cam_idx[ok], pc[ok]
    uv = (pc[:, :2] / pc[:, 2:]).astype(np.float32)
    # 20% outliers
    n2 = len(uv)
    bad = rng.choice(n2, n2 // 5, replace=False)
    uv[bad] += rng.normal(0, 0.3, (len(bad), 2))

    # residuals are normalized-coords squared errors -> pixel threshold / f
    from colmap_tpu.optim.ransac import RansacOptions

    res = gp.estimate_generalized_absolute_pose(
        jax.random.PRNGKey(0), jnp.asarray(X), jnp.asarray(uv),
        jnp.asarray(cam_idx), jnp.asarray(cams_from_rig),
        jnp.ones(n2, bool),
        options=RansacOptions(num_samples=2048, lo_iterations=2,
                              max_error=4.0 / 800.0))
    pose = np.asarray(res.rig_from_world)
    dq = abs(np.dot(pose[:4] / np.linalg.norm(pose[:4]), rig_gt[:4]))
    rot_err = np.degrees(2 * np.arccos(min(dq, 1.0)))
    assert bool(res.success)
    assert rot_err < 0.5, rot_err
    np.testing.assert_allclose(pose[4:], rig_gt[4:], atol=0.02)
    assert int(res.num_inliers) > 0.7 * (n2 - len(bad))


def test_camera_rig_compute_rig_from_world(rng):
    from colmap_tpu.scene.reconstruction import Camera, Image, Reconstruction

    cams_from_rig = _rig_setup(rng)
    rig = CameraRig()
    rec = Reconstruction()
    for c in range(3):
        rig.add_camera(c + 1, cams_from_rig[c])
        rec.add_camera(Camera(camera_id=c + 1, model_id=0, width=100,
                              height=100, params=np.array([100.0, 50, 50])))
    q = _quat(rng)
    t = rng.normal(0, 1, 3)
    rig_gt = np.concatenate([q, t])
    iids = []
    for c in range(3):
        pose = np.asarray(rigid3.compose(
            jnp.asarray(cams_from_rig[c], jnp.float32),
            jnp.asarray(rig_gt, jnp.float32)))
        img = Image(image_id=c + 1, name=f"c{c}.png", camera_id=c + 1)
        img.cam_from_world = pose.astype(np.float64)
        rec.add_image(img)
        iids.append(c + 1)
    rig.add_snapshot(iids)
    assert rig.check(rec)
    est = rig.compute_rig_from_world(0, rec)
    dq = abs(np.dot(est[:4], rig_gt[:4]))
    assert np.degrees(2 * np.arccos(min(dq, 1.0))) < 0.01
    np.testing.assert_allclose(est[4:], rig_gt[4:], atol=1e-4)


def test_rig_bundle_adjustment(rng):
    """Perturbed rig snapshot poses + extrinsics + points recover GT."""
    cams_from_rig = _rig_setup(rng)
    num_snapshots = 6
    num_points = 120
    X = rng.uniform(-2, 2, (num_points, 3)).astype(np.float32)
    X[:, 2] += 6
    rig_poses = []
    for s in range(num_snapshots):
        q = _quat(rng, 0.1)
        t = np.array([s * 0.5 - 1.5, 0, 0]) + rng.normal(0, 0.1, 3)
        rig_poses.append(np.concatenate([q, t]).astype(np.float32))
    rig_poses = np.stack(rig_poses)

    f = 500.0
    from colmap_tpu.sensor import models as cm

    cam_params = np.stack([cm.pad_params([f, 0.0, 0.0])] * 3)

    obs_s, obs_c, obs_p, obs_xy = [], [], [], []
    for s in range(num_snapshots):
        for c in range(3):
            pose = np.asarray(rigid3.compose(jnp.asarray(cams_from_rig[c]),
                                             jnp.asarray(rig_poses[s])))
            pc = np.asarray(rigid3.apply(
                jnp.asarray(np.tile(pose, (num_points, 1))), jnp.asarray(X)))
            vis = pc[:, 2] > 1
            uv = pc[vis, :2] / pc[vis, 2:]
            for k, m in zip(np.nonzero(vis)[0], range(vis.sum())):
                obs_s.append(s)
                obs_c.append(c)
                obs_p.append(k)
                obs_xy.append(f * uv[m])
    obs_xy = np.stack(obs_xy).astype(np.float32)

    # perturb everything except gauge blocks
    rig_noisy = rig_poses.copy()
    rig_noisy[1:, 4:] += rng.normal(0, 0.03, (num_snapshots - 1, 3))
    cams_noisy = cams_from_rig.copy()
    cams_noisy[1:, 4:] += rng.normal(0, 0.02, (2, 3))
    X_noisy = X + rng.normal(0, 0.02, X.shape).astype(np.float32)

    problem = rba.make_rig_problem(
        rig_noisy, cams_noisy, cam_params, X_noisy,
        np.array(obs_s, np.int32), np.array(obs_c, np.int32),
        np.array(obs_p, np.int32), obs_xy)
    opts = rba.RigBAOptions(max_iterations=25, cg_iterations=40)
    solved, cost = rba.solve_rig(problem, opts)
    cost = float(cost)

    r_final = np.asarray(rba._residuals(
        solved, solved.rig_poses, solved.cams_from_rig, solved.points,
        opts.camera_model_id))
    rms = np.sqrt((r_final ** 2).sum(-1).mean())
    assert rms < 0.1, f"final reprojection RMS {rms:.4f}px"
    # recovered extrinsics match GT
    np.testing.assert_allclose(np.asarray(solved.cams_from_rig)[1:, 4:],
                               cams_from_rig[1:, 4:], atol=5e-3)


def test_generalized_relative_pose(rng):
    """Two rig positions; mixed same/cross-camera correspondences recover
    the metric rig motion (scale from the rig baseline)."""
    import jax

    from colmap_tpu.optim.ransac import RansacOptions

    cams_from_rig = _rig_setup(rng, num_cams=2)
    q = _quat(rng, 0.15)
    t = np.array([0.8, 0.1, 0.3])
    rig2_from_rig1 = np.concatenate([q, t]).astype(np.float32)

    n = 200
    X = rng.uniform(-4, 4, (n, 3)).astype(np.float32)
    X[:, 2] += 8
    cam_idx1 = rng.integers(0, 2, n).astype(np.int32)
    # half same-camera, half cross-camera observations
    cam_idx2 = np.where(rng.uniform(size=n) < 0.5, cam_idx1,
                        rng.integers(0, 2, n)).astype(np.int32)

    def project(rig_pose, cidx, X):
        uv = np.zeros((len(X), 2), np.float32)
        ok = np.ones(len(X), bool)
        for k, x in enumerate(X):
            pose = np.asarray(rigid3.compose(
                jnp.asarray(cams_from_rig[cidx[k]]),
                jnp.asarray(rig_pose, jnp.float32)))
            pc = np.asarray(rigid3.apply(jnp.asarray(pose), jnp.asarray(x)))
            if pc[2] < 0.5:
                ok[k] = False
                continue
            uv[k] = pc[:2] / pc[2]
        return uv, ok

    identity = np.array([1, 0, 0, 0, 0, 0, 0], np.float32)
    uv1, ok1 = project(identity, cam_idx1, X)
    uv2, ok2 = project(rig2_from_rig1, cam_idx2, X)
    keep = ok1 & ok2
    uv1, uv2 = uv1[keep], uv2[keep]
    c1, c2 = cam_idx1[keep], cam_idx2[keep]
    n2 = keep.sum()
    # 15% outliers
    bad = rng.choice(n2, n2 // 7, replace=False)
    uv2[bad] += rng.normal(0, 0.2, (len(bad), 2)).astype(np.float32)

    from colmap_tpu.estimators.generalized_pose import (
        estimate_generalized_relative_pose)

    res = estimate_generalized_relative_pose(
        jax.random.PRNGKey(1), jnp.asarray(uv1), jnp.asarray(uv2),
        jnp.asarray(c1), jnp.asarray(c2), jnp.asarray(cams_from_rig),
        jnp.ones(int(n2), bool),
        options=RansacOptions(num_samples=4096, lo_iterations=3,
                              max_error=2e-3))
    pose = np.asarray(res.rig_from_world)
    dq = abs(np.dot(pose[:4] / np.linalg.norm(pose[:4]), rig2_from_rig1[:4]))
    rot_err = np.degrees(2 * np.arccos(min(dq, 1.0)))
    assert rot_err < 1.0, (rot_err, pose)
    # metric translation recovered (scale from the rig baseline)
    np.testing.assert_allclose(pose[4:], rig2_from_rig1[4:], atol=0.1)
